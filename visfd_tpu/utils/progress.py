"""Structured progress reporting.

The reference threads an optional ``ostream *pReportProgress`` through
every long-running function (``filter3d.hpp:695``, ``feature.hpp:75``,
``connect.hpp:197``) and prints plane counters / percent-complete
lines.  On TPU the unit of work is a jitted stage, not a scanline, so
the equivalent is a per-stage timer that reports wall time (first call
includes compile time -- reported separately on recompile) around
``block_until_ready()`` boundaries.

Usage::

    rep = Report(sys.stderr)
    with stage("tensor voting", rep):
        vote = tv_dense_stick(...)
        jax.block_until_ready(vote)

``Report(None)`` silences everything (like passing a null
pReportProgress).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional, TextIO


class Report:
    """A progress sink; ``write()`` mirrors the ostream protocol so the
    segmentation modules' ``report=`` arguments accept it too."""

    def __init__(self, stream: Optional[TextIO] = None):
        self.stream = stream
        self.timings = {}  # stage name -> seconds (last run)

    def write(self, msg: str) -> None:
        if self.stream is not None:
            self.stream.write(msg)
            self.stream.flush()

    def line(self, msg: str) -> None:
        self.write(msg + "\n")


@contextlib.contextmanager
def stage(name: str, report: Optional[Report] = None):
    """Time a pipeline stage; records into ``report.timings``."""
    rep = report if report is not None else Report(None)
    rep.line(f"---- {name} ----")
    t0 = time.perf_counter()
    try:
        yield rep
    finally:
        dt = time.perf_counter() - t0
        rep.timings[name] = dt
        rep.line(f"---- {name}: {dt:.3f}s ----")
