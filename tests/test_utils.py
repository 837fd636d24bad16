"""Progress / profiling utilities."""

import io

import jax.numpy as jnp
import numpy as np

from visfd_tpu.utils import Report, stage, stage_timings


def test_report_and_stage():
    buf = io.StringIO()
    rep = Report(buf)
    with stage("blur", rep):
        rep.line("processing plane 1 / 4")
    out = buf.getvalue()
    assert "---- blur ----" in out
    assert "processing plane 1 / 4" in out
    assert "blur" in rep.timings and rep.timings["blur"] >= 0.0


def test_report_none_is_silent():
    rep = Report(None)
    with stage("x", rep):
        rep.line("hidden")
    assert "x" in rep.timings


def test_stage_timings():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 32)))
    t = stage_timings([("square", lambda: x * x)], warmup=1, iters=2)
    assert t["square"] > 0.0


def test_report_accepted_by_segmentation():
    from visfd_tpu.segment.connect import label_connected
    rng = np.random.default_rng(0)
    sal = rng.random((6, 6, 6)).astype(np.float32)
    buf = io.StringIO()
    res = label_connected(sal, threshold_saliency=0.5, report=Report(buf))
    assert "Number of clusters found:" in buf.getvalue()
    assert res.num_clusters >= 1
