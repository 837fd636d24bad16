"""Sharded phase checkpoints (orbax).

The reference's only checkpoint/resume is ``-save-progress F`` /
``-load-progress F``, which round-trips the 6 tensor-voting channels
through host ``F_tensor_{0..5}.rec`` files
(``handlers.cpp:1840-1922``).  That is parity-correct but scale-wrong:
the whole volume funnels through one host.  This module persists the
phase state (vote tensor + saliency + direction fields) as an orbax
checkpoint whose arrays keep their mesh sharding -- each host writes
its own shards, and restore places shards directly on the right
devices.  The CLI keeps the ``.rec`` path for reference compatibility
and adds ``-save-progress-sharded`` / ``-load-progress-sharded``
extensions backed by this module.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np


def save_sharded(path: str, tree: Dict[str, jax.Array]) -> None:
    """Save a dict of (possibly sharded) jax arrays as an orbax
    checkpoint at ``path`` (a directory; created/overwritten)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_sharded(
    path: str,
    shardings: Optional[Dict[str, jax.sharding.Sharding]] = None,
) -> Dict[str, jax.Array]:
    """Restore a checkpoint saved by :func:`save_sharded`.  When
    ``shardings`` maps names to target shardings, arrays are restored
    directly into that placement; otherwise they arrive with the
    default (replicated/host) layout."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if shardings is None:
        return ckptr.restore(path)
    tree_meta = ckptr.metadata(path).item_metadata.tree
    abstract = {
        k: jax.ShapeDtypeStruct(tuple(v.shape), v.dtype,
                                sharding=shardings.get(k))
        for k, v in tree_meta.items()
    }
    return ckptr.restore(path, abstract)
