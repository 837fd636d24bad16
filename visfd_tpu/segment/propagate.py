"""Device-scale watershed by iterative label propagation.

The reference's watershed (``segmentation.hpp:240-468``) is a
sequential Meyer priority-flood; ``visfd_tpu.segment.watershed`` keeps
those exact semantics on the host (native C++ flood).  This module is
the TPU-resident alternative for volumes that should stay in HBM: a
steepest-descent watershed computed entirely with jitted, fixpoint
``lax.while_loop`` label propagation (no host transfers of the volume).

Algorithm (all device):

1. per-voxel steepest-descent parent: the lowest strictly-lower
   neighbor (ties -> smallest flat index);
2. plateau connected components by min-index propagation over
   equal-value adjacency (pointer jumping, same scheme as
   ``extrema._extrema_device``);
3. minima plateaus (no member has a lower neighbor) become basin
   roots: every member points at the plateau representative;
   non-minimum plateau members without a lower neighbor iteratively
   adopt a resolved equal-value neighbor (BFS-from-exit ordering);
4. pointer jumping collapses parents to roots in O(log depth) rounds.

Each voxel lands in the basin its steepest-descent path reaches --
identical to the Meyer flood wherever a voxel's descent is
unambiguous, and deterministic (smallest-index tie-breaks) elsewhere.
Basin numbering matches ``segment.watershed``: basins are 1..N in
score order (ascending for minima floods, descending for maxima),
raster order on ties, so ``max(label) == number of extrema`` holds
just like the host path.

For sharded volumes, run under ``shard_map`` with halo exchange: all
steps are neighbor-local except pointer jumping, which is a gather --
see ``visfd_tpu.parallel``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from visfd_tpu.segment.extrema import neighbor_offsets, _shift_int


@functools.partial(jax.jit, static_argnames=("offsets",))
def _descend_device(x, mask, offsets):
    """Returns (root, valid) where ``root`` is the basin-root flat
    index per voxel (its steepest-descent destination) and ``valid``
    the in-mask predicate."""
    nz, ny, nx = x.shape
    n = nz * ny * nx
    valid = jnp.ones(x.shape, bool) if mask is None else (mask != 0)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(x.shape)

    INF = jnp.float32(jnp.inf)
    xv = jnp.where(valid, x, INF)

    # -- 1. steepest lower neighbor (min value, tie -> min index) --
    best_val = jnp.full(x.shape, INF)
    best_idx = jnp.full(x.shape, n, jnp.int32)
    # -- 2. plateau adjacency for equal-value propagation --
    neigh_equal = []
    for off in offsets:
        nv = _shift_int(xv, off, INF)
        nidx = _shift_int(idx, off, n)
        usable = nidx < n
        lower = usable & (nv < xv)
        better = lower & ((nv < best_val)
                          | ((nv == best_val) & (nidx < best_idx)))
        best_val = jnp.where(better, nv, best_val)
        best_idx = jnp.where(better, nidx, best_idx)
        neigh_equal.append((usable & (nv == xv), nidx))

    has_lower = jnp.isfinite(best_val)

    # plateau labels: min flat index over equal-value components
    plab = idx

    def plab_body(state):
        lab, _ = state
        new = lab
        flat = lab.reshape(-1)
        for same, nidx in neigh_equal:
            nlab = flat[jnp.clip(nidx.reshape(-1), 0, n - 1)].reshape(x.shape)
            new = jnp.where(same, jnp.minimum(new, nlab), new)
        newf = new.reshape(-1)
        new = newf[newf].reshape(x.shape)
        return new, jnp.any(new != lab)

    plab, _ = jax.lax.while_loop(lambda s: s[1], plab_body,
                                 (plab, jnp.asarray(True)))

    # plateau has-a-lower-neighbor reduction
    p_has_lower = jnp.zeros(n, bool).at[plab.reshape(-1)].max(
        (has_lower & valid).reshape(-1))
    is_min_plateau = valid & ~p_has_lower[plab]

    # -- 3. initial parents --
    parent = jnp.where(has_lower, best_idx, jnp.int32(-1))
    parent = jnp.where(is_min_plateau, plab, parent)
    parent = jnp.where(~valid, idx, parent)

    def resolve_body(state):
        par, _ = state
        resolved = par >= 0
        newpar = par
        parf = par.reshape(-1)
        for same, nidx in neigh_equal:
            nres = (parf[jnp.clip(nidx.reshape(-1), 0, n - 1)] >= 0
                    ).reshape(x.shape)
            cand_ok = same & nres
            cand = jnp.where(cand_ok, nidx, n)
            newpar = jnp.where(
                ~resolved & cand_ok & (cand < jnp.where(newpar >= 0, newpar,
                                                        n)),
                cand, newpar)
        return newpar, jnp.any((newpar >= 0) != resolved)

    parent, _ = jax.lax.while_loop(lambda s: s[1], resolve_body,
                                   (parent, jnp.asarray(True)))
    parent = jnp.where(parent < 0, idx, parent)  # safety net

    # -- 4. pointer jumping to roots --
    def jump_body(state):
        par, _ = state
        parf = par.reshape(-1)
        new = parf[parf].reshape(x.shape)
        return new, jnp.any(new != par)

    root, _ = jax.lax.while_loop(lambda s: s[1], jump_body,
                                 (parent, jnp.asarray(True)))
    return jnp.where(valid, root, -1), valid


@dataclasses.dataclass
class PropagateResult:
    labels: np.ndarray           # (Z, Y, X) int64; basins 1..N; -1 undefined
    num_basins: int
    basin_locations: np.ndarray  # (N, 3) (ix, iy, iz) of basin roots
    basin_scores: np.ndarray


def propagate_watershed(
    source,
    mask=None,
    start_from_minima: bool = True,
    halt_threshold: float = np.inf,
    connectivity: int = 1,
    label_undefined: int = -1,
) -> PropagateResult:
    """Steepest-descent watershed; see module docstring.

    Unlike :func:`visfd_tpu.segment.watershed.watershed` there is no
    boundary labeling (Meyer boundaries are flood-order artifacts);
    every in-mask, below-halt voxel belongs to a basin.
    """
    x = jnp.asarray(source, jnp.float32)
    if not start_from_minima:
        x = -x
        halt = -halt_threshold if np.isfinite(halt_threshold) else np.inf
    else:
        halt = halt_threshold
    offs = neighbor_offsets(connectivity)
    root, valid = _descend_device(
        x, None if mask is None else jnp.asarray(mask, jnp.float32), offs)
    return postprocess_basins(
        np.asarray(root), np.asarray(valid), np.asarray(x),
        start_from_minima=start_from_minima, halt=halt,
        label_undefined=label_undefined)


def postprocess_basins(
    root: np.ndarray,
    valid: np.ndarray,
    x_signed: np.ndarray,
    start_from_minima: bool,
    halt: float,
    label_undefined: int,
) -> PropagateResult:
    """Host-side basin numbering shared by the single-device and
    mesh-sharded descent kernels.  ``x_signed`` is the (possibly
    sign-flipped) flood surface; ``root`` holds per-voxel basin-root
    flat indices in the TRUE (unpadded) volume."""
    vals = x_signed.reshape(-1)
    shape = root.shape
    nz, ny, nx = shape

    roots = np.unique(root[valid])
    scores = vals[roots]
    # basin numbering to match the host flood: score ascending (in the
    # sign-flipped domain), raster order on ties
    perm = np.lexsort((roots, scores))
    roots = roots[perm]
    scores = scores[perm]

    n = root.size
    lut = np.full(n + 1, 0, np.int64)
    lut[roots] = np.arange(1, len(roots) + 1)
    labels = np.where(valid, lut[np.clip(root, 0, n)], label_undefined)

    # halt: voxels above the threshold (in flood order) are undefined
    if np.isfinite(halt):
        labels = np.where(valid & (x_signed > halt), label_undefined,
                          labels)

    ixs = roots % nx
    iys = (roots // nx) % ny
    izs = roots // (nx * ny)
    sign = 1.0 if start_from_minima else -1.0
    return PropagateResult(
        labels=labels.astype(np.int64),
        num_basins=len(roots),
        basin_locations=np.stack([ixs, iys, izs], -1).astype(np.int64),
        basin_scores=(scores * sign).astype(np.float32),
    )
