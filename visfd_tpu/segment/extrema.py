"""Plateau-aware local extrema detection.

Capability parity with ``_FindExtrema``
(``morphology_implementation.hpp:55-515``): a local minimum/maximum is
a connected *plateau* of equal-valued voxels (connectivity 1/2/3 =
squared neighbor radius) all of whose outside neighbors are strictly
higher/lower. Plateaus touching the image border or mask boundary are
disqualified when ``allow_borders=False``. Results are sorted (minima
ascending, maxima descending by score; ties keep raster discovery
order like the reference's tuple sort) and an optional label image
marks maxima plateaus with +rank, minima with -rank, 0 elsewhere
(positive-only when a single kind is requested).

TPU formulation (replaces the reference's sequential BFS):

1. per-voxel neighbor comparisons (shift-sums) give has_lower /
   has_higher / touches_border flags;
2. plateau connected components by iterative min-label propagation
   with pointer jumping (converges in O(log diameter) rounds inside
   one jitted ``lax.while_loop``) -- the converged label is the
   smallest flat index in the plateau, which is exactly the
   reference's raster-first representative voxel;
3. plateau properties reduce over labels with scatter-min/add;
4. tiny per-extremum lists are extracted and sorted host-side.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def neighbor_offsets(connectivity: int) -> Tuple[Tuple[int, int, int], ...]:
    """Neighbor displacement set: all (dz,dy,dx) != 0 with
    dx^2+dy^2+dz^2 <= connectivity
    (``morphology_implementation.hpp:132-160``)."""
    r = int(np.floor(np.sqrt(connectivity)))
    offs = []
    for dz in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if (dx, dy, dz) == (0, 0, 0):
                    continue
                if dx * dx + dy * dy + dz * dz > connectivity:
                    continue
                offs.append((dz, dy, dx))
    return tuple(offs)


def _shift_int(x, dzyx, fill):
    out = x
    for axis, d in enumerate(dzyx):
        if d == 0:
            continue
        n = out.shape[axis]
        pad = [(0, 0)] * out.ndim
        sl = [slice(None)] * out.ndim
        if d > 0:
            pad[axis] = (0, d)
            sl[axis] = slice(d, d + n)
        else:
            pad[axis] = (-d, 0)
            sl[axis] = slice(0, n)
        out = jnp.pad(out, pad, constant_values=fill)[tuple(sl)]
    return out


@functools.partial(jax.jit, static_argnames=("offsets",))
def _extrema_device(x, mask, offsets):
    """Returns (labels, has_lt, has_gt, touches_border) where labels is
    the plateau-representative flat index per voxel (-1 outside mask).
    """
    nz, ny, nx = x.shape
    n = nz * ny * nx
    valid = jnp.ones(x.shape, bool) if mask is None else (mask != 0)

    has_lt = jnp.zeros(x.shape, bool)
    has_gt = jnp.zeros(x.shape, bool)
    border = jnp.zeros(x.shape, bool)
    # neighbor "same plateau" adjacency contributes to label propagation
    idx = jnp.arange(n, dtype=jnp.int32).reshape(x.shape)

    neigh_info = []
    for off in offsets:
        nv = _shift_int(x, off, np.nan)
        nvalid = _shift_int(valid.astype(jnp.int32), off, 0) > 0
        in_bounds = ~jnp.isnan(_shift_int(jnp.zeros_like(x), off, np.nan))
        usable = nvalid & in_bounds
        border = border | ~usable
        has_lt = has_lt | (usable & (nv < x))
        has_gt = has_gt | (usable & (nv > x))
        same = usable & (nv == x)
        nidx = _shift_int(idx, off, n)  # out-of-bounds -> n (sentinel)
        neigh_info.append((same, nidx))

    labels = idx

    def body(state):
        labels, _ = state
        new = labels
        flat = labels.reshape(-1)
        for same, nidx in neigh_info:
            nlab = flat[jnp.clip(nidx.reshape(-1), 0, n - 1)].reshape(x.shape)
            new = jnp.where(same, jnp.minimum(new, nlab), new)
        # pointer jumping: label <- label of representative
        newf = new.reshape(-1)
        new = newf[newf].reshape(x.shape)
        changed = jnp.any(new != labels)
        return new, changed

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.asarray(True)))
    labels = jnp.where(valid, labels, -1)
    return labels, has_lt & valid, has_gt & valid, border & valid


@functools.partial(jax.jit, static_argnames=("offsets",))
def _extrema_flags(x, mask, offsets):
    """Per-voxel neighbor flags ONLY (no plateau labels): has_lt /
    has_gt / touches_border / has_same_neighbor, plus per-z-plane int32
    counts of same-valued neighbor pairs.  When that count is ZERO
    (the typical smooth-float-field case at scale) every plateau is a
    singleton and ``find_extrema`` takes the compaction fast path --
    no full-volume label propagation, no full-volume host transfer."""
    valid = jnp.ones(x.shape, bool) if mask is None else (mask != 0)
    has_lt = jnp.zeros(x.shape, bool)
    has_gt = jnp.zeros(x.shape, bool)
    border = jnp.zeros(x.shape, bool)
    has_same = jnp.zeros(x.shape, bool)
    for off in offsets:
        nv = _shift_int(x, off, np.nan)
        nvalid = _shift_int(valid.astype(jnp.int32), off, 0) > 0
        in_bounds = ~jnp.isnan(_shift_int(jnp.zeros_like(x), off, np.nan))
        usable = nvalid & in_bounds
        border = border | ~usable
        has_lt = has_lt | (usable & (nv < x))
        has_gt = has_gt | (usable & (nv > x))
        has_same = has_same | (usable & (nv == x))
    has_same = has_same & valid
    return (has_lt & valid, has_gt & valid, border & valid, has_same,
            jnp.sum(has_same, axis=(1, 2), dtype=jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("find_minima", "find_maxima"))
def _relevant_same(x, has_same, tmin, tmax, find_minima, find_maxima):
    """Restrict the plateau analysis to voxels that could pass the
    requested thresholds.  A plateau has ONE value, so either every
    member passes or none does -- plateau connectivity among voxels
    that fail both thresholds cannot affect any output.  This is what
    keeps the flagship's thresholded saliency (95% EXACT ZEROS after
    -tv-best, i.e. one volume-sized zero plateau) on the compaction
    fast path instead of a full-volume label propagation."""
    rel = jnp.zeros(x.shape, bool)
    if find_minima:
        rel = rel | (x <= tmin)
    if find_maxima:
        rel = rel | (x >= tmax)
    hs = has_same & rel
    return hs, jnp.sum(hs, axis=(1, 2), dtype=jnp.int32)


def _f32_bound(thr, is_min):
    """Largest/smallest f32 boundary reproducing the host float64
    comparison exactly (f32 -> f64 promotion is exact)."""
    t32 = np.float32(thr)
    if is_min:
        if np.float64(t32) > thr:
            t32 = np.nextafter(t32, np.float32(-np.inf))
    else:
        if np.float64(t32) < thr:
            t32 = np.nextafter(t32, np.float32(np.inf))
    return t32


@functools.partial(jax.jit, static_argnames=("kind", "allow_borders"))
def _extrema_counts(x, mask, has_lt, has_gt, border, has_same, thr,
                    kind, allow_borders):
    """Candidate mask for SINGLETON extrema (plateau voxels are
    excluded; they go through the compacted host union-find)."""
    valid = jnp.ones(x.shape, bool) if mask is None else (mask != 0)
    if kind == "min":
        cand = valid & ~has_lt & (x <= thr)
    else:
        cand = valid & ~has_gt & (x >= thr)
    cand = cand & ~has_same
    if not allow_borders:
        cand = cand & ~border
    return cand, jnp.sum(cand, axis=(1, 2), dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("capacity",))
def _extrema_compact(cand, x, capacity):
    z, y, xx = jnp.nonzero(cand, size=capacity, fill_value=0)
    return (jnp.stack([z, y, xx], -1).astype(jnp.int32),
            x[z, y, xx])


@functools.partial(jax.jit, static_argnames=("offsets", "capacity"))
def _plateau_gather(x, mask, has_lt, has_gt, border, has_same,
                    capacity, offsets):
    """Compact the (rare) plateau voxels: coordinates, values,
    per-voxel flags, and a per-offset equal-neighbor bitmap -- the
    host rebuilds the plateau components with a union-find over this
    tiny set (reference BFS semantics, morphology_implementation.hpp
    225-340), never touching the full volume."""
    nz, ny, nx = x.shape
    valid = jnp.ones(x.shape, bool) if mask is None else (mask != 0)
    z, y, xx = jnp.nonzero(has_same, size=capacity, fill_value=0)
    vals = x[z, y, xx]
    sames = []
    for dz, dy, dx in offsets:
        z2, y2, x2 = z + dz, y + dy, xx + dx
        inb = ((z2 >= 0) & (z2 < nz) & (y2 >= 0) & (y2 < ny)
               & (x2 >= 0) & (x2 < nx))
        z2c = jnp.clip(z2, 0, nz - 1)
        y2c = jnp.clip(y2, 0, ny - 1)
        x2c = jnp.clip(x2, 0, nx - 1)
        sames.append(inb & valid[z2c, y2c, x2c]
                     & (x[z2c, y2c, x2c] == vals))
    return (jnp.stack([z, y, xx], -1).astype(jnp.int32), vals,
            has_lt[z, y, xx], has_gt[z, y, xx], border[z, y, xx],
            jnp.stack(sames, -1))


def _plateau_reduce(zyx, vals, p_lt, p_gt, p_bd, same_mat, offsets,
                    shape):
    """Host union-find over the compacted plateau voxels.  Returns
    (root_idx, root_val, size, has_lt, has_gt, border) per plateau,
    root = min flat index (the reference's raster-first
    representative)."""
    nz, ny, nx = shape
    idx = (zyx[:, 0].astype(np.int64) * ny
           + zyx[:, 1]) * nx + zyx[:, 2]
    pos = {int(i): k for k, i in enumerate(idx)}
    parent = list(range(len(idx)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    strides = [((dz * ny) + dy) * nx + dx for dz, dy, dx in offsets]
    for k in range(len(idx)):
        for o, s in enumerate(strides):
            if same_mat[k, o]:
                j = pos.get(int(idx[k]) + s)
                if j is not None:
                    ra, rb = find(k), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for k in range(len(idx)):
        groups.setdefault(find(k), []).append(k)
    out = []
    for members in groups.values():
        mi = np.asarray(members)
        out.append((int(idx[mi].min()), float(vals[mi[0]]), len(mi),
                    bool(p_lt[mi].any()), bool(p_gt[mi].any()),
                    bool(p_bd[mi].any()), idx[mi]))
    return out


@dataclasses.dataclass
class ExtremaResult:
    minima_indices: np.ndarray   # flat indices ix + nx*(iy + ny*iz)
    minima_scores: np.ndarray
    minima_nvoxels: np.ndarray
    maxima_indices: np.ndarray
    maxima_scores: np.ndarray
    maxima_nvoxels: np.ndarray
    label_image: Optional[np.ndarray] = None

    @property
    def num_extrema(self) -> int:
        return len(self.minima_indices) + len(self.maxima_indices)


def find_extrema(
    x,
    mask=None,
    find_minima: bool = True,
    find_maxima: bool = True,
    minima_threshold: float = np.inf,
    maxima_threshold: float = -np.inf,
    connectivity: int = 3,
    allow_borders: bool = True,
    want_label_image: bool = True,
) -> ExtremaResult:
    """Find plateau extrema; see module docstring. ``x`` is (Z, Y, X)."""
    x = jnp.asarray(x, jnp.float32)
    m = None if mask is None else jnp.asarray(mask, jnp.float32)
    offs = neighbor_offsets(connectivity)

    # Fast path (round 5): singleton extrema compact on device and
    # only (idx, score) lists cross the wire; the RARE voxels with an
    # equal-valued neighbor (plateaus) also compact, and the host
    # rebuilds their components with a union-find over that tiny set.
    # At 384^3 this replaces a 390 MB 4-volume transfer + full-volume
    # label propagation (~77 s through the remote tunnel) with ~1 s of
    # flag passes.  Identical results to the full-volume path (same
    # tests, same raster/tie ordering); when plateau voxels are NOT
    # rare (e.g. integer-valued images with flat backgrounds) the
    # link set would rival the volume, so fall back to the full-volume
    # propagation below.
    has_lt, has_gt, border, has_same, _ = _extrema_flags(x, m, offs)
    t32_min = _f32_bound(minima_threshold, is_min=True)
    t32_max = _f32_bound(maxima_threshold, is_min=False)
    has_same, same_counts = _relevant_same(
        x, has_same, jnp.float32(t32_min), jnp.float32(t32_max),
        bool(find_minima), bool(find_maxima))
    n_same = int(np.asarray(same_counts).astype(np.int64).sum())
    if n_same * max(len(offs), 1) <= x.size // 8:
        nz, ny, nx = x.shape
        n = x.size

        plateaus = []
        if n_same:
            cap_p = min(1 << max(6, int(np.ceil(np.log2(n_same)))), n)
            pz, pv, pl, pg, pb, ps = _plateau_gather(
                x, m, has_lt, has_gt, border, has_same, cap_p, offs)
            plateaus = _plateau_reduce(
                np.asarray(pz)[:n_same], np.asarray(pv)[:n_same],
                np.asarray(pl)[:n_same], np.asarray(pg)[:n_same],
                np.asarray(pb)[:n_same], np.asarray(ps)[:n_same],
                offs, x.shape)

        def compact(kind, thr):
            # the full-volume path compares float32 scores against the
            # PYTHON (float64) threshold on the host; the correctly
            # rounded f32 boundary reproduces that exactly
            t32 = t32_min if kind == "min" else t32_max
            cand, counts = _extrema_counts(
                x, m, has_lt, has_gt, border, has_same,
                jnp.float32(t32), kind, bool(allow_borders))
            cnt = int(np.asarray(counts).astype(np.int64).sum())
            if cnt == 0:
                idx = np.zeros(0, np.int64)
                sc = np.zeros(0, np.float32)
                nv = np.zeros(0, np.int64)
            else:
                cap = min(1 << max(6, int(np.ceil(np.log2(cnt)))), n)
                zyx, scj = _extrema_compact(cand, x, cap)
                zyx = np.asarray(zyx)[:cnt].astype(np.int64)
                idx = (zyx[:, 0] * ny + zyx[:, 1]) * nx + zyx[:, 2]
                sc = np.asarray(scj)[:cnt]
                nv = np.ones(cnt, np.int64)
            # merge plateau extrema of this kind, keeping raster order
            # (the full path enumerates roots in ascending-index order)
            p_sel = []
            for (ridx, rval, size, p_lt, p_gt, p_bd, members) in plateaus:
                is_ext = (not p_lt) if kind == "min" else (not p_gt)
                if not allow_borders and p_bd:
                    is_ext = False
                ok_thr = (rval <= thr) if kind == "min" else (rval >= thr)
                if is_ext and ok_thr:
                    p_sel.append((ridx, rval, size, members))
            if p_sel:
                idx = np.concatenate([idx,
                                      [p[0] for p in p_sel]]).astype(
                                          np.int64)
                sc = np.concatenate([sc, np.asarray(
                    [p[1] for p in p_sel], np.float32)])
                nv = np.concatenate([nv, np.asarray(
                    [p[2] for p in p_sel], np.int64)])
                order = np.argsort(idx, kind="stable")
                idx, sc, nv = idx[order], sc[order], nv[order]
            return idx, sc, nv

        member_map = {p[0]: p[6] for p in plateaus}
        zero_i = np.zeros(0, np.int64)
        zero_f = np.zeros(0, np.float32)
        min_idx, min_sc, min_nv = (zero_i, zero_f, zero_i)
        max_idx, max_sc, max_nv = (zero_i, zero_f, zero_i)
        if find_minima:
            idx, sc, nv = compact("min", minima_threshold)
            perm = np.lexsort((np.arange(len(idx)), sc))
            min_idx, min_sc, min_nv = idx[perm], sc[perm], nv[perm]
        if find_maxima:
            idx, sc, nv = compact("max", maxima_threshold)
            perm = np.lexsort((-np.arange(len(idx)), -sc))
            max_idx, max_sc, max_nv = idx[perm], sc[perm], nv[perm]
        label_image = None
        if want_label_image:
            flat = np.zeros(n, np.int64)
            for rank, ridx in enumerate(min_idx):
                flat[member_map.get(int(ridx), [ridx])] = -(rank + 1)
            for rank, ridx in enumerate(max_idx):
                flat[member_map.get(int(ridx), [ridx])] = rank + 1
            label_image = flat.reshape(x.shape)
            if not (find_minima and find_maxima):
                label_image = np.abs(label_image)
        return ExtremaResult(
            minima_indices=min_idx, minima_scores=min_sc,
            minima_nvoxels=min_nv,
            maxima_indices=max_idx, maxima_scores=max_sc,
            maxima_nvoxels=max_nv, label_image=label_image)

    # plateau-heavy fallback (integer-valued / flat-background images):
    # _extrema_device recomputes the per-offset flag sweep the fast
    # path already did -- an accepted ~2x flag-pass cost on the inputs
    # where the full-volume label propagation dominates anyway
    labels, has_lt, has_gt, border = _extrema_device(x, m, offs)
    return postprocess_extrema(
        np.asarray(labels), np.asarray(has_lt), np.asarray(has_gt),
        np.asarray(border), np.asarray(x),
        find_minima=find_minima, find_maxima=find_maxima,
        minima_threshold=minima_threshold,
        maxima_threshold=maxima_threshold,
        allow_borders=allow_borders,
        want_label_image=want_label_image)


def postprocess_extrema(
    labels: np.ndarray,
    has_lt: np.ndarray,
    has_gt: np.ndarray,
    border: np.ndarray,
    vals: np.ndarray,
    find_minima: bool = True,
    find_maxima: bool = True,
    minima_threshold: float = np.inf,
    maxima_threshold: float = -np.inf,
    allow_borders: bool = True,
    want_label_image: bool = True,
) -> ExtremaResult:
    """Host-side reduction of the per-voxel plateau labels/flags into
    sorted extremum lists (shared by the single-device and the
    mesh-sharded device kernels)."""
    n = vals.size

    flat_labels = labels.reshape(-1)
    in_mask = flat_labels >= 0
    lab = flat_labels[in_mask]
    # per-plateau reductions
    plateau_has_lt = np.zeros(n, bool)
    plateau_has_gt = np.zeros(n, bool)
    plateau_border = np.zeros(n, bool)
    plateau_size = np.zeros(n, np.int64)
    np.logical_or.at(plateau_has_lt, lab, has_lt.reshape(-1)[in_mask])
    np.logical_or.at(plateau_has_gt, lab, has_gt.reshape(-1)[in_mask])
    np.logical_or.at(plateau_border, lab, border.reshape(-1)[in_mask])
    np.add.at(plateau_size, lab, 1)

    roots = np.unique(lab)
    is_min = ~plateau_has_lt[roots]
    is_max = ~plateau_has_gt[roots]
    if not allow_borders:
        ok = ~plateau_border[roots]
        is_min &= ok
        is_max &= ok
    root_vals = vals.reshape(-1)[roots]

    def build(sel, scores_thresh_ok, descending):
        rr = roots[sel & scores_thresh_ok]
        sc = vals.reshape(-1)[rr]
        nv = plateau_size[rr]
        # discovery order == increasing root (raster) order; sort by
        # score with the reference's tie behavior: ascending keeps
        # raster order on ties; descending reverses it
        order_key = np.arange(len(rr))
        if descending:
            perm = np.lexsort((-order_key, -sc))
        else:
            perm = np.lexsort((order_key, sc))
        return rr[perm], sc[perm], nv[perm]

    zero = np.zeros(0)
    min_idx = min_sc = min_nv = zero
    max_idx = max_sc = max_nv = zero
    if find_minima:
        min_idx, min_sc, min_nv = build(
            is_min, root_vals <= minima_threshold, descending=False)
    if find_maxima:
        max_idx, max_sc, max_nv = build(
            is_max, root_vals >= maxima_threshold, descending=True)

    label_image = None
    if want_label_image:
        lut = np.zeros(n + 1, np.int64)  # maps root -> signed rank
        if find_minima:
            lut[min_idx] = -(np.arange(len(min_idx)) + 1)
        if find_maxima:
            lut[max_idx] = np.arange(len(max_idx)) + 1
        label_image = np.where(labels >= 0, lut[np.clip(labels, 0, n)], 0)
        if not (find_minima and find_maxima):
            label_image = np.abs(label_image)

    return ExtremaResult(
        minima_indices=min_idx.astype(np.int64),
        minima_scores=min_sc,
        minima_nvoxels=min_nv,
        maxima_indices=max_idx.astype(np.int64),
        maxima_scores=max_sc,
        maxima_nvoxels=max_nv,
        label_image=label_image,
    )


def flat_to_xyz(index, shape_zyx):
    """flat index ix + nx*(iy + ny*iz) -> (ix, iy, iz)."""
    nz, ny, nx = shape_zyx
    ix = index % nx
    iy = (index // nx) % ny
    iz = index // (nx * ny)
    return ix, iy, iz
