"""Dense stick tensor voting (surface / curve saliency refinement).

Parity with ``class TV3D`` (``feature.hpp:1624-2483``):

* radial decay kernel = normalized generalized Gaussian exp(-(r/sigma)^2)
  with corner truncation, window halfwidth = floor(sigma * ratio)
  (``:2419-2440``);
* per receiver i, each in-window source voxel s = i - j casts
  ``vote = saliency(s) * w(j) * mask_src(s) * angle^(p/2) *
  outer(n_rot, n_rot)`` where sin(theta) = r_hat . n(s),
  ``angle = cos^2`` for surfaces / ``sin^2`` for curves, and
  ``n_rot = 2 sin(theta) r_hat - n`` (surfaces) or its negation
  (curves) (``:2216-2384``);
* sources that are out of bounds, masked out, zero-saliency, or have
  a zero kernel weight contribute neither votes nor denominator;
* normalization: with a source mask, all 6 tensor channels divide by
  the accumulated denominator; WITHOUT a mask the reference divides
  through a full 3x3 double loop over the symmetric-6 storage, so
  off-diagonal channels are divided TWICE by the separable
  1-D-Gaussian box denominator (``feature.hpp:1840-1864`` -- a real
  behavior we replicate for parity);
* optional final diagonalization with DECREASING eigenvalue order.

TPU formulation: receiver-centric gather as a ``lax.fori_loop`` over
the (2*hw+1)^3 window offsets; each step is a dynamic-slice shifted
fused multiply-add over the whole (Z, Y, X) grid -- the same
gather-not-scatter structure the reference chose for thread safety is
what makes this race-free and vectorizable on the VPU. The loop body
is O(30) elementwise ops; the offset tables (radial weight, unit
displacement) are precomputed host-side like the reference's lookup
tables.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visfd_tpu.ops import kernels as K
from visfd_tpu.ops.conv import _ones_denom_1d
from visfd_tpu.linalg import sym3


def _grid_mesh_of(x):
    """The concrete 2-axis (z, y) Mesh behind a NamedSharding that
    block-shards exactly the first two axes of a (Z, Y, X[, C]) array
    evenly -- the layout the CLI's ``-mesh`` / ``grid_sharding`` use.
    Returns None for any other sharding (callers then fall back to the
    GSPMD-partitioned XLA path)."""
    sh = getattr(x, "sharding", None)
    mesh = getattr(sh, "mesh", None)
    spec = getattr(sh, "spec", None)
    if mesh is None or spec is None:
        return None
    try:
        axes = tuple(mesh.axis_names)
    except Exception:
        return None
    if len(axes) != 2:
        return None

    def norm(e):
        if isinstance(e, tuple):
            return e[0] if len(e) == 1 else e
        return e

    got = tuple(norm(e) for e in tuple(spec))
    got = got + (None,) * (x.ndim - len(got))
    if got[:2] != axes or any(g is not None for g in got[2:]):
        return None
    sizes = dict(zip(axes, mesh.devices.shape))
    if (x.shape[0] % sizes[axes[0]] != 0
            or x.shape[1] % sizes[axes[1]] != 0):
        return None  # uneven blocks: shard_map cannot partition
    return mesh


def tv_tables(sigma: float, truncate_ratio: float = 2.5):
    """(radial weights (K,), unit displacements (K, 3) in (x, y, z),
    offsets (K, 3) as (jz, jy, jx), halfwidth)."""
    hw = int(np.floor(sigma * truncate_ratio))
    ker = K.gen_gauss_kernel_3d((sigma,) * 3, 2.0, (hw,) * 3)  # (Z, Y, X)
    jz, jy, jx = np.meshgrid(*([np.arange(-hw, hw + 1)] * 3), indexing="ij")
    offs = np.stack([jz.ravel(), jy.ravel(), jx.ravel()], axis=-1)
    w = ker.ravel().astype(np.float32)
    length = np.sqrt((offs ** 2).sum(axis=-1)).astype(np.float32)
    length[length == 0] = 1.0
    rhat = np.stack([offs[:, 2], offs[:, 1], offs[:, 0]],
                    axis=-1).astype(np.float32) / length[:, None]
    return w, rhat, offs.astype(np.int32), hw


def tv_accumulate_padded(
    sal_pad, n_pad, m_pad, out_shape,
    w_table, rhat_table, off_table,
    exponent: int, detect_curves: bool, hw: int,
    want_denominator: bool,
):
    """Core vote-accumulation loop over PRE-PADDED (by hw) fields.
    Exposed separately so the sharded path (which pads with halo
    exchange instead of zeros) can reuse the identical vote math.

    Loop structure (TPU-tuned): the z-offset runs in a ``fori_loop``
    (so compile size stays bounded) while the (2*hw+1)^2 in-plane
    offsets are unrolled INSIDE the body -- XLA then fuses all their
    shifted reads and keeps the vote accumulation in registers, so the
    big (Z, Y, X, 6) accumulator is read+written only 2*hw+1 times
    instead of (2*hw+1)^3 times. This alone is ~10x over the naive
    one-offset-per-iteration loop.
    """
    nz, ny, nx = out_shape
    w_len = 2 * hw + 1

    dest0 = jnp.zeros((nz, ny, nx, 6), jnp.float32)
    den0 = jnp.zeros((nz, ny, nx), jnp.float32)
    # per-offset scalars indexed [tz][ty][tx] (may be traced)
    w_tz = jnp.reshape(jnp.asarray(w_table), (w_len, w_len, w_len))
    rh_tz = jnp.reshape(jnp.asarray(rhat_table), (w_len, w_len, w_len, 3))

    def body(tz, carry):
        dest, den = carry
        z0 = 2 * hw - tz  # = hw - jz
        sal_sl = jax.lax.dynamic_slice(
            sal_pad, (z0, 0, 0), (nz, ny + 2 * hw, nx + 2 * hw))
        m_sl = jax.lax.dynamic_slice(
            m_pad, (z0, 0, 0), (nz, ny + 2 * hw, nx + 2 * hw))
        n_sl = jax.lax.dynamic_slice(
            n_pad, (z0, 0, 0, 0), (nz, ny + 2 * hw, nx + 2 * hw, 3))

        acc = [jnp.zeros((nz, ny, nx), jnp.float32) for _ in range(7)]
        for ty in range(w_len):
            for tx in range(w_len):
                y0 = 2 * hw - ty
                x0 = 2 * hw - tx
                sl = (slice(None), slice(y0, y0 + ny), slice(x0, x0 + nx))
                sal = sal_sl[sl]
                m = m_sl[sl]
                n = n_sl[sl + (slice(None),)]
                w = w_tz[tz, ty, tx]
                rh = rh_tz[tz, ty, tx]

                filter_val = w * m
                active = (sal != 0.0) & (filter_val != 0.0)
                weight = jnp.where(active, sal * filter_val, 0.0)

                sin_t = (n[..., 0] * rh[0] + n[..., 1] * rh[1]
                         + n[..., 2] * rh[2])
                sin2 = sin_t * sin_t
                cos2 = 1.0 - sin2
                ang2 = sin2 if detect_curves else cos2
                if exponent == 2:
                    decay_ang = ang2
                elif exponent == 4:
                    decay_ang = ang2 * ang2
                elif exponent % 2 == 0:
                    decay_ang = ang2 ** (exponent // 2)
                else:
                    decay_ang = jnp.abs(ang2) ** (0.5 * exponent)
                sinx2 = 2.0 * sin_t
                if detect_curves:
                    nr = n - sinx2[..., None] * rh
                else:
                    nr = sinx2[..., None] * rh - n

                amp = weight * decay_ang
                acc[0] += amp * nr[..., 0] * nr[..., 0]
                acc[1] += amp * nr[..., 1] * nr[..., 1]
                acc[2] += amp * nr[..., 2] * nr[..., 2]
                acc[3] += amp * nr[..., 0] * nr[..., 1]
                acc[4] += amp * nr[..., 1] * nr[..., 2]
                acc[5] += amp * nr[..., 0] * nr[..., 2]
                if want_denominator:
                    acc[6] += jnp.where(active, filter_val, 0.0)
        dest = dest + jnp.stack(acc[:6], axis=-1)
        if want_denominator:
            den = den + acc[6]
        return dest, den

    dest, den = jax.lax.fori_loop(0, w_len, body, (dest0, den0))
    return dest, den


@functools.partial(
    jax.jit,
    static_argnames=("exponent", "detect_curves", "hw", "want_denominator"))
def _tv_accumulate(
    saliency, nvec, mask_src, mask_dest,
    w_table, rhat_table, off_table,
    exponent: int, detect_curves: bool, hw: int,
    want_denominator: bool,
):
    pad = [(hw, hw)] * 3
    sal_pad = jnp.pad(saliency, pad)
    n_pad = jnp.pad(nvec, pad + [(0, 0)])
    if mask_src is not None:
        m_pad = jnp.pad(mask_src, pad)
    else:
        m_pad = jnp.pad(jnp.ones_like(saliency), pad)
    dest, den = tv_accumulate_padded(
        sal_pad, n_pad, m_pad, saliency.shape,
        w_table, rhat_table, off_table,
        exponent, detect_curves, hw, want_denominator)
    if mask_dest is not None:
        sel = (mask_dest != 0)[..., None]
        dest = jnp.where(sel, dest, 0.0)
        den = jnp.where(mask_dest != 0, den, 0.0)
    return dest, den


def tv_dense_stick(
    saliency: jax.Array,          # (Z, Y, X)
    nvec: jax.Array,              # (Z, Y, X, 3) unit stick directions (x,y,z)
    sigma: float,
    exponent: int = 4,
    mask_src: Optional[jax.Array] = None,
    mask_dest: Optional[jax.Array] = None,
    detect_curves: bool = False,
    truncate_ratio: float = 2.5,
    normalize: bool = True,
    diagonalize_dest: bool = False,
    use_pallas: Optional[bool] = None,
    sparse: Optional[bool] = None,
) -> jax.Array:
    """Run dense stick voting; returns (Z, Y, X, 6) vote tensors (or
    [eivals, shoemake] when diagonalize_dest).

    ``use_pallas=True`` routes the accumulation through the hand-tuned
    Pallas kernel (~8x faster per-iteration on real TPU; parity vs the
    XLA path is re-measured on hardware by tools/perf_report.py and
    recorded in PERF.md).  Default (None): consult the VISFD_TV_PALLAS
    env var if set ("1"/"0"), else Pallas IS the default on TPU for
    windows up to hw <= 8 (the kernel chunks the z-offsets so each
    pallas_call body stays within the Mosaic compiler's unroll budget;
    see ops/tv_pallas.py), XLA everywhere else (CPU tests, very large
    windows where the per-chunk output re-accumulation dominates).

    ``sparse`` (Pallas paths only): skip vote work for all-zero source
    rows -- the TPU counterpart of the reference's "-tv-best" skip
    branch (feature.hpp:1704-1709, "up to 64 times faster").  Bit-
    identical to the dense kernel; the CLI enables it automatically
    when a top-fraction saliency threshold zeroed most sources."""
    import os
    w, rhat, offs, hw = tv_tables(sigma, truncate_ratio)
    saliency = jnp.asarray(saliency, jnp.float32)
    nvec = jnp.asarray(nvec, jnp.float32)
    ms = None if mask_src is None else jnp.asarray(mask_src, jnp.float32)
    md = None if mask_dest is None else jnp.asarray(mask_dest, jnp.float32)
    want_den = bool(normalize and ms is not None)
    from visfd_tpu.ops.conv import _is_multidevice
    platform = jax.devices()[0].platform
    if use_pallas is None:
        env = os.environ.get("VISFD_TV_PALLAS")
        if env is not None:
            use_pallas = env == "1"
        else:
            use_pallas = hw <= 8 and platform == "tpu"
    grid_mesh = None
    if _is_multidevice(saliency):
        # a >1-device GSPMD array cannot feed a single-device Pallas
        # call directly; recover the (z, y) grid mesh and run the
        # kernel per-shard under shard_map with ICI halo exchange
        # (parallel.sharded.tv_accumulate_sharded_pallas).  Arrays
        # with any other sharding fall back to the XLA shift-sum path,
        # which partitions under GSPMD.
        grid_mesh = _grid_mesh_of(saliency)
        if grid_mesh is None:
            use_pallas = False
    fell_back = False
    if use_pallas:
        from visfd_tpu.ops.tv_pallas import tv_dense_stick_pallas
        try:
            if grid_mesh is not None:
                from visfd_tpu.parallel.sharded import (
                    tv_accumulate_sharded_pallas)
                dest, den = tv_accumulate_sharded_pallas(
                    saliency, nvec, ms, float(sigma), int(exponent),
                    bool(detect_curves), float(truncate_ratio),
                    want_den, grid_mesh,
                    interpret=platform != "tpu",
                    sparse=bool(sparse))
            else:
                dest, den = tv_dense_stick_pallas(
                    saliency, nvec, sigma, exponent=int(exponent),
                    mask_src=ms,
                    detect_curves=bool(detect_curves),
                    truncate_ratio=truncate_ratio,
                    want_denominator=want_den,
                    interpret=platform != "tpu",
                    sparse=bool(sparse))
        except Exception as exc:
            # safety net for unforeseen Mosaic/placement failures (the
            # known scoped-VMEM stack overflows are prevented by the
            # kernel's nxp-based estimate + z-chunking, see
            # ops/tv_pallas.py); degrade to the XLA shift-sum path
            # rather than erroring
            import sys as _sys
            print("tv_dense_stick: Pallas path failed "
                  f"({type(exc).__name__}); falling back to XLA",
                  file=_sys.stderr)
            use_pallas = False
            fell_back = True
        else:
            from visfd_tpu.utils import record_path
            record_path("tv",
                        ("pallas-sharded" if grid_mesh is not None
                         else "pallas") + ("-sparse" if sparse else ""))
            if md is not None:
                dest = jnp.where((md != 0)[..., None], dest, 0.0)
                if den is not None:
                    den = jnp.where(md != 0, den, 0.0)
    if not use_pallas:
        from visfd_tpu.utils import record_path
        record_path("tv", ("xla-fallback" if fell_back else "xla")
                    + ("-sparse" if sparse else ""))
        dest, den = _tv_accumulate(
            saliency, nvec, ms, md,
            jnp.asarray(w), jnp.asarray(rhat), jnp.asarray(offs),
            int(exponent), bool(detect_curves), hw, want_den)

    if normalize:
        if ms is not None:
            ok = den > 0
            dest = jnp.where(ok[..., None],
                             dest / jnp.where(ok, den, 1.0)[..., None], dest)
        else:
            # no-mask shortcut: separable product of the 1-D *discrete*
            # Gaussian convolved with all-ones (feature.hpp:1833-1864).
            # The reference divides through a full 3x3 loop, so the 3
            # off-diagonal channels are divided twice -- replicated.
            k1 = jnp.asarray(K.gauss_kernel_1d(sigma, hw))
            dz = _ones_denom_1d(k1, saliency.shape[0])[:, None, None]
            dy = _ones_denom_1d(k1, saliency.shape[1])[None, :, None]
            dx = _ones_denom_1d(k1, saliency.shape[2])[None, None, :]
            den_box = dz * dy * dx
            scale = jnp.stack([den_box, den_box, den_box,
                               den_box * den_box, den_box * den_box,
                               den_box * den_box], axis=-1)
            dest = dest / scale
            if md is not None:
                dest = jnp.where((md != 0)[..., None], dest, 0.0)

    if diagonalize_dest:
        diag = sym3.diagonalize_flat_sym3(dest,
                                          order=sym3.EigenOrder.DECREASING)
        if md is not None:
            diag = diag * (md != 0)[..., None]
        dest = diag
    return dest
