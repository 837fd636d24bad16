"""Sharded (multi-chip) voxel pipelines via shard_map + halo exchange.

The (Z, Y, X) grid is block-partitioned over a ("z", "y") mesh
(``visfd_tpu.parallel.mesh``); every stencil stage pulls its halo rows
from ring neighbors over ICI (``halo_pad``) and computes locally, so
the sharded results match the single-chip zero-padded stencils
exactly.  This is the TPU-native replacement for the reference's
OpenMP loop parallelism (SURVEY 2.5) and its only large-tomogram
strategy (binning): the volume itself scales across chips.

``make_membrane_step`` builds the flagship end-to-end step:
Gaussian blur -> FD gradient/Hessian -> voxelwise eigen ->
planar saliency -> threshold -> dense stick tensor voting ->
vote-tensor eigen -> stick saliency.  It jit-compiles over the mesh
with real (z, y) block shardings.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visfd_tpu.ops import kernels as K
from visfd_tpu.ops.conv import _conv1d_axis_impl
from visfd_tpu.features import tv as TV
from visfd_tpu.linalg import sym3
from visfd_tpu.parallel.halo import halo_pad, halo_pad_2d


def _local_conv_sliced(xp: jax.Array, kernel, axis: int, halo: int):
    """Convolve a halo-padded block along ``axis`` and slice out the
    valid interior."""
    out = _conv1d_axis_impl(xp, kernel, axis)
    if halo == 0:
        return out
    sl = [slice(None)] * xp.ndim
    sl[axis] = slice(halo, xp.shape[axis] - halo)
    return out[tuple(sl)]


def _sharded_gauss(x, kx, ky, kz, hw, z_name="z", y_name="y"):
    """Separable blur of a local block with halo exchange; the no-mask
    edge normalization (filter3d.hpp:1006-1040) divides by the same
    rank-1 (dz*dy)*dx 1-D denominators as the single-device path
    (``_separable_conv3d_nomask``), computed over the GLOBAL axis
    lengths and sliced to this block -- bit-identical to the
    single-device result and one full blur cheaper than the round-4
    blur-of-ones formulation."""
    from visfd_tpu.ops.conv import _ones_denom_1d

    def blur(v):
        vz = halo_pad(v, hw, 0, z_name)
        vz = _local_conv_sliced(vz, kz, 0, hw)
        vy = halo_pad(vz, hw, 1, y_name)
        vy = _local_conv_sliced(vy, ky, 1, hw)
        return _conv1d_axis_impl(vy, kx, 2)

    num = blur(x)
    bz, by_, nxl = x.shape
    dz_full = _ones_denom_1d(kz, bz * jax.lax.axis_size(z_name))
    dy_full = _ones_denom_1d(ky, by_ * jax.lax.axis_size(y_name))
    dx = _ones_denom_1d(kx, nxl)
    dz = jax.lax.dynamic_slice(
        dz_full, (jax.lax.axis_index(z_name) * bz,), (bz,))
    dy = jax.lax.dynamic_slice(
        dy_full, (jax.lax.axis_index(y_name) * by_,), (by_,))
    return num / (dz[:, None, None] * dy[None, :, None]
                  * dx[None, None, :])


def _sharded_stencil_edge_fix(res, axis, axis_name):
    """Replicate the stencil result of the nearest interior voxel onto
    the global boundary faces of a sharded axis (the reference's
    coordinate clamping, visfd_utils.hpp:592-610)."""
    idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    first = jnp.take(res, jnp.asarray(1), axis=axis)
    last = jnp.take(res, jnp.asarray(res.shape[axis] - 2), axis=axis)
    res = res.at[(slice(None),) * axis + (0,)].set(
        jnp.where(idx == 0, first,
                  jnp.take(res, jnp.asarray(0), axis=axis)))
    res = res.at[(slice(None),) * axis + (res.shape[axis] - 1,)].set(
        jnp.where(idx == n_shards - 1, last,
                  jnp.take(res, jnp.asarray(res.shape[axis] - 1),
                           axis=axis)))
    return res


def _local_gradient_hessian(blur_block, z_name="z", y_name="y"):
    """FD gradient + flat-6 Hessian of a sharded block: halo 1 along
    z/y, local along x, with global edge clamping on all axes."""
    p = halo_pad_2d(blur_block, 1, 1, z_name, y_name)
    p = jnp.pad(p, ((0, 0), (0, 0), (1, 1)))  # x zero pad (clamped later)

    def sh(dz, dy, dx):
        nz, ny, nx = blur_block.shape
        return jax.lax.dynamic_slice(p, (1 + dz, 1 + dy, 1 + dx),
                                     (nz, ny, nx))

    c = blur_block
    gx = 0.5 * (sh(0, 0, 1) - sh(0, 0, -1))
    gy = 0.5 * (sh(0, 1, 0) - sh(0, -1, 0))
    gz = 0.5 * (sh(1, 0, 0) - sh(-1, 0, 0))
    hxx = sh(0, 0, 1) + sh(0, 0, -1) - 2 * c
    hyy = sh(0, 1, 0) + sh(0, -1, 0) - 2 * c
    hzz = sh(1, 0, 0) + sh(-1, 0, 0) - 2 * c
    hxy = 0.25 * (sh(0, 1, 1) + sh(0, -1, -1) - sh(0, -1, 1) - sh(0, 1, -1))
    hyz = 0.25 * (sh(1, 1, 0) + sh(-1, -1, 0) - sh(-1, 1, 0) - sh(1, -1, 0))
    hxz = 0.25 * (sh(1, 0, 1) + sh(-1, 0, -1) - sh(1, 0, -1) - sh(-1, 0, 1))
    grad = jnp.stack([gx, gy, gz], axis=-1)
    hess = jnp.stack([hxx, hyy, hzz, hxy, hyz, hxz], axis=-1)

    # x-axis edge clamp is local; z/y clamps are shard-aware
    def clamp_x(a):
        a = a.at[:, :, 0].set(a[:, :, 1])
        return a.at[:, :, -1].set(a[:, :, -2])

    grad = clamp_x(grad)
    hess = clamp_x(hess)
    grad = _sharded_stencil_edge_fix(grad, 0, z_name)
    hess = _sharded_stencil_edge_fix(hess, 0, z_name)
    grad = _sharded_stencil_edge_fix(grad, 1, y_name)
    hess = _sharded_stencil_edge_fix(hess, 1, y_name)
    return grad, hess


def _sharded_tv(sal, nvec, tv_hw, w_t, rhat_t, off_t, exponent,
                z_name="z", y_name="y", use_pallas=False,
                interpret=False, tv_sigma=None,
                tv_truncate_ratio=None, sparse=False):
    """Dense stick voting on a sharded block: halo-exchange the
    (saliency, direction) fields by the vote radius, then run either
    the hand-tuned Pallas row-streaming kernel (``use_pallas``, ~8-15x
    the XLA loop per chip on real TPU -- the reference's OpenMP hot
    loop, feature.hpp:1993-2036, runs all cores at full speed and so
    must the mesh) or the XLA shift-sum loop on the local block."""
    sal_pad = halo_pad_2d(sal, tv_hw, tv_hw, z_name, y_name)
    sal_pad = jnp.pad(sal_pad, ((0, 0), (0, 0), (tv_hw, tv_hw)))
    n_pad = halo_pad_2d(nvec, tv_hw, tv_hw, z_name, y_name)
    n_pad = jnp.pad(n_pad, ((0, 0), (0, 0), (tv_hw, tv_hw), (0, 0)))
    if use_pallas:
        from visfd_tpu.ops.tv_pallas import tv_dense_stick_pallas_prepadded
        dest, _ = tv_dense_stick_pallas_prepadded(
            sal_pad, n_pad, tv_sigma, sal.shape, exponent=exponent,
            truncate_ratio=tv_truncate_ratio, interpret=interpret,
            sparse=sparse)
        return dest
    m_pad = jnp.pad(
        halo_pad_2d(jnp.ones_like(sal), tv_hw, tv_hw, z_name, y_name),
        ((0, 0), (0, 0), (tv_hw, tv_hw)))
    # NOTE: m_pad (the in-bounds indicator) came from halo_pad of ones,
    # which zero-fills outside the global volume -- exactly the
    # reference's out-of-bounds skip.
    dest, _ = TV.tv_accumulate_padded(
        sal_pad, n_pad, m_pad, sal.shape,
        w_t, rhat_t, off_t, exponent, False, tv_hw, False)
    return dest


def tv_accumulate_sharded_pallas(
    saliency: jax.Array,          # GSPMD-sharded (Z, Y, X) over mesh
    nvec: jax.Array,              # (Z, Y, X, 3) or channel-major (3, ...)
    mask_src: Optional[jax.Array],
    sigma: float,
    exponent: int,
    detect_curves: bool,
    truncate_ratio: float,
    want_denominator: bool,
    mesh: Mesh,
    interpret: bool = False,
    sparse: bool = False,
    channel_major: bool = False,
    nvec_channel_major=None,
):
    """Raw (unnormalized) vote accumulation of a mesh-sharded volume
    through the per-shard Pallas kernel: halo-exchange saliency /
    direction / mask by the vote radius over ICI, vote locally.  Each
    voxel's tap loop is identical to the single-device kernel, so the
    result is bit-identical to the single-device Pallas output
    (asserted in tests/test_parallel.py).  Returns (dest, den|None)
    with the input sharding."""
    z_name, y_name = mesh.axis_names
    hw = int(np.floor(sigma * truncate_ratio))
    has_mask = mask_src is not None
    xpad3 = ((0, 0), (0, 0), (hw, hw))
    if nvec_channel_major is None:
        cm_ok = (nvec.ndim == 4 and nvec.shape[0] == 3
                 and nvec.shape[1:] == saliency.shape)
        cl_ok = (nvec.ndim == 4 and nvec.shape[-1] == 3
                 and nvec.shape[:-1] == saliency.shape)
        if cm_ok and cl_ok:
            raise ValueError("nvec layout is ambiguous for this shape;"
                             " pass nvec_channel_major explicitly")
        nv_cm = cm_ok
    else:
        nv_cm = bool(nvec_channel_major)

    def local(sal, nv, m):
        sal_pad = jnp.pad(halo_pad_2d(sal, hw, hw, z_name, y_name), xpad3)
        if nv_cm:
            n_pad = halo_pad(halo_pad(nv, hw, 1, z_name), hw, 2, y_name)
            n_pad = jnp.pad(n_pad, ((0, 0),) + xpad3)
        else:
            n_pad = jnp.pad(halo_pad_2d(nv, hw, hw, z_name, y_name),
                            xpad3 + ((0, 0),))
        m_pad = (jnp.pad(halo_pad_2d(m, hw, hw, z_name, y_name), xpad3)
                 if has_mask else None)
        from visfd_tpu.ops.tv_pallas import tv_dense_stick_pallas_prepadded
        dest, den = tv_dense_stick_pallas_prepadded(
            sal_pad, n_pad, sigma, sal.shape, exponent=exponent,
            mask_pad=m_pad, detect_curves=detect_curves,
            truncate_ratio=truncate_ratio,
            want_denominator=want_denominator, interpret=interpret,
            sparse=sparse, channel_major=channel_major,
            nvec_channel_major=nv_cm)
        if den is None:
            den = jnp.zeros_like(sal)
        return dest, den

    spec = P(z_name, y_name)
    nv_spec = (P(None, z_name, y_name) if nv_cm
               else P(z_name, y_name, None))
    dest_spec = (P(None, z_name, y_name) if channel_major
                 else P(z_name, y_name, None, None))
    dest, den = shard_map(
        local, mesh=mesh,
        in_specs=(spec, nv_spec, spec),
        out_specs=(dest_spec, spec),
        check_vma=False,
    )(saliency, nvec,
      # the dummy (mask-less) operand just needs the grid sharding
      mask_src if has_mask else saliency)
    return dest, (den if want_denominator else None)


def hessian_principal_sharded(
    blur: jax.Array,              # GSPMD-sharded (Z, Y, X) over mesh
    mesh: Mesh,
    sigma: float,
    decreasing: bool = True,
    formula: str = "planar",
    want_v: bool = True,
    interpret: bool = False,
):
    """Per-shard fused FD-Hessian + principal eigensolve + score
    (``ops.eigen_pallas``) over a mesh-sharded blurred volume:
    1-deep halo exchange over ICI, the fused kernel on each local
    block, then the global-face clamp applied on the assembled result
    -- bit-identical to the single-device fused kernel (asserted in
    tests/test_parallel.py).  Returns (score, v_channel_major|None)
    with (z, y) grid sharding."""
    from visfd_tpu.ops.eigen_pallas import (
        _n_score_channels, clamp_faces,
        hessian_principal_pallas_prepadded)
    z_name, y_name = mesh.axis_names

    def local(b):
        bp = jnp.pad(halo_pad_2d(b, 1, 1, z_name, y_name),
                     ((0, 0), (0, 0), (1, 1)))
        return hessian_principal_pallas_prepadded(
            bp, sigma, decreasing=decreasing, formula=formula,
            want_v=want_v, interpret=interpret)

    spec = P(z_name, y_name)
    out = shard_map(local, mesh=mesh, in_specs=spec,
                    out_specs=P(None, z_name, y_name),
                    check_vma=False)(blur)
    out = clamp_faces(out)
    n_s = _n_score_channels(formula)
    score = out[0] if n_s == 1 else out[:n_s]
    v = out[n_s:n_s + 3] if want_v else None
    return score, v


def sym3_score_sharded(
    t6: jax.Array,                # (6, Z, Y, X) channel-major, sharded
    mesh: Mesh,
    decreasing: bool = True,
    formula: str = "stick",
    want_v: bool = False,
    interpret: bool = False,
):
    """Per-shard fused eigen score of a mesh-sharded channel-major
    tensor field (no halos needed -- purely voxelwise)."""
    from visfd_tpu.ops.eigen_pallas import (_n_score_channels,
                                            _sym3_score_impl)
    if t6.shape[0] != 6:
        raise ValueError("t6 must be channel-major (6, Z, Y, X)")
    t6 = jnp.asarray(t6, jnp.float32)
    z_name, y_name = mesh.axis_names

    def local(t):
        return _sym3_score_impl(t, decreasing, formula, want_v,
                                interpret)

    out = shard_map(local, mesh=mesh, in_specs=P(None, z_name, y_name),
                    out_specs=P(None, z_name, y_name),
                    check_vma=False)(t6)
    n_s = _n_score_channels(formula)
    score = out[0] if n_s == 1 else out[:n_s]
    v = out[n_s:n_s + 3] if want_v else None
    return score, v


def make_membrane_step(
    mesh: Mesh,
    sigma: float = 2.0,
    tv_sigma: float = 2.0,
    tv_exponent: int = 4,
    saliency_threshold: float = 0.0,
    truncate_ratio: float = 2.5,
    tv_truncate_ratio: float = float(np.sqrt(2.0)),
    tv_use_pallas: Optional[bool] = None,
    tv_sparse: bool = False,
):
    """Build the jitted, mesh-sharded flagship membrane step.

    Returns (step_fn, in_sharding). step_fn: (Z, Y, X) float32 ->
    (stick_saliency (Z, Y, X), vote_tensor (Z, Y, X, 6)).

    ``tv_use_pallas``: run the dominant TV stage through the per-shard
    Pallas kernel (None = yes on TPU devices, no elsewhere; on non-TPU
    a forced True runs the interpreter -- correct but slow, for tests).
    ``tv_sparse``: occupancy-gate the per-shard Pallas voting kernel
    (the -tv-best cost lever) -- bitwise-identical output, large
    speedup when ``saliency_threshold`` zeroes most sources; composes
    with the mesh exactly like the CLI's sparse+mesh path.
    """
    z_name, y_name = mesh.axis_names
    platform = mesh.devices.reshape(-1)[0].platform
    if tv_use_pallas is None:
        tv_use_pallas = platform == "tpu"
    tv_interpret = bool(tv_use_pallas) and platform != "tpu"
    hw = max(1, int(np.floor(sigma * truncate_ratio)))
    k1_np = K.gauss_kernel_1d(sigma, hw)
    w_np, rhat_np, off_np, tv_hw = TV.tv_tables(tv_sigma, tv_truncate_ratio)

    # tables enter as traced args (constant-embedding pessimizes XLA)
    def local_step(x, k1, w_t, rhat_t, off_t):
        blur = _sharded_gauss(x, k1, k1, k1, hw, z_name, y_name)
        grad, hess = _local_gradient_hessian(blur, z_name, y_name)
        grad = grad * sigma
        hess = hess * (sigma * sigma)
        eivals, direction = sym3.principal_sym3(
            sym3.flat_to_full(hess), order=sym3.EigenOrder.DECREASING)
        l1, l2 = eivals[..., 0], eivals[..., 1]
        nrm = l1 * l1 - l2 * l2
        saliency = nrm * nrm
        saliency = jnp.where(saliency < saliency_threshold, 0.0, saliency)
        vote = _sharded_tv(saliency, direction, tv_hw, w_t, rhat_t, off_t,
                           tv_exponent, z_name, y_name,
                           use_pallas=tv_use_pallas,
                           interpret=tv_interpret, tv_sigma=tv_sigma,
                           tv_truncate_ratio=tv_truncate_ratio,
                           sparse=tv_sparse)
        vvals, _ = sym3.diagonalize_sym3(
            sym3.flat_to_full(vote), order=sym3.EigenOrder.DECREASING,
            want_vects=False)
        stick = vvals[..., 0] - vvals[..., 1]
        return stick, vote

    spec = P(z_name, y_name)
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec, P(), P(), P(), P()),
        out_specs=(spec, P(z_name, y_name, None, None)),
        check_vma=False)
    jitted = jax.jit(sharded)
    tables = (jnp.asarray(k1_np), jnp.asarray(w_np),
              jnp.asarray(rhat_np), jnp.asarray(off_np))

    def step(x):
        return jitted(x, *tables)

    return step, NamedSharding(mesh, spec)
