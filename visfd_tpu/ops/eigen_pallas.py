"""Fused Pallas TPU kernels for the voxelwise symmetric-3x3 eigen
stages of the membrane/curve pipeline.

The XLA formulation of these stages (``features/hessian.py`` +
``linalg/sym3.py``) materializes a 6-channel Hessian field that the
eigensolver immediately re-reads, and the channel-last (Z, Y, X, 6)
layout puts the tensor channels in the TPU lane dimension -- measured
at 4-6% of HBM speed-of-light (PERF.md).  These kernels fuse the whole
chain and keep every intermediate in VMEM:

* ``hessian_principal_pallas``: blurred volume -> FD Hessian ->
  closed-form principal eigensolver -> saliency score (+ principal
  eigenvector), one read of the volume + one write per output channel.
  Replaces ``hessian_fd`` + ``principal_sym3`` + ``score_hessian_*``
  (reference stages ``feature.hpp:1203-1348`` Hessian,
  ``eigen3_simple.hpp:139-266`` solver, ``feature.hpp:1526-1589``
  scores; FD stencils + edge clamping from
  ``visfd_utils.hpp:528-610``).
* ``sym3_score_pallas``: 6-channel symmetric tensor field (channel-
  MAJOR (6, Z, Y, X), the native layout of the Pallas voting kernel's
  accumulator) -> eigenvalue score (+ principal eigenvector).
  Replaces ``diagonalize_flat_sym3``/``principal_sym3`` +
  ``score_tensor_*`` on the vote tensor.

The eigensolver math is the same branch-free closed form as
``linalg/sym3.py`` (trigonometric characteristic roots + cross-product
kernel extraction), re-expressed over 2-D vector registers with every
3-vector unrolled into scalar components -- no stacking, no lane-dim
channels.  Eigenvector SIGN may differ from the XLA path at exact
floating-point ties in the branch selects; every consumer (stick
voting, |dot| thresholds) is sign-invariant.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
_STACK_BUDGET_BYTES = 60 * 1024 * 1024
# Mosaic's stack allocator does not fully reuse slots across the
# solver's ~100 unrolled elementwise temporaries (same behavior as the
# TV kernel, see ops/tv_pallas.py); conservative envelope in units of
# (rows * nxa * 4) bytes.
_SOLVER_STACK_SLOTS = 144

_TINY = float(np.finfo(np.float32).tiny)
_SQRT3 = float(np.sqrt(3.0))

_FORMULAS = ("planar", "linear", "stick", "vals")

# VPU work per voxel of the unrolled solver, counted from
# _solve_sym3_planes / _score_channels (round-5 roofline accounting,
# VERDICT r4 #3).  Plain elementwise ops (mul/add/sub/max/select/cmp)
# count 1; div and sqrt count 4 (multi-pass on the VPU); the
# transcendentals are Mosaic polynomial expansions: the in-kernel
# atan2 is ~22 ops (3-range _atan_poly + selects + 2 div), cos/sin
# ~15 each.  Tallies:
#   shift/scale/normalize      ~17 + 6 div            =  41
#   char. poly c0/c1/c2        ~26                    =  26
#   roots (q, rho, theta, cos,
#   sin, r0..r2)               ~24 + atan2 + cos/sin  =  76
#   principal eigenvector      ~58 + rsqrt            =  66
#   score + rescale            ~12                    =  12
SOLVER_FLOPS_PER_VOX = 221          # eigensolve + score, with vector
SOLVER_FLOPS_NO_V = 155             # without the eigenvector block
HESSIAN_STENCIL_FLOPS = 30          # 6 FD stencils + sigma^2 scaling


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _n_score_channels(formula: str) -> int:
    if formula not in _FORMULAS:
        raise ValueError(f"formula must be one of {_FORMULAS}")
    return 3 if formula == "vals" else 1


def _atan_poly(t):
    """Cephes-style float32 atan core, |t| <= tan(pi/8): t + t*z*p(z)."""
    z = t * t
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z - 3.33329491539e-1
    return t + t * z * p


def _atan2_nonneg(y, x):
    """atan2(y, x) for y >= 0 (result in [0, pi]) from primitives the
    Mosaic TPU lowering supports (it has no atan/atan2): range-reduced
    polynomial atan.  Max abs error ~1e-7 vs the libm atan2 the XLA
    path uses -- well inside the f32 tolerance of every consumer."""
    both_zero = (y == 0.0) & (x == 0.0)
    xs = jnp.where(both_zero, 1.0, x)
    u = y / jnp.abs(xs)             # +inf when x == 0, y > 0
    # three reduction ranges: [0, tan(pi/8)], (tan(pi/8), tan(3pi/8)],
    # (tan(3pi/8), inf] -- compute all, select (branch-free VPU code)
    t_hi = 1.0 / jnp.maximum(u, _TINY)
    a_hi = 0.5 * np.pi - _atan_poly(t_hi)
    t_mid = (u - 1.0) / (u + 1.0)
    a_mid = 0.25 * np.pi + _atan_poly(t_mid)
    a_lo = _atan_poly(jnp.minimum(u, 1.0))
    a = jnp.where(u > 2.4142135623730950, a_hi,
                  jnp.where(u > 0.4142135623730951, a_mid, a_lo))
    return jnp.where(xs >= 0.0, a, np.pi - a)


def _solve_sym3_planes(m00, m11, m22, m01, m12, m02,
                       decreasing: bool, want_v: bool):
    """Branch-free eigensolve of a per-lane symmetric 3x3 field given
    as six 2-D planes.  Returns ((e0, e1, e2) in requested order,
    (vx, vy, vz) principal eigenvector or None).  Identical math to
    ``sym3.principal_sym3`` (``eigen3_simple.hpp:47-137``), unrolled
    componentwise so every op is a plain VPU elementwise op."""
    inv3 = 1.0 / 3.0
    shift = (m00 + m11 + m22) * inv3
    a00 = m00 - shift
    a11 = m11 - shift
    a22 = m22 - shift
    scale = jnp.maximum(jnp.abs(a00), jnp.abs(a11))
    scale = jnp.maximum(scale, jnp.abs(a22))
    scale = jnp.maximum(scale, jnp.abs(m01))
    scale = jnp.maximum(scale, jnp.abs(m12))
    scale = jnp.maximum(scale, jnp.abs(m02))
    safe = jnp.where(scale > 0, scale, 1.0)
    a00 = a00 / safe
    a11 = a11 / safe
    a22 = a22 / safe
    a01 = m01 / safe
    a12 = m12 / safe
    a02 = m02 / safe

    # trigonometric characteristic roots, sorted increasing
    c0 = (a00 * a11 * a22 + 2.0 * a01 * a02 * a12
          - a00 * a12 * a12 - a11 * a02 * a02 - a22 * a01 * a01)
    c1 = (a00 * a11 - a01 * a01 + a00 * a22 - a02 * a02
          + a11 * a22 - a12 * a12)
    c2 = a00 + a11 + a22
    c2_over_3 = c2 * inv3
    a_over_3 = jnp.maximum((c2 * c2_over_3 - c1) * inv3, 0.0)
    half_b = 0.5 * (c0 + c2_over_3 * (2.0 * c2_over_3 * c2_over_3 - c1))
    q = jnp.maximum(a_over_3 ** 3 - half_b * half_b, 0.0)
    rho = jnp.sqrt(a_over_3)
    theta = _atan2_nonneg(jnp.sqrt(q), half_b) * inv3
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    r0 = c2_over_3 - rho * (cos_t + _SQRT3 * sin_t)
    r1 = c2_over_3 - rho * (cos_t - _SQRT3 * sin_t)
    r2 = c2_over_3 + 2.0 * rho * cos_t

    v = None
    if want_v:
        lam_p = r2 if decreasing else r0
        t00 = a00 - lam_p
        t11 = a11 - lam_p
        t22 = a22 - lam_p
        # argmax over |diag| (first max wins ties, like jnp.argmax)
        d0 = jnp.abs(t00)
        d1 = jnp.abs(t11)
        d2 = jnp.abs(t22)
        is0 = (d0 >= d1) & (d0 >= d2)
        is1 = jnp.logical_not(is0) & (d1 >= d2)

        def sel(v_if0, v_if1, v_if2):
            return jnp.where(is0, v_if0, jnp.where(is1, v_if1, v_if2))

        # columns of T: C0 = (t00, a01, a02), C1 = (a01, t11, a12),
        # C2 = (a02, a12, t22); rep = column i0, b = column i0+1,
        # c = column i0+2 (mod 3)
        rep_x = sel(t00, a01, a02)
        rep_y = sel(a01, t11, a12)
        rep_z = sel(a02, a12, t22)
        b_x = sel(a01, a02, t00)
        b_y = sel(t11, a12, a01)
        b_z = sel(a12, t22, a02)
        cc_x = sel(a02, t00, a01)
        cc_y = sel(a12, a01, t11)
        cc_z = sel(t22, a02, a12)

        c0x = rep_y * b_z - rep_z * b_y
        c0y = rep_z * b_x - rep_x * b_z
        c0z = rep_x * b_y - rep_y * b_x
        c1x = rep_y * cc_z - rep_z * cc_y
        c1y = rep_z * cc_x - rep_x * cc_z
        c1z = rep_x * cc_y - rep_y * cc_x
        n0 = c0x * c0x + c0y * c0y + c0z * c0z
        n1 = c1x * c1x + c1y * c1y + c1z * c1z
        use0 = n0 > n1
        cx = jnp.where(use0, c0x, c1x)
        cy = jnp.where(use0, c0y, c1y)
        cz = jnp.where(use0, c0z, c1z)
        nn = jnp.where(use0, n0, n1)
        inv_n = 1.0 / jnp.sqrt(jnp.maximum(nn, _TINY))
        v = (cx * inv_n, cy * inv_n, cz * inv_n)

    l0 = r0 * safe + shift
    l1 = r1 * safe + shift
    l2 = r2 * safe + shift
    vals = (l2, l1, l0) if decreasing else (l0, l1, l2)
    return vals, v


def _score_channels(vals, formula: str):
    e0, e1, e2 = vals
    if formula == "planar":
        n = e0 * e0 - e1 * e1
        return [n * n]
    if formula == "linear":
        return [e0 * e1 - e2 * e2]
    if formula == "stick":
        return [e0 - e1]
    return [e0, e1, e2]  # "vals"


# ---------------------------------------------------------------------------
# Kernel A: blurred volume -> FD Hessian -> principal eigen -> score (+v)
# ---------------------------------------------------------------------------

def _hess_eig_kernel(nz, ny, nx, by, nxa, s2, decreasing, formula,
                     want_v, clamp, in_hbm, out_ref, slab, sem):
    i = pl.program_id(0)            # receiver z plane
    j = pl.program_id(1)            # y block
    by2 = (by + 2) if clamp else by
    slab_ny = slab.shape[1]
    if clamp:
        # FD stencils are evaluated at the nearest interior voxel and
        # replicated onto the faces (visfd_utils.hpp:592-610): the z
        # face planes reuse the z=1 / z=nz-2 stencil via a clamped
        # slab start
        z_start = jnp.clip(i, 1, nz - 2) - 1
    else:
        # prepadded mode (mesh shards): the caller filled 1-deep halos
        # (real neighbor data via ICI exchange) and re-fixes the
        # global faces itself, so no clamping happens here
        z_start = i
    cp = pltpu.make_async_copy(
        in_hbm.at[pl.ds(z_start, 3), pl.ds(j * by, slab_ny)], slab, sem)
    cp.start()
    cp.wait()

    def S(z, dy, dx):
        # stencil-row t reads slab row t+1+dy (clamped mode covers
        # rows j*by-1 .. j*by+by for the y edge-select; prepadded mode
        # covers exactly the block's rows)
        return slab[z, 1 + dy:1 + dy + by2, 1 + dx:1 + dx + nxa]

    ctr = S(1, 0, 0)
    hxx = (S(1, 0, 1) + S(1, 0, -1) - 2.0 * ctr) * s2
    hyy = (S(1, 1, 0) + S(1, -1, 0) - 2.0 * ctr) * s2
    hzz = (S(2, 0, 0) + S(0, 0, 0) - 2.0 * ctr) * s2
    hxy = 0.25 * s2 * (S(1, 1, 1) + S(1, -1, -1)
                       - S(1, -1, 1) - S(1, 1, -1))
    hyz = 0.25 * s2 * (S(2, 1, 0) + S(0, -1, 0)
                       - S(0, 1, 0) - S(2, -1, 0))
    hxz = 0.25 * s2 * (S(2, 0, 1) + S(0, 0, -1)
                       - S(2, 0, -1) - S(0, 0, 1))

    vals, v = _solve_sym3_planes(hxx, hyy, hzz, hxy, hyz, hxz,
                                 decreasing, want_v)
    chans = _score_channels(vals, formula)
    if want_v:
        chans = chans + list(v)

    if not clamp:
        for ch, f in enumerate(chans):
            out_ref[ch, 0] = f
        return

    # x/y edge clamping of the OUTPUT (the whole stencil+solve result
    # is replicated from the nearest interior voxel, matching
    # _edge_clamp): x via static shifted copies within the lane dim,
    # y by selecting the +-1 row from the (by+2)-row compute block
    colid = jax.lax.broadcasted_iota(jnp.int32, (by2, nxa), 1)
    rowg = (jax.lax.broadcasted_iota(jnp.int32, (by, nxa), 0)
            + j * by)
    for ch, f in enumerate(chans):
        fl = jnp.concatenate([f[:, 1:], f[:, :1]], axis=1)   # f[c+1]
        fr = jnp.concatenate([f[:, -1:], f[:, :-1]], axis=1)  # f[c-1]
        f = jnp.where(colid == 0, fl,
                      jnp.where(colid == nx - 1, fr, f))
        out = jnp.where(rowg == 0, f[2:2 + by],
                        jnp.where(rowg == ny - 1, f[0:by],
                                  f[1:1 + by]))
        out_ref[ch, 0] = out


def _pick_by(ny: int, nxa: int) -> int:
    by = min(64, _round_up(ny, 8))
    while (by > 8 and
           _SOLVER_STACK_SLOTS * (by + 2) * nxa * 4
           > _STACK_BUDGET_BYTES):
        # keep the block a multiple of the 8-row f32 sublane tile
        # (plain halving of e.g. 24 would yield 12 and misalign the
        # out BlockSpec)
        by = max(8, _round_up(by // 2, 8))
    return by


@functools.partial(
    jax.jit,
    static_argnames=("s2", "decreasing", "formula", "want_v", "clamp",
                     "interpret"))
def _hessian_principal_impl(blur, s2, decreasing, formula, want_v,
                            interpret, clamp=True):
    if clamp:
        nz, ny, nx = blur.shape
    else:
        nz, ny, nx = (d - 2 for d in blur.shape)
    nxa = _round_up(nx, 128)
    nxp = _round_up(nxa + 2, 128)
    by = _pick_by(ny, nxa)
    n_yblk = -(-ny // by)
    slab_ny = _round_up(by + (4 if clamp else 2), 8)
    ny_field = (n_yblk - 1) * by + slab_ny
    if clamp:
        # y pre-pad 2 (stencil halo 1 + clamp-select halo 1), x pad 1
        xp = jnp.pad(jnp.asarray(blur, jnp.float32),
                     [(0, 0), (2, ny_field - ny - 2),
                      (1, nxp - nx - 1)])
    else:
        # caller already halo-padded by 1 on every face
        xp = jnp.pad(jnp.asarray(blur, jnp.float32),
                     [(0, 0), (0, ny_field - ny - 2),
                      (0, nxp - nx - 2)])
    n_out = _n_score_channels(formula) + (3 if want_v else 0)
    kern = functools.partial(_hess_eig_kernel, nz, ny, nx, by, nxa,
                             s2, decreasing, formula, want_v, clamp)
    out = pl.pallas_call(
        kern,
        grid=(nz, n_yblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((n_out, 1, by, nxa),
                               lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, nz, n_yblk * by, nxa),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, slab_ny, nxp), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(xp)
    return out[:, :, :ny, :nx]


def hessian_principal_pallas_prepadded(
    blur_pad: jax.Array,            # (Z+2, Y+2, X+2), halos filled
    sigma: float,
    decreasing: bool = True,
    formula: str = "planar",
    want_v: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Per-shard entry for mesh pipelines: the caller halo-exchanged
    1-deep neighbor planes into ``blur_pad`` and is responsible for
    re-clamping the GLOBAL volume faces afterwards (``clamp_faces``
    on the assembled result).  Returns the raw channel-stacked
    (n_out, Z, Y, X) block."""
    return _hessian_principal_impl(
        blur_pad, float(sigma) * float(sigma), bool(decreasing),
        str(formula), bool(want_v), bool(interpret), clamp=False)


def clamp_faces(arr: jax.Array) -> jax.Array:
    """Replicate the nearest-interior value onto the global faces of
    the trailing (Z, Y, X) axes -- the XLA-side equivalent of the
    in-kernel edge clamp (x first, then y, then z, so corners compose
    to the fully-clamped stencil: identical floats to the
    single-device kernel)."""
    arr = arr.at[..., 0].set(arr[..., 1])
    arr = arr.at[..., -1].set(arr[..., -2])
    arr = arr.at[..., 0, :].set(arr[..., 1, :])
    arr = arr.at[..., -1, :].set(arr[..., -2, :])
    arr = arr.at[..., 0, :, :].set(arr[..., 1, :, :])
    arr = arr.at[..., -1, :, :].set(arr[..., -2, :, :])
    return arr


def hessian_principal_pallas(
    blur: jax.Array,                # (Z, Y, X) blurred volume
    sigma: float,
    decreasing: bool = True,
    formula: str = "planar",
    want_v: bool = True,
    interpret: bool = False,
):
    """Fused FD-Hessian (x sigma^2 Lindeberg scaling) + principal
    eigensolve + saliency score over a blurred volume.

    Returns (score, v): score is (Z, Y, X) for formula in
    {"planar", "linear", "stick"} or (3, Z, Y, X) eigenvalues for
    "vals"; v is the (3, Z, Y, X) principal eigenvector field
    (channel-major) or None.  Parity target: ``hessian_fd(blur) *
    sigma^2`` -> ``principal_sym3`` -> ``score_hessian_*``.
    """
    nz, ny, nx = blur.shape
    if min(nz, ny, nx) < 3:
        raise ValueError("hessian_principal_pallas needs dims >= 3")
    out = _hessian_principal_impl(
        blur, float(sigma) * float(sigma), bool(decreasing),
        str(formula), bool(want_v), bool(interpret))
    n_s = _n_score_channels(formula)
    score = out[0] if n_s == 1 else out[:n_s]
    v = out[n_s:n_s + 3] if want_v else None
    return score, v


# ---------------------------------------------------------------------------
# Kernel C: channel-major symmetric tensor field -> eigen score (+v)
# ---------------------------------------------------------------------------

def _sym3_kernel(decreasing, formula, want_v, in_ref, out_ref):
    h = [in_ref[c, 0] for c in range(6)]
    # flat layout [xx, yy, zz, xy, yz, xz] (lin3_utils.hpp:400-404)
    vals, v = _solve_sym3_planes(h[0], h[1], h[2], h[3], h[4], h[5],
                                 decreasing, want_v)
    chans = _score_channels(vals, formula)
    if want_v:
        chans = chans + list(v)
    for ch, f in enumerate(chans):
        out_ref[ch, 0] = f


@functools.partial(
    jax.jit,
    static_argnames=("decreasing", "formula", "want_v", "interpret"))
def _sym3_score_impl(t6, decreasing, formula, want_v, interpret):
    _, nz, ny, nx = t6.shape
    nxa = _round_up(nx, 128)
    by = _pick_by(ny, nxa)
    n_yblk = -(-ny // by)
    n_out = _n_score_channels(formula) + (3 if want_v else 0)
    kern = functools.partial(_sym3_kernel, decreasing, formula, want_v)
    return pl.pallas_call(
        kern,
        grid=(nz, n_yblk),
        in_specs=[pl.BlockSpec((6, 1, by, nxa),
                               lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_out, 1, by, nxa),
                               lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, nz, ny, nx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(t6)


def sym3_score_pallas(
    t6: jax.Array,                  # (6, Z, Y, X) channel-major flat sym
    decreasing: bool = True,
    formula: str = "stick",
    want_v: bool = False,
    interpret: bool = False,
):
    """Voxelwise eigen score of a channel-major symmetric tensor field
    (e.g. the raw vote accumulator of the Pallas TV kernel).

    Returns (score, v) with the same conventions as
    ``hessian_principal_pallas``.  Parity target:
    ``diagonalize_sym3(flat_to_full(moveaxis(t6, 0, -1)),
    want_vects=False)`` -> ``score_tensor_*`` (and ``principal_sym3``
    for v)."""
    if t6.shape[0] != 6:
        raise ValueError("t6 must be channel-major (6, Z, Y, X)")
    out = _sym3_score_impl(jnp.asarray(t6, jnp.float32),
                           bool(decreasing), str(formula),
                           bool(want_v), bool(interpret))
    n_s = _n_score_channels(formula)
    score = out[0] if n_s == 1 else out[:n_s]
    v = out[n_s:n_s + 3] if want_v else None
    return score, v
