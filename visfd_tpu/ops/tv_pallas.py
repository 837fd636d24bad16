"""Pallas TPU kernel for dense stick tensor voting.

One receiver z-row per grid step; the haloed source rows of each field
are DMA'd to VMEM once and the whole vote loop runs as straight-line
2-D vector code with STATIC offsets only -- no dynamic slices, no
rolls, no 3-D vector ops (each of those made the Mosaic/axon compiler
either explode or emit slow code; see git history for the graveyard).
Vote accumulators live in registers across the loop, so HBM traffic is
~(2*hw+1) passes over the volume and the kernel is bounded by VPU
shift+FMA throughput.

The radial weight exp(-(|j|/sigma)^2) (with the reference's corner
truncation, ``filter3d.hpp:556-586``) and the unit displacement
r_hat = j/|j| are baked in as python constants per offset.

Masked voting reuses the dense path with sal' = saliency * mask (the
vote weight factorizes; see feature.hpp:2262-2292) and accumulates the
normalization denominator as a 7th channel when requested.  Matches
``TV.tv_dense_stick(..., normalize=False)`` to f32 roundoff.

Two compile-size safeguards (round 3):

* the Mosaic stack allocator does not reuse slots across the unrolled
  tap bodies, so the kernel's scoped-VMEM stack grows with the tap
  count (~1.2x (by * nxa * 4) bytes per tap) and overflowed the
  default 16 MB window at hw >= 3 ("Ran out of memory in memory space
  vmem ... allocating on stack").  The per-kernel window is raised via
  ``vmem_limit_bytes`` and the y-block shrinks for wide volumes so the
  estimate stays inside a fixed budget;
* large windows are additionally split over several ``pallas_call``s,
  each handling a chunk of z-offsets (the per-call unrolled tap count
  stays below ``_MAX_TAPS_PER_CALL``; hw=5's 1331-tap single-call body
  blew the Mosaic compiler stack outright).  Later chunks accumulate
  IN PLACE into the previous chunk's output (the running accumulator
  is an input aliased to the output), so chunking adds no extra live
  vote tensor to the HBM peak and no separate XLA add pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visfd_tpu.ops import kernels as K

# Largest number of unrolled (tz, ty, tx) taps per pallas_call body.
# 343 (hw=3, single call) is known-good on the Mosaic/axon stack; 1331
# (hw=5) is known to blow the compiler stack. Chunking the z-offsets
# keeps every call at or below the known-good size.
_MAX_TAPS_PER_CALL = 512

# Mosaic's stack allocator does not fully reuse slots across the
# unrolled tap bodies: measured scoped-VMEM stack grows ~1.2x
# (by * nxa * 4) bytes PER TAP (e.g. 343 taps, by=64, nxa=256 ->
# 35.06 MB, over the default 16 MB scoped window).  We raise the
# per-kernel window via vmem_limit_bytes and budget the taps per call
# so stack + scratch stays inside it (v5e has 128 MiB of VMEM).
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
_STACK_BUDGET_BYTES = 60 * 1024 * 1024


def _stack_factor(w_len: int) -> float:
    """Measured Mosaic stack bytes per unrolled tap, in units of
    (by * nxp * 4): ~1.05 at w_len<=7 (hw<=3), ~2.4 at w_len=11 (hw=5;
    larger unrolled bodies keep more slices live).  Conservative
    envelopes -- underestimating fails the compile outright."""
    return 1.25 if w_len <= 7 else 2.75


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _tv_kernel(hw, exponent, detect_curves, ker, want_den, sparse,
               has_acc, by, nxa, tz_lo, tz_hi, *refs):
    n_fields = 5 if want_den else 4
    w_len = 2 * hw + 1
    n_tz = tz_hi - tz_lo
    ins = refs[:n_fields]          # HBM-resident z/y-padded fields
    # when this call handles a later z-offset chunk, the running
    # accumulator rides in as a blocked VMEM input ALIASED to the
    # output (input_output_aliases), so chunking adds no extra live
    # partial tensor in HBM (round-4 capacity finding)
    acc_ref = refs[n_fields] if has_acc else None
    n_in = n_fields + (1 if has_acc else 0)
    out_ref = refs[n_in]           # blocked VMEM (n_acc, 1, by, nxa)
    slabs = refs[n_in + 1:n_in + 1 + n_fields]
    sems = refs[n_in + 1 + n_fields]

    i = pl.program_id(0)           # receiver z row
    j = pl.program_id(1)           # receiver y block
    slab_ny = slabs[0].shape[1]
    # source padded z-index for tap tz is i + 2*hw - tz, so the chunk
    # [tz_lo, tz_hi) occupies [i + w_len - tz_hi, i + w_len - tz_hi + n_tz)
    z_start = i + (w_len - tz_hi)
    copies = [
        pltpu.make_async_copy(
            ins[f].at[pl.ds(z_start, n_tz), pl.ds(j * by, slab_ny)],
            slabs[f], sems.at[f])
        for f in range(n_fields)
    ]
    if not sparse:
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
    else:
        # sparse mode fetches ONLY the saliency slab up front; the
        # direction/mask slabs are DMA'd inside the occupancy branch,
        # so fully-empty receiver blocks cost 1 field of bandwidth
        # instead of n_fields
        copies[0].start()
        copies[0].wait()

    n_acc = 7 if want_den else 6
    ny = by  # receiver rows in this block

    # sparse mode ("-tv-best" voting, where ~95% of sources have zero
    # saliency after the top-fraction threshold): a per-source-z-plane
    # occupancy scalar (max |saliency| over the slab row, one 2-D
    # reduce each) gates each z-offset's whole w_len^2 tap group
    # behind pl.when, and a whole-block gate additionally skips the
    # direction-field DMAs and every tap.  Gating at the tz level
    # keeps the accumulators in registers across each group (spill to
    # the blocked out_ref once per z-offset, ~1/w_len^2 of the group's
    # compute), so fully-dense volumes pay almost nothing.  Skipped
    # groups contribute exact zeros (parity with the dense kernel to
    # FMA-contraction ulps; tests/test_tv_pallas.py pins rtol 3e-7).
    # (An XLA-precomputed occupancy-grid input that also skipped the
    # saliency DMA faulted the TPU worker -- Mosaic miscompile of the
    # input-DMA-under-conditional structure; this in-slab variant is
    # the stable one.)
    zmax = None
    if sparse:
        zmax = [jnp.max(jnp.abs(slabs[0][z]))
                for z in range(n_tz)]  # scalar per source z-plane
        block_occ = zmax[0]
        for z in range(1, n_tz):
            block_occ = jnp.maximum(block_occ, zmax[z])
        for ch in range(n_acc):
            out_ref[ch, 0] = (acc_ref[ch, 0] if has_acc
                              else jnp.zeros((by, nxa), jnp.float32))

    def run_tap_groups(sparse_gated):
        if sparse_gated:
            acc = None
        elif has_acc:
            acc = [acc_ref[ch, 0] for ch in range(n_acc)]
        else:
            acc = [jnp.zeros((by, nxa), jnp.float32)
                   for _ in range(n_acc)]
        for tz in range(tz_lo, tz_hi):
            jz = tz - hw
            src_z = (2 * hw - tz) - (2 * hw - (tz_hi - 1))  # slab-local
            s2r = slabs[0][src_z]
            b0r = slabs[1][src_z]
            b1r = slabs[2][src_z]
            b2r = slabs[3][src_z]
            m2r = slabs[4][src_z] if want_den else None

            def z_group(acc, tz=tz, jz=jz, s2r=s2r, b0r=b0r, b1r=b1r,
                        b2r=b2r, m2r=m2r):
                for ty in range(w_len):
                    jy = ty - hw
                    y0g = hw - jy
                    for tx in range(w_len):
                        jx = tx - hw
                        r2c = float(jz * jz + jy * jy + jx * jx)
                        # per-tap weight from the SAME normalized corner-
                        # truncated kernel as the XLA table (tv.tv_tables /
                        # gen_gauss_kernel_3d), so tap sets and weights
                        # agree bitwise -- recomputing exp() here once
                        # disagreed on the r^2 == hw^2 corner shell at
                        # hw=3 (13% error)
                        w = float(ker[tz, ty, tx])
                        if w == 0.0:
                            continue  # corner-truncated tap
                        ln = float(np.sqrt(r2c)) if r2c > 0 else 1.0
                        rx, ry, rz = jx / ln, jy / ln, jz / ln
                        x0 = hw - jx
                        sl = (slice(y0g, y0g + ny), slice(x0, x0 + nxa))
                        s = s2r[sl]
                        a0 = b0r[sl]
                        a1 = b1r[sl]
                        a2 = b2r[sl]

                        sin_t = a0 * rx + a1 * ry + a2 * rz
                        sin2 = sin_t * sin_t
                        ang2 = sin2 if detect_curves else 1.0 - sin2
                        if exponent == 2:
                            dec = ang2
                        elif exponent % 2 == 0:
                            dec = ang2
                            for _ in range(exponent // 2 - 1):
                                dec = dec * ang2
                        else:
                            dec = jnp.abs(ang2) ** (0.5 * exponent)
                        sx2 = 2.0 * sin_t
                        if detect_curves:
                            r0 = a0 - sx2 * rx
                            r1 = a1 - sx2 * ry
                            r2v = a2 - sx2 * rz
                        else:
                            r0 = sx2 * rx - a0
                            r1 = sx2 * ry - a1
                            r2v = sx2 * rz - a2
                        amp = s * (w * dec)
                        # factored amp*r_i products: same left-to-right
                        # association as amp * r_i * r_j, so results
                        # are bit-identical, 3 fewer muls per tap
                        p0 = amp * r0
                        p1 = amp * r1
                        p2 = amp * r2v
                        acc[0] = acc[0] + p0 * r0
                        acc[1] = acc[1] + p1 * r1
                        acc[2] = acc[2] + p2 * r2v
                        acc[3] = acc[3] + p0 * r1
                        acc[4] = acc[4] + p1 * r2v
                        acc[5] = acc[5] + p0 * r2v
                        if want_den:
                            m = m2r[sl]
                            acc[6] = acc[6] + jnp.where(s != 0.0, w * m, 0.0)
                return acc

            if not sparse_gated:
                acc = z_group(acc)
            else:
                @pl.when(zmax[src_z] != 0.0)
                def _(z_group=z_group):
                    a = [out_ref[ch, 0] for ch in range(n_acc)]
                    a = z_group(a)
                    for ch in range(n_acc):
                        out_ref[ch, 0] = a[ch]
        return acc

    if not sparse:
        acc = run_tap_groups(sparse_gated=False)
        for ch in range(n_acc):
            out_ref[ch, 0] = acc[ch]
    else:
        @pl.when(block_occ != 0.0)
        def _():
            for c in copies[1:]:
                c.start()
            for c in copies[1:]:
                c.wait()
            run_tap_groups(sparse_gated=True)



def _tv_pallas_one_call(fields, ker, hw, exponent, detect_curves,
                        want_den, sparse, by, n_yblk, slab_ny, nxa,
                        nz, tz_lo, tz_hi, interpret, acc=None):
    n_fields = 5 if want_den else 4
    n_acc = 7 if want_den else 6
    n_tz = tz_hi - tz_lo
    nxp = fields[0].shape[-1]
    # request only the scoped VMEM this call actually needs (the
    # Mosaic stack estimate + scratch + pipelined out blocks): a
    # blanket 100 MB window measurably slows the kernel (~10% on the
    # flagship bench), presumably by pessimizing XLA's scheduling
    w_len = 2 * hw + 1
    taps = n_tz * w_len * w_len
    # per-tap slices address the full padded slab width (nxp), so the
    # stack estimate must use nxp, not the output width nxa: at
    # 128^3/hw=3 (nxa=128, nxp=256) an nxa-based estimate (19.7 MB)
    # undershot the measured 23.5 MB stack and failed the compile
    has_acc = acc is not None
    stack_est = int(taps * _stack_factor(w_len) * by * nxp * 4)
    if has_acc:
        # initializing the accumulators from the aliased acc block
        # keeps extra values live across the unrolled taps: measured
        # +13% stack on v5e (49.3 vs 43.6 MB at hw=5/64^3); 1.3x
        # envelope
        stack_est = int(stack_est * 1.3)
    scratch = n_fields * n_tz * slab_ny * nxp * 4
    out_blk = 2 * (2 if has_acc else 1) * n_acc * by * nxa * 4
    vmem_limit = min(_VMEM_LIMIT_BYTES,
                     max(16 * 1024 * 1024,
                         stack_est + scratch + out_blk + 4 * 1024 * 1024))
    kern = functools.partial(
        _tv_kernel, hw, exponent, detect_curves, ker,
        want_den, sparse, has_acc, by, nxa, tz_lo, tz_hi)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_fields
    ins = list(fields)
    if has_acc:
        # the running accumulator from the previous z-offset chunk,
        # blocked like the output and ALIASED to it: the chunked
        # accumulation is in place, with no (24 B/voxel) extra partial
        # vote tensor in HBM and no separate XLA add pass
        in_specs.append(pl.BlockSpec((n_acc, 1, by, nxa),
                                     lambda i, j: (0, i, j, 0),
                                     memory_space=pltpu.VMEM))
        ins.append(acc)
    scratch = [pltpu.VMEM((n_tz, slab_ny, nxp), jnp.float32)] * n_fields
    scratch = scratch + [pltpu.SemaphoreType.DMA((n_fields,))]
    return pl.pallas_call(
        kern,
        grid=(nz, n_yblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_acc, 1, by, nxa),
                               lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_acc, nz, n_yblk * by, nxa),
                                       jnp.float32),
        scratch_shapes=scratch,
        input_output_aliases=({n_fields: 0} if has_acc else {}),
        # the raised per-kernel scoped-VMEM window is what lets hw >= 3
        # compile: Mosaic's stack allocator does not reuse slots across
        # the unrolled taps (see _STACK_BUDGET_BYTES above), and the
        # default 16 MB window overflowed at 343 taps
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*ins)


def _tv_pallas_padded_core(fields, out_shape, hw, ker, exponent,
                           detect_curves, want_denominator, interpret,
                           sparse=False, channel_major=False):
    """Run the chunked pallas_calls over fields ALREADY padded by
    ``hw`` on every face of (z, y, x): shape (nz+2hw, ny+2hw, nx+2hw).
    The halo rows may be zeros (single-device zero-pad boundary) or
    real neighbor data (mesh halo exchange inside shard_map) -- the
    kernel math is identical either way, so the sharded result is
    bit-identical to the single-device interior."""
    nz, ny, nx = out_shape
    w_len = 2 * hw + 1
    n_fields = 5 if want_denominator else 4
    assert len(fields) == n_fields
    assert fields[0].shape == (nz + 2 * hw, ny + 2 * hw, nx + 2 * hw), (
        fields[0].shape, out_shape, hw)

    # y is blocked (grid dim 1) so the VMEM slab scratch stays
    # O(w_len * by * X) no matter how large the volume is; x is padded
    # to a full lane multiple past the output width so both the
    # accumulator and the output DMA are 128-aligned.
    nxa = _round_up(nx, 128)
    nxp = _round_up(nxa + 2 * hw, 128)
    by = min(64, _round_up(ny, 8))
    # shrink the y block until one z-plane of taps fits the stack
    # budget (wide volumes / large windows); nxp basis, see
    # _tv_pallas_one_call's stack_est
    while (by > 8 and w_len * w_len * _stack_factor(w_len)
           * by * nxp * 4 > _STACK_BUDGET_BYTES):
        by //= 2
    n_yblk = -(-ny // by)
    slab_ny = _round_up(by + 2 * hw, 8)
    # fields padded so every (j*by .. j*by+slab_ny) slab is in bounds
    ny_field = (n_yblk - 1) * by + slab_ny
    pad = [(0, 0), (0, ny_field - ny - 2 * hw),
           (0, nxp - nx - 2 * hw)]
    fields = [jnp.pad(f, pad) for f in fields]

    # chunk the z-offsets so no single call unrolls more taps than the
    # Mosaic compiler is known to handle, and so the per-call stack
    # estimate stays inside the scoped-VMEM budget
    budget_taps = int(_STACK_BUDGET_BYTES
                      / (_stack_factor(w_len) * by * nxp * 4))
    taps_cap = max(w_len * w_len, min(_MAX_TAPS_PER_CALL, budget_taps))
    tz_per_call = max(1, taps_cap // (w_len * w_len))
    n_chunks = -(-w_len // tz_per_call)
    out = None
    for c in range(n_chunks):
        tz_lo = c * tz_per_call
        tz_hi = min(w_len, tz_lo + tz_per_call)
        # later chunks accumulate IN PLACE into the previous chunk's
        # output (acc input aliased to the output): no partial vote
        # tensor is ever live next to the accumulated one (the round-3
        # HBM blowup at hw=5/384^3), no separate add pass, and the
        # data dependence through `out` serializes the calls without
        # an optimization_barrier
        out = _tv_pallas_one_call(
            fields, ker, hw, exponent, detect_curves,
            want_denominator, sparse, by, n_yblk, slab_ny, nxa,
            nz, tz_lo, tz_hi, interpret, acc=out)

    out = out[:, :, :ny, :nx]
    if channel_major:
        # native accumulator layout (6, Z, Y, X) -- feeds
        # ops.eigen_pallas.sym3_score_pallas without a transpose
        vote = out[:6]
    else:
        vote = jnp.moveaxis(out[:6], 0, -1)
    den = out[6] if want_denominator else None
    return vote, den


def _split_nvec(nvec, sal_shape, channel_major):
    """Split a direction field into component planes.  Layout is
    (Z, Y, X, 3) by default or channel-major (3, Z, Y, X) with
    ``channel_major=True``; ``None`` autodetects by shape but REFUSES
    the one ambiguous case (a 3x3x3 volume, where both layouts have
    shape (3, 3, 3, 3))."""
    sal_shape = tuple(sal_shape)
    cm_ok = (nvec.ndim == 4 and nvec.shape[0] == 3
             and tuple(nvec.shape[1:]) == sal_shape)
    cl_ok = (nvec.ndim == 4 and nvec.shape[-1] == 3
             and tuple(nvec.shape[:-1]) == sal_shape)
    if channel_major is None:
        if cm_ok and cl_ok:
            raise ValueError(
                "nvec layout is ambiguous for this shape; pass "
                "nvec_channel_major explicitly")
        channel_major = cm_ok
    if channel_major:
        if not cm_ok:
            raise ValueError(f"expected channel-major (3,)+{sal_shape}"
                             f" nvec, got {tuple(nvec.shape)}")
        return nvec[0], nvec[1], nvec[2]
    if not cl_ok:
        raise ValueError(f"expected {sal_shape}+(3,) nvec, got "
                         f"{tuple(nvec.shape)}")
    return nvec[..., 0], nvec[..., 1], nvec[..., 2]


def tv_dense_stick_pallas_prepadded(
    sal_pad: jax.Array,           # (Z+2hw, Y+2hw, X+2hw) float32
    nvec_pad: jax.Array,          # (Z+2hw, Y+2hw, X+2hw, 3) or (3, ...)
    sigma: float,
    out_shape: Tuple[int, int, int],
    exponent: int = 4,
    mask_pad: Optional[jax.Array] = None,
    detect_curves: bool = False,
    truncate_ratio: float = 2.5,
    want_denominator: bool = False,
    interpret: bool = False,
    sparse: bool = False,
    channel_major: bool = False,
    nvec_channel_major: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Pallas voting over fields whose hw-deep halos were filled by
    the CALLER (mesh halo exchange; zeros outside the global volume).
    This is the per-shard entry the sharded pipelines call inside
    shard_map.  ``mask_pad``, when given, must carry the halo-padded
    source mask (it gates votes and feeds the denominator).
    ``channel_major`` returns the raw (6, Z, Y, X) accumulator."""
    hw = int(np.floor(sigma * truncate_ratio))
    ker = K.gen_gauss_kernel_3d((sigma,) * 3, 2.0, (hw,) * 3)
    sal_pad = jnp.asarray(sal_pad, jnp.float32)
    if mask_pad is not None:
        m = jnp.asarray(mask_pad, jnp.float32)
        sal_eff = sal_pad * m
        md = m * 1.0
    else:
        sal_eff = sal_pad
        md = jnp.ones_like(sal_pad)
    n_fields = 5 if want_denominator else 4
    nv = _split_nvec(nvec_pad, sal_pad.shape, nvec_channel_major)
    fields = [sal_eff, nv[0], nv[1], nv[2], md][:n_fields]
    return _tv_pallas_padded_core(
        fields, tuple(out_shape), hw, ker, int(exponent),
        bool(detect_curves), bool(want_denominator), interpret,
        sparse=bool(sparse), channel_major=bool(channel_major))


@functools.lru_cache(maxsize=64)
def _tv_dense_stick_jitted(sigma, exponent, has_mask, detect_curves,
                           truncate_ratio, want_denominator, interpret,
                           sparse, channel_major, nv_cm):
    """One jitted program per static TV configuration.  Without this,
    every CLI call re-traced the pad + chunked pallas_call composition
    EAGERLY -- measured 19 s/call of pure dispatch overhead at 384^3
    through the remote tunnel vs 0.2 s for the jitted kernel."""
    hw = int(np.floor(sigma * truncate_ratio))
    ker = K.gen_gauss_kernel_3d((sigma,) * 3, 2.0, (hw,) * 3)

    def fn(saliency, nvec, mask_src):
        nz, ny, nx = saliency.shape
        sal = jnp.asarray(saliency, jnp.float32)
        if has_mask:
            m = jnp.asarray(mask_src, jnp.float32)
            sal_eff = sal * m
            md = m * 1.0
        else:
            sal_eff = sal
            md = jnp.ones_like(sal)
        n_fields = 5 if want_denominator else 4
        pad = [(hw, hw)] * 3
        nv = _split_nvec(nvec, sal.shape, nv_cm)
        fields = [jnp.pad(f, pad) for f in
                  ([sal_eff, nv[0], nv[1], nv[2], md][:n_fields])]
        return _tv_pallas_padded_core(
            fields, (nz, ny, nx), hw, ker, exponent,
            detect_curves, want_denominator, interpret,
            sparse=sparse, channel_major=channel_major)

    return jax.jit(fn)


def tv_dense_stick_pallas(
    saliency: jax.Array,          # (Z, Y, X) float32
    nvec: jax.Array,              # (Z, Y, X, 3) or (3, Z, Y, X)
    sigma: float,
    exponent: int = 4,
    mask_src: Optional[jax.Array] = None,
    detect_curves: bool = False,
    truncate_ratio: float = 2.5,
    want_denominator: bool = False,
    interpret: bool = False,
    sparse: bool = False,
    channel_major: bool = False,
    nvec_channel_major: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Raw (unnormalized) vote tensors (Z, Y, X, 6) -- or channel-major
    (6, Z, Y, X) with ``channel_major=True`` -- and optionally the
    masked-normalization denominator (Z, Y, X).  ``sparse`` gates
    z-offset tap groups on per-source-plane occupancy (pl.when) --
    equal to the dense kernel to FMA-contraction ulps (bitwise at most
    window sizes), large speedup when the zero saliencies are
    spatially coherent (-tv-best on membrane-like data)."""
    # resolve the nvec layout OUTSIDE the jit (it is a static property)
    nv_cm = nvec_channel_major
    if nv_cm is None:
        _split_nvec(nvec, saliency.shape, None)  # raise on ambiguity
        nv_cm = nvec.ndim == 4 and nvec.shape[0] == 3 \
            and tuple(nvec.shape[1:]) == tuple(saliency.shape)
    fn = _tv_dense_stick_jitted(
        float(sigma), int(exponent), mask_src is not None,
        bool(detect_curves), float(truncate_ratio),
        bool(want_denominator), bool(interpret), bool(sparse),
        bool(channel_major), bool(nv_cm))
    dummy = saliency if mask_src is None else mask_src
    return fn(saliency, nvec, dummy)
