"""Pallas TPU kernel for dense stick tensor voting.

One receiver z-row per grid step; the (2*hw+1) haloed source rows of
each field are DMA'd to VMEM once and the whole (2*hw+1)^3 vote loop
runs as straight-line 2-D vector code with STATIC offsets only --
no dynamic slices, no rolls, no 3-D vector ops (each of those made
the Mosaic/axon compiler either explode or emit slow code; see git
history for the graveyard).  Vote accumulators live in registers
across the loop, so HBM traffic is ~(2*hw+1) passes over the volume
and the kernel is bounded by VPU shift+FMA throughput.

The radial weight exp(-(|j|/sigma)^2) (with the reference's corner
truncation, ``filter3d.hpp:556-586``) and the unit displacement
r_hat = j/|j| are baked in as python constants per offset.

Masked voting reuses the dense path with sal' = saliency * mask (the
vote weight factorizes; see feature.hpp:2262-2292) and accumulates the
normalization denominator as a 7th channel when requested.  Matches
``TV.tv_dense_stick(..., normalize=False)`` to f32 roundoff.

Intended for small/medium windows (hw <= ~4: compile size grows as
(2*hw+1)^3); ``features.tv`` is the general XLA fallback.
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


def _tv_kernel(hw, exponent, detect_curves, ker, want_den,
               by, nx, *refs):
    n_fields = 5 if want_den else 4
    w_len = 2 * hw + 1
    ins = refs[:n_fields]          # HBM-resident z/y-padded fields
    out_ref = refs[n_fields]
    slabs = refs[n_fields + 1:n_fields + 1 + n_fields]
    sems = refs[n_fields + 1 + n_fields]

    i = pl.program_id(0)           # receiver z row
    j = pl.program_id(1)           # receiver y block
    slab_ny = slabs[0].shape[1]
    copies = [
        pltpu.make_async_copy(
            ins[f].at[pl.ds(i, w_len), pl.ds(j * by, slab_ny)],
            slabs[f], sems.at[f])
        for f in range(n_fields)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    n_acc = 7 if want_den else 6
    acc = [jnp.zeros((by, nx), jnp.float32) for _ in range(n_acc)]
    ny = by  # receiver rows in this block

    for tz in range(w_len):
        jz = tz - hw
        src_z = 2 * hw - tz
        s2r = slabs[0][src_z]
        b0r = slabs[1][src_z]
        b1r = slabs[2][src_z]
        b2r = slabs[3][src_z]
        m2r = slabs[4][src_z] if want_den else None
        for ty in range(w_len):
            for tx in range(w_len):
                jy = ty - hw
                jx = tx - hw
                r2c = float(jz * jz + jy * jy + jx * jx)
                # per-tap weight from the SAME normalized corner-
                # truncated kernel as the XLA table (tv.tv_tables /
                # gen_gauss_kernel_3d), so tap sets and weights agree
                # bitwise -- recomputing exp() here once disagreed on
                # the r^2 == hw^2 corner shell at hw=3 (13% error)
                w = float(ker[tz, ty, tx])
                if w == 0.0:
                    continue  # corner-truncated tap
                ln = float(np.sqrt(r2c)) if r2c > 0 else 1.0
                rx, ry, rz = jx / ln, jy / ln, jz / ln
                y0 = hw - jy
                x0 = hw - jx
                sl = (slice(y0, y0 + ny), slice(x0, x0 + nx))
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
                acc[0] = acc[0] + amp * r0 * r0
                acc[1] = acc[1] + amp * r1 * r1
                acc[2] = acc[2] + amp * r2v * r2v
                acc[3] = acc[3] + amp * r0 * r1
                acc[4] = acc[4] + amp * r1 * r2v
                acc[5] = acc[5] + amp * r0 * r2v
                if want_den:
                    m = m2r[sl]
                    acc[6] = acc[6] + jnp.where(s != 0.0, w * m, 0.0)

    for ch in range(n_acc):
        out_ref[ch, 0] = acc[ch]


def tv_dense_stick_pallas(
    saliency: jax.Array,          # (Z, Y, X) float32
    nvec: jax.Array,              # (Z, Y, X, 3)
    sigma: float,
    exponent: int = 4,
    mask_src: Optional[jax.Array] = None,
    detect_curves: bool = False,
    truncate_ratio: float = 2.5,
    want_denominator: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Raw (unnormalized) vote tensors (Z, Y, X, 6) and optionally the
    masked-normalization denominator (Z, Y, X)."""
    nz, ny, nx = saliency.shape
    hw = int(np.floor(sigma * truncate_ratio))
    w_len = 2 * hw + 1
    ker = K.gen_gauss_kernel_3d((sigma,) * 3, 2.0, (hw,) * 3)

    sal = jnp.asarray(saliency, jnp.float32)
    if mask_src is not None:
        m = jnp.asarray(mask_src, jnp.float32)
        sal_eff = sal * m
        md = m * 1.0
    else:
        sal_eff = sal
        md = jnp.ones_like(sal)

    # y is blocked (grid dim 1) so the VMEM slab scratch stays
    # O(w_len * by * X) no matter how large the volume is: 4 fields x
    # w_len x (by + 2hw) x X_pad floats must fit the ~16 MB scoped
    # VMEM budget (the unblocked kernel OOM'd at >= 384^3, hw >= 3)
    n_ch = 7 if want_denominator else 6
    n_fields = 5 if want_denominator else 4
    nxp = -(-(nx + 2 * hw) // 128) * 128
    by = min(64, -(-ny // 8) * 8)
    n_yblk = -(-ny // by)
    slab_ny = -(-(by + 2 * hw) // 8) * 8
    # fields padded so every (j*by .. j*by+slab_ny) slab is in bounds
    ny_field = (n_yblk - 1) * by + slab_ny
    pad = [(hw, hw), (hw, ny_field - ny - hw), (hw, nxp - nx - hw)]
    fields = [jnp.pad(f, pad) for f in
              ([sal_eff, nvec[..., 0], nvec[..., 1], nvec[..., 2], md]
               [:n_fields])]

    kern = functools.partial(
        _tv_kernel, hw, exponent, detect_curves, ker,
        want_denominator, by, nx)

    out = pl.pallas_call(
        kern,
        grid=(nz, n_yblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_fields,
        out_specs=pl.BlockSpec((n_ch, 1, by, nx),
                               lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ch, nz, n_yblk * by, nx),
                                       jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((w_len, slab_ny, nxp), jnp.float32)] * n_fields
            + [pltpu.SemaphoreType.DMA((n_fields,))]),
        interpret=interpret,
    )(*fields)

    out = out[:, :, :ny]
    vote = jnp.moveaxis(out[:6], 0, -1)
    den = out[6] if want_denominator else None
    return vote, den
