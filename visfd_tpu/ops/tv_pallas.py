"""Pallas TPU kernel for dense stick tensor voting.

The jnp implementation (``visfd_tpu.features.tv``) re-reads every
source field from HBM once per window offset: traffic scales as
K * N^3 (K = (2*hw+1)^3 window voxels).  This kernel blocks the volume
along Z and keeps the source slab plus the 6(+1) vote accumulators in
VMEM across the whole offset loop, so HBM traffic drops to ~three
passes over the volume and the loop runs at VPU compute speed.

Design notes:
* receiver block = (BZ, Y, X); the haloed source slab (BZ+2hw, Y+2hw,
  X+2hw) is assembled in VMEM from three consecutive standard input
  blocks (prev/cur/next, via three BlockSpecs on a z-padded input) --
  no manual DMA, so Mosaic's alignment rules are satisfied;
* the radial weight exp(-(|j|/sigma)^2) (with the reference's corner
  truncation, ``filter3d.hpp:556-586``) and the unit displacement
  r_hat = j/|j| are recomputed from the loop indices -- no lookup
  tables, no gathers (the kernel normalization constant is folded into
  the amplitude);
* jz iterates in a ``fori_loop`` (dynamic offsets are only on the
  leading, untiled dimension); jy/jx are unrolled static sublane/lane
  shifts;
* masked voting reuses the dense path with sal' = saliency * mask (the
  vote weight factorizes; see feature.hpp:2262-2292) and accumulates
  the normalization denominator as a 7th channel when requested.

Matches ``TV.tv_dense_stick(..., normalize=False)`` and the masked
denominator to f32 roundoff.
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


def _choose_bz(nz: int, ny: int, nx: int, hw: int, vmem_budget=9 * 2**20):
    """Largest Z block size (dividing nz, >= hw) that keeps slabs +
    accumulators in VMEM."""
    def bytes_for(bz):
        slab = (bz + 2 * hw) * (ny + 2 * hw) * (nx + 2 * hw) * 4
        blocks = 3 * bz * (ny + 2 * hw) * (nx + 2 * hw) * 4
        acc = bz * ny * nx * 4 * 7
        return 5 * (slab + blocks) + acc
    bz = None
    for cand in range(1, nz + 1):
        if nz % cand:
            continue
        if cand >= hw and bytes_for(cand) <= vmem_budget:
            if bz is None or cand > bz:
                bz = cand
    if bz is None:
        bz = max(c for c in range(1, nz + 1) if nz % c == 0 and c >= hw)
    return bz


def _tv_kernel(hw, exponent, detect_curves, sigma, norm, want_den,
               bz, ny, nx, *refs):
    n_fields = 5 if want_den else 4
    ins = refs[: 3 * n_fields]
    out_ref = refs[3 * n_fields]
    scratch = refs[3 * n_fields + 1:]
    slabs = scratch[:n_fields]
    acc = scratch[n_fields]

    w_len = 2 * hw + 1

    # assemble haloed slabs: prev[-hw:], cur, next[:hw]
    for f in range(n_fields):
        prev, cur, nxt = ins[3 * f], ins[3 * f + 1], ins[3 * f + 2]
        slabs[f][0:hw] = prev[bz - hw:bz]
        slabs[f][hw:hw + bz] = cur[...]
        slabs[f][hw + bz:hw + bz + hw] = nxt[0:hw]

    sal_v, n0_v, n1_v, n2_v = slabs[:4]
    md_v = slabs[4] if want_den else None

    acc[...] = jnp.zeros_like(acc)

    # corner truncation threshold (filter3d.hpp:556-586): axis-edge value
    trunc = float(np.exp(-((hw / sigma) ** 2))) if sigma > 0 else 1.0
    inv_s2 = 1.0 / (sigma * sigma)

    def body_z(tz, _):
        jz = tz - hw
        fz = jz.astype(jnp.float32)
        z0 = hw - jz  # dynamic start on the leading (untiled) dim only

        def do_jyx(ty, tx):
            jy = ty - hw
            jx = tx - hw
            fy = float(jy)
            fx = float(jx)
            r2 = fz * fz + fy * fy + fx * fx
            w = jnp.exp(-r2 * inv_s2)
            w = jnp.where(w < trunc * (1.0 - 1e-6), 0.0, w) * norm
            inv_len = jnp.where(
                r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-30)), 0.0)
            rx = fx * inv_len
            ry = fy * inv_len
            rz = fz * inv_len

            y0 = hw - jy
            x0 = hw - jx
            s = sal_v[pl.ds(z0, bz), y0:y0 + ny, x0:x0 + nx]
            a0 = n0_v[pl.ds(z0, bz), y0:y0 + ny, x0:x0 + nx]
            a1 = n1_v[pl.ds(z0, bz), y0:y0 + ny, x0:x0 + nx]
            a2 = n2_v[pl.ds(z0, bz), y0:y0 + ny, x0:x0 + nx]

            sin_t = a0 * rx + a1 * ry + a2 * rz
            sin2 = sin_t * sin_t
            cos2 = 1.0 - sin2
            ang2 = sin2 if detect_curves else cos2
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
            amp = s * w * dec
            acc[0] += amp * r0 * r0
            acc[1] += amp * r1 * r1
            acc[2] += amp * r2v * r2v
            acc[3] += amp * r0 * r1
            acc[4] += amp * r1 * r2v
            acc[5] += amp * r0 * r2v
            if want_den:
                m = md_v[pl.ds(z0, bz), y0:y0 + ny, x0:x0 + nx]
                acc[6] += jnp.where(s != 0.0, w * m, 0.0)

        for ty in range(w_len):
            for tx in range(w_len):
                do_jyx(ty, tx)
        return 0

    jax.lax.fori_loop(0, w_len, body_z, 0)
    out_ref[...] = acc[...]


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
    ker = K.gen_gauss_kernel_3d((sigma,) * 3, 2.0, (hw,) * 3)
    norm = float(ker[hw, hw, hw])  # normalized kernel peak value = A

    sal = jnp.asarray(saliency, jnp.float32)
    if mask_src is not None:
        m = jnp.asarray(mask_src, jnp.float32)
        sal_eff = sal * m
        md = m * 1.0
    else:
        sal_eff = sal
        md = jnp.ones_like(sal)

    bz = _choose_bz(nz, ny, nx, hw)
    nzp = bz + 2 * hw
    nyp = ny + 2 * hw
    nxp = nx + 2 * hw
    n_ch = 7 if want_denominator else 6
    n_fields = 5 if want_denominator else 4

    # pad y/x by hw (stencil halo) and z by bz (so the prev/next block
    # views of block i are always in range)
    pad = [(bz, bz), (hw, hw), (hw, hw)]
    fields = [jnp.pad(f, pad) for f in
              ([sal_eff, nvec[..., 0], nvec[..., 1], nvec[..., 2], md]
               [:n_fields])]

    kern = functools.partial(
        _tv_kernel, hw, exponent, detect_curves, sigma, norm,
        want_denominator, bz, ny, nx)

    blk = (bz, nyp, nxp)
    in_specs = []
    ins = []
    for f in fields:
        for off in (0, 1, 2):
            in_specs.append(pl.BlockSpec(
                blk, functools.partial(lambda o, i: (i + o, 0, 0), off),
                memory_space=pltpu.VMEM))
            ins.append(f)

    out = pl.pallas_call(
        kern,
        grid=(nz // bz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_ch, bz, ny, nx),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ch, nz, ny, nx), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((nzp, nyp, nxp), jnp.float32)] * n_fields
            + [pltpu.VMEM((n_ch, bz, ny, nx), jnp.float32)]),
        interpret=interpret,
    )(*ins)

    vote = jnp.moveaxis(out[:6], 0, -1)
    den = out[6] if want_denominator else None
    return vote, den
