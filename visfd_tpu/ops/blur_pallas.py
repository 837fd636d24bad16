"""Fused Pallas TPU kernel for separable 3-D convolution.

The XLA lowering of the shift-sum separable blur makes several passes
over HBM (one per axis, plus materialized temporaries).  This kernel
performs all three 1-D passes in one sweep: for each (y-block, z)
grid step it

1. waits on the (double-buffered, prefetched one step ahead) DMA of
   ONE haloed source plane,
2. convolves it along y then x into a ring buffer of xy-blurred
   planes (VMEM scratch persists across sequential grid steps), and
3. emits the z-convolution of the ring as the output plane,

so total HBM traffic is ~1 read + 1 write of the volume -- the minimum
possible for this op.  The z grid dimension is innermost; at z == 0
the kernel warms the ring up with the first hw_z+1 planes.  The
z-combination reads the ring at STATIC slot indices and picks the
weight dynamically from SMEM (a scalar load), avoiding dynamic vector
slices which Mosaic lowers poorly.

Semantics match ``ops.conv._sep3`` (true convolution g[i] = sum_j
h[j] f[i-j] per axis, zero padding) so the masked / normalized
variants in ``ops.conv`` build on it unchanged; reference engine:
``ApplySeparable`` (``filter3d.hpp:686-1050``).

Kernel *values* are runtime inputs (SMEM), so re-running with a
different sigma of the same window width reuses the compiled
executable (blob scale-space ladders).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
_STACK_BUDGET_BYTES = 60 * 1024 * 1024
_RING_BUDGET_BYTES = 48 * 1024 * 1024
_STACK_BYTES_PER_TAP_FACTOR = 1.25


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _blur_kernel(hwz, hwy, hwx, nz, by, nxa,
                 kz_ref, ky_ref, kx_ref, in_hbm, out_ref,
                 slab, ring, sems):
    """Grid = (n_yblk, nz); z innermost so the ring marches in z."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    wz = 2 * hwz + 1
    slab_ny = slab.shape[1]

    def dma(src_z, buf):
        return pltpu.make_async_copy(
            in_hbm.at[src_z, pl.ds(j * by, slab_ny)],
            slab.at[buf], sems.at[buf])

    def xyblur(buf):
        # y pass: g[y] = sum_t ky_rev[t] * slab[y + t], then x pass
        acc = None
        for t in range(2 * hwy + 1):
            w = ky_ref[2 * hwy - t]
            term = slab[buf, pl.ds(t, by), :] * w
            acc = term if acc is None else acc + term
        out = None
        for t in range(2 * hwx + 1):
            w = kx_ref[2 * hwx - t]
            term = acc[:, t:t + nxa] * w
            out = term if out is None else out + term
        return out

    @pl.when(i == 0)
    def _warmup():
        # sequentially load + blur source planes 0..hwz, zero-fill the
        # ring slots of out-of-range planes, then prefetch plane hwz+1
        for s in range(-hwz, hwz + 1):
            if s < 0:
                ring[s % wz] = jnp.zeros((by, nxa), jnp.float32)
            else:
                @pl.when(s < nz)
                def _(s=s):
                    d = dma(s, s % 2)
                    d.start()
                    d.wait()
                    ring[s % wz] = xyblur(s % 2)

                @pl.when(s >= nz)
                def _(s=s):
                    ring[s % wz] = jnp.zeros((by, nxa), jnp.float32)
        if hwz + 1 < nz:  # nz is a static Python int
            dma(hwz + 1, (hwz + 1) % 2).start()

    @pl.when(i > 0)
    def _step():
        src = i + hwz
        slot = jax.lax.rem(src, wz)

        @pl.when(src < nz)
        def _():
            buf = jax.lax.rem(src, 2)
            dma(src, buf).wait()  # started at the previous grid step
            ring[pl.ds(slot, 1)] = xyblur(buf)[None]

        @pl.when(src >= nz)
        def _():
            ring[pl.ds(slot, 1)] = jnp.zeros((1, by, nxa), jnp.float32)

        @pl.when(src + 1 < nz)
        def _():
            dma(src + 1, jax.lax.rem(src + 1, 2)).start()

    # z pass over STATIC ring slots; the weight index is dynamic:
    # slot s holds plane p with p = (i - hwz) + ((s - (i - hwz)) mod wz)
    # and kz index = jz + hwz = wz - 1 - ((s - i + hwz) mod wz).
    acc = None
    for s in range(wz):
        m = jax.lax.rem(jax.lax.rem(s - i + hwz, wz) + wz, wz)
        w = kz_ref[wz - 1 - m]
        term = ring[s] * w
        acc = term if acc is None else acc + term
    out_ref[0] = acc


def _pick_by(ny, nxa, nxp, taps, wz):
    by = min(256, _round_up(ny, 8))
    while by > 8 and (
            taps * _STACK_BYTES_PER_TAP_FACTOR * by * nxp * 4
            > _STACK_BUDGET_BYTES
            or wz * by * nxa * 4 > _RING_BUDGET_BYTES):
        by //= 2
    return by


def _blur3_pallas_impl(x, kz, ky, kx, interpret=False):
    nz, ny, nx = x.shape
    hwz = kz.shape[0] // 2
    hwy = ky.shape[0] // 2
    hwx = kx.shape[0] // 2
    wz = 2 * hwz + 1
    nxa = _round_up(nx, 128)
    nxp = _round_up(nxa + 2 * hwx, 128)
    taps = (2 * hwy + 1) + (2 * hwx + 1) + wz
    by = _pick_by(ny, nxa, nxp, taps, wz)
    n_yblk = -(-ny // by)
    slab_ny = _round_up(by + 2 * hwy, 8)
    ny_field = (n_yblk - 1) * by + slab_ny
    xp = jnp.pad(x, [(0, 0), (hwy, ny_field - ny - hwy),
                     (hwx, nxp - nx - hwx)])

    kern = functools.partial(_blur_kernel, hwz, hwy, hwx, nz, by, nxa)
    out = pl.pallas_call(
        kern,
        grid=(n_yblk, nz),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, by, nxa), lambda j, i: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, n_yblk * by, nxa),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, slab_ny, nxp), jnp.float32),
            pltpu.VMEM((wz, by, nxa), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(kz, ky, kx, xp)
    return out[:, :ny, :nx]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _blur3_pallas_jit(x, kz, ky, kx, interpret=False):
    return _blur3_pallas_impl(x, kz, ky, kx, interpret)


def blur3_pallas(x, kernels_xyz, interpret: bool = False) -> jax.Array:
    """Separable 3-D convolution (kx, ky, kz 1-D kernels, zero padding)
    in a single fused HBM pass.  Drop-in replacement for
    ``ops.conv._sep3``."""
    kx, ky, kz = (jnp.asarray(k, jnp.float32) for k in kernels_xyz)
    return _blur3_pallas_jit(jnp.asarray(x, jnp.float32),
                             kz, ky, kx, interpret=interpret)
