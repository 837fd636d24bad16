"""Separable and dense 3-D convolution over (Z, Y, X) voxel grids.

TPU-first design notes
----------------------
The reference's central engine ``ApplySeparable`` (``filter3d.hpp:
686-1050``) runs three sequential 1-D passes with a fused mask
"denominator".  Its masked-normalized output is mathematically
``blur(f*m) / blur(m)`` with zero padding (the reference's own comment,
``filter3d.hpp:673-683``, calls the fused form a ~17% faster variant of
exactly this ratio), and the no-mask normalized output is
``blur(f) / blur(1)`` where ``blur(1)`` factorizes into a per-axis
outer product (``filter3d.hpp:1006-1040``).  We implement those
identities directly: each 1-D pass is a sum of shifted arrays --
(2*hw+1) fused VPU multiply-adds per axis, the bandwidth-optimal
formulation for stencils on TPU -- and the denominators are either a
rank-1 broadcast (no mask) or a second separable blur of the mask.

Kernel *lengths* are static (they shape the compiled program); kernel
*values* are traced, so re-running with a different sigma of the same
window width reuses the compiled executable (important for blob
scale-space ladders).

Convolution orientation matches the reference: g[i] = sum_j h[j]*f[i-j]
(true convolution; symmetric kernels are unaffected).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _conv1d_axis_impl(x: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    klen = kernel.shape[0]
    hw = klen // 2
    if hw == 0:
        return x * kernel[0]
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (hw, hw)
    xp = jnp.pad(x, pad)
    # g[i] = sum_t k_rev[t] * padded[i + t], k_rev = kernel reversed
    out = None
    for t in range(klen):
        w = kernel[klen - 1 - t]
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + n)
        term = xp[tuple(sl)] * w
        out = term if out is None else out + term
    return out


@functools.partial(jax.jit, static_argnames=("axis",))
def conv1d_axis(x: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """1-D convolution g[i] = sum_j h[j] * f[i-j] along ``axis`` with
    zero padding; kernel length must be odd (2*hw+1)."""
    return _conv1d_axis_impl(x, jnp.asarray(kernel, jnp.float32), axis)


def _is_multidevice(x) -> bool:
    """True when x is committed to a >1-device GSPMD sharding (a
    single-device Pallas call cannot consume it)."""
    sh = getattr(x, "sharding", None)
    try:
        return sh is not None and len(sh.device_set) > 1
    except Exception:
        return False


def _use_pallas_blur(shape, klens) -> bool:
    """Gate for the fused Pallas separable blur: TPU only, volumes big
    enough to amortize the kernel, window sizes within the kernel's
    budget.  VISFD_BLUR_PALLAS=0/1 overrides."""
    import os

    env = os.environ.get("VISFD_BLUR_PALLAS")
    if env is not None:
        return env == "1"
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    if len(shape) != 3:
        return False
    nz, ny, nx = shape
    if nz * ny * nx < 96 ** 3 or ny < 8 or nx < 128:
        return False
    return all(k % 2 == 1 and k <= 61 for k in klens)


def _sep3(x, kx, ky, kz, use_pallas: bool = False):
    if use_pallas:
        from visfd_tpu.ops.blur_pallas import _blur3_pallas_jit
        return _blur3_pallas_jit(x, kz, ky, kx)
    out = _conv1d_axis_impl(x, kz, axis=0)
    out = _conv1d_axis_impl(out, ky, axis=1)
    out = _conv1d_axis_impl(out, kx, axis=2)
    return out


def _ones_denom_1d(kernel: jax.Array, n: int) -> jax.Array:
    """conv of an all-ones length-n signal with the kernel, zero padded:
    the per-axis normalization denominator (``filter3d.hpp:1006-1040``)."""
    ones = jnp.ones((1, 1, n), dtype=jnp.float32)
    return _conv1d_axis_impl(ones, kernel, axis=2)[0, 0]


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _separable_conv3d_nomask(x, kx, ky, kz, use_pallas=False):
    out = _sep3(x, kx, ky, kz, use_pallas)
    dz = _ones_denom_1d(kz, x.shape[0])[:, None, None]
    dy = _ones_denom_1d(ky, x.shape[1])[None, :, None]
    dx = _ones_denom_1d(kx, x.shape[2])[None, None, :]
    return out / (dz * dy * dx)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _separable_conv3d_masked(x, mask, kx, ky, kz, use_pallas=False):
    out = _sep3(x * mask, kx, ky, kz, use_pallas)
    den = _sep3(mask, kx, ky, kz, use_pallas)
    return jnp.where(den > 0, out / jnp.where(den > 0, den, 1.0), out)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _separable_conv3d_raw(x, mask, kx, ky, kz, use_pallas=False):
    src = x if mask is None else x * mask
    return _sep3(src, kx, ky, kz, use_pallas)


def separable_conv3d(
    x: jax.Array,
    kernels_xyz: Sequence,  # (kx, ky, kz) 1-D kernels
    mask: Optional[jax.Array] = None,
    normalize: bool = True,
) -> jax.Array:
    """Separable 3-D convolution with the reference's mask/normalize
    semantics (``filter3d.hpp:686-1050``):

    * mask given: voxels with mask==0 contribute nothing; non-binary
      mask values act as weights. Output = blur(x*mask) and, when
      normalizing, divided by blur(mask) where that is > 0.
    * no mask + normalize: divide by the separable blur of an all-ones
      box (edge correction), a rank-1 outer product per axis.
    """
    kx, ky, kz = (jnp.asarray(np.asarray(k), jnp.float32) for k in kernels_xyz)
    x = jnp.asarray(x, jnp.float32)
    up = (_use_pallas_blur(x.shape, (kx.shape[0], ky.shape[0], kz.shape[0]))
          and not _is_multidevice(x))
    if not normalize:
        if mask is None:
            return _separable_conv3d_raw(x, None, kx, ky, kz, use_pallas=up)
        return _separable_conv3d_raw(x, jnp.asarray(mask, jnp.float32),
                                     kx, ky, kz, use_pallas=up)
    if mask is None:
        return _separable_conv3d_nomask(x, kx, ky, kz, use_pallas=up)
    return _separable_conv3d_masked(x, jnp.asarray(mask, jnp.float32),
                                    kx, ky, kz, use_pallas=up)


@functools.partial(jax.jit, static_argnames=("normalize",))
def _dense_conv3d_impl(x, mask, kf, normalize: bool):
    src = x if mask is None else x * mask

    def corr(v):
        return jax.lax.conv_general_dilated(
            v[None, None],
            kf[None, None],
            window_strides=(1, 1, 1),
            padding=[(s // 2, s // 2) for s in kf.shape],
            dimension_numbers=("NCZYX", "OIZYX", "NCZYX"),
            precision=jax.lax.Precision.HIGHEST,
        )[0, 0]

    out = corr(src)
    if not normalize:
        return out
    den = corr(mask if mask is not None else jnp.ones_like(x))
    return jnp.where(den > 0, out / jnp.where(den > 0, den, 1.0), out)


def dense_conv3d(
    x: jax.Array,
    kernel_zyx,  # (Z, Y, X)-shaped dense kernel
    mask: Optional[jax.Array] = None,
    normalize: bool = True,
) -> jax.Array:
    """Dense (non-separable) 3-D convolution with mask/normalize
    semantics of ``Filter3D::Apply`` (``filter3d.hpp:150-458``):
    g = conv(f*m), denominator = conv(m) (or conv(box) without mask).

    Used for generalized (non-separable) Gaussians; lowered through
    XLA's conv which tiles onto the MXU (full f32 precision).
    """
    k = jnp.asarray(np.asarray(kernel_zyx, dtype=np.float32))
    # true convolution: flip all spatial axes, then correlate
    kf = k[::-1, ::-1, ::-1]
    x = jnp.asarray(x, jnp.float32)
    m = None if mask is None else jnp.asarray(mask, jnp.float32)
    return _dense_conv3d_impl(x, m, kf, normalize)
