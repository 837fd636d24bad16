"""Intensity-mapping (threshold) functions.

Vectorized equivalents of ``lib/threshold/threshold.hpp:9-258``:
``threshold2`` (linear ramp, direction chosen by argument order),
``threshold4`` (trapezoid / inverted trapezoid), ``select_intensity_
range`` (binary band select) and its Gaussian variant. All operate
elementwise on arrays and are jit/XLA friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def _is_between(x, a, b):
    """((a <= x) & (x < b)) | ((b < x) & (x <= a)) -- works whichever
    of a, b is larger (``threshold.hpp:9-12``)."""
    return ((a <= x) & (x < b)) | ((b < x) & (x <= a))


def threshold2(x, thresh_a, thresh_b, out_a=0.0, out_b=1.0):
    """Linear ramp from 0 at thresh_a to 1 at thresh_b (decreasing
    ramp when thresh_b < thresh_a), then mapped to [out_a, out_b]
    (``threshold.hpp:52-76``)."""
    x = jnp.asarray(x)
    ramp = (x - thresh_a) / (thresh_b - thresh_a)
    above = (x - thresh_a) * (thresh_b - thresh_a) > 0.0
    g = jnp.where(_is_between(x, thresh_a, thresh_b), ramp,
                  jnp.where(above, 1.0, 0.0))
    return out_a + g * (out_b - out_a)


def threshold4(x, t01a, t01b, t10a, t10b, out_a=0.0, out_b=1.0):
    """Trapezoidal ramp 0->1->0 over (t01a, t01b, t10a, t10b), or the
    inverted 1->0->1 shape when given in decreasing order
    (``threshold.hpp:113-166``). Degenerate t01b == t10a == t10b falls
    back to threshold2."""
    x = jnp.asarray(x)
    if (t01b == t10a) and (t01b == t10b):
        return threshold2(x, t01a, t01b, out_a, out_b)
    ramp01 = (x - t01a) / (t01b - t01a)
    ramp10 = (x - t10a) / (t10b - t10a)
    if t01b <= t10a:
        plateau = jnp.where(_is_between(x, t01b, t10a), 1.0, 0.0)
    elif t10b <= t01a:
        plateau = jnp.where(_is_between(x, t10b, t01a), 0.0, 1.0)
    else:
        raise ValueError("threshold4 arguments must be monotonic")
    g = jnp.where(_is_between(x, t01a, t01b), ramp01,
                  jnp.where(_is_between(x, t10a, t10b), ramp10, plateau))
    return out_a + g * (out_b - out_a)


def select_intensity_range(x, range_a, range_b, out_a=0.0, out_b=1.0):
    """Binary band select: 1 inside [range_a, range_b), 0 outside;
    swapped arguments invert the selection (``threshold.hpp:171-216``).
    NOTE: mirrors the reference exactly -- out_a/out_b do NOT remap the
    result there (the g value is returned raw)."""
    x = jnp.asarray(x)
    if range_a < range_b:
        g = jnp.where(_is_between(x, range_a, range_b), 1.0, 0.0)
    else:
        g = jnp.where(_is_between(x, range_b, range_a), 0.0, 1.0)
    return g


def select_intensity_range_gauss(x, x0, sigma, out_a=0.0, out_b=1.0):
    """Soft band select: unnormalized Gaussian bump centered at x0
    (``threshold.hpp:237-258``)."""
    x = jnp.asarray(x)
    xr = (x - x0) / sigma
    return out_a + (out_b - out_a) * jnp.exp(-0.5 * xr * xr)
