"""Halo exchange for sharded stencils.

Inside ``shard_map``, each device holds a (Z/nz, Y/ny, X) block.
Stencils (separable conv, FD Hessian, tensor voting windows) need
``halo`` rows of neighbor data along each sharded axis.  ``halo_pad``
fetches those rows with ``jax.lax.ppermute`` (ICI neighbor exchange)
and zero-fills at the global boundary, so a local zero-padded stencil
over the haloed block reproduces the unsharded zero-padded stencil
exactly (the reference's boundary convention, ``filter1d.hpp:93-99``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def halo_pad(x: jax.Array, halo: int, axis: int, axis_name: str) -> jax.Array:
    """Return x extended by ``halo`` rows on both sides of ``axis``,
    filled from ring neighbors along ``axis_name`` (zeros at the
    global edges). Must be called inside shard_map."""
    if halo == 0:
        return x
    n_shards = jax.lax.axis_size(axis_name)
    if n_shards == 1:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (halo, halo)
        return jnp.pad(x, pad)
    idx = jax.lax.axis_index(axis_name)

    # slab this shard sends to its +1 neighbor (our trailing rows)
    sl_hi = [slice(None)] * x.ndim
    sl_hi[axis] = slice(x.shape[axis] - halo, x.shape[axis])
    send_up = x[tuple(sl_hi)]
    # slab sent to the -1 neighbor (our leading rows)
    sl_lo = [slice(None)] * x.ndim
    sl_lo[axis] = slice(0, halo)
    send_down = x[tuple(sl_lo)]

    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_below = jax.lax.ppermute(send_up, axis_name, fwd)
    from_above = jax.lax.ppermute(send_down, axis_name, bwd)

    # zero-fill the wrapped-around slabs at the global boundary
    zero = jnp.zeros_like(from_below)
    from_below = jnp.where(idx == 0, zero, from_below)
    from_above = jnp.where(idx == n_shards - 1, zero, from_above)
    return jnp.concatenate([from_below, x, from_above], axis=axis)


def halo_pad_2d(x: jax.Array, halo_z: int, halo_y: int,
                z_name: str = "z", y_name: str = "y") -> jax.Array:
    """Halo-pad axes 0 (z) and 1 (y) of a (Z, Y, X[, C]) block.
    Corner regions are filled correctly because the y exchange runs
    after the z exchange (slabs already include z halos)."""
    x = halo_pad(x, halo_z, 0, z_name)
    x = halo_pad(x, halo_y, 1, y_name)
    return x
