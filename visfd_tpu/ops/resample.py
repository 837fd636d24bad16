"""Binning (box-average downsample) and unbinning (nearest-neighbor
upsample) of voxel grids.

Equivalents of ``BinArray3D``/``UnbinArray3D``
(``lib/visfd/resample.hpp:53-166``): bin averages each bin_size^3
block (remainder voxels past dest*bin are cropped; an optional window
offset shifts the block origin), unbin replicates each voxel bin_size
times (clamped at edges when sizes do not divide).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bin_array3d(
    x: jax.Array,
    dest_shape_zyx: Tuple[int, int, int],
    offset_xyz: Optional[Sequence[int]] = None,
) -> jax.Array:
    """Box-average downsample to ``dest_shape_zyx``
    (``resample.hpp:53-100``)."""
    nz, ny, nx = x.shape
    dz, dy, dx = dest_shape_zyx
    bz, by, bx = nz // dz, ny // dy, nx // dx
    oz = oy = ox = 0
    if offset_xyz is not None:
        ox, oy, oz = (int(o) for o in offset_xyz)
        for o, b in zip((ox, oy, oz), (bx, by, bz)):
            if not (0 <= o < b):
                raise ValueError("bin offset must lie in [0, bin_size)")
    v = x[oz : oz + dz * bz, oy : oy + dy * by, ox : ox + dx * bx]
    v = v.reshape(dz, bz, dy, by, dx, bx)
    return jnp.mean(v, axis=(1, 3, 5))


def unbin_array3d(
    x: jax.Array,
    dest_shape_zyx: Tuple[int, int, int],
    offset_xyz: Optional[Sequence[int]] = None,
) -> jax.Array:
    """Nearest-neighbor upsample to ``dest_shape_zyx``
    (``resample.hpp:124-166``): dest[I] = src[clamp((I-offset)//bin)].
    """
    sz, sy, sx = x.shape
    dz, dy, dx = dest_shape_zyx
    bz, by, bx = dz // sz, dy // sy, dx // sx
    oz = oy = ox = 0
    if offset_xyz is not None:
        ox, oy, oz = (int(o) for o in offset_xyz)

    def src_idx(n_dest, off, b, n_src):
        i = (np.arange(n_dest) - off) // b
        return np.clip(i, 0, n_src - 1)

    iz = src_idx(dz, oz, bz, sz)
    iy = src_idx(dy, oy, by, sy)
    ix = src_idx(dx, ox, bx, sx)
    return x[jnp.asarray(iz)[:, None, None],
             jnp.asarray(iy)[None, :, None],
             jnp.asarray(ix)[None, None, :]]
