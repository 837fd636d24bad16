"""Device-mesh construction and voxel-grid shardings.

The reference scales only via intra-node OpenMP loops
(``filter3d.hpp:172`` etc.); the TPU-native equivalent is a
(Z, Y)-block partition of the (Z, Y, X) voxel grid over a named
``jax.sharding.Mesh``.  X (the fastest axis) stays unsharded so it
maps onto vector lanes and 1-D convolutions along X remain local;
stencils across Z/Y shard boundaries use halo exchange
(``visfd_tpu.parallel.halo``) over ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("z", "y")) -> Mesh:
    """Build a (z, y) mesh over the available devices: prefers a
    near-square factorization so halo surface area is minimized."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    # factor n = nz * ny with nz >= ny, nz as small as possible
    best = (n, 1)
    for ny in range(1, int(np.sqrt(n)) + 1):
        if n % ny == 0:
            best = (n // ny, ny)
    nz, ny = best
    arr = np.asarray(devs).reshape(nz, ny)
    return Mesh(arr, axis_names)


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """(Z, Y, X) voxel grid sharded over (z, y); X replicated."""
    return NamedSharding(mesh, P(mesh.axis_names[0], mesh.axis_names[1]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
