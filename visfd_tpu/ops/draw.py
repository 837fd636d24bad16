"""Region painting and sphere annotation.

Parity with ``lib/visfd/draw.hpp``:

* ``draw_regions`` -- paint rect/sphere primitives; negative values
  subtract voxels from the mask set (with the all-ones initialization
  special case) (``draw.hpp:88-224``);
* ``draw_spheres`` -- render spherical shells per blob with
  diameter/thickness/brightness vectors, background offset/rescale/
  normalize options (``draw.hpp:235-465``).

These operate on host numpy arrays: they paint tiny lists of
primitives into images (cold path); the hot voxel math stays on
device elsewhere.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Rect:
    xmin: float
    xmax: float
    ymin: float
    ymax: float
    zmin: float
    zmax: float
    value: float = 1.0


@dataclasses.dataclass
class Sphere:
    x0: float
    y0: float
    z0: float
    r: float
    value: float = 1.0


def draw_regions(
    dest: np.ndarray,
    regions: Sequence,
    mask: Optional[np.ndarray] = None,
    negative_means_subtract: bool = False,
) -> np.ndarray:
    """Paint regions into ``dest`` in order (``draw.hpp:88-224``).
    Modifies and returns ``dest``."""
    nz, ny, nx = dest.shape
    valid = None if mask is None else (np.asarray(mask) != 0)

    if negative_means_subtract and regions and regions[0].value < 0:
        sel = valid if valid is not None else np.ones(dest.shape, bool)
        if not (dest[sel] != 0).any():
            dest[sel] = 1.0

    for reg in regions:
        value = reg.value
        if isinstance(reg, Sphere):
            R = reg.r
            ri = int(np.ceil(R - 0.5))
            cx = int(np.floor(reg.x0 + 0.5))
            cy = int(np.floor(reg.y0 + 0.5))
            cz = int(np.floor(reg.z0 + 0.5))
            for jz in range(-ri, ri + 1):
                for jy in range(-ri, ri + 1):
                    descr = R * R - (jy * jy + jz * jz)
                    if descr < 0:
                        continue
                    xr = int(np.floor(np.sqrt(descr)))
                    z, y = cz + jz, cy + jy
                    if not (0 <= z < nz and 0 <= y < ny):
                        continue
                    x0 = max(cx - xr, 0)
                    x1 = min(cx + xr, nx - 1)
                    if x0 > x1:
                        continue
                    row = slice(x0, x1 + 1)
                    ok = np.ones(x1 + 1 - x0, bool)
                    if valid is not None:
                        ok &= valid[z, y, row]
                    if value < 0:
                        if negative_means_subtract:
                            seg = dest[z, y, row]
                            seg[ok & (seg > 0)] = 0.0
                            dest[z, y, row] = seg
                    else:
                        seg = dest[z, y, row]
                        seg[ok] = value
                        dest[z, y, row] = seg
        elif isinstance(reg, Rect):
            ix0 = int(np.floor(reg.xmin + 0.5))
            ix1 = int(np.floor(reg.xmax + 0.5))
            iy0 = int(np.floor(reg.ymin + 0.5))
            iy1 = int(np.floor(reg.ymax + 0.5))
            iz0 = int(np.floor(reg.zmin + 0.5))
            iz1 = int(np.floor(reg.zmax + 0.5))
            zsl = slice(max(iz0, 0), min(iz1, nz - 1) + 1)
            ysl = slice(max(iy0, 0), min(iy1, ny - 1) + 1)
            xsl = slice(max(ix0, 0), min(ix1, nx - 1) + 1)
            box = dest[zsl, ysl, xsl]
            ok = np.ones(box.shape, bool)
            if valid is not None:
                ok &= valid[zsl, ysl, xsl]
            if value < 0:
                if negative_means_subtract:
                    box[ok & (box > 0)] = 0.0
            else:
                box[ok] = value
            dest[zsl, ysl, xsl] = box
        else:
            raise TypeError(f"unknown region type {type(reg)}")
    return dest


def draw_spheres(
    dest_shape_zyx: Tuple[int, int, int],
    centers_xyz: np.ndarray,          # (N, 3) float voxel coords
    diameters: Optional[np.ndarray] = None,
    shell_thicknesses: Optional[np.ndarray] = None,
    foreground: Optional[np.ndarray] = None,   # per-sphere brightness
    background: Optional[np.ndarray] = None,   # (Z, Y, X) image
    mask: Optional[np.ndarray] = None,
    background_offset: float = 0.0,
    background_rescale: float = 1.0,
    background_normalize: bool = False,
    foreground_normalize: bool = False,
) -> np.ndarray:
    """Render spheres/shells over an (optional) background image
    (``draw.hpp:235-465``)."""
    nz, ny, nx = dest_shape_zyx
    n = len(centers_xyz)
    if diameters is None:
        diameters = np.zeros(n)
    if shell_thicknesses is None:
        shell_thicknesses = np.asarray(diameters) / 2
    if foreground is None:
        foreground = np.ones(n)
    valid = None if mask is None else (np.asarray(mask) != 0)

    dest = np.zeros(dest_shape_zyx, np.float32)
    if background is not None:
        if not background_normalize:
            dest[:] = np.asarray(background) * background_rescale
        else:
            sel = valid if valid is not None else np.ones(dest.shape, bool)
            bg = np.asarray(background, np.float64)
            ave = bg[sel].mean() if sel.any() else 0.0
            std = bg[sel].std() if sel.any() else 0.0
            rms = np.sqrt(np.mean(np.square(foreground))) if n else 1.0
            if std > 0:
                dest[:] = (((bg - ave) / std) * rms
                           * background_rescale).astype(np.float32)
            else:
                dest[:] = 0.0
    dest += background_offset

    for i in range(n):
        cx, cy, cz = (int(c) for c in centers_xyz[i])
        rs = max(int(np.ceil(diameters[i] / 2 - 0.5)), 0)
        r2max = (diameters[i] / 2) ** 2
        r2min = 0.0
        if (shell_thicknesses[i] > 0
                and diameters[i] / 2 - shell_thicknesses[i] > 0):
            r2min = (diameters[i] / 2 - shell_thicknesses[i]) ** 2
        mult = 1.0
        if foreground_normalize:
            cnt = 0
            for jz in range(-rs, rs + 1):
                for jy in range(-rs, rs + 1):
                    for jx in range(-rs, rs + 1):
                        z, y, x = cz + jz, cy + jy, cx + jx
                        if not (0 <= z < nz and 0 <= y < ny and 0 <= x < nx):
                            continue
                        if valid is not None and not valid[z, y, x]:
                            continue
                        r2 = jx * jx + jy * jy + jz * jz
                        if r2min <= r2 <= r2max:
                            cnt += 1
            if cnt > 0:
                mult = 1.0 / cnt
        for jz in range(-rs, rs + 1):
            for jy in range(-rs, rs + 1):
                for jx in range(-rs, rs + 1):
                    r2 = jx * jx + jy * jy + jz * jz
                    if not (r2min <= r2 <= r2max):
                        continue
                    z, y, x = cz + jz, cy + jy, cx + jx
                    if not (0 <= z < nz and 0 <= y < ny and 0 <= x < nx):
                        continue
                    if valid is not None and not valid[z, y, x]:
                        continue
                    dest[z, y, x] = foreground[i] * mult
    return dest
