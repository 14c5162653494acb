"""DEM hillshading (ref ``src/vw/Cartography/Hillshade.cc:30`` and
``tools/hillshade.cc``): Lambertian shading of the DEM normal field against a
sun direction given by azimuth/elevation."""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from visionworkbench_tpu.image.filters import derivative_filter
from visionworkbench_tpu.image.types import MaskedImage


def hillshade(dem, azimuth: float = 300.0, elevation: float = 20.0,
              scale: float = 1.0, nodata: Optional[float] = None):
    """Shaded relief in [0, 1]; ``scale`` is ground units per pixel (ref
    ``do_hillshade``: light vector from az/el, normals from Sobel-style
    derivatives divided by the pixel scale)."""
    dem = jnp.asarray(dem, jnp.float32)
    az = math.radians(azimuth)
    el = math.radians(elevation)
    light = jnp.asarray([math.sin(az) * math.cos(el),
                         -math.cos(az) * math.cos(el),
                         math.sin(el)], jnp.float32)
    dx = derivative_filter(dem, 1, 0) / scale
    dy = derivative_filter(dem, 0, 1) / scale
    # Surface normal (un-normalized): (-dz/dx, -dz/dy, 1)
    norm = jnp.sqrt(dx * dx + dy * dy + 1.0)
    shaded = (-dx * light[0] - dy * light[1] + light[2]) / norm
    shaded = jnp.clip(shaded, 0.0, 1.0)
    if nodata is not None:
        valid = dem != nodata
        return MaskedImage(jnp.where(valid, shaded, 0.0), valid)
    return shaded
