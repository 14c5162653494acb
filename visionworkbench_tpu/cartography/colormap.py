"""DEM colorization (ref ``src/vw/Image/Colormap.cc`` and
``tools/colormap.cc``): value -> RGB lookup with the reference's binary-red-
blue style default ramp plus jet; optional hillshade modulation."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr

# The reference's default colormap ("binary red blue" ramp, Colormap.cc).
_BRB_NODES = [
    (0.0, (59, 76, 192)),
    (0.25, (124, 159, 249)),
    (0.5, (221, 221, 221)),
    (0.75, (245, 156, 125)),
    (1.0, (180, 4, 38)),
]

_JET_NODES = [
    (0.0, (0, 0, 131)),
    (0.125, (0, 60, 170)),
    (0.375, (5, 255, 255)),
    (0.625, (255, 255, 0)),
    (0.875, (250, 0, 0)),
    (1.0, (128, 0, 0)),
]


def _build_lut(nodes, size: int = 256) -> np.ndarray:
    xs = np.array([n[0] for n in nodes])
    cols = np.array([n[1] for n in nodes], np.float64) / 255.0
    t = np.linspace(0, 1, size)
    lut = np.stack([np.interp(t, xs, cols[:, c]) for c in range(3)], -1)
    return lut.astype(np.float32)


_LUTS = {"binary-red-blue": _build_lut(_BRB_NODES), "jet": _build_lut(_JET_NODES)}


def colormap(values, lo: Optional[float] = None, hi: Optional[float] = None,
             style: str = "binary-red-blue", nodata: Optional[float] = None,
             shade=None):
    """Map values to RGB in [0, 1]; optionally modulate by a hillshade image
    (ref ``tools/colormap.cc`` --shaded-relief)."""
    if style not in _LUTS:
        raise ArgumentErr(f"unknown colormap style {style!r}; one of {sorted(_LUTS)}")
    values = jnp.asarray(values, jnp.float32)
    valid = jnp.isfinite(values)
    if nodata is not None:
        valid = valid & (values != nodata)
    safe = jnp.where(valid, values, 0.0)
    if lo is None:
        lo = jnp.min(jnp.where(valid, values, jnp.inf))
    if hi is None:
        hi = jnp.max(jnp.where(valid, values, -jnp.inf))
    t = jnp.clip((safe - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    lut = jnp.asarray(_LUTS[style])
    idx = jnp.clip((t * (lut.shape[0] - 1)).astype(jnp.int32), 0, lut.shape[0] - 1)
    rgb = lut[idx]
    if shade is not None:
        rgb = rgb * jnp.asarray(shade, jnp.float32)[..., None]
    return jnp.where(valid[..., None], rgb, 0.0)
