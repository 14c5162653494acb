"""Bayer demosaicing (ref ``src/vw/Camera/BayerFilter.h``): bilinear
interpolation of an RGGB mosaic into RGB, fully vectorized."""

from __future__ import annotations

import jax.numpy as jnp

from visionworkbench_tpu.image.convolution import correlate_2d


def bayer_demosaic(mosaic, pattern: str = "rggb"):
    """(H, W) mosaic -> (H, W, 3) RGB via bilinear kernels."""
    mosaic = jnp.asarray(mosaic, jnp.float32)
    h, w = mosaic.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    pattern = pattern.lower()
    offsets = {"rggb": ((0, 0), (0, 1), (1, 0), (1, 1)),
               "bggr": ((1, 1), (0, 1), (1, 0), (0, 0)),
               "grbg": ((0, 1), (0, 0), (1, 1), (1, 0)),
               "gbrg": ((1, 0), (0, 0), (1, 1), (0, 1))}[pattern]
    (ry, rx), (g1y, g1x), (g2y, g2x), (by, bx) = offsets
    r_mask = ((ys % 2 == ry) & (xs % 2 == rx)).astype(jnp.float32)
    g_mask = (((ys % 2 == g1y) & (xs % 2 == g1x)) |
              ((ys % 2 == g2y) & (xs % 2 == g2x))).astype(jnp.float32)
    b_mask = ((ys % 2 == by) & (xs % 2 == bx)).astype(jnp.float32)

    k_rb = jnp.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 4.0
    k_g = jnp.array([[0, 1, 0], [1, 4, 1], [0, 1, 0]], jnp.float32) / 4.0

    def interp(channel_mask, kern):
        num = correlate_2d(mosaic * channel_mask, kern, edge="reflect")
        den = correlate_2d(channel_mask, kern, edge="reflect")
        return num / jnp.maximum(den, 1e-8)

    r = interp(r_mask, k_rb)
    g = interp(g_mask, k_g)
    b = interp(b_mask, k_rb)
    return jnp.stack([r, g, b], -1)
