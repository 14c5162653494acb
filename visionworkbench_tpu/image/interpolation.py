"""Image interpolation (ref ``src/vw/Image/Interpolation.h:75-190``).

Samples an image at float coordinates ``(x, y)`` = (col, row), vectorized over
arbitrary coordinate-array shapes — the gather-based TPU replacement for the
reference's per-pixel interpolator functors.

Weight formulas match the reference exactly:

* bilinear — separable (1-t, t) (``BilinearInterpolationImpl``,
  ``Interpolation.h:75-112``)
* bicubic  — the reference's 2x Catmull-Rom basis with a global 0.25
  normalization (``BicubicInterpolationImpl``, ``Interpolation.h:138-182``):
  ``s0=((2-t)t-1)t, s1=(3t-5)t^2+2, s2=((4-3t)t+1)t, s3=(t-1)t^2``
* nearest  — round-half-up in each axis (``NearestPixelInterpolation``)

``pixel_buffer(method)`` gives the out-of-bounds reach (1 for bilinear, 2 for
bicubic) so callers can size edge extension, mirroring the reference's
``pixel_buffer`` trait.
"""

from __future__ import annotations

import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr

METHODS = ("nearest", "bilinear", "bicubic")


def pixel_buffer(method: str) -> int:
    return {"nearest": 0, "bilinear": 1, "bicubic": 2}[method]


def _gather(image, xi, yi):
    """Clamped integer gather; image (H, W[, C]), xi/yi int arrays."""
    h, w = image.shape[0], image.shape[1]
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    return image[yi, xi]


def interpolate(image, x, y, method: str = "bilinear"):
    """Sample ``image`` at float (x=col, y=row) coordinates.

    Returns an array of shape ``x.shape`` (plus trailing channel dim if the
    image has one). Out-of-range coordinates clamp to the border; for other
    boundary behavior, :func:`~visionworkbench_tpu.image.edge.edge_extend`
    first and offset the coordinates.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    image = jnp.asarray(image)
    if method == "nearest":
        xi = jnp.floor(x + 0.5).astype(jnp.int32)
        yi = jnp.floor(y + 0.5).astype(jnp.int32)
        return _gather(image, xi, yi)
    if method == "bilinear":
        return _bilinear(image, x, y)
    if method == "bicubic":
        return _bicubic(image, x, y)
    raise ArgumentErr(f"Unknown interpolation method {method!r}; one of {METHODS}")


def _expand(w, image):
    """Broadcast a weight array against optional channel dim."""
    return w[..., None] if image.ndim == 3 else w


def _bilinear(image, x, y):
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    p00 = _gather(image, x0i, y0i)
    p10 = _gather(image, x0i + 1, y0i)
    p01 = _gather(image, x0i, y0i + 1)
    p11 = _gather(image, x0i + 1, y0i + 1)
    tx = _expand(tx, image)
    ty = _expand(ty, image)
    top = p00 * (1 - tx) + p10 * tx
    bot = p01 * (1 - tx) + p11 * tx
    return top * (1 - ty) + bot * ty


def _cubic_weights(t):
    """The reference's bicubic taps (Interpolation.h:155-158); sum == 2."""
    s0 = ((2 - t) * t - 1) * t
    s1 = (3 * t - 5) * t * t + 2
    s2 = ((4 - 3 * t) * t + 1) * t
    s3 = (t - 1) * t * t
    return s0, s1, s2, s3


def _bicubic(image, x, y):
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sx = _cubic_weights(tx)
    sy = _cubic_weights(ty)
    acc = None
    for j in range(4):
        row = None
        for i in range(4):
            p = _gather(image, x0i + (i - 1), y0i + (j - 1))
            term = p * _expand(sx[i], image)
            row = term if row is None else row + term
        term = row * _expand(sy[j], image)
        acc = term if acc is None else acc + term
    return acc * 0.25


def interpolate_image(image, method: str = "bilinear"):
    """Return a sampler closure ``f(x, y)`` (parity with the reference's
    ``interpolate(view, interp)`` wrapper, Interpolation.h:243)."""
    def sampler(x, y):
        return interpolate(image, x, y, method)
    return sampler
