"""Integral images and box/Haar filters
(ref ``src/vw/InterestPoint/IntegralImage.h:42-217`` and ``BoxFilter.h``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr


def integral_image(img):
    """Summed-area table with a zero top row/left column, so
    ``box = I[y1, x1] - I[y0, x1] - I[y1, x0] + I[y0, x0]`` sums
    ``img[y0:y1, x0:x1]`` (ref ``IntegralImage.h:42-91``)."""
    img = jnp.asarray(img, jnp.float32)
    s = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)))


def integral_box_sum(ii, x0, y0, x1, y1):
    """Sum of img[y0:y1, x0:x1] from the integral image; index args may be
    arrays (vectorized box queries)."""
    return ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]


def box_filter_same(img, size: int):
    """Centered box sum via the integral image (O(1) per pixel regardless of
    size — the property the OBALoG detector exploits)."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    r = size // 2
    padded = jnp.pad(img, ((r + 1, r + 1), (r + 1, r + 1)), mode="edge")
    ii = integral_image(padded)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + 1
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + 1
    return integral_box_sum(ii, xs, ys, xs + size, ys + size)


def haar_x(img, size: int):
    """Horizontal Haar wavelet response: right half minus left half
    (ref ``IntegralImage.h:131-217``)."""
    if size % 2:
        raise ArgumentErr("haar size must be even")
    half = size // 2
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    padded = jnp.pad(img, ((size, size), (size, size)), mode="edge")
    ii = integral_image(padded)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + size
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + size
    y0, y1 = ys - half, ys + half
    left = integral_box_sum(ii, xs - half, y0, xs, y1)
    right = integral_box_sum(ii, xs, y0, xs + half, y1)
    return right - left


def haar_y(img, size: int):
    if size % 2:
        raise ArgumentErr("haar size must be even")
    half = size // 2
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    padded = jnp.pad(img, ((size, size), (size, size)), mode="edge")
    ii = integral_image(padded)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + size
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + size
    x0, x1 = xs - half, xs + half
    top = integral_box_sum(ii, x0, ys - half, x1, ys)
    bot = integral_box_sum(ii, x0, ys, x1, ys + half)
    return bot - top


def obalog_interest(img, scale_level: int = 0):
    """Optimized Box Approximation of the Laplacian of Gaussian
    (ref ``IntegralInterestOperator.h:43-79``): a center-surround
    difference-of-box-sums response computed from the integral image; box
    sizes double per scale level."""
    inner = 3 * (1 << scale_level)
    outer = 3 * inner
    if inner % 2 == 0:
        inner += 1
    if outer % 2 == 0:
        outer += 1
    s_in = box_filter_same(img, inner)
    s_out = box_filter_same(img, outer)
    # Normalize to zero response on constant images.
    return s_in / (inner * inner) - s_out / (outer * outer)
