"""Image statistics (ref ``src/vw/Image/Statistics.h``): min/max/mean/stddev
and histograms, with masked variants that ignore invalid pixels."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from visionworkbench_tpu.image.types import MaskedImage


def min_pixel_value(image):
    return jnp.min(image)


def max_pixel_value(image):
    return jnp.max(image)


def min_max_pixel_values(image) -> Tuple:
    return jnp.min(image), jnp.max(image)


def mean_pixel_value(image):
    return jnp.mean(image)


def stddev_pixel_value(image):
    return jnp.std(image)


def sum_of_pixel_values(image):
    return jnp.sum(image)


def _masked(mi: MaskedImage):
    data = mi.data
    valid = mi.valid
    if data.ndim == 3:
        valid = valid[..., None]
    return data, valid


def masked_mean(mi: MaskedImage):
    data, valid = _masked(mi)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, data, 0.0)) / count


def masked_min(mi: MaskedImage, fill=jnp.inf):
    data, valid = _masked(mi)
    return jnp.min(jnp.where(valid, data, fill))


def masked_max(mi: MaskedImage, fill=-jnp.inf):
    data, valid = _masked(mi)
    return jnp.max(jnp.where(valid, data, fill))


def masked_stddev(mi: MaskedImage):
    data, valid = _masked(mi)
    count = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid, data, 0.0)) / count
    var = jnp.sum(jnp.where(valid, (data - mean) ** 2, 0.0)) / count
    return jnp.sqrt(var)


def histogram(image, num_bins: int, lo=None, hi=None,
              valid: Optional[jnp.ndarray] = None):
    """Histogram over [lo, hi] with ``num_bins`` buckets (ref ``histogram``,
    Statistics.h); masked pixels excluded when ``valid`` given."""
    image = jnp.asarray(image)
    if lo is None:
        lo = jnp.min(image)
    if hi is None:
        hi = jnp.max(image)
    span = jnp.where(hi == lo, 1.0, hi - lo)
    idx = jnp.clip(((image - lo) / span * num_bins).astype(jnp.int32), 0, num_bins - 1)
    weights = None
    if valid is not None:
        weights = valid.astype(jnp.float32)
    return jnp.zeros((num_bins,), jnp.float32).at[idx.reshape(-1)].add(
        1.0 if weights is None else weights.reshape(-1))


def cdf_quantile(image, quantile: float, num_bins: int = 1024,
                 valid: Optional[jnp.ndarray] = None):
    """Approximate quantile via histogram CDF (the role of the reference's
    ``CDFAccumulator``, ``src/vw/Math/CDFAccumulator.cc`` — dense histogram
    instead of streaming percentiles, which suits one-shot device arrays)."""
    image = jnp.asarray(image)
    lo = jnp.min(image)
    hi = jnp.max(image)
    hist = histogram(image, num_bins, lo, hi, valid)
    cdf = jnp.cumsum(hist)
    total = cdf[-1]
    target = quantile * total
    bin_idx = jnp.searchsorted(cdf, target)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)
    return lo + (bin_idx + 0.5) / num_bins * (hi - lo)
