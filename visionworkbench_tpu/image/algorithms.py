"""Per-image algorithms (ref ``src/vw/Image/Algorithms.h:33-266`` and
``AlgorithmFunctions.h``): clamp / normalize / threshold / fill, grassfire
distance, blob labeling helpers live in :mod:`visionworkbench_tpu.image.morphology`.
"""

from __future__ import annotations

import jax.numpy as jnp


def clamp(image, low=0.0, high=1.0):
    """(ref ``clamp``, Algorithms.h:60)"""
    return jnp.clip(image, low, high)


def normalize(image, new_low=0.0, new_high=1.0, old_low=None, old_high=None,
              valid=None):
    """Rescale [old_low, old_high] -> [new_low, new_high]; old range defaults
    to the image min/max over all channels — the reference's auto-detecting
    ``normalize`` overloads (ref ``AutoNormalize.h:1-90``, which call
    ``min_max_channel_values``; explicit-range form: Algorithms.h:110-160).
    ``valid`` restricts the auto range to a boolean mask, matching the
    PixelMask behavior of ``min_max_channel_values`` (invalid pixels are
    skipped when detecting the range but still rescaled)."""
    image = jnp.asarray(image)
    if valid is not None and (old_low is None or old_high is None):
        v = jnp.asarray(valid).astype(bool)
        if v.ndim < image.ndim:
            v = v[..., None]
        if old_low is None:
            old_low = jnp.min(jnp.where(v, image, jnp.inf))
        if old_high is None:
            old_high = jnp.max(jnp.where(v, image, -jnp.inf))
    if old_low is None:
        old_low = jnp.min(image)
    if old_high is None:
        old_high = jnp.max(image)
    old_range = old_high - old_low
    # Degenerate range maps everything to new_low, as the reference does.
    scale = jnp.where(old_range == 0, 0.0, (new_high - new_low) /
                      jnp.where(old_range == 0, 1.0, old_range))
    return (image - old_low) * scale + new_low


def threshold(image, thresh=0.0, low=0.0, high=1.0):
    """Binary threshold: > thresh -> high else low (ref ``threshold``,
    Algorithms.h:206-240)."""
    return jnp.where(jnp.asarray(image) > thresh, high, low)


def fill(shape_or_image, value, dtype=jnp.float32):
    """Constant image (ref eager ``fill``, AlgorithmFunctions.h)."""
    if hasattr(shape_or_image, "shape"):
        return jnp.full(shape_or_image.shape, value, shape_or_image.dtype)
    return jnp.full(shape_or_image, value, dtype)


def _alpha_of(image, valid=None):
    """Alpha plane of an image: an explicit ``valid`` mask (MaskedImage
    convention), else the last channel of an even-channel array (GrayA /
    RGBA), else None (no alpha => opaque, like ``PixelHasAlpha``)."""
    if valid is not None:
        return jnp.asarray(valid).astype(jnp.float32)
    image = jnp.asarray(image)
    if image.ndim == 3 and image.shape[-1] in (2, 4):
        return image[..., -1]
    return None


def is_opaque(image, valid=None) -> bool:
    """True iff the image is entirely opaque (ref ``is_opaque``,
    ``ImageOpacity.h:33-52``: alpha-less pixel types are opaque by
    definition; otherwise every pixel's alpha must be at maximum). Host-side
    query — concretizes, like the reference's pixel loop."""
    import numpy as np
    a = _alpha_of(image, valid)
    if a is None:
        return True
    return bool(np.all(np.asarray(a) >= 1.0))


def is_transparent(image, valid=None) -> bool:
    """True iff the image is entirely transparent (ref ``is_transparent``,
    ``ImageOpacity.h:54-76``: alpha-less pixel types are never
    transparent)."""
    import numpy as np
    a = _alpha_of(image, valid)
    if a is None:
        return False
    return bool(np.all(np.asarray(a) <= 0.0))


def nonzero_data_bounding_box(image, nodata=0.0):
    """Tight box around pixels != nodata (ref ``nonzero_data_bounding_box``,
    ``ImageOpacity.h:78-123``). Host-side: concretizes. Returns a BBox2i
    (empty if no valid data)."""
    import numpy as np
    from visionworkbench_tpu.math.bbox import BBox2i
    arr = np.asarray(image)
    spatial = arr if arr.ndim == 2 else arr.any(axis=-1)
    mask = spatial != nodata
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return BBox2i(0, 0, 0, 0)
    return BBox2i.from_bounds(int(xs.min()), int(ys.min()),
                              int(xs.max()) + 1, int(ys.max()) + 1)
