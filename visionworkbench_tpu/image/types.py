"""Image conventions and the masked-image container.

The reference carries validity in ``PixelMask<T>`` pixels
(``src/vw/Image/PixelMask.h:105-198``). TPU-natively a struct-of-arrays wins:
``MaskedImage`` is a registered pytree of ``(data, valid)`` where ``valid`` is
a boolean array broadcastable against ``data``'s spatial dims. All mask-
propagating math lives in :mod:`visionworkbench_tpu.image.masks`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class MaskedImage(NamedTuple):
    data: jax.Array   # (H, W[, C]) float32 typically
    valid: jax.Array  # (H, W) bool

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def filled(self, fill_value=0.0) -> jax.Array:
        """Data with invalid pixels replaced by ``fill_value``
        (ref ``apply_mask``, ``src/vw/Image/MaskViews.h``)."""
        v = self.valid
        if self.data.ndim == 3:
            v = v[..., None]
        return jnp.where(v, self.data, jnp.asarray(fill_value, self.data.dtype))


def create_mask(data, nodata_value: Optional[float] = None) -> MaskedImage:
    """Wrap an array with a validity mask (ref ``create_mask``, MaskViews.h):
    pixels equal to ``nodata_value`` (or non-finite, always) are invalid."""
    data = jnp.asarray(data)
    spatial = data if data.ndim == 2 else data[..., 0]
    valid = jnp.isfinite(spatial)
    if nodata_value is not None:
        nd = jnp.asarray(nodata_value, data.dtype)
        if data.ndim == 3:
            valid = valid & jnp.any(data != nd, axis=-1)
        else:
            valid = valid & (data != nd)
    return MaskedImage(data, valid)


def all_valid(data) -> MaskedImage:
    data = jnp.asarray(data)
    spatial_shape = data.shape[:2]
    return MaskedImage(data, jnp.ones(spatial_shape, dtype=bool))


def as_float32(image) -> jax.Array:
    """Convert to the framework compute dtype. Integer images are rescaled to
    [0, 1] following the reference's channel_cast_rescale semantics
    (``src/vw/Image/PixelTypeInfo.h``)."""
    arr = jnp.asarray(image)
    if jnp.issubdtype(arr.dtype, jnp.floating):
        return arr.astype(jnp.float32)
    info = np.iinfo(np.dtype(arr.dtype.name))
    return arr.astype(jnp.float32) / float(info.max)
