"""Mask views and mask-propagating math (ref ``src/vw/Image/MaskViews.h`` and
``PixelMask.h:105-198``).

The reference's masked pixel lattice: a binary op's result is valid iff both
operands are valid; unary ops preserve validity. Struct-of-arrays here.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from visionworkbench_tpu.image.types import MaskedImage, create_mask, all_valid  # noqa: F401 (re-export)


def apply_mask(mi: MaskedImage, fill_value=0.0):
    """Collapse to a plain array with invalid pixels filled
    (ref ``apply_mask``, MaskViews.h)."""
    return mi.filled(fill_value)


def copy_mask(data, mask_source: MaskedImage) -> MaskedImage:
    """New image carrying another image's validity (ref ``copy_mask``)."""
    return MaskedImage(jnp.asarray(data), mask_source.valid)


def invert_mask(mi: MaskedImage) -> MaskedImage:
    return MaskedImage(mi.data, ~mi.valid)


def validate_all(mi: MaskedImage) -> MaskedImage:
    return MaskedImage(mi.data, jnp.ones_like(mi.valid))


def invalidate_all(mi: MaskedImage) -> MaskedImage:
    return MaskedImage(mi.data, jnp.zeros_like(mi.valid))


def intersect_masks(*mis: MaskedImage) -> jnp.ndarray:
    valid = mis[0].valid
    for m in mis[1:]:
        valid = valid & m.valid
    return valid


def union_masks(*mis: MaskedImage) -> jnp.ndarray:
    valid = mis[0].valid
    for m in mis[1:]:
        valid = valid | m.valid
    return valid


def edge_mask(image, edge_value=0.0) -> MaskedImage:
    """Invalidate the border region of constant ``edge_value`` pixels creeping
    in from each edge (ref ``edge_mask``, MaskViews.h). Computed with four
    directional running scans (cummax of "not edge value").
    """
    image = jnp.asarray(image)
    spatial = image if image.ndim == 2 else image[..., 0]
    interior = spatial != edge_value
    seen_l = jnp.cumsum(interior, axis=1) > 0
    seen_r = jnp.cumsum(interior[:, ::-1], axis=1)[:, ::-1] > 0
    seen_t = jnp.cumsum(interior, axis=0) > 0
    seen_b = jnp.cumsum(interior[::-1, :], axis=0)[::-1, :] > 0
    valid = seen_l & seen_r & seen_t & seen_b
    return MaskedImage(image, valid)


def masked_unary(fn: Callable, mi: MaskedImage) -> MaskedImage:
    """Unary op preserving validity (ref unary PixelMask math)."""
    return MaskedImage(fn(mi.data), mi.valid)


def masked_binary(fn: Callable, a: MaskedImage, b) -> MaskedImage:
    """Binary op; result valid where both inputs valid (ref binary PixelMask
    math lattice, PixelMask.h)."""
    if isinstance(b, MaskedImage):
        return MaskedImage(fn(a.data, b.data), a.valid & b.valid)
    return MaskedImage(fn(a.data, b), a.valid)
