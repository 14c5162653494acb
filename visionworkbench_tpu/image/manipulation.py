"""Image manipulation (ref ``src/vw/Image/Manipulation.h:79-``).

crop / subsample / upsample / flips / rotations / transpose / channel and
plane selection as eager jnp ops. Coordinates: x = column, y = row.
"""

from __future__ import annotations

import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.math.bbox import BBox2i


def crop(image, x0=None, y0=None, width=None, height=None, bbox: BBox2i = None):
    """Crop to (x0, y0, w, h) or a BBox2i (ref ``crop``, Manipulation.h:1009).

    The region must lie inside the image (use
    :func:`~visionworkbench_tpu.image.edge.edge_extend` first for out-of-bounds
    crops, as the reference requires an edge-extended view for that).
    """
    if bbox is not None:
        x0, y0 = int(bbox.min_x), int(bbox.min_y)
        width, height = int(bbox.width), int(bbox.height)
    return image[y0:y0 + height, x0:x0 + width]


def subsample(image, xfactor: int, yfactor: int = None):
    """Every Nth pixel starting at (0, 0) (ref ``subsample``, Manipulation.h:584)."""
    if yfactor is None:
        yfactor = xfactor
    return image[::yfactor, ::xfactor]


def subsample2_mxu(image):
    """``subsample(image, 2)`` for 2D float images as two banded selection
    matmuls: strided lane slices lower to gathers on this TPU toolchain
    (~3-4 ms per 1024^2 plane, the round-2 DoG pipeline's top pathology);
    a banded 0/1 MXU matmul selects the even rows/columns exactly."""
    import jax.lax as lax
    h, w = image.shape
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    o_r = lax.broadcasted_iota(jnp.int32, (h2, h), 0)
    i_r = lax.broadcasted_iota(jnp.int32, (h2, h), 1)
    dr = (i_r == 2 * o_r).astype(jnp.float32)
    o_c = lax.broadcasted_iota(jnp.int32, (w2, w), 0)
    i_c = lax.broadcasted_iota(jnp.int32, (w2, w), 1)
    dc = (i_c == 2 * o_c).astype(jnp.float32)
    out = jnp.einsum("oh,hw->ow", dr, jnp.asarray(image, jnp.float32),
                     precision=lax.Precision.HIGHEST)
    return jnp.einsum("ow,pw->op", out, dc, precision=lax.Precision.HIGHEST)


def upsample(image, xfactor: int, yfactor: int = None):
    """Nearest upsample by integer factors (ref ``upsample``)."""
    if yfactor is None:
        yfactor = xfactor
    out = jnp.repeat(image, yfactor, axis=0)
    return jnp.repeat(out, xfactor, axis=1)


def flip_vertical(image):
    return image[::-1, ...]


def flip_horizontal(image):
    return image[:, ::-1, ...]


def rotate_180(image):
    return image[::-1, ::-1, ...]


def rotate_90_cw(image):
    # (x, y) -> (rows-1-y, x): new[y', x'] = old[H-1-x', y']
    return jnp.swapaxes(image, 0, 1)[:, ::-1, ...]


def rotate_90_ccw(image):
    return jnp.swapaxes(image, 0, 1)[::-1, :, ...]


def transpose(image):
    return jnp.swapaxes(image, 0, 1)


def select_channel(image, channel: int):
    if image.ndim == 2:
        if channel != 0:
            raise ArgumentErr("select_channel: single-channel image")
        return image
    return image[..., channel]


def select_plane(image, plane: int):
    """Planes in the reference are a third index; here synonymous with channels."""
    return select_channel(image, plane)


def channels_to_planes(image):
    """(H, W, C) -> (C, H, W) (ref ``channels_to_planes``)."""
    return jnp.moveaxis(image, -1, 0)


def planes_to_channels(image):
    return jnp.moveaxis(image, 0, -1)
