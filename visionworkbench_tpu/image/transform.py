"""Geometric transform views — reverse-mapping warps
(ref ``src/vw/Image/Transform.h:336-570``, ``ImageTransform.h``).

``transform()`` evaluates the destination grid, maps it through the
transform's ``reverse``, and gathers with the chosen interpolation — one
fused XLA gather instead of the reference's per-pixel functor chain
(``TransformView<InterpolationView<EdgeExtensionView<...>>>``). The
grid-sampled ``ApproximateTransform`` speedup (``Transform.h:142-238``) is
unnecessary on TPU for affine/homography maps (the map is already cheap and
vectorized), but ``transform_grid`` provides the same approximation for
expensive reverse maps (e.g. cartographic reprojection through PROJ-style
math on the host).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.math.bbox import BBox2, BBox2i
from visionworkbench_tpu.math.transform2d import (
    ResampleTransform, RotateTransform, Transform2D, TranslateTransform,
)
from visionworkbench_tpu.image.edge import edge_extend
from visionworkbench_tpu.image.interpolation import interpolate, pixel_buffer


def _dest_grid(h: int, w: int):
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return xs, ys


def transform(src, tx, out_shape: Optional[Tuple[int, int]] = None,
              interp: str = "bilinear", edge: str = "zero",
              edge_value: float = 0.0):
    """Warp ``src`` by ``tx`` (a :class:`Transform2D` or a callable
    ``reverse(x, y) -> (sx, sy)``) via reverse mapping
    (ref ``transform()``, Transform.h:485-540).

    Output pixel (x, y) samples the source at ``tx.reverse(x, y)``.
    ``out_shape`` defaults to the source shape.
    """
    src = jnp.asarray(src)
    if out_shape is None:
        out_shape = (src.shape[0], src.shape[1])
    oh, ow = int(out_shape[0]), int(out_shape[1])
    reverse = tx.reverse if isinstance(tx, Transform2D) else tx
    xs, ys = _dest_grid(oh, ow)
    sx, sy = reverse(xs, ys)
    return sample(src, sx, sy, interp=interp, edge=edge, edge_value=edge_value)


def sample(src, sx, sy, interp: str = "bilinear", edge: str = "zero",
           edge_value: float = 0.0):
    """Sample ``src`` at float source coordinates with edge policy: the
    composition ``interpolate(edge_extend(src))`` from the reference."""
    buf = pixel_buffer(interp) + 1
    padded = edge_extend(src, x_pad=buf, y_pad=buf, mode=edge, value=edge_value)
    out = interpolate(padded, jnp.asarray(sx) + buf, jnp.asarray(sy) + buf, interp)
    if edge in ("zero", "value"):
        # Beyond-buffer coordinates must keep returning the fill value, not a
        # clamped border sample.
        h, w = src.shape[0], src.shape[1]
        inside = ((sx > -buf) & (sx < w - 1 + buf) &
                  (sy > -buf) & (sy < h - 1 + buf))
        fill = 0.0 if edge == "zero" else edge_value
        if out.ndim == 3:
            inside = inside[..., None]
        out = jnp.where(inside, out, jnp.asarray(fill, out.dtype))
    return out


def resample(src, xfactor: float, yfactor: Optional[float] = None,
             interp: str = "bilinear", edge: str = "constant"):
    """Scale by a (possibly fractional) factor (ref ``resample``,
    Transform.h:545): output size = ceil(size * factor)."""
    if yfactor is None:
        yfactor = xfactor
    h, w = src.shape[0], src.shape[1]
    out_shape = (int(np.ceil(h * yfactor)), int(np.ceil(w * xfactor)))
    return transform(src, ResampleTransform(xfactor, yfactor), out_shape,
                     interp, edge)


def translate(src, dx: float, dy: float, interp: str = "bilinear",
              edge: str = "zero"):
    """(ref ``translate``, Transform.h:550)"""
    return transform(src, TranslateTransform(dx, dy), None, interp, edge)


def rotate(src, theta: float, interp: str = "bilinear", edge: str = "zero"):
    """Rotate about the image center (ref ``rotate``, Transform.h:556)."""
    h, w = src.shape[0], src.shape[1]
    center = ((w - 1) / 2.0, (h - 1) / 2.0)
    return transform(src, RotateTransform(theta, center), None, interp, edge)


def compute_transformed_bbox(src_shape, tx: Transform2D) -> BBox2i:
    """Forward image of the source box (ref ``compute_transformed_bbox``,
    Transform.h:260)."""
    h, w = src_shape[0], src_shape[1]
    return tx.forward_bbox(BBox2(0, 0, w, h)).rounded()


def transform_grid(src, reverse_fn: Callable, out_shape: Tuple[int, int],
                   grid_step: int = 16, interp: str = "bilinear",
                   edge: str = "zero"):
    """Grid-approximated warp for expensive reverse maps (ref
    ``ApproximateTransform``, Transform.h:142-238): the reverse map is
    evaluated on a coarse host grid and interpolated bilinearly to full
    resolution, then sampled on device.

    ``reverse_fn`` is a host function mapping NumPy (x, y) arrays to source
    coordinates — e.g. a cartographic reprojection.
    """
    oh, ow = int(out_shape[0]), int(out_shape[1])
    gx = np.arange(0, ow + grid_step, grid_step, dtype=np.float64)
    gy = np.arange(0, oh + grid_step, grid_step, dtype=np.float64)
    gxx, gyy = np.meshgrid(gx, gy)
    sx_g, sy_g = reverse_fn(gxx, gyy)
    # Bilinear upsample of the coordinate grids on device.
    sxg = jnp.asarray(sx_g, jnp.float32)
    syg = jnp.asarray(sy_g, jnp.float32)
    xs, ys = _dest_grid(oh, ow)
    fx = xs / grid_step
    fy = ys / grid_step
    sx = interpolate(sxg, fx, fy, "bilinear")
    sy = interpolate(syg, fx, fy, "bilinear")
    return sample(src, sx, sy, interp=interp, edge=edge)
