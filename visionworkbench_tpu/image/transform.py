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

import os
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

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
    if (isinstance(tx, Transform2D)
            and os.environ.get("VWTPU_BANDED_WARP", "1") == "1"):
        band = _displacement_band(tx, oh, ow, interp)
        if band is not None:
            return sample_banded(src, sx, sy, band[0], band[1], interp=interp,
                                 edge=edge, edge_value=edge_value)
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


# taps of each interpolation kernel relative to the base index floor(s)
# (floor(s + 0.5) for nearest); weights are functions of the fractional part.
_TAPS = {
    "nearest": (0, 0),
    "bilinear": (0, 1),
    "bicubic": (-1, 2),
}
_BAND_CAP = int(os.environ.get("VWTPU_BAND_CAP", "700"))


def _displacement_band(tx: Transform2D, oh: int, ow: int, interp: str):
    """Host-side integer bounds of the reverse map's displacement
    ``floor(s) - dest`` over the output grid, or None when the banded
    formulation does not apply (degenerate map, too-wide band, unknown
    interp).

    The transform is a static host object, so the bounds are exact up to
    grid sampling; a dense grid + ±2 margin covers the mild curvature of
    projective maps (affine maps are exact from the corners alone).
    """
    if interp not in _TAPS:
        return None
    m = np.asarray(tx._inv, np.float64)
    # Sample corners exactly; interior on a dense grid for projective terms.
    npts = 2 if m[2, 0] == 0.0 and m[2, 1] == 0.0 else 513
    gx, gy = np.meshgrid(np.linspace(0.0, ow - 1.0, npts),
                         np.linspace(0.0, oh - 1.0, npts))
    wn = m[2, 0] * gx + m[2, 1] * gy + m[2, 2]
    if not np.all(np.isfinite(wn)) or np.min(np.abs(wn)) < 1e-8 \
            or np.min(wn) * np.max(wn) <= 0:
        return None  # horizon line crosses (or grazes) the output grid
    sx = (m[0, 0] * gx + m[0, 1] * gy + m[0, 2]) / wn
    sy = (m[1, 0] * gx + m[1, 1] * gy + m[1, 2]) / wn
    if not (np.all(np.isfinite(sx)) and np.all(np.isfinite(sy))):
        return None
    margin = 0 if npts == 2 else 2
    half = 0.5 if interp == "nearest" else 0.0  # nearest base = floor(s+0.5)
    dy = (int(np.floor((sy - gy).min() + half)) - margin,
          int(np.floor((sy - gy).max() + half)) + margin)
    dx = (int(np.floor((sx - gx).min() + half)) - margin,
          int(np.floor((sx - gx).max() + half)) + margin)
    t_lo, t_hi = _TAPS[interp]
    n_shift_y = (dy[1] - dy[0]) + (t_hi - t_lo) + 1
    n_shift_x = (dx[1] - dx[0]) + (t_hi - t_lo) + 1
    if n_shift_y * n_shift_x > _BAND_CAP:
        return None
    return dy, dx


def _axis_weights(s_rel, base_lo: int, base_hi: int, interp: str, ndim: int):
    """Per-absolute-shift weight arrays for one axis.

    ``s_rel`` = source coordinate minus destination index. Returns
    ``{shift: weight_array}`` over shifts ``[base_lo + t_lo, base_hi + t_hi]``
    where the weight at shift d collects every kernel tap t whose base index
    ``floor(s_rel)`` equals ``d - t``.
    """
    t_lo, t_hi = _TAPS[interp]
    if interp == "nearest":
        b = jnp.floor(s_rel + 0.5)
        taps = [(0, jnp.ones_like(s_rel))]
    else:
        b = jnp.floor(s_rel)
        f = s_rel - b
        if interp == "bilinear":
            taps = [(0, 1.0 - f), (1, f)]
        else:  # bicubic: reference Catmull-Rom taps (Interpolation.h:155-158)
            s0 = ((2 - f) * f - 1) * f
            s1 = (3 * f - 5) * f * f + 2
            s2 = ((4 - 3 * f) * f + 1) * f
            s3 = (f - 1) * f * f
            taps = [(-1, s0), (0, s1), (1, s2), (2, s3)]
    b = jnp.clip(b, base_lo, base_hi)
    weights = {}
    for d in range(base_lo + t_lo, base_hi + t_hi + 1):
        w = None
        for t, wt in taps:
            lo, hi = base_lo + t, base_hi + t
            if not (lo <= d <= hi):
                continue
            term = jnp.where(b == d - t, wt, 0.0)
            w = term if w is None else w + term
        if ndim == 3:
            w = w[..., None]
        weights[d] = w
    return weights


def sample_banded(src, sx, sy, dy_bounds: Tuple[int, int],
                  dx_bounds: Tuple[int, int], interp: str = "bilinear",
                  edge: str = "zero", edge_value: float = 0.0):
    """Exact warp sampling for displacement-bounded maps, without gathers.

    Same semantics as :func:`sample`, but requires static integer bounds on
    the displacement ``floor(s) - dest`` per axis (``floor(s + 0.5)`` for
    nearest). The 2D gather — ~11 ms/Mpx on this toolchain — becomes a
    shifted-slice stencil: for every absolute shift (d, e) in the band, the
    output accumulates ``wy_d * wx_e * src[Y + d, X + e]``, where the per-axis
    weights select the kernel taps whose base index lands on that shift.
    Identical results to :func:`sample` (same taps, same weights); the band
    merely enumerates where the taps can fall.
    """
    src = jnp.asarray(src)
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    oh, ow = sx.shape
    h, w = src.shape[0], src.shape[1]
    t_lo, t_hi = _TAPS[interp]
    d_lo, d_hi = dy_bounds[0] + t_lo, dy_bounds[1] + t_hi
    e_lo, e_hi = dx_bounds[0] + t_lo, dx_bounds[1] + t_hi
    top = max(0, -d_lo)
    bot = max(0, (oh - 1 + d_hi) - (h - 1))
    left = max(0, -e_lo)
    right = max(0, (ow - 1 + e_hi) - (w - 1))
    fill = edge_value if edge == "value" else 0.0
    pad_mode = "value" if edge == "value" else edge
    padded = edge_extend(src, x_pad=(left, right), y_pad=(top, bot),
                         mode=pad_mode, value=fill)
    ph, pw = padded.shape[0], padded.shape[1]

    ys = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    wy = _axis_weights(sy - ys, *dy_bounds, interp, src.ndim)
    wx = _axis_weights(sx - xs, *dx_bounds, interp, src.ndim)

    tail = (padded.shape[2],) if src.ndim == 3 else ()
    zeros = (0,) if src.ndim == 3 else ()
    out = None
    for d in range(d_lo, d_hi + 1):
        inner = None
        for e in range(e_lo, e_hi + 1):
            plane = lax.slice(padded, (d + top, e + left) + zeros,
                              (d + top + oh, e + left + ow) + tail)
            term = wx[e] * plane
            inner = term if inner is None else inner + term
        term = wy[d] * inner
        out = term if out is None else out + term
    if interp == "bicubic":
        out = out * 0.25
    if edge in ("zero", "value"):
        buf = pixel_buffer(interp) + 1
        inside = ((sx > -buf) & (sx < w - 1 + buf) &
                  (sy > -buf) & (sy < h - 1 + buf))
        if out.ndim == 3:
            inside = inside[..., None]
        out = jnp.where(inside, out, jnp.asarray(fill, out.dtype))
    return out


def sample_separable(src, sx1, sy1, interp: str = "bilinear",
                     edge: str = "zero", edge_value: float = 0.0):
    """Axis-separable warp as two MXU matmuls.

    When the reverse map factors per axis — ``sx`` depends only on the output
    column and ``sy`` only on the output row (scale/translate maps,
    same-projection cartographic reprojection with diagonal georef
    transforms) — the warp is ``W_y @ src @ W_x^T`` with per-axis tap-weight
    matrices. Same taps and weights as :func:`sample` (exact separable
    kernels), but the cost is two matmuls regardless of displacement band
    width: scale-type maps whose band is too wide for :func:`sample_banded`
    (band area grows ~ |scale-1| * image size) stay gather-free.

    ``sx1``: (ow,) float source x per output column; ``sy1``: (oh,) float
    source y per output row.
    """
    src = jnp.asarray(src)
    sx1 = jnp.asarray(sx1, jnp.float32)
    sy1 = jnp.asarray(sy1, jnp.float32)
    if interp not in _TAPS:
        raise ArgumentErr(f"sample_separable: unknown interp {interp!r}")
    h, w = src.shape[0], src.shape[1]
    buf = pixel_buffer(interp) + 1
    pad = buf + 2
    fill = edge_value if edge == "value" else 0.0
    pad_mode = "value" if edge == "value" else edge
    padded = edge_extend(src, x_pad=pad, y_pad=pad, mode=pad_mode, value=fill)

    def axis_matrix(s, n):
        # (out, n + 2*pad) tap-weight matrix, rows = output index.
        if interp == "nearest":
            b = jnp.floor(s + 0.5)
            taps = [(0, jnp.ones_like(s))]
        else:
            b = jnp.floor(s)
            f = s - b
            if interp == "bilinear":
                taps = [(0, 1.0 - f), (1, f)]
            else:  # Catmull-Rom (Interpolation.h:155-158); global 0.25 factor
                s0 = ((2 - f) * f - 1) * f
                s1 = (3 * f - 5) * f * f + 2
                s2 = ((4 - 3 * f) * f + 1) * f
                s3 = (f - 1) * f * f
                taps = [(-1, s0), (0, s1), (1, s2), (2, s3)]
        bp = (jnp.clip(b, -buf, n - 1 + buf) + pad).astype(jnp.int32)
        jj = lax.broadcasted_iota(jnp.int32, (s.shape[0], n + 2 * pad), 1)
        mat = None
        for t, wt in taps:
            term = jnp.where(jj == (bp + t)[:, None], wt[:, None], 0.0)
            mat = term if mat is None else mat + term
        if interp == "bicubic":
            mat = mat * 0.5   # Catmull-Rom taps carry a global 1/4: 1/2 per axis
        return mat

    w_y = axis_matrix(sy1, h)                      # (oh, h + 2p)
    w_x = axis_matrix(sx1, w)                      # (ow, w + 2p)
    spec_row = "oh,hw...->ow..."
    rows = jnp.einsum(spec_row, w_y, padded, precision=lax.Precision.HIGHEST)
    out = jnp.einsum("ow...,pw->op...", rows, w_x,
                     precision=lax.Precision.HIGHEST)
    if edge in ("zero", "value"):
        inside = ((sx1 > -buf) & (sx1 < w - 1 + buf))[None, :] & \
                 ((sy1 > -buf) & (sy1 < h - 1 + buf))[:, None]
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
                   edge: str = "zero", tolerance: float = 0.5,
                   min_grid_step: int = 2):
    """Grid-approximated warp for expensive reverse maps (ref
    ``ApproximateTransform``, Transform.h:142-238): the reverse map is
    evaluated on a coarse host grid and interpolated bilinearly to full
    resolution, then sampled on device.

    ``reverse_fn`` is a host function mapping NumPy (x, y) arrays to source
    coordinates — e.g. a cartographic reprojection.

    ``tolerance``: maximum allowed grid-approximation error in source
    pixels. The reference only substitutes the approximation "when the
    error bound permits" (Transform.h:142-238); here the error is estimated
    by evaluating the EXACT reverse map at every grid-cell midpoint and
    comparing against the bilinear interpolation of the grid corners (the
    worst case of a bilinear fit sits near mid-cell). The grid step halves
    until the estimate fits the tolerance or reaches ``min_grid_step``
    (<= 0 tolerance disables the check, keeping the requested step).
    """
    sx_g, sy_g, grid_step = reverse_map_grid(reverse_fn, out_shape, grid_step,
                                             tolerance, min_grid_step)
    return warp_from_grid(src, sx_g, sy_g, grid_step, out_shape,
                          interp=interp, edge=edge)


def reverse_map_grid(reverse_fn: Callable, out_shape: Tuple[int, int],
                     grid_step: int = 16, tolerance: float = 0.5,
                     min_grid_step: int = 2):
    """Host half of :func:`transform_grid`: evaluate ``reverse_fn`` on a
    coarse grid, refining ``grid_step`` until the mid-cell bilinear
    approximation error fits ``tolerance`` (ref ``ApproximateTransform``,
    Transform.h:142-238). Returns ``(sx_g, sy_g, grid_step)`` NumPy grids."""
    oh, ow = int(out_shape[0]), int(out_shape[1])
    while True:
        gx = np.arange(0, ow + grid_step, grid_step, dtype=np.float64)
        gy = np.arange(0, oh + grid_step, grid_step, dtype=np.float64)
        gxx, gyy = np.meshgrid(gx, gy)
        sx_g, sy_g = reverse_fn(gxx, gyy)
        if tolerance <= 0 or grid_step <= min_grid_step:
            break
        mx = 0.5 * (gx[:-1] + gx[1:])
        my = 0.5 * (gy[:-1] + gy[1:])
        mxx, myy = np.meshgrid(mx, my)
        ex, ey = reverse_fn(mxx, myy)
        ax = 0.25 * (sx_g[:-1, :-1] + sx_g[:-1, 1:]
                     + sx_g[1:, :-1] + sx_g[1:, 1:])
        ay = 0.25 * (sy_g[:-1, :-1] + sy_g[:-1, 1:]
                     + sy_g[1:, :-1] + sy_g[1:, 1:])
        with np.errstate(invalid="ignore"):
            err = np.nanmax(np.maximum(np.abs(ex - ax), np.abs(ey - ay))) \
                if ex.size else 0.0
        if not np.isfinite(err) or err <= tolerance:
            break
        grid_step = max(grid_step // 2, min_grid_step)
    return np.asarray(sx_g), np.asarray(sy_g), grid_step


def interp_map_grid(sx_g, sy_g, grid_step: int, out_shape: Tuple[int, int]):
    """Device half, part 1: bilinearly upsample host coordinate grids to
    full-resolution per-pixel source coordinates ``(sx, sy)``.

    The upsample coordinates are axis-aligned (``x/step``, ``y/step``), so
    this is the separable two-matmul sampler on the tiny grid — NOT a 2D
    gather: the gather formulation cost ~8.3 ms per 1-Mpx coordinate plane
    on this toolchain and dominated the whole reprojection profile."""
    oh, ow = int(out_shape[0]), int(out_shape[1])
    sxg = jnp.asarray(sx_g, jnp.float32)
    syg = jnp.asarray(sy_g, jnp.float32)
    fx = jnp.arange(ow, dtype=jnp.float32) / grid_step
    fy = jnp.arange(oh, dtype=jnp.float32) / grid_step
    return (sample_separable(sxg, fx, fy, interp="bilinear", edge="constant"),
            sample_separable(syg, fx, fy, interp="bilinear", edge="constant"))


def _grid_axis_1d(g_row, grid_step: int, n: int):
    """Linear interpolation of a 1D host grid row/column to n output
    positions (the per-axis half of :func:`interp_map_grid`)."""
    g = jnp.asarray(g_row, jnp.float32)
    f = jnp.arange(n, dtype=jnp.float32) / grid_step
    k = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, g.shape[0] - 2)
    t = f - k.astype(jnp.float32)
    return g[k] * (1.0 - t) + g[k + 1] * t


# Below this band area the shifted-slice stencil beats two full matmuls;
# above it (scale-type maps: band area grows ~ (|scale-1| * size)^2) the
# separable matmul path wins, and past _BAND_CAP it is the only gather-free
# option.
_SEP_MIN_AREA = int(os.environ.get("VWTPU_SEP_MIN_AREA", "64"))


def warp_from_grid(src, sx_g, sy_g, grid_step: int,
                   out_shape: Tuple[int, int], interp: str = "bilinear",
                   edge: str = "zero"):
    """Device half of :func:`transform_grid`: interpolate the host grids to
    per-pixel coordinates and sample — gather-free via the shifted-slice
    banded sampler (narrow displacement bands) or the separable two-matmul
    sampler (axis-factorable maps), falling back to the XLA gather only when
    neither applies."""
    oh, ow = int(out_shape[0]), int(out_shape[1])
    sx_g = np.asarray(sx_g)
    sy_g = np.asarray(sy_g)
    gxx, gyy = np.meshgrid(
        np.arange(sx_g.shape[1], dtype=np.float64) * grid_step,
        np.arange(sx_g.shape[0], dtype=np.float64) * grid_step)
    if (interp in _TAPS
            and os.environ.get("VWTPU_BANDED_WARP", "1") == "1"
            and np.all(np.isfinite(sx_g)) and np.all(np.isfinite(sy_g))):
        # The full-res coordinates are bilinear blends of the host grid
        # values, so displacement bounds follow from the grid (+1 margin).
        half = 0.5 if interp == "nearest" else 0.0
        dxg = sx_g - gxx + half
        dyg = sy_g - gyy + half
        dy_b = (int(np.floor(dyg.min())) - 1, int(np.floor(dyg.max())) + 1)
        dx_b = (int(np.floor(dxg.min())) - 1, int(np.floor(dxg.max())) + 1)
        t_lo, t_hi = _TAPS[interp]
        n_y = (dy_b[1] - dy_b[0]) + (t_hi - t_lo) + 1
        n_x = (dx_b[1] - dx_b[0]) + (t_hi - t_lo) + 1
        area = n_y * n_x
        # Axis-separability: every grid row of sx identical and every grid
        # column of sy identical (scale/translate maps, same-projection
        # reprojection). Wide-band separable maps take the matmul path.
        separable = (area > _SEP_MIN_AREA
                     and np.ptp(sx_g, axis=0).max() <= 1e-4
                     and np.ptp(sy_g, axis=1).max() <= 1e-4)
        if area <= min(_BAND_CAP, _SEP_MIN_AREA) or \
                (area <= _BAND_CAP and not separable):
            sx, sy = interp_map_grid(sx_g, sy_g, grid_step, out_shape)
            return sample_banded(src, sx, sy, dy_b, dx_b, interp=interp,
                                 edge=edge)
        if separable:
            sx1 = _grid_axis_1d(sx_g[0], grid_step, ow)
            sy1 = _grid_axis_1d(sy_g[:, 0], grid_step, oh)
            return sample_separable(src, sx1, sy1, interp=interp, edge=edge)
    sx, sy = interp_map_grid(sx_g, sy_g, grid_step, out_shape)
    return sample(src, sx, sy, interp=interp, edge=edge)
