"""Morphology and distance ops (ref ``src/vw/Image/Grassfire.cc``,
``BlobIndex.cc``, ``ErodeView.h``, ``FillHoles.h``, ``DistanceFunction.cc``).

TPU formulations:

* ``grassfire`` — the reference's two-pass chamfer sweep is sequential; the
  Manhattan distance transform is separable into per-axis min-plus scans,
  and a min-plus scan is an ``associative_scan`` over (value - index) — so
  the whole transform is 4 log-depth scans, fully lane-parallel.
* ``blob_index`` — connected components by iterative min-label propagation
  with pointer jumping (``lax.while_loop`` to fixpoint); labels = min flat
  index in the component (deterministic).
* erode/dilate — min/max ``reduce_window``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(1e9)


def _minplus_scan(seed, axis: int):
    """c_i = min_j (seed_j + |i - j|) along ``axis`` via two associative
    running-min scans of (seed - i) / (seed_rev - i)."""
    n = seed.shape[axis]
    shape = [1] * seed.ndim
    shape[axis] = n
    idx = jnp.arange(n, dtype=seed.dtype).reshape(shape)
    fwd = lax.associative_scan(jnp.minimum, seed - idx, axis=axis) + idx
    rev = jnp.flip(seed, axis)
    bwd = lax.associative_scan(jnp.minimum, rev - idx, axis=axis) + idx
    bwd = jnp.flip(bwd, axis)
    return jnp.minimum(fwd, bwd)


@jax.jit
def grassfire(valid):
    """Manhattan (4-connected) distance to the nearest invalid pixel or image
    border (ref ``grassfire``, Grassfire.cc: zero pixels have distance 0,
    border-adjacent valid pixels distance 1). ``valid``: bool or nonzero
    array; returns int32 distances."""
    valid = jnp.asarray(valid)
    if valid.dtype != jnp.bool_:
        valid = valid != 0
    seed = jnp.where(valid, _INF, 0.0)
    # Virtual zero border: pad one pixel of 0 on each side, crop at the end.
    seed = jnp.pad(seed, 1, constant_values=0.0)
    d = _minplus_scan(seed, 0)
    d = _minplus_scan(d, 1)
    return d[1:-1, 1:-1].astype(jnp.int32)


def grassfire_np(valid):
    """Host NumPy twin of :func:`grassfire` for STATIC masks (the mosaic
    planner precomputes source alphas at plan time, like the reference's
    cached per-source grassfire generators, ``ImageComposite.h:184`` —
    the device associative scans cost ~2.6 ms per 1-Mpx mask on TPU and
    are pure constants when the mask comes from a reprojection plan)."""
    import numpy as np
    v = np.asarray(valid)
    if v.dtype != np.bool_:
        v = v != 0
    seed = np.where(v, 1e9, 0.0)
    seed = np.pad(seed, 1, constant_values=0.0)
    for axis in (0, 1):
        n = seed.shape[axis]
        shape = [1, 1]
        shape[axis] = n
        idx = np.arange(n, dtype=seed.dtype).reshape(shape)
        fwd = np.minimum.accumulate(seed - idx, axis=axis) + idx
        rev = np.flip(seed, axis)
        bwd = np.flip(np.minimum.accumulate(rev - idx, axis=axis) + idx,
                      axis)
        seed = np.minimum(fwd, bwd)
    return seed[1:-1, 1:-1].astype(np.int32)


@jax.jit
def euclidean_distance_sq(valid):
    """Exact squared-Euclidean distance to the nearest invalid pixel (the
    role of ``DistanceFunction.cc``): 1D Manhattan pass along x (exact within
    a row), then a row-offset sweep ``min_k (dx2[y+k] + k^2)``."""
    valid = jnp.asarray(valid)
    if valid.dtype != jnp.bool_:
        valid = valid != 0
    seed = jnp.where(valid, _INF, 0.0)
    dx = _minplus_scan(seed, 1)
    dx2 = jnp.minimum(dx * dx, _INF)
    h = valid.shape[0]

    def body(k, best):
        up = jnp.pad(dx2, ((0, k), (0, 0)), constant_values=_INF)[k:]
        dn = jnp.pad(dx2, ((k, 0), (0, 0)), constant_values=_INF)[:h]
        return jnp.minimum(best, jnp.minimum(up, dn) + jnp.float32(k * k))

    # dynamic shifts need dynamic_slice; use a scan over k with roll-free pads
    def body_dyn(k, best):
        up = lax.dynamic_slice(
            jnp.pad(dx2, ((0, h), (0, 0)), constant_values=_INF), (k, 0),
            dx2.shape)
        dn = lax.dynamic_slice(
            jnp.pad(dx2, ((h, 0), (0, 0)), constant_values=_INF), (h - k, 0),
            dx2.shape)
        return jnp.minimum(best, jnp.minimum(up, dn) + (k * k).astype(jnp.float32))

    best = lax.fori_loop(1, h, body_dyn, dx2)
    return best


@functools.partial(jax.jit, static_argnames=("connectivity",))
def blob_index(mask, connectivity: int = 4):
    """Label connected components of ``mask`` (ref ``BlobIndexThreaded``,
    BlobIndex.cc). Returns int32 labels: -1 outside, else the min flat index
    of the component."""
    mask = jnp.asarray(mask)
    if mask.dtype != jnp.bool_:
        mask = mask != 0
    h, w = mask.shape
    init = jnp.where(mask,
                     jnp.arange(h * w, dtype=jnp.int32).reshape(h, w),
                     jnp.int32(h * w))
    big = jnp.int32(h * w)

    def neighbors_min(lbl):
        up = jnp.pad(lbl, ((1, 0), (0, 0)), constant_values=big)[:-1, :]
        dn = jnp.pad(lbl, ((0, 1), (0, 0)), constant_values=big)[1:, :]
        lf = jnp.pad(lbl, ((0, 0), (1, 0)), constant_values=big)[:, :-1]
        rt = jnp.pad(lbl, ((0, 0), (0, 1)), constant_values=big)[:, 1:]
        out = jnp.minimum(jnp.minimum(lbl, up), jnp.minimum(dn, lf))
        out = jnp.minimum(out, rt)
        if connectivity == 8:
            ul = jnp.pad(lbl, ((1, 0), (1, 0)), constant_values=big)[:-1, :-1]
            ur = jnp.pad(lbl, ((1, 0), (0, 1)), constant_values=big)[:-1, 1:]
            dl = jnp.pad(lbl, ((0, 1), (1, 0)), constant_values=big)[1:, :-1]
            dr = jnp.pad(lbl, ((0, 1), (0, 1)), constant_values=big)[1:, 1:]
            out = jnp.minimum(jnp.minimum(out, ul),
                              jnp.minimum(ur, jnp.minimum(dl, dr)))
        return jnp.where(mask, out, big)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        lbl, _ = state
        new = neighbors_min(lbl)
        # Pointer jumping: follow the label's label to shortcut long chains.
        flat = new.reshape(-1)
        safe = jnp.minimum(flat, big - 1)
        jumped = jnp.where(flat < big,
                           jnp.minimum(flat, jnp.take(flat, safe)), flat)
        new = jumped.reshape(lbl.shape)
        return (new, jnp.any(new != lbl))

    lbl, _ = lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return jnp.where(mask, lbl, -1)


def blob_areas(labels):
    """Per-pixel area of the blob each pixel belongs to."""
    labels = jnp.asarray(labels)
    h, w = labels.shape
    flat = labels.reshape(-1)
    safe = jnp.where(flat >= 0, flat, 0)
    counts = jnp.zeros((h * w,), jnp.int32).at[safe].add(
        jnp.where(flat >= 0, 1, 0))
    area = jnp.take(counts, safe)
    return jnp.where(flat >= 0, area, 0).reshape(h, w)


def remove_small_blobs(mask, min_area: int, connectivity: int = 4):
    """Keep only components with area >= min_area (ref ``applyErodeView`` +
    ``BlobIndexThreaded`` in ``disparity_blob_filter``,
    CorrelationView.cc:241-280)."""
    labels = blob_index(mask, connectivity)
    area = blob_areas(labels)
    return jnp.asarray(mask).astype(bool) & (area >= min_area)


def blob_sizes(mask, size_limit: int, connectivity: int = 4):
    """Per-pixel size of the containing blob, capped at ``size_limit``
    (ref ``get_blob_sizes``, BlobIndex.h:613; the reference approximates
    per-tile with an expand collar — labeling the whole image here is exact).
    Pixels outside the mask get 0 (the reference's BLOBS_NODATA)."""
    labels = blob_index(mask, connectivity)
    area = blob_areas(labels)
    return jnp.minimum(area, size_limit).astype(jnp.uint32)


def two_threshold_fill(image, low_threshold: float, high_threshold: float,
                       output_false: int = 0, output_true: int = 1):
    """Hysteresis fill: seed at pixels > high_threshold, grow through
    8-connected pixels > low_threshold (ref ``two_threshold_fill``,
    ImageSurface.h:324; the reference's tile-expanded raster sweeps
    approximate this closure — blob labeling computes it exactly)."""
    img = jnp.asarray(image, jnp.float32)
    low_mask = img > low_threshold
    seeds = img > high_threshold
    labels = blob_index(low_mask, connectivity=8)
    h, w = labels.shape
    flat = labels.reshape(-1)
    safe = jnp.where(flat >= 0, flat, 0)
    has_seed = jnp.zeros((h * w,), jnp.bool_).at[safe].max(
        seeds.reshape(-1) & (flat >= 0))
    filled = (jnp.take(has_seed, safe) & (flat >= 0)).reshape(h, w)
    return jnp.where(filled, jnp.uint8(output_true),
                     jnp.uint8(output_false))


def _window_minmax(image, size: int, is_max: bool, edge_value):
    pad = size // 2
    padded = jnp.pad(jnp.asarray(image, jnp.float32),
                     ((pad, size - 1 - pad), (pad, size - 1 - pad)),
                     constant_values=edge_value)
    op = lax.max if is_max else lax.min
    init = -_INF if is_max else _INF
    return lax.reduce_window(padded, init, op, (size, size), (1, 1), "VALID")


def erode(mask, size: int = 3):
    """Binary erosion (ref ``ErodeView.h``)."""
    m = jnp.asarray(mask).astype(jnp.float32)
    return _window_minmax(m, size, False, 0.0) > 0.5


def dilate(mask, size: int = 3):
    m = jnp.asarray(mask).astype(jnp.float32)
    return _window_minmax(m, size, True, 0.0) > 0.5


def fill_holes(data, valid, max_dist: int = 16):
    """Fill invalid pixels from nearby valid data by iterative dilation
    averaging (ref ``FillHoles.h`` / ``InpaintView.cc`` grassfire inpainting)."""
    data = jnp.asarray(data, jnp.float32)
    valid = jnp.asarray(valid).astype(jnp.float32)
    k = jnp.ones((1, 1, 3, 3), jnp.float32)

    def conv(x):
        return lax.conv_general_dilated(x[None, None], k, (1, 1), "SAME",
                                        dimension_numbers=("NCHW", "OIHW",
                                                           "NCHW"))[0, 0]

    def body(_, state):
        d, v = state
        num = conv(d * v)
        den = conv(v)
        filled = num / jnp.maximum(den, 1e-6)
        new_v = jnp.minimum(v + (den > 0), 1.0)
        return (jnp.where(v > 0, d, filled), new_v)

    d, v = lax.fori_loop(0, max_dist, body, (data * valid, valid))
    return d, v > 0
