"""Interest point detection
(ref ``src/vw/InterestPoint/InterestPointDetector.h:54-160``,
``Extrema.h`` find_peaks, ``Localize.h`` fit_peak, ``DetectorBase.h:59-310``).

TPU formulation: response maps are computed densely; local 3x3 maxima above
threshold are ranked with ``lax.top_k`` into a fixed-capacity buffer (the
reference's ragged ``InterestPointList`` + ``m_max_points`` culling). The
scaled detector runs octave/scale Gaussian scale-space and takes extrema over
the 3-scale neighborhood (``ScaledInterestPointDetector``); subpixel peak
localization fits the 1D quadratics the reference's ``fit_peak`` uses.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.image.filters import gaussian_filter
from visionworkbench_tpu.interest.operators import (
    HARRIS_DEFAULT_THRESHOLD, LOG_DEFAULT_THRESHOLD, harris_interest, log_interest,
)
from visionworkbench_tpu.interest.types import InterestPoints


def _local_max_3x3(resp):
    h, w = resp.shape
    p = jnp.pad(resp, 1, mode="constant", constant_values=-jnp.inf)
    m = resp
    is_max = jnp.ones_like(resp, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w))
            is_max = is_max & (m > n)
    return is_max


@functools.partial(jax.jit, static_argnames=("max_points",))
def _peaks_to_points(resp, threshold, max_points: int, extra_mask=None):
    h, w = resp.shape
    is_peak = _local_max_3x3(resp) & (resp > threshold)
    if extra_mask is not None:
        is_peak = is_peak & extra_mask
    flat = jnp.where(is_peak, resp, -jnp.inf).reshape(-1)
    vals, idx = lax.top_k(flat, max_points)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    valid = jnp.isfinite(vals)

    # Subpixel localization: 1D quadratic in x and y (ref Localize.h fit_peak).
    p = jnp.pad(resp, 1, mode="edge")
    yi = (idx // w) + 1
    xi = (idx % w) + 1
    c = p[yi, xi]
    lx = p[yi, xi - 1]
    rx = p[yi, xi + 1]
    ty = p[yi - 1, xi]
    by = p[yi + 1, xi]
    denom_x = lx - 2 * c + rx
    denom_y = ty - 2 * c + by
    off_x = jnp.where(jnp.abs(denom_x) > 1e-12, 0.5 * (lx - rx) / denom_x, 0.0)
    off_y = jnp.where(jnp.abs(denom_y) > 1e-12, 0.5 * (ty - by) / denom_y, 0.0)
    off_x = jnp.clip(off_x, -1.0, 1.0)
    off_y = jnp.clip(off_y, -1.0, 1.0)
    return xs + off_x, ys + off_y, jnp.where(valid, vals, 0.0), valid


def detect_points(img, operator: str = "harris", threshold: Optional[float] = None,
                  scale: float = 1.0, max_points: int = 1000) -> InterestPoints:
    """Single-scale detection (ref ``InterestPointDetector::process_image``)."""
    img = jnp.asarray(img, jnp.float32)
    if operator == "harris":
        resp = harris_interest(img, scale)
        thr = HARRIS_DEFAULT_THRESHOLD if threshold is None else threshold
    elif operator == "log":
        resp = jnp.abs(log_interest(img, scale))
        thr = LOG_DEFAULT_THRESHOLD if threshold is None else threshold
    else:
        raise ValueError(f"unknown operator {operator!r}")
    xs, ys, interest, valid = _peaks_to_points(resp, jnp.float32(thr), max_points)
    k = max_points
    return InterestPoints(xs, ys, jnp.full((k,), scale, jnp.float32),
                          jnp.zeros((k,), jnp.float32), interest, valid)


def detect_points_scaled(img, operator: str = "log",
                         threshold: Optional[float] = None,
                         scales: int = 3, octaves: int = 3,
                         max_points: int = 1000) -> InterestPoints:
    """Octave/scale-space detection (ref ``ScaledInterestPointDetector``,
    InterestPointDetector.h:100-160; defaults 3 scales x 3 octaves).

    Per octave, responses at sigma = 1.0 * 2^(s/scales) are stacked and
    extrema must dominate the adjacent-scale 3x3x3 neighborhood.
    """
    img = jnp.asarray(img, jnp.float32)
    per_level = max(max_points // max(octaves * scales, 1), 1)
    all_pts = []
    base = img
    octave_scale = 1.0
    for o in range(octaves):
        sigmas = [2.0 ** (s / scales) for s in range(scales + 2)]
        if operator == "log":
            # sigma^2 scale normalization makes LoG responses comparable
            # across scales (standard scale-space; the reference's ImageOctave
            # compares responses across its scale stack the same way).
            resps = [jnp.abs(log_interest(base, s)) * (s * s) for s in sigmas]
            thr = LOG_DEFAULT_THRESHOLD if threshold is None else threshold
        else:
            resps = [harris_interest(base, s) for s in sigmas]
            thr = HARRIS_DEFAULT_THRESHOLD if threshold is None else threshold
        stack = jnp.stack(resps)   # (S+2, h, w)
        bh, bw = base.shape
        for s in range(1, scales + 1):
            resp = stack[s]
            neigh_max = jnp.maximum(stack[s - 1], stack[s + 1])
            is_scale_max = resp > neigh_max
            # Exclude the filter-support border (edge-extension artifacts).
            margin = int(2 * sigmas[s]) + 3
            border_ok = jnp.zeros((bh, bw), bool)
            if bh > 2 * margin and bw > 2 * margin:
                border_ok = border_ok.at[margin:bh - margin,
                                         margin:bw - margin].set(True)
            xs, ys, interest, valid = _peaks_to_points(resp, jnp.float32(thr),
                                                       per_level,
                                                       is_scale_max & border_ok)
            pts = InterestPoints(
                xs * octave_scale, ys * octave_scale,
                jnp.full((per_level,), sigmas[s] * octave_scale, jnp.float32),
                jnp.zeros((per_level,), jnp.float32), interest, valid)
            all_pts.append(pts)
        base = gaussian_filter(base, 1.0)[::2, ::2]
        octave_scale *= 2.0
        if min(base.shape) < 8:
            break
    return concatenate_points(all_pts)


def concatenate_points(point_sets) -> InterestPoints:
    desc = None
    if all(p.descriptor is not None for p in point_sets):
        desc = jnp.concatenate([p.descriptor for p in point_sets])
    return InterestPoints(
        jnp.concatenate([p.x for p in point_sets]),
        jnp.concatenate([p.y for p in point_sets]),
        jnp.concatenate([p.scale for p in point_sets]),
        jnp.concatenate([p.orientation for p in point_sets]),
        jnp.concatenate([p.interest for p in point_sets]),
        jnp.concatenate([p.valid for p in point_sets]),
        desc)


@functools.partial(jax.jit, static_argnames=())
def assign_orientations(img, pts: InterestPoints) -> InterestPoints:
    """Dominant gradient orientation per point (ref orientation assignment in
    ``InterestPointDetector.h`` via ``WeightedHistogram.h``): 36-bin histogram
    of gradient directions in a Gaussian-weighted 9x9 support, peak bin wins."""
    from visionworkbench_tpu.interest.operators import image_gradients
    img = jnp.asarray(img, jnp.float32)
    ix, iy = image_gradients(img)
    mag = jnp.sqrt(ix * ix + iy * iy)
    ori = jnp.arctan2(iy, ix)
    h, w = img.shape
    r = 4
    size = 2 * r + 1
    ys0 = jnp.clip(pts.y.astype(jnp.int32) - r, 0, h - size)
    xs0 = jnp.clip(pts.x.astype(jnp.int32) - r, 0, w - size)
    gauss = jnp.exp(-0.5 * (jnp.arange(size) - r) ** 2 / (2.0 ** 2))
    weight2d = gauss[:, None] * gauss[None, :]

    def one(y0, x0):
        m = lax.dynamic_slice(mag, (y0, x0), (size, size)) * weight2d
        o = lax.dynamic_slice(ori, (y0, x0), (size, size))
        bins = jnp.floor((o + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
        hist = jnp.zeros((36,), jnp.float32).at[bins.reshape(-1)].add(m.reshape(-1))
        peak = jnp.argmax(hist)
        return (peak.astype(jnp.float32) + 0.5) / 36 * 2 * jnp.pi - jnp.pi

    orientation = jax.vmap(one)(ys0, xs0)
    return pts._replace(orientation=jnp.where(pts.valid, orientation, 0.0))


def detect_points_obalog(img, threshold: float = 1e-4, scales: int = 3,
                         max_points: int = 1000,
                         gain: float = 1.0) -> InterestPoints:
    """Integral-image box-approximated LoG detector with per-scale auto gain
    (ref ``OBALoG`` / ``IntegralAutoGainDetector``,
    ``IntegralInterestOperator.h:43-79``, ``IntegralDetector.h:37-103``):
    center-surround box responses at doubling box sizes, thresholds relaxed
    by ``gain`` per scale, extrema per scale merged."""
    from visionworkbench_tpu.image.integral import obalog_interest
    img = jnp.asarray(img, jnp.float32)
    per_level = max(max_points // max(scales, 1), 1)
    sets = []
    thr = threshold
    for s in range(scales):
        resp = jnp.abs(obalog_interest(img, s))
        margin = 5 * (1 << s)
        h, w = resp.shape
        border_ok = jnp.zeros((h, w), bool)
        if h > 2 * margin and w > 2 * margin:
            border_ok = border_ok.at[margin:h - margin,
                                     margin:w - margin].set(True)
        xs, ys, interest, valid = _peaks_to_points(resp, jnp.float32(thr),
                                                   per_level, border_ok)
        sets.append(InterestPoints(
            xs, ys, jnp.full((per_level,), float(1 << s), jnp.float32),
            jnp.zeros((per_level,), jnp.float32), interest, valid))
        thr *= gain
    return concatenate_points(sets)
