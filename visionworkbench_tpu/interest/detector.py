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
    # 2x2-max-pool before top_k: strict 3x3 maxima admit at most ONE peak
    # per 2x2 block (two block cells are always 8-neighbors), so pooling
    # is EXACT and cuts the sort input 4x — the top_k sorts were 17.6 ms
    # of the SIFT pair profile (48 calls/image across the octave grid).
    # reshape (not strided slices — those lower to gathers here).
    masked = jnp.where(is_peak, resp, -jnp.inf)
    ph, pw = (-h) % 2, (-w) % 2
    p2 = jnp.pad(masked, ((0, ph), (0, pw)), constant_values=-jnp.inf)
    h2, w2 = (h + ph) // 2, (w + pw) // 2
    pooled = lax.reduce_window(p2, -jnp.inf, lax.max, (2, 2), (2, 2),
                               "VALID")
    vals, bidx = lax.top_k(pooled.reshape(-1), max_points)
    by = bidx // w2
    bx = bidx % w2
    # recover the in-block position with 4 tiny (K,) gathers
    p2f = p2.reshape(-1)
    w2p = w2 * 2
    base = (2 * by) * w2p + 2 * bx
    cand = jnp.stack([p2f[base], p2f[base + 1],
                      p2f[base + w2p], p2f[base + w2p + 1]], -1)
    off = jnp.argmax(cand, axis=-1)
    idx = (2 * by + off // 2) * w + (2 * bx + off % 2)
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


def _dog_edge_ok(plane, edge_ratio: float):
    """SIFT edge rejection: 2x2 spatial Hessian of the DoG plane must satisfy
    tr^2/det < (r+1)^2/r with det > 0 (Lowe 2004 sec. 4.1; fills the role of
    the reference's OpenCV SIFT bridge's edgeThreshold)."""
    h, w = plane.shape
    p = jnp.pad(plane, 1, mode="edge")
    c = plane
    dxx = p[1:-1, 2:] - 2 * c + p[1:-1, :-2]
    dyy = p[2:, 1:-1] - 2 * c + p[:-2, 1:-1]
    dxy = 0.25 * (p[2:, 2:] - p[2:, :-2] - p[:-2, 2:] + p[:-2, :-2])
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    return (det > 0) & (tr * tr * r < det * (r + 1.0) * (r + 1.0))


def detect_points_dog(img, threshold: float = 0.015, edge_ratio: float = 10.0,
                      scales: int = 3, octaves: int = 4, sigma0: float = 1.6,
                      max_points: int = 1000, return_blocks: bool = False):
    """Difference-of-Gaussians scale-space detector — the TPU-native
    SIFT-class pipeline standing in for the reference's OpenCV SIFT bridge
    (``ipfind.cc:61-229``, ``OpenCvDetector.cc``; ipfind's DEFAULT operator).

    Per octave: a Gaussian ladder at sigma = sigma0 * 2^(s/scales)
    (s = 0..scales+2, absolute blurs of the octave base), DoG planes from
    adjacent ladder steps, strict 3x3x3 scale-space extrema (maxima of DoG
    and minima via the negated volume), contrast threshold on the response,
    2x2-Hessian edge rejection (``_dog_edge_ok``), and 1D quadratic subpixel
    localization in x, y, and scale. Scales/positions are reported in input
    pixels; ``scale`` is the interpolated Gaussian sigma.
    """
    img = jnp.asarray(img, jnp.float32)
    per_level = max(max_points // max(octaves * scales, 1), 1)
    sets = []
    blocks = []     # (octave_base, octave_scale, slot_start, slot_end)
    base = img
    octave_scale = 1.0
    for o in range(octaves):
        bh, bw = base.shape
        if min(bh, bw) < 16:
            break
        blocks.append([base, octave_scale, len(sets) * per_level, None])
        sigmas = [sigma0 * 2.0 ** (s / scales) for s in range(scales + 3)]
        # Incremental Gaussian ladder (Lowe 2004 sec. 3): each step blurs the
        # PREVIOUS level by the differential sigma sqrt(s_i^2 - s_{i-1}^2)
        # instead of re-blurring the octave base at absolute sigmas — the
        # kernels stay small (<= ~9 taps vs 2*ceil(2.5*3.2)+1 = 17 for the
        # top absolute blur) and deeper octave bases keep the blur they
        # already carry (the decimated gauss[scales] IS at sigma0 in the new
        # octave's pixels; octave 0 blurs the raw input up to sigma0).
        gauss = [base if o > 0 else gaussian_filter(base, sigmas[0])]
        for s in range(1, scales + 3):
            dsig = (sigmas[s] ** 2 - sigmas[s - 1] ** 2) ** 0.5
            gauss.append(gaussian_filter(gauss[-1], dsig))
        dog = [g1 - g0 for g0, g1 in zip(gauss[:-1], gauss[1:])]
        stack = jnp.stack(dog)                      # (S+2, bh, bw)
        for s in range(1, scales + 1):
            for sign in (1.0, -1.0):
                vol = stack * sign
                resp = vol[s]
                # strict 3x3x3 extremum: beats the 3x3 in-plane ring (via
                # _peaks_to_points' local max) AND all 9 neighbors in each
                # adjacent scale plane.
                p_up = jnp.pad(vol[s + 1], 1, mode="constant",
                               constant_values=jnp.inf)
                p_dn = jnp.pad(vol[s - 1], 1, mode="constant",
                               constant_values=jnp.inf)
                ok_adj = jnp.ones((bh, bw), bool)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        up = lax.dynamic_slice(p_up, (1 + dy, 1 + dx), (bh, bw))
                        dn = lax.dynamic_slice(p_dn, (1 + dy, 1 + dx), (bh, bw))
                        ok_adj = ok_adj & (resp > up) & (resp > dn)
                margin = int(2 * sigmas[s + 1]) + 3
                border_ok = jnp.zeros((bh, bw), bool)
                if bh > 2 * margin and bw > 2 * margin:
                    border_ok = border_ok.at[margin:bh - margin,
                                             margin:bw - margin].set(True)
                mask = ok_adj & border_ok & _dog_edge_ok(stack[s] * sign,
                                                         edge_ratio)
                xs, ys, interest, valid = _peaks_to_points(
                    resp, jnp.float32(threshold), per_level, mask)
                # scale interpolation: 1D quadratic across the DoG ladder at
                # the integer peak
                xi = jnp.clip(xs.astype(jnp.int32), 0, bw - 1)
                yi = jnp.clip(ys.astype(jnp.int32), 0, bh - 1)
                c = vol[s][yi, xi]
                lo = vol[s - 1][yi, xi]
                hi = vol[s + 1][yi, xi]
                denom = lo - 2 * c + hi
                ds = jnp.where(jnp.abs(denom) > 1e-12,
                               jnp.clip(0.5 * (lo - hi) / denom, -0.5, 0.5),
                               0.0)
                sig = sigma0 * 2.0 ** ((s + ds) / scales) * octave_scale
                sets.append(InterestPoints(
                    xs * octave_scale, ys * octave_scale,
                    jnp.where(valid, sig, 1.0).astype(jnp.float32),
                    jnp.zeros((per_level,), jnp.float32), interest, valid))
        blocks[-1][3] = len(sets) * per_level
        # sigma doubled -> next octave base; banded-matmul decimation (a
        # strided lane slice lowers to a ~3-4 ms/Mpx gather on this
        # toolchain — the round-2 profile's top DoG pathology).
        from visionworkbench_tpu.image.manipulation import subsample2_mxu
        base = subsample2_mxu(gauss[scales])
        octave_scale *= 2.0
    pts = concatenate_points(sets)
    if return_blocks:
        return pts, [tuple(b) for b in blocks]
    return pts


@functools.partial(jax.jit, static_argnames=("radius",))
def _orientations_scaled(img, x, y, scale, valid, radius: int):
    """Scale-aware dominant orientation: gradients of bilinear samples on a
    scale-normalized grid, 36-bin magnitude histogram with Gaussian
    weighting, circular [1,4,6,4,1]/16 smoothing, and parabola-interpolated
    peak (Lowe 2004 sec. 5; ref orientation assignment in
    InterestPointDetector.h:160 via WeightedHistogram.h)."""
    from visionworkbench_tpu.image.interpolation import interpolate
    size = 2 * radius + 3           # +1 ring for patch-frame gradients
    us = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    uu, vv = jnp.meshgrid(us, us)

    def one(px, py, s):
        xc = px + uu * s
        yc = py + vv * s
        patch = interpolate(img, xc, yc, "bilinear")
        gx = (patch[1:-1, 2:] - patch[1:-1, :-2]) * 0.5
        gy = (patch[2:, 1:-1] - patch[:-2, 1:-1]) * 0.5
        mag = jnp.sqrt(gx * gx + gy * gy)
        ang = jnp.arctan2(gy, gx)
        ws = jnp.exp(-0.5 * (uu[1:-1, 1:-1] ** 2 + vv[1:-1, 1:-1] ** 2)
                     / (1.5 * radius / 3.0) ** 2)
        bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
        hist = jnp.zeros((36,), jnp.float32).at[bins.reshape(-1)].add(
            (mag * ws).reshape(-1))
        for _ in range(2):   # circular smoothing
            hist = (jnp.roll(hist, 2) + 4 * jnp.roll(hist, 1) + 6 * hist
                    + 4 * jnp.roll(hist, -1) + jnp.roll(hist, -2)) / 16.0
        k = jnp.argmax(hist)
        c = hist[k]
        lo = hist[(k - 1) % 36]
        hi = hist[(k + 1) % 36]
        denom = lo - 2 * c + hi
        off = jnp.where(jnp.abs(denom) > 1e-12,
                        jnp.clip(0.5 * (lo - hi) / denom, -0.5, 0.5), 0.0)
        return ((k + 0.5 + off) / 36.0) * 2 * jnp.pi - jnp.pi

    ori = jax.vmap(one)(x, y, scale)
    return jnp.where(valid, ori, 0.0)


def assign_orientations_scaled(img, pts: InterestPoints,
                               radius: int = 8) -> InterestPoints:
    """Scale-aware orientation assignment for scale-space detections (use
    after :func:`detect_points_dog`; :func:`assign_orientations` remains the
    fixed-window variant for unit-scale points)."""
    img = jnp.asarray(img, jnp.float32)
    ori = _orientations_scaled(img, pts.x, pts.y, pts.scale, pts.valid,
                               int(radius))
    return pts._replace(orientation=ori)


def detect_sift_like(img, threshold: float = 0.015, max_points: int = 1000,
                     descriptor_size: int = 24):
    """The full SIFT-class pipeline: DoG detection -> scale-aware
    orientations -> oriented, scale-normalized gradient-histogram (sgrad)
    descriptors. Matches the capability of the reference ipfind's default
    SIFT path with TPU-native parts.

    Round 4: orientation + description run gather-free per octave block
    (``descriptor.sift_orient_describe``): upright dynamic-slice patch
    stacks from the octave bases, scale normalization as batched banded
    matmuls, rotated-CELL histogram binning instead of rotated-grid
    sampling. The vmapped bilinear-gather sampler it replaces measured
    ~76 of the config-8 pair's 101 ms device frame
    (tools_profile_config --config 8); ``VWTPU_SIFT_GATHER=1`` restores
    it (assign_orientations_scaled + sgrad_descriptor remain the general
    any-points API)."""
    import os
    from visionworkbench_tpu.interest.descriptor import (
        sgrad_descriptor, sift_orient_describe,
    )
    img = jnp.asarray(img, jnp.float32)
    if os.environ.get("VWTPU_SIFT_GATHER", "0") == "1":
        pts = detect_points_dog(img, threshold=threshold,
                                max_points=max_points)
        pts = assign_orientations_scaled(img, pts)
        return sgrad_descriptor(img, pts, size=descriptor_size,
                                upright=False)
    pts, blocks = detect_points_dog(img, threshold=threshold,
                                    max_points=max_points,
                                    return_blocks=True)
    return sift_orient_describe(pts, blocks, size=descriptor_size)
