"""Reference-parity oracle: a slow, literal NumPy transliteration of the
NASA Vision Workbench pyramid correlator, used ONLY as a test oracle.

This module exists so that every semantic claim the TPU implementation makes
in its docstrings ("first-best-wins argmin", "float64 accumulators", "the
reference's elif worst-update", zone refinement, ...) is proven against an
*executable* rendition of the reference algorithm as written — not against
OpenCV or synthetic shifts. It follows the C++ loop-for-loop (same iteration
order, same accumulator types, same update conditions) and is deliberately
unoptimized; correctness and faithfulness beat speed here. Each function
cites the reference file:line it transliterates.

Transliterated components:

* ``fast_box_sum``                — ``src/vw/Stereo/Algorithms.h:41-131``
  (column sums + running row sum, float64 accumulator for float32 input per
  ``CostFunctions.h:56-69``).
* cost functions ABS/SQ/NCC       — ``src/vw/Stereo/CostFunctions.h:143-236``
  (per-pixel cost computed in fp32, box-summed in f64; NCC precomputes f64
  inverse window energies and multiplies ``sqrt(lp*rp)`` into the metric).
* census/ternary-census costs     — ``src/vw/Image/CensusTransform.h:64-300``
  comparison sets + hamming counts. NOTE: the reference's *block-matching*
  dispatch silently maps the census cost enums to ABSOLUTE_DIFFERENCE
  (``Correlation.cc:355-370`` — the switch has no census case and falls to
  ``default``); census costs only run inside SGM there. The TPU framework
  implements census block matching for real, so the oracle carries the same
  census-hamming cost through the ``best_of_search_convolution`` skeleton to
  validate it.
* ``best_of_search_convolution``  — ``src/vw/Stereo/Correlation.cc:30-137``
  (strict-inequality best update => first-best-wins in dy-major order; the
  ``elif`` worst update; flat-region invalidation where best == worst).
* ``calc_disparity``              — ``Correlation.cc:330-375``.
* ``subdivide_regions``           — ``Correlation.cc:139-328`` including the
  200-px/16-px stop rule, the 0.8 improvement ratio, the second-chance
  fail_count recursion and the 1/2/3-failed merge heuristics.
* parabola subpixel               — ``ParabolaSubpixelView.cc:40-344``
  (zone re-evaluation with AbsoluteCost regardless of the correlator's cost,
  the 6x9 pseudoinverse fit, MAX_SUBPIXEL_SHIFT = 5 rejection).
* speckle filters                 — ``DisparityMap.h:300-447``
  (``rm_outliers_using_thresh`` with replicate edge extension and the
  two-pass ``disparity_cleanup_using_thresh`` whose second pass is hard-coded
  to (1, 1, 3.0, 0.20)).
* ``cross_corr_consistency_check``— ``Correlate.cc:1442-1502``.
* ``disparity_mask``              — ``DisparityMap.h:85-250``.
* pyramid construction + level loop — ``CorrelationView.cc:66-886``
  (constant-edge crop, subsampled-mean fill of masked pixels, 5-tap
  [1,4,6,4,1]/16 blur + subsample-by-2, 2-of-4 mask downsample, prefilter per
  level, zone loop with ``calc_disparity`` per zone, level-0 L<->R check,
  per-level speckle filtering, zone refinement x2 + expand(2) with crop to
  the pyramid size difference).

Known, documented deviations from the C++ (all justified):

1. Crops that the reference takes beyond a rasterized buffer (the coarsest
   level searches ``search/2^L + 1`` disparities while the right pyramid only
   carries ``search/2^L`` of margin — ``CorrelationView.cc:97`` dropped the
   ``+ max_upscaling`` term its own comment asks about, so the final
   disparity column reads out of the allocated buffer in C++) are clamped
   with replicate extension here instead of reading garbage.
2. Box-sum partial sums use ``np.cumsum`` (sequential order, like the C++
   running sums) but seeds use pairwise ``np.sum`` over <= kernel-width
   elements; differences are below f64 epsilon at correlation magnitudes and
   vanish entirely for the quantized inputs the parity tests use.
3. Search-region convention: VW's pyramid correlator effectively searches
   ``[min, max]`` INCLUSIVE (the ``+ 1`` in ``CorrelationView.cc:338-340``);
   the TPU framework is max-exclusive ``[min, min+size)``. Callers map one
   convention onto the other (see tests/test_oracle_parity.py).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# BBox: max-exclusive integer box, mirroring vw::BBox2i semantics.
# ---------------------------------------------------------------------------


class OBox:
    """Integer box; empty() mirrors a default-constructed vw::BBox2i."""

    def __init__(self, minx=None, miny=None, maxx=None, maxy=None):
        if minx is None:           # default-constructed: empty
            self.minx, self.miny = 2**31 - 1, 2**31 - 1
            self.maxx, self.maxy = -(2**31), -(2**31)
        else:
            self.minx, self.miny, self.maxx, self.maxy = minx, miny, maxx, maxy

    @staticmethod
    def sized(minx, miny, w, h):
        return OBox(minx, miny, minx + w, miny + h)

    def copy(self):
        return OBox(self.minx, self.miny, self.maxx, self.maxy)

    @property
    def width(self):
        return self.maxx - self.minx

    @property
    def height(self):
        return self.maxy - self.miny

    def area(self):
        if self.empty():
            return 0
        return self.width * self.height

    def empty(self):
        return self.maxx <= self.minx or self.maxy <= self.miny

    def expand(self, n):
        self.minx -= n
        self.miny -= n
        self.maxx += n
        self.maxy += n

    def grow_box(self, other: "OBox"):
        if other.empty():
            return
        self.minx = min(self.minx, other.minx)
        self.miny = min(self.miny, other.miny)
        self.maxx = max(self.maxx, other.maxx)
        self.maxy = max(self.maxy, other.maxy)

    def crop_to(self, other: "OBox"):
        self.minx = max(self.minx, other.minx)
        self.miny = max(self.miny, other.miny)
        self.maxx = min(self.maxx, other.maxx)
        self.maxy = min(self.maxy, other.maxy)

    def scale(self, s):
        self.minx *= s
        self.miny *= s
        self.maxx *= s
        self.maxy *= s

    def shift(self, dx, dy):
        return OBox(self.minx + dx, self.miny + dy, self.maxx + dx, self.maxy + dy)

    def __eq__(self, other):
        if self.empty() and other.empty():
            return True
        return (self.minx, self.miny, self.maxx, self.maxy) == \
            (other.minx, other.miny, other.maxx, other.maxy)

    def __repr__(self):
        return f"OBox({self.minx},{self.miny},{self.maxx},{self.maxy})"


def crop_replicate(img: np.ndarray, box: OBox) -> np.ndarray:
    """crop(edge_extend(img, ConstantEdgeExtension()), box) — VW's "constant"
    edge extension replicates the border pixel (EdgeExtension.h:73-187)."""
    h, w = img.shape[:2]
    ys = np.clip(np.arange(box.miny, box.maxy), 0, h - 1)
    xs = np.clip(np.arange(box.minx, box.maxx), 0, w - 1)
    return img[np.ix_(ys, xs)]


def crop_zero(img: np.ndarray, box: OBox) -> np.ndarray:
    """crop(edge_extend(img, ZeroEdgeExtension()), box)."""
    h, w = img.shape[:2]
    out_shape = (box.height, box.width) + img.shape[2:]
    out = np.zeros(out_shape, img.dtype)
    sy0, sy1 = max(box.miny, 0), min(box.maxy, h)
    sx0, sx1 = max(box.minx, 0), min(box.maxx, w)
    if sy1 > sy0 and sx1 > sx0:
        out[sy0 - box.miny:sy1 - box.miny, sx0 - box.minx:sx1 - box.minx] = \
            img[sy0:sy1, sx0:sx1]
    return out


# ---------------------------------------------------------------------------
# fast_box_sum (Stereo/Algorithms.h:41-131), float64 accumulator.
# ---------------------------------------------------------------------------


def fast_box_sum(img: np.ndarray, kernel: Tuple[int, int]) -> np.ndarray:
    """Sliding 'valid' box sum with f64 column sums + running row sums, the
    reference's exact accumulation structure (col_sum vector updated by
    +front-row -back-row per output row; row sums swept left to right)."""
    kw, kh = int(kernel[0]), int(kernel[1])
    assert kw % 2 == 1 and kh % 2 == 1
    h, w = img.shape
    oh, ow = h - kh + 1, w - kw + 1
    out = np.empty((oh, ow), np.float64)
    col_sum = np.zeros(w, np.float64)
    for ky in range(kh):                       # start column sum
        col_sum += img[ky].astype(np.float64)
    for y in range(oh):
        # running row sum along the line (sequential order via cumsum)
        seed = np.sum(col_sum[:kw])
        if ow > 1:
            deltas = col_sum[kw:kw + ow - 1] - col_sum[:ow - 1]
            out[y, 0] = seed
            out[y, 1:] = seed + np.cumsum(deltas)
        else:
            out[y, 0] = seed
        if y + 1 < oh:                         # update column sums
            col_sum += img[y + kh].astype(np.float64)
            col_sum -= img[y].astype(np.float64)
    return out


# ---------------------------------------------------------------------------
# Census comparison stacks (Image/CensusTransform.h:64-300).
# For hamming costs only the comparison *set* matters, not bit packing.
# ---------------------------------------------------------------------------

# Sparse 9x9 pattern (CensusTransform.h:130-155), offsets relative to center.
_PATTERN_9 = [(c - 4, r - 4) for (c, r) in [
    (0, 0), (4, 0), (8, 0),
    (1, 1), (3, 1), (5, 1), (7, 1),
    (2, 2), (4, 2), (6, 2),
    (1, 3), (4, 3), (7, 3),
    (0, 4), (2, 4), (3, 4), (5, 4), (6, 4), (8, 4),
    (1, 5), (4, 5), (7, 5),
    (2, 6), (4, 6), (6, 6),
    (1, 7), (3, 7), (5, 7), (7, 7),
    (0, 8), (4, 8), (8, 8)]]

# Sparse 7x7 ternary pattern (CensusTransform.h:232-250).
_PATTERN_7T = [(c - 3, r - 3) for (c, r) in [
    (0, 0), (2, 0), (3, 0), (4, 0), (6, 0),
    (1, 1), (3, 1), (5, 1),
    (0, 2), (2, 2), (3, 2), (4, 2), (6, 2),
    (0, 3), (1, 3), (2, 3), (4, 3), (5, 3), (6, 3),
    (0, 4), (2, 4), (3, 4), (4, 4), (6, 4),
    (1, 5), (3, 5), (5, 5),
    (0, 6), (2, 6), (3, 6), (4, 6), (6, 6)]]


def _census_offsets(window: int, ternary: bool) -> List[Tuple[int, int]]:
    if not ternary and window == 9:
        return list(_PATTERN_9)
    if ternary and window == 7:
        return list(_PATTERN_7T)
    r = window // 2
    if ternary and window == 9:
        r = 3  # ternary 9x9 uses the dense 7x7 set (CensusTransform.h:262-282)
    offs = []
    for dr in range(r, -r - 1, -1):
        for dc in range(r, -r - 1, -1):
            if dr == 0 and dc == 0:
                continue
            offs.append((dc, dr))
    return offs


def census_comparisons(img: np.ndarray, window: int, ternary: bool,
                       diff_threshold: int = 2) -> np.ndarray:
    """(H, W, nbits) uint8 comparison stack over a replicate-extended image
    (the framework evaluates census at every pixel against replicated edges;
    the reference only evaluates interior pixels — callers of the oracle mask
    the border band when asserting parity)."""
    arr = np.asarray(img).astype(np.int64)
    h, w = arr.shape
    r = window // 2
    pad = np.pad(arr, r, mode="edge")
    offs = _census_offsets(window, ternary)
    bits = []
    for (dc, dr) in offs:
        nb = pad[r + dr:r + dr + h, r + dc:r + dc + w]
        if ternary:
            lo = (nb >= arr - diff_threshold).astype(np.uint8)
            hi = (nb > arr + diff_threshold).astype(np.uint8)
            bits.append(lo)
            bits.append(hi)
        else:
            bits.append((nb > arr).astype(np.uint8))
    return np.stack(bits, axis=-1)


def quantize_u8(img: np.ndarray) -> np.ndarray:
    """float image in [0,1] -> uint8 levels, as the framework's census path
    quantizes (the reference SGM takes uint8 input images)."""
    return np.clip(img * 255.0, 0, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# best_of_search_convolution (Correlation.cc:30-137)
# ---------------------------------------------------------------------------

COSTS_MIN = ("abs", "sq", "census", "ternary_census")


def best_of_search_convolution(left: np.ndarray, right: np.ndarray,
                               search_volume: Tuple[int, int],
                               kernel_size: Tuple[int, int],
                               cost_type: str = "abs",
                               census_window: int = 5):
    """Returns (disp (oh, ow, 2) int32, valid bool). ``left`` (H, W) f32,
    ``right`` (H+sy-1, W+sx-1) f32; disparities are offsets in
    [0, sx) x [0, sy). Loop order and update rules are the reference's:
    dy outer / dx inner, strict better-than-best, elif worst, best == worst
    invalidation."""
    sx, sy = int(search_volume[0]), int(search_volume[1])
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    h, w = left.shape
    assert right.shape == (h + sy - 1, w + sx - 1), (right.shape, (h, w), (sx, sy))
    oh, ow = h - kh + 1, w - kw + 1
    left32 = left.astype(np.float32)
    right32 = right.astype(np.float32)

    is_ncc = cost_type == "ncc"
    is_census = cost_type in ("census", "ternary_census")
    if is_census:
        lcmp = census_comparisons(quantize_u8(left32), census_window,
                                  cost_type == "ternary_census")
        rcmp = census_comparisons(quantize_u8(right32), census_window,
                                  cost_type == "ternary_census")
    if is_ncc:
        # NCCCost ctor (CostFunctions.h:204-215): f64 inverse window energies.
        lsq = (left32 * left32).astype(np.float32)       # square() in fp32
        rsq = (right32 * right32).astype(np.float32)
        left_prec = 1.0 / fast_box_sum(lsq, (kw, kh))
        right_prec = 1.0 / fast_box_sum(rsq, (kw, kh))

    best = None
    worst = None
    argd = np.zeros((oh, ow, 2), np.int32)
    for dy in range(sy):
        for dx in range(sx):
            rcrop = right32[dy:dy + h, dx:dx + w]
            if cost_type == "abs":
                cost = np.abs(left32 - rcrop)            # fp32 per-pixel
            elif cost_type == "sq":
                d = left32 - rcrop
                cost = d * d                              # fp32 per-pixel
            elif is_ncc:
                cost = left32 * rcrop                     # fp32 per-pixel
            else:
                rc = rcmp[dy:dy + h, dx:dx + w]
                cost = np.sum(lcmp != rc, axis=-1).astype(np.float32)
            metric = fast_box_sum(cost, (kw, kh))         # f64 accumulate
            if is_ncc:
                # cost_modification (CostFunctions.h:221-226)
                metric = metric * np.sqrt(
                    left_prec * right_prec[dy:dy + oh, dx:dx + ow])
            if best is None:
                best = metric.copy()
                worst = metric.copy()
            else:
                if is_ncc:
                    better = metric > best
                    not_worse = metric > worst
                else:
                    better = metric < best
                    not_worse = metric < worst
                best = np.where(better, metric, best)
                argd[..., 0] = np.where(better, dx, argd[..., 0])
                argd[..., 1] = np.where(better, dy, argd[..., 1])
                worst = np.where(~better & ~not_worse, metric, worst)
    valid = best != worst   # flat-region invalidation (Correlation.cc:124-137)
    disp = np.where(valid[..., None], argd, 0).astype(np.int32)
    return disp, valid


def calc_disparity(cost_type: str, left_in: np.ndarray, right_in: np.ndarray,
                   left_region: OBox, search_volume: Tuple[int, int],
                   kernel_size: Tuple[int, int], census_window: int = 5,
                   replicate_overrun: bool = True):
    """Correlation.cc:330-375: crop left to ``left_region``, right to
    ``left_region + search_volume - 1``, dispatch. ``replicate_overrun``
    replicate-extends crops that overrun the stored raster (deviation #1)."""
    sx, sy = int(search_volume[0]), int(search_volume[1])
    right_region = OBox(left_region.minx, left_region.miny,
                        left_region.maxx + sx - 1, left_region.maxy + sy - 1)
    left = crop_replicate(left_in, left_region) if replicate_overrun \
        else left_in[left_region.miny:left_region.maxy,
                     left_region.minx:left_region.maxx]
    right = crop_replicate(right_in, right_region) if replicate_overrun \
        else right_in[right_region.miny:right_region.maxy,
                      right_region.minx:right_region.maxx]
    return best_of_search_convolution(left, right, (sx, sy), kernel_size,
                                      cost_type, census_window)


# ---------------------------------------------------------------------------
# subdivide_regions (Correlation.cc:139-328)
# ---------------------------------------------------------------------------


def _minmax_box(disp: np.ndarray, valid: np.ndarray, box: OBox) -> OBox:
    """EWMinMaxAccumulator over valid disparities inside ``box`` (already
    cropped to the image); returns [min, max+1) or an empty OBox."""
    sub_v = valid[box.miny:box.maxy, box.minx:box.maxx]
    if not sub_v.any():
        return OBox()
    sub_d = disp[box.miny:box.maxy, box.minx:box.maxx][sub_v]
    mn = sub_d.min(axis=0)
    mx = sub_d.max(axis=0)
    return OBox(int(mn[0]), int(mn[1]), int(mx[0]) + 1, int(mx[1]) + 1)


def subdivide_regions(disp: np.ndarray, valid: np.ndarray, current: OBox,
                      out_list: List[Tuple[OBox, OBox]],
                      kernel_size: Tuple[int, int], fail_count: int = 0) -> bool:
    """Literal transliteration, including the quadrant split point, the 0.8
    improvement ratio, the fail_count==0 second-chance recursion, and the
    1/2/3-failed merge heuristics (Correlation.cc:139-328)."""
    MIN_REGION_SIZE = 16
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    full = OBox(0, 0, valid.shape[1], valid.shape[0])

    if (current.area() <= 200 or current.width < MIN_REGION_SIZE
            or current.height < MIN_REGION_SIZE):
        expanded = current.copy()
        expanded.expand(1)
        expanded.crop_to(full)
        search = _minmax_box(disp, valid, expanded)
        if search.empty():
            return True
        out_list.append((current.copy(), search))
        return True

    half_w, half_h = current.width // 2, current.height // 2
    q1 = OBox(current.minx, current.miny,
              current.minx + half_w, current.miny + half_h)
    q4 = OBox(current.minx + half_w, current.miny + half_h,
              current.maxx, current.maxy)
    q2 = OBox(current.minx + half_w, current.miny,
              current.maxx, current.miny + half_h)
    q3 = OBox(current.minx, current.miny + half_h,
              current.minx + half_w, current.maxy)

    split_search = 0
    searches = []
    for q in (q1, q2, q3, q4):
        s = _minmax_box(disp, valid, q)
        searches.append(s)
        if not s.empty():
            split_search += s.area() * (q.width + kw) * (q.height + kh)
    q1s, q2s, q3s, q4s = searches

    # Union logic transliterated with its exact if/else chain
    # (Correlation.cc:222-238): empty boxes grow as no-ops.
    cur_search = OBox()
    if not q1s.empty():
        cur_search = q1s.copy()
    if (not q2s.empty()) and cur_search.empty():
        cur_search = q2s.copy()
    else:
        cur_search.grow_box(q2s)
    if (not q3s.empty()) and cur_search.empty():
        cur_search = q3s.copy()
    else:
        cur_search.grow_box(q3s)
    if (not q4s.empty()) and cur_search.empty():
        cur_search = q4s.copy()
    else:
        cur_search.grow_box(q4s)

    current_search = cur_search.area() * (current.width + kw) * (current.height + kh)
    IMPROVEMENT_RATIO = 0.8

    if split_search > current_search * IMPROVEMENT_RATIO and fail_count == 0:
        failed = []
        for q, qs in ((q1, q1s), (q2, q2s), (q3, q3s), (q4, q4s)):
            if not subdivide_regions(disp, valid, q, out_list, kernel_size,
                                     fail_count + 1):
                failed.append((q.copy(), qs.copy()))
        if len(failed) == 4:
            out_list.append((current.copy(), cur_search))
            return True
        elif len(failed) == 3:
            def mergeable(a, b):
                return ((a[0].minx == b[0].minx or a[0].miny == b[0].miny)
                        and a[1] == b[1])
            if mergeable(failed[0], failed[1]):
                merge = failed[0][0].copy()
                merge.grow_box(failed[1][0])
                out_list.append((merge, failed[0][1]))
                out_list.append(failed[2])
                return True
            if mergeable(failed[1], failed[2]):
                merge = failed[1][0].copy()
                merge.grow_box(failed[2][0])
                out_list.append((merge, failed[1][1]))
                out_list.append(failed[0])
                return True
            if mergeable(failed[0], failed[2]):
                merge = failed[0][0].copy()
                merge.grow_box(failed[2][0])
                out_list.append((merge, failed[0][1]))
                out_list.append(failed[1])
                return True
            out_list.extend(failed)
        elif len(failed) == 2:
            if ((failed[0][0].minx == failed[1][0].minx
                 or failed[0][0].miny == failed[1][0].miny)
                    and failed[0][1] == failed[1][1]):
                merge = failed[0][0].copy()
                merge.grow_box(failed[1][0])
                out_list.append((merge, failed[0][1]))
                return True
            out_list.extend(failed)
        elif len(failed) == 1:
            out_list.append(failed[0])
        return True
    elif split_search > current_search * IMPROVEMENT_RATIO and fail_count > 0:
        return False
    else:
        subdivide_regions(disp, valid, q1, out_list, kernel_size)
        subdivide_regions(disp, valid, q2, out_list, kernel_size)
        subdivide_regions(disp, valid, q3, out_list, kernel_size)
        subdivide_regions(disp, valid, q4, out_list, kernel_size)
    return True


# ---------------------------------------------------------------------------
# Parabola subpixel (ParabolaSubpixelView.cc:40-344)
# ---------------------------------------------------------------------------

# Pseudoinverse of A, rows of A = [x^2 y^2 xy x y 1] at the nine (x, y) in
# [-1,1]^2, x fastest (ParabolaSubpixelView.h:83-88).
PINV_A = np.array([
    [1/6, -1/3, 1/6, 1/6, -1/3, 1/6, 1/6, -1/3, 1/6],    # a
    [1/6, 1/6, 1/6, -1/3, -1/3, -1/3, 1/6, 1/6, 1/6],    # b
    [1/4, 0.0, -1/4, 0.0, 0.0, 0.0, -1/4, 0.0, 1/4],     # c
    [-1/6, 0.0, 1/6, -1/6, 0.0, 1/6, -1/6, 0.0, 1/6],    # d
    [-1/6, -1/6, -1/6, 0.0, 0.0, 0.0, 1/6, 1/6, 1/6],    # e
    [-1/9, 2/9, -1/9, 2/9, 5/9, 2/9, -1/9, 2/9, -1/9],   # f
], dtype=np.float32)

MAX_SUBPIXEL_SHIFT = 5.0


def parabola_fit(patch9: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(..., 9) float32 patch -> (offset_x, offset_y) of the quadratic's
    stationary point, all math in fp32 (ParabolaSubpixelView.cc:238-252)."""
    x = np.einsum("ij,...j->...i", PINV_A, patch9.astype(np.float32))
    x = x.astype(np.float32)
    denom = 4 * x[..., 0] * x[..., 1] - x[..., 2] * x[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        ox = (x[..., 2] * x[..., 4] - 2 * x[..., 1] * x[..., 3]) / denom
        oy = (x[..., 2] * x[..., 3] - 2 * x[..., 0] * x[..., 4]) / denom
    return ox.astype(np.float32), oy.astype(np.float32)


def parabola_subpixel(int_disp: np.ndarray, valid: np.ndarray,
                      left_img: np.ndarray, right_img: np.ndarray,
                      kernel_size: Tuple[int, int]):
    """ParabolaSubpixelView::prerasterize + evaluate for a whole-image bbox.

    ``int_disp``/``valid``: the integer disparity over the full left image
    (absolute right-image offsets). ``left_img``/``right_img``: the
    *prefiltered* images. Returns (float_disp (H, W, 2) f32, valid).

    Follows the reference: entire_search_range = disparity range + 1, expand
    1; left_region = bbox expand half_kernel; right_region = left_region +
    range.min, max += range.size; zones from ``subdivide_regions`` split
    per-pixel when range-area/region-area >= 1; per zone & disparity:
    AbsoluteCost + fast_box_sum, written into the 3x3 patch at
    ``delta = disparity_abs - int_disp``; fit + MAX_SUBPIXEL_SHIFT gate.
    """
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    h, w = valid.shape
    bbox = OBox(0, 0, w, h)

    rng = _minmax_box(int_disp, valid, bbox)
    if rng.empty():
        return int_disp.astype(np.float32), valid.copy()
    # _minmax_box already returns [min, max+1); the reference applies
    # get_disparity_range (max inclusive) then max += 1 — identical. Then
    # expand(1) for the 3x3 neighborhood (CorrelationView path: :287-291).
    entire = rng.copy()
    entire.expand(1)

    half_kw, half_kh = kw // 2, kh // 2
    left_region = OBox(bbox.minx - half_kw, bbox.miny - half_kh,
                       bbox.maxx + half_kw, bbox.maxy + half_kh)
    right_region = OBox(left_region.minx + entire.minx,
                        left_region.miny + entire.miny,
                        left_region.maxx + entire.minx + entire.width,
                        left_region.maxy + entire.miny + entire.height)
    left_raster = crop_replicate(left_img, left_region)
    right_raster = crop_replicate(right_img, right_region)

    cost_patch = np.zeros((h, w, 9), np.float32)

    big_zones: List[Tuple[OBox, OBox]] = []
    subdivide_regions(int_disp, valid, bbox, big_zones, (kw, kh))
    zones: List[Tuple[OBox, OBox]] = []
    ratio = 1.0
    for (region, search) in big_zones:
        len1 = float(region.area())
        len2 = float(search.area())
        if len2 / len1 < ratio:
            zones.append((region, search))
        else:
            for px in range(region.minx, region.maxx):
                for py in range(region.miny, region.maxy):
                    box = OBox(px, py, px + 1, py + 1)
                    s = _minmax_box(int_disp, valid, box)
                    if s.empty():
                        continue
                    zones.append((box, s))

    for (region, search) in zones:
        search = search.copy()
        search.expand(1)
        left_zone = OBox(region.minx, region.miny,
                         region.maxx + kw - 1, region.maxy + kh - 1)
        lz = left_raster[left_zone.miny:left_zone.maxy,
                         left_zone.minx:left_zone.maxx]
        zone_disp = int_disp[region.miny:region.maxy,
                             region.minx:region.maxx]
        for dx in range(search.width):
            for dy in range(search.height):
                abs_dx = dx + search.minx
                abs_dy = dy + search.miny
                rz_box = left_zone.shift(abs_dx - entire.minx,
                                         abs_dy - entire.miny)
                rz = crop_replicate(right_raster, rz_box)
                cost = np.abs(lz.astype(np.float32) - rz.astype(np.float32))
                metric = fast_box_sum(cost, (kw, kh)).astype(np.float32)
                ddx = abs_dx - zone_disp[..., 0]
                ddy = abs_dy - zone_disp[..., 1]
                inside = (np.abs(ddx) <= 1) & (np.abs(ddy) <= 1)
                idx = (ddy + 1) * 3 + (ddx + 1)
                ys, xs = np.nonzero(inside)
                cost_patch[region.miny + ys, region.minx + xs,
                           idx[ys, xs]] = metric[ys, xs]

    # Final fit (ParabolaSubpixelView.cc:226-276)
    out = np.zeros((h, w, 2), np.float32)
    ox, oy = parabola_fit(cost_patch)
    all_equal = np.all(cost_patch == cost_patch[..., :1], axis=-1)
    norm = np.sqrt(ox * ox + oy * oy)
    use = valid & ~all_equal & (norm < MAX_SUBPIXEL_SHIFT)
    keep_int = valid & (all_equal | ~(norm < MAX_SUBPIXEL_SHIFT))
    out[..., 0] = np.where(use, int_disp[..., 0] + ox, 0.0)
    out[..., 1] = np.where(use, int_disp[..., 1] + oy, 0.0)
    out[..., 0] = np.where(keep_int, int_disp[..., 0].astype(np.float32), out[..., 0])
    out[..., 1] = np.where(keep_int, int_disp[..., 1].astype(np.float32), out[..., 1])
    return out, valid.copy()


# ---------------------------------------------------------------------------
# Disparity filters (DisparityMap.h:300-447) + consistency check
# ---------------------------------------------------------------------------


def rm_outliers_using_thresh(disp, valid, half_h, half_v, pixel_threshold,
                             rejection_threshold):
    """RmOutliersUsingThreshFunc over a replicate-extended disparity
    (DisparityMap.h:318-433): survive iff matched/total >= threshold."""
    h, w = valid.shape
    pd = np.pad(disp, ((half_v, half_v), (half_h, half_h), (0, 0)), mode="edge")
    pv = np.pad(valid, ((half_v, half_v), (half_h, half_h)), mode="edge")
    matched = np.zeros((h, w), np.int64)
    total = (2 * half_v + 1) * (2 * half_h + 1)
    d0 = disp[..., 0].astype(np.float64)
    d1 = disp[..., 1].astype(np.float64)
    for i in range(2 * half_v + 1):
        for j in range(2 * half_h + 1):
            nd = pd[i:i + h, j:j + w]
            nv = pv[i:i + h, j:j + w]
            ok = (nv & (np.abs(d0 - nd[..., 0]) <= pixel_threshold)
                  & (np.abs(d1 - nd[..., 1]) <= pixel_threshold))
            matched += ok
    keep = (matched / float(total)) >= rejection_threshold
    new_valid = valid & keep
    return np.where(new_valid[..., None], disp, 0), new_valid


def disparity_cleanup_using_thresh(disp, valid, half_h, half_v,
                                   pixel_threshold, rejection_threshold):
    """Two passes; second hard-coded (1, 1, 3.0, 0.20) (DisparityMap.h:426-447)."""
    d, v = rm_outliers_using_thresh(disp, valid, half_h, half_v,
                                    pixel_threshold, rejection_threshold)
    return rm_outliers_using_thresh(d, v, 1, 1, 3.0, 0.20)


def cross_corr_consistency_check(disp, valid, rl_disp, rl_valid, threshold):
    """Correlate.cc:1442-1502. Invalidates L2R pixels whose R2L target is out
    of bounds, invalid, or disagrees by more than the threshold (strict >)."""
    h, w = valid.shape
    rh, rw = rl_valid.shape
    ys, xs = np.mgrid[0:h, 0:w]
    tx = xs + disp[..., 0].astype(np.int64)
    ty = ys + disp[..., 1].astype(np.int64)
    in_b = (tx >= 0) & (tx < rw) & (ty >= 0) & (ty < rh)
    txc = np.clip(tx, 0, rw - 1)
    tyc = np.clip(ty, 0, rh - 1)
    rv = rl_valid[tyc, txc]
    rdx = rl_disp[..., 0][tyc, txc].astype(np.float32)
    rdy = rl_disp[..., 1][tyc, txc].astype(np.float32)
    diff = np.maximum(np.abs(disp[..., 0].astype(np.float32) + rdx),
                      np.abs(disp[..., 1].astype(np.float32) + rdy))
    new_valid = valid & in_b & rv & (threshold >= diff)
    return np.where(new_valid[..., None], disp, 0), new_valid


def disparity_mask(disp, valid, left_mask, right_mask):
    """DisparityMaskView::operator() (DisparityMap.h:141-160)."""
    h, w = valid.shape
    rh, rw = right_mask.shape
    ys, xs = np.mgrid[0:h, 0:w]
    tx = xs + disp[..., 0].astype(np.int64)
    ty = ys + disp[..., 1].astype(np.int64)
    in_b = (tx >= 0) & (tx < rw) & (ty >= 0) & (ty < rh)
    txc = np.clip(tx, 0, rw - 1)
    tyc = np.clip(ty, 0, rh - 1)
    rok = right_mask[tyc, txc] != 0
    new_valid = valid & (left_mask != 0) & in_b & rok
    return np.where(new_valid[..., None], disp, 0), new_valid


# ---------------------------------------------------------------------------
# Prefilters (Stereo/PreFilter.h:41-100) + pyramid kernels (Image/Filter.*)
# ---------------------------------------------------------------------------


def compute_kernel_size(sigma: float) -> int:
    size = int(7 * sigma)                       # Filter.cc:32-38
    if size < 3:
        size = 3
    elif size % 2 == 0:
        size -= 1
    return size


def generate_gaussian_kernel(sigma: float, size: int = 0) -> np.ndarray:
    """Filter.tcc:37-79 (erf-integrated taps, normalized)."""
    if sigma == 0:
        return np.zeros(0, np.float32)
    if size == 0:
        size = compute_kernel_size(sigma)
    kernel = np.zeros(size, np.float64)
    center = size // 2
    z = 1.0 / (math.sqrt(2.0) * sigma)
    s = 0.0
    if size % 2 == 0:
        for i in range(center):
            tap = math.erf((i + 1.0) * z) - math.erf(i * z)
            s += tap
            kernel[center + i] = kernel[center - i - 1] = tap
        s *= 2.0
    else:
        for i in range(1, center + 1):
            tap = math.erf((i + 0.5) * z) - math.erf((i - 0.5) * z)
            s += tap
            kernel[center + i] = kernel[center - i] = tap
        s *= 2.0
        tap = math.erf(0.5 * z) - math.erf(-0.5 * z)
        s += tap
        kernel[center] = tap
    return (kernel / s).astype(np.float32)


def separable_convolution_replicate(img: np.ndarray, xk: np.ndarray,
                                    yk: np.ndarray) -> np.ndarray:
    """separable_convolution_filter with centered origin and
    ConstantEdgeExtension (Filter.h:182-192). VW convolution correlates with
    the REVERSED kernel (true convolution)."""
    h, w = img.shape
    cx, cy = (len(xk) - 1) // 2, (len(yk) - 1) // 2
    px = np.pad(img.astype(np.float32), ((0, 0), (len(xk) - 1 - cx, cx)),
                mode="edge")
    out = np.zeros((h, w), np.float32)
    for i, k in enumerate(reversed(list(xk))):   # convolution flips
        out += np.float32(k) * px[:, i:i + w]
    py = np.pad(out, ((len(yk) - 1 - cy, cy), (0, 0)), mode="edge")
    out2 = np.zeros((h, w), np.float32)
    for i, k in enumerate(reversed(list(yk))):
        out2 += np.float32(k) * py[i:i + h, :]
    return out2


def laplacian_filter(img: np.ndarray) -> np.ndarray:
    """3x3 [0 1 0; 1 -4 1; 0 1 0] convolution, replicate edges
    (Filter.h:320-326)."""
    p = np.pad(img.astype(np.float32), 1, mode="edge")
    h, w = img.shape
    return (p[0:h, 1:w + 1] + p[2:h + 2, 1:w + 1] + p[1:h + 1, 0:w]
            + p[1:h + 1, 2:w + 2] - 4.0 * p[1:h + 1, 1:w + 1])


def prefilter_image(img: np.ndarray, mode: str, width: float) -> np.ndarray:
    """PreFilter.h:41-100: none / subtracted-mean / LoG."""
    if mode == "none":
        return img.astype(np.float32)
    k = generate_gaussian_kernel(width)
    g = separable_convolution_replicate(img, k, k)
    if mode == "meansub":
        return img.astype(np.float32) - g
    if mode == "log":
        return laplacian_filter(g)
    raise ValueError(mode)


PYRAMID_KERNEL = np.array([1, 4, 6, 4, 1], np.float32) / np.float32(16.0)


def blur_subsample(img: np.ndarray) -> np.ndarray:
    """5-tap blur + subsample(x, 2) taking even indices
    (CorrelationView.cc:210-216)."""
    b = separable_convolution_replicate(img, PYRAMID_KERNEL, PYRAMID_KERNEL)
    return b[::2, ::2]


def subsample_mask_by_two(mask: np.ndarray) -> np.ndarray:
    """SubsampleMaskByTwoFunc (CorrelationView.cc:36-60): 2x2 count > 1,
    evaluated at even pixels; out-of-bounds 2x2 members read replicated edges
    (the reference filter view is edge-extended when rasterized)."""
    h, w = mask.shape
    m = (np.asarray(mask) != 0).astype(np.int32)
    p = np.pad(m, ((0, 1), (0, 1)), mode="edge")
    cnt = p[0:h, 0:w] + p[1:h + 1, 0:w] + p[0:h, 1:w + 1] + p[1:h + 1, 1:w + 1]
    return (cnt[::2, ::2] > 1)


def mean_pixel_value_subsampled(img: np.ndarray, mask: np.ndarray) -> float:
    """mean_pixel_value(subsample(copy_mask(img, create_mask(mask, 0)), 2))
    (CorrelationView.cc:131-140): mean over the valid pixels of the 2x
    subsampled masked image. Raises ValueError when no valid pixels."""
    sub_i = img[::2, ::2]
    sub_m = mask[::2, ::2] != 0
    if not sub_m.any():
        raise ValueError("no valid pixels")
    return float(np.mean(sub_i[sub_m].astype(np.float64)))

# ---------------------------------------------------------------------------
# Pyramid correlator level loop (CorrelationView.cc:273-886, BM path)
# ---------------------------------------------------------------------------


def max_levels(width, height, kernel_size, search_region: OBox,
               requested: int) -> int:
    """CorrelationView.cc:300-308 + the ctor's search cap (:99-105)."""
    smallest_bbox = min(width, height)
    largest_kernel = max(int(kernel_size[0]), int(kernel_size[1]))
    lv = int(math.floor(math.log(smallest_bbox) / math.log(2.0)
                        - math.log(largest_kernel) / math.log(2.0)))
    largest_search = max(search_region.width, search_region.height)
    by_search = int(math.floor(math.log(float(max(largest_search, 1)))
                               / math.log(2.0))) - 1
    if by_search > requested:
        by_search = requested
    if by_search < 0:
        by_search = 0
    if by_search < lv:
        lv = by_search
    if lv < 1:
        lv = 0
    return lv


def pyramid_correlate(left, right, search_region: OBox, kernel_size,
                      left_mask=None, right_mask=None, cost_type="abs",
                      prefilter_mode="none", prefilter_width=1.4,
                      consistency_threshold=-1.0, max_pyramid_levels=5,
                      filter_half_kernel=5, census_window=5):
    """The PyramidCorrelationView BM path over a whole-image bbox.

    ``search_region`` uses the VW convention: the effective searched set at
    full resolution is ``[min, min + size]`` INCLUSIVE (the +1 of
    CorrelationView.cc:338-340). Returns (disp (H, W, 2) f32 absolute
    offsets, valid bool). Timeout and blob filtering are not modeled (tests
    run the framework with corr_timeout=0 and blob_filter_area=0).
    """
    left = np.asarray(left, np.float32)
    right = np.asarray(right, np.float32)
    h, w = left.shape
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    half_kw, half_kh = kw // 2, kh // 2
    bbox = OBox(0, 0, w, h)
    if left_mask is None:
        left_mask = np.ones((h, w), np.uint8)
    if right_mask is None:
        right_mask = np.ones(right.shape, np.uint8)
    left_mask = (np.asarray(left_mask) != 0).astype(np.uint8)
    right_mask = (np.asarray(right_mask) != 0).astype(np.uint8)

    levels = max_levels(w, h, (kw, kh), search_region, max_pyramid_levels)
    up = 1 << levels
    roff_x, roff_y = half_kw * up, half_kh * up
    s_w, s_h = search_region.width, search_region.height

    # ---- build_image_pyramids (CorrelationView.cc:66-240) ----------------
    left_global = OBox(bbox.minx - roff_x, bbox.miny - roff_y,
                       bbox.maxx + roff_x, bbox.maxy + roff_y)
    right_global = OBox(left_global.minx + search_region.minx,
                        left_global.miny + search_region.miny,
                        left_global.maxx + search_region.minx + s_w,
                        left_global.maxy + search_region.miny + s_h)
    lp0 = crop_replicate(left, left_global).astype(np.float32)
    rp0 = crop_replicate(right, right_global).astype(np.float32)
    lm_full = crop_replicate(left_mask, left_global)
    rm_full = crop_replicate(right_mask, right_global)
    try:
        left_mean = mean_pixel_value_subsampled(lp0, lm_full)
        right_mean = mean_pixel_value_subsampled(rp0, rm_full)
    except ValueError:
        return np.zeros((h, w, 2), np.float32), np.zeros((h, w), bool)
    lp0 = np.where(lm_full != 0, lp0, np.float32(left_mean))
    rp0 = np.where(rm_full != 0, rp0, np.float32(right_mean))

    # masks over the *unexpanded* regions, zero-extended (:188-199)
    right_mask_box = OBox(bbox.minx + search_region.minx,
                          bbox.miny + search_region.miny,
                          bbox.maxx + search_region.minx + s_w,
                          bbox.maxy + search_region.miny + s_h)
    lmask_pyr = [crop_zero(left_mask, bbox)]
    rmask_pyr = [crop_zero(right_mask, right_mask_box)]
    left_pyr, right_pyr = [lp0], [rp0]
    for _ in range(levels):
        left_pyr.append(blur_subsample(left_pyr[-1]))
        right_pyr.append(blur_subsample(right_pyr[-1]))
        lmask_pyr.append(subsample_mask_by_two(lmask_pyr[-1]))
        rmask_pyr.append(subsample_mask_by_two(rmask_pyr[-1]))
    left_pyr = [prefilter_image(im, prefilter_mode, prefilter_width)
                for im in left_pyr]
    right_pyr = [prefilter_image(im, prefilter_mode, prefilter_width)
                 for im in right_pyr]

    # ---- level loop (CorrelationView.cc:363-830, BM) ----------------------
    top_mask = lmask_pyr[levels]
    zones: List[Tuple[OBox, OBox]] = [(
        OBox(0, 0, top_mask.shape[1], top_mask.shape[0]),
        OBox(0, 0, s_w // up + 1, s_h // up + 1))]

    disparity = None
    valid = None
    for level in range(levels, -1, -1):
        on_last = level == 0
        scaling = 1 << level
        mh, mw = lmask_pyr[level].shape
        disparity = np.zeros((mh, mw, 2), np.int32)
        valid = np.zeros((mh, mw), bool)
        roff = (up * half_kw // scaling, up * half_kh // scaling)

        zones = sorted(zones, key=lambda z: float(z[0].area()) * z[1].area())
        for (region, drange) in zones:
            left_region = OBox(region.minx + roff[0] - half_kw,
                               region.miny + roff[1] - half_kh,
                               region.maxx + roff[0] + half_kw,
                               region.maxy + roff[1] + half_kh)
            right_region = OBox(left_region.minx + drange.minx,
                                left_region.miny + drange.miny,
                                left_region.maxx + drange.minx + drange.width,
                                left_region.maxy + drange.miny + drange.height)
            zd, zv = calc_disparity(
                cost_type, left_pyr[level], right_pyr[level], left_region,
                (drange.width, drange.height), (kw, kh), census_window)
            if consistency_threshold >= 0 and on_last:
                # RL check per zone (CorrelationView.cc:655-695). The match
                # view is a lazy out-of-bounds crop in C++; effectively the
                # replicate-extended left pyramid starting at
                # left_region.min - drange.size.
                rl_left = crop_replicate(right_pyr[level], right_region)
                match_box = OBox(
                    left_region.minx - drange.width,
                    left_region.miny - drange.height,
                    left_region.minx - drange.width + right_region.width
                    + drange.width - 1,
                    left_region.miny - drange.height + right_region.height
                    + drange.height - 1)
                rl_match = crop_replicate(left_pyr[level], match_box)
                rl_disp, rl_valid = best_of_search_convolution(
                    rl_left, rl_match, (drange.width, drange.height),
                    (kw, kh), cost_type, census_window)
                rl_disp = rl_disp - np.array([drange.width, drange.height],
                                             np.int32)
                rl_disp = np.where(rl_valid[..., None], rl_disp, 0)
                zd, zv = cross_corr_consistency_check(
                    zd, zv, rl_disp, rl_valid, consistency_threshold)
            zd = zd + np.array([drange.minx, drange.miny], np.int32)
            zd = np.where(zv[..., None], zd, 0)
            disparity[region.miny:region.maxy, region.minx:region.maxx] = zd
            valid[region.miny:region.maxy, region.minx:region.maxx] = zv

        # per-level speckle filtering (:707-749)
        if filter_half_kernel > 0:
            if not on_last:
                disparity, valid = disparity_cleanup_using_thresh(
                    disparity, valid, filter_half_kernel, filter_half_kernel,
                    3.0, 0.5)
            else:
                disparity, valid = rm_outliers_using_thresh(
                    disparity, valid, filter_half_kernel, filter_half_kernel,
                    3.0, 0.5)
            disparity, valid = disparity_mask(
                disparity, valid, lmask_pyr[level], rmask_pyr[level])

        # zone refinement (:754-800)
        if not on_last:
            new_zones: List[Tuple[OBox, OBox]] = []
            subdivide_regions(disparity, valid,
                              OBox(0, 0, valid.shape[1], valid.shape[0]),
                              new_zones, (kw, kh))
            nl = level - 1
            scale_search = OBox(0, 0,
                                right_pyr[nl].shape[1] - left_pyr[nl].shape[1],
                                right_pyr[nl].shape[0] - left_pyr[nl].shape[0])
            next_mask = lmask_pyr[nl]
            next_zone_box = OBox(0, 0, next_mask.shape[1], next_mask.shape[0])
            default_range = OBox(0, 0, s_w, s_h)
            zones = []
            for (region, drange) in new_zones:
                region = region.copy()
                region.scale(2)
                region.crop_to(next_zone_box)
                drange = drange.copy()
                drange.scale(2)
                drange.expand(2)
                drange.crop_to(scale_search)
                if drange.empty():
                    drange = default_range.copy()
                zones.append((region, drange))

    out = disparity.astype(np.float32) + np.array(
        [search_region.minx, search_region.miny], np.float32)
    out = np.where(valid[..., None], out, 0.0)
    return out, valid
