"""Hierarchical (pyramid) stereo correlator — the north-star pipeline
(ref ``src/vw/Stereo/CorrelationView.cc:66-886``, ``CorrelationView.h:35-193``).

Reference flow, preserved here: pad the left region by ``half_kernel * 2^L``
for full kernel support at every level (``CorrelationView.cc:84-99``); crop the
right image at ``search_region.min`` so in-pyramid disparities are always >= 0;
mean-fill masked pixels (``:129-150``); build 5-tap [1,4,6,4,1]/16 blur +
subsample-by-2 pyramids with 2-of-4 mask downsampling (``:202-216, :36-63``);
prefilter every level; then correlate coarse-to-fine with per-level speckle
filtering and (at level 0) an optional L<->R consistency check.

**TPU-native deviation (static shapes):** the reference refines search ranges
with a recursive quadtree of variable-size "zones" (``subdivide_regions``,
``Correlation.cc:139-328``). Data-dependent shapes don't trace, so this
implementation uses a *fixed tile grid with per-tile dynamic search offsets*:
each TxT tile takes the min of the (filtered, x2-upsampled) previous-level
disparity over the tile, expands by 2 (the reference's ``expand(2)``,
``CorrelationView.cc:784``), and searches a static-size window from that
offset via a vmapped scan. Same effect — local search ranges that track the
coarse solution — with shapes known at trace time. Tiles whose prior is fully
invalid fall back to the global valid minimum.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from visionworkbench_tpu.core.log import DEBUG, vw_out
from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.image.edge import crop_extended
from visionworkbench_tpu.image.convolution import separable_convolution_filter
from visionworkbench_tpu.image.filters import generate_pyramid_smoothing_kernel
from visionworkbench_tpu.stereo.correlation import (
    ABSOLUTE_DIFFERENCE, DisparityMap, _best_of_search,
)
from visionworkbench_tpu.stereo.disparity import (
    cross_corr_consistency_check, disparity_cleanup_using_thresh, disparity_mask,
    disparity_upsample, rm_outliers_using_thresh,
)
from visionworkbench_tpu.stereo.prefilter import PREFILTER_NONE, prefilter_image
from visionworkbench_tpu.stereo.subpixel import parabola_subpixel


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def max_pyramid_levels_for(width: int, height: int, kernel_size, search_region: BBox2i,
                           requested: int) -> int:
    """Level-count heuristic (ref ``CorrelationView.cc:300-308`` and the
    search-based cap ``CorrelationView.h:99-105``)."""
    smallest_bbox = min(width, height)
    largest_kernel = max(int(kernel_size[0]), int(kernel_size[1]))
    by_size = int(math.floor(math.log2(max(smallest_bbox, 1)) -
                             math.log2(max(largest_kernel, 1))))
    largest_search = max(search_region.width, search_region.height, 1)
    by_search = int(math.floor(math.log2(largest_search))) - 1
    levels = min(by_size, max(by_search, 0), int(requested))
    return max(levels, 0)


def _decimate_bands(n_out: int, n_in: int, taps, offset: int = 0):
    """(n_out, n_in) banded matrix D with D[o, 2*o + i + offset] = taps[i] —
    one matmul performs a small-tap filter *and* the subsample-by-2. Strided
    lane slices lower to gathers on this TPU toolchain (profiled ~3-4 ms per
    1024^2 plane); a banded fp32 matmul on the MXU does the same exactly and
    essentially for free."""
    o = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    i = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    rel = i - 2 * o - offset
    d = jnp.zeros((n_out, n_in), jnp.float32)
    for t, val in enumerate(taps):
        d = d + jnp.where(rel == t, jnp.float32(val), 0.0)
    return d


@jax.jit
def _blur_downsample(img):
    """5-tap pyramid smooth + subsample by 2 (ref ``CorrelationView.cc:210-216``).

    Fused as two banded MXU matmuls: rows' = D_r @ img, out = rows' @ D_c^T,
    where each band carries the [1,4,6,4,1]/16 taps at even offsets — exact
    (the taps are binary fractions; fp32 HIGHEST accumulation)."""
    kernel = [float(v) for v in generate_pyramid_smoothing_kernel()]
    h, w = img.shape
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    # VW "constant" edge extension = replicate; output o reads padded rows
    # 2o .. 2o+4 (the separable filter's default centered origin).
    p = jnp.pad(img, ((2, 2), (2, 2)), mode="edge")
    dr = _decimate_bands(h2, h + 4, kernel)
    dc = _decimate_bands(w2, w + 4, kernel)
    out = jnp.einsum("oh,hw->ow", dr, p, precision=lax.Precision.HIGHEST)
    return jnp.einsum("ow,pw->op", out, dc, precision=lax.Precision.HIGHEST)


@jax.jit
def _mask_downsample(mask):
    """2-of-4 2x2 mask reduction (ref ``SubsampleMaskByTwoFunc``,
    CorrelationView.cc:36-63). Operates on bool (H, W); output ceil sizes.
    The 2x2 counts are two banded 0/1 MXU matmuls (exact small-int fp32)."""
    h, w = mask.shape
    ph, pw = (-h) % 2, (-w) % 2
    m = jnp.pad(mask.astype(jnp.float32), ((0, ph), (0, pw)))
    dr = _decimate_bands((h + ph) // 2, h + ph, (1.0, 1.0))
    dc = _decimate_bands((w + pw) // 2, w + pw, (1.0, 1.0))
    s = jnp.einsum("oh,hw->ow", dr, m, precision=lax.Precision.HIGHEST)
    s = jnp.einsum("ow,pw->op", s, dc, precision=lax.Precision.HIGHEST)
    return s > 1.5


@functools.partial(jax.jit, static_argnames=("tile", "s_x", "s_y", "kw", "kh",
                                             "cost_type", "census_window"))
def _tiled_search(base, match, offsets, tile: int, s_x: int, s_y: int,
                  kw: int, kh: int, cost_type: str, census_window: int):
    """Vmapped per-tile disparity search — the static-shape "zone" engine.

    ``base``: padded image; tile (ty, tx) reads base rows
    ``ty*tile .. ty*tile + tile + kh - 2`` (i.e. base must carry half-kernel
    padding baked into its coordinate frame). ``match``: image searched over;
    tile reads a window of size (tile+kh-1+s_y-1, tile+kw-1+s_x-1) at
    ``(ty*tile + off_y + match_origin_y, ...)``. ``offsets``: (nty, ntx, 2)
    int32 (dx, dy) per tile, pre-clamped by the caller so slices stay in
    bounds. Returns (disp, valid) of size (nty*tile, ntx*tile, ...) where
    disp = offset + in-window argbest.
    """
    nty, ntx = offsets.shape[0], offsets.shape[1]
    lh, lw = tile + kh - 1, tile + kw - 1
    rh, rw = lh + s_y - 1, lw + s_x - 1
    # Batched-volume chunking: under vmap the volume is (ntiles, chunk, th, tw).
    from visionworkbench_tpu.stereo.correlation import _auto_chunk
    chunk = _auto_chunk(s_x * s_y, nty * ntx * lh * lw, cost_type)

    def per_tile(ty, tx, off):
        ltile = lax.dynamic_slice(base, (ty * tile, tx * tile), (lh, lw))
        rtile = lax.dynamic_slice(
            match, (ty * tile + off[1], tx * tile + off[0]), (rh, rw))
        disp, valid, _ = _best_of_search(ltile, rtile, s_x, s_y, kw, kh,
                                         cost_type, census_window, chunk)
        return disp + off[None, None, :], valid

    tys = jnp.repeat(jnp.arange(nty), ntx)
    txs = jnp.tile(jnp.arange(ntx), nty)
    offs = offsets.reshape(-1, 2)
    disp_t, valid_t = jax.vmap(per_tile)(tys, txs, offs)
    disp = disp_t.reshape(nty, ntx, tile, tile, 2).transpose(0, 2, 1, 3, 4)
    disp = disp.reshape(nty * tile, ntx * tile, 2)
    valid = valid_t.reshape(nty, ntx, tile, tile).transpose(0, 2, 1, 3)
    valid = valid.reshape(nty * tile, ntx * tile)
    return disp, valid


@functools.partial(jax.jit, static_argnames=("tile", "s_x", "s_y", "kw", "kh",
                                             "cost_type", "census_window"))
def _tiled_search_patches(base, match, offsets, tile: int, s_x: int, s_y: int,
                          kw: int, kh: int, cost_type: str,
                          census_window: int = 5):
    """:func:`_tiled_search` variant that also returns the 3x3 cost
    neighborhood of every winner (for parabola subpixel; see
    ``_search_with_patches``). ``match`` must be the level frame cropped with
    its origin shifted by (-1, -1) relative to ``_tiled_search``'s match frame
    and 2 extra pixels per axis, so each tile's window covers disparities
    ``[off - 1, off + s + 1)``. disp/valid are bit-identical to
    :func:`_tiled_search`."""
    from visionworkbench_tpu.stereo.correlation import (
        _auto_chunk, _search_with_patches,
    )
    nty, ntx = offsets.shape[0], offsets.shape[1]
    lh, lw = tile + kh - 1, tile + kw - 1
    rh, rw = lh + s_y + 1, lw + s_x + 1
    chunk = _auto_chunk((s_x + 2) * (s_y + 2), nty * ntx * lh * lw, cost_type)

    def per_tile(ty, tx, off):
        ltile = lax.dynamic_slice(base, (ty * tile, tx * tile), (lh, lw))
        rtile = lax.dynamic_slice(
            match, (ty * tile + off[1], tx * tile + off[0]), (rh, rw))
        disp, valid, _, patch = _search_with_patches(
            ltile, rtile, s_x, s_y, kw, kh, cost_type, chunk,
            census_window=census_window)
        return disp + off[None, None, :], valid, patch

    tys = jnp.repeat(jnp.arange(nty), ntx)
    txs = jnp.tile(jnp.arange(ntx), nty)
    offs = offsets.reshape(-1, 2)
    disp_t, valid_t, patch_t = jax.vmap(per_tile)(tys, txs, offs)
    disp = disp_t.reshape(nty, ntx, tile, tile, 2).transpose(0, 2, 1, 3, 4)
    disp = disp.reshape(nty * tile, ntx * tile, 2)
    valid = valid_t.reshape(nty, ntx, tile, tile).transpose(0, 2, 1, 3)
    valid = valid.reshape(nty * tile, ntx * tile)
    patch = patch_t.reshape(nty, ntx, tile, tile, 9).transpose(0, 2, 1, 3, 4)
    patch = patch.reshape(nty * tile, ntx * tile, 9)
    return disp, valid, patch


@functools.partial(jax.jit, static_argnames=("tile", "expand", "max_off_x", "max_off_y"))
def _tile_offsets(prior_disp, prior_valid, tile: int, expand: int,
                  max_off_x: int, max_off_y: int):
    """Per-tile search offsets from the previous level's disparity: tile-min
    over valid pixels, minus ``expand``, clamped to [0, max_off] — the
    static-shape stand-in for ``subdivide_regions`` zone ranges."""
    h, w = prior_valid.shape
    nty, ntx = h // tile, w // tile
    disp = prior_disp.astype(jnp.float32)
    big = jnp.float32(1e30)
    masked = jnp.where(prior_valid[..., None], disp, big)
    t = masked.reshape(nty, tile, ntx, tile, 2)
    tmin = jnp.min(t, axis=(1, 3))                       # (nty, ntx, 2)
    has_valid = jnp.any(prior_valid.reshape(nty, tile, ntx, tile), axis=(1, 3))
    global_min = jnp.min(masked.reshape(-1, 2), axis=0)
    global_min = jnp.where(global_min >= big, 0.0, global_min)
    tmin = jnp.where(has_valid[..., None], tmin, global_min[None, None, :])
    off = jnp.floor(tmin).astype(jnp.int32) - expand
    off_x = jnp.clip(off[..., 0], 0, max_off_x)
    off_y = jnp.clip(off[..., 1], 0, max_off_y)
    return jnp.stack([off_x, off_y], axis=-1)


def _hist_median(counts):
    """Exact median of non-negative-int samples from per-value counts
    (..., nvals): averages the two middle order statistics like
    ``nanmedian``. Zero-count rows return 0."""
    n = jnp.sum(counts, axis=-1, keepdims=True)
    cum = jnp.cumsum(counts, axis=-1)
    k1 = (n - 1) // 2                     # lower middle (0-based)
    k2 = n // 2                           # upper middle
    vals = jnp.arange(counts.shape[-1], dtype=jnp.float32)
    big = jnp.float32(counts.shape[-1])
    v1 = jnp.min(jnp.where(cum > k1, vals, big), axis=-1)
    v2 = jnp.min(jnp.where(cum > k2, vals, big), axis=-1)
    med = 0.5 * (v1 + v2)
    return jnp.where(n[..., 0] > 0, med, 0.0)


@functools.partial(jax.jit, static_argnames=("tile", "buffer", "max_off_x",
                                             "max_off_y", "value_bounds"))
def _tile_offsets_centered(prior_disp, prior_valid, tile: int, buffer: int,
                           max_off_x: int, max_off_y: int,
                           value_bounds: Optional[Tuple[int, int]] = None):
    """Per-tile search offsets centered on the tile median of the previous
    level's disparity — the static-shape stand-in for the reference SGM's
    per-pixel ``prev_disparity +- search_buffer`` bounds (SGM.cc:405-420).
    The median (vs the BM path's min) keeps the narrow ``2*buffer+1`` window
    centered on the dominant tile disparity.

    ``value_bounds``: static (n_x, n_y) such that valid disparities are
    integers in [0, n_x) x [0, n_y). When given, medians are computed from
    per-value histograms (fused counting, exact order statistics) — the
    generic ``nanmedian`` lowers to full sorts that cost ~4 ms/frame on a
    512^2 level."""
    h, w = prior_valid.shape
    nty, ntx = h // tile, w // tile
    has_valid = jnp.any(prior_valid.reshape(nty, tile, ntx, tile),
                        axis=(1, 3))
    if value_bounds is not None:
        di = jnp.clip(jnp.round(prior_disp).astype(jnp.int32), 0,
                      jnp.asarray([value_bounds[0] - 1, value_bounds[1] - 1]))
        t4 = (di.reshape(nty, tile, ntx, tile, 2)
              .transpose(0, 2, 1, 3, 4).reshape(nty, ntx, tile * tile, 2))
        v4 = prior_valid.reshape(nty, tile, ntx, tile) \
            .transpose(0, 2, 1, 3).reshape(nty, ntx, tile * tile)
        meds = []
        for c, nvals in ((0, int(value_bounds[0])), (1, int(value_bounds[1]))):
            onehot = (t4[..., c][..., None]
                      == jnp.arange(nvals)[None, None, None, :])
            counts = jnp.sum(jnp.where(v4[..., None], onehot, False)
                             .astype(jnp.float32), axis=2)   # (nty, ntx, n)
            meds.append(_hist_median(counts))
            gmed_c = _hist_median(jnp.sum(counts, axis=(0, 1)))
            meds[-1] = jnp.where(has_valid, meds[-1], gmed_c)
        med = jnp.stack(meds, axis=-1)
    else:
        disp = prior_disp.astype(jnp.float32)
        masked = jnp.where(prior_valid[..., None], disp, jnp.nan)
        t4 = (masked.reshape(nty, tile, ntx, tile, 2)
              .transpose(0, 2, 1, 3, 4).reshape(nty, ntx, tile * tile, 2))
        med = jnp.nanmedian(t4, axis=2)                  # (nty, ntx, 2)
        gmed = jnp.nanmedian(masked.reshape(-1, 2), axis=0)
        gmed = jnp.nan_to_num(gmed, nan=0.0)
        med = jnp.where(has_valid[..., None], jnp.nan_to_num(med, nan=0.0),
                        gmed[None, None, :])
    off = jnp.round(med).astype(jnp.int32) - buffer
    off_x = jnp.clip(off[..., 0], 0, max_off_x)
    off_y = jnp.clip(off[..., 1], 0, max_off_y)
    return jnp.stack([off_x, off_y], axis=-1)


class PyramidCorrResult(NamedTuple):
    disparity: DisparityMap          # absolute disparities, left-image frame
    level_disparities: Optional[list]


def pyramid_correlate(left, right, search_region: BBox2i,
                      kernel_size: Tuple[int, int] = (21, 21),
                      left_mask=None, right_mask=None,
                      cost_type: str = ABSOLUTE_DIFFERENCE,
                      prefilter_mode: str = PREFILTER_NONE,
                      prefilter_width: float = 1.4,
                      consistency_threshold: float = -1.0,
                      max_pyramid_levels: int = 5,
                      filter_half_kernel: int = 5,
                      tile_size: int = 64,
                      refine_window: int = 11,
                      census_window: int = 5,
                      subpixel: str = "none",
                      blob_filter_area: int = 0,
                      engine: str = "auto",
                      stereo_algorithm: str = "bm",
                      sgm_search_buffer: int = 2,
                      corr_timeout: float = 0.0,
                      seconds_per_op: Optional[float] = None,
                      keep_levels: bool = False) -> DisparityMap:
    """Full coarse-to-fine correlator (ref ``PyramidCorrelationView``,
    CorrelationView.cc:273-886; CLI: ``tools/correlate.cc:207-223``).

    Returns a :class:`DisparityMap` the size of ``left`` whose (dx, dy) are
    absolute right-image offsets (``search_region.min`` already added, as the
    reference does at the end of ``prerasterize``). ``subpixel='parabola'``
    appends the 9-point quadratic refinement (``parabola_subpixel``).

    ``corr_timeout`` (seconds, 0 disables) applies the reference's
    degrade-not-fail time budget (``m_corr_timeout``,
    CorrelationView.cc:621-637): per level, the predicted search time
    (pixels x search volume x s/op, ``calc_seconds_per_op`` style) is charged
    against the budget and the level's search volume is halved until it fits
    — a tiny budget degrades the search instead of failing. ``seconds_per_op``
    overrides the self-calibrated estimate (``Correlation.cc:377-429``).

    ``stereo_algorithm`` selects the per-level engine like the reference's
    ``CorrelationAlgorithm`` (CorrelationView.h:45, ``VW_CORRELATION_{BM,SGM,
    MGM}``): ``"bm"`` block matching (above), or ``"sgm"``/``"mgm"``
    semi-global matching per level over the same per-tile search offsets
    (census costs of ``census_window``; padding uses the census kernel, and
    ``subpixel`` may be any SGM mode — applied inside the last level, as the
    reference does).
    """
    from visionworkbench_tpu.core.exceptions import ArgumentErr
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    h, w = left.shape
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    if stereo_algorithm not in ("bm", "sgm", "mgm"):
        raise ArgumentErr(f"unknown stereo_algorithm {stereo_algorithm!r}")
    sgm_mode = stereo_algorithm in ("sgm", "mgm")
    if sgm_mode:
        # Census support drives the pyramid padding in SGM mode.
        kw = kh = int(census_window)
    if kw % 2 != 1 or kh % 2 != 1:
        raise ArgumentErr("pyramid_correlate: kernel dimensions must be odd")
    if search_region.width <= 0 or search_region.height <= 0:
        raise ArgumentErr("pyramid_correlate: search region must be non-empty")
    half_kw, half_kh = kw // 2, kh // 2
    # Engine: 'xla' is the chunked-volume sweep (big fused ops). On TPU,
    # 'auto' runs the LEVEL-0 patches sweep through the VMEM-resident
    # Pallas kernel (ops/sweep.py) for abs/sq costs — the round-3
    # second-generation kernel whose per-group lane-packed matmuls measure
    # 6.1 ms vs the XLA engine's 9.2 ms on the flagship stage (same-day
    # A/B; fp32-grade two-term bf16 split, 99.998% argmin agreement,
    # bit-exact for 8-bit-quantized inputs). 'pallas' forces it; refine
    # levels stay on the XLA engine (sub-ms sweeps vs per-shape remote
    # Mosaic compiles). All BM costs qualify since round 4 (abs/sq/ncc +
    # every census variant).
    if engine not in ("auto", "xla", "pallas"):
        raise ArgumentErr(f"unknown engine {engine!r}")
    pallas_ok = (engine != "xla" and not sgm_mode
                 and cost_type in (ABSOLUTE_DIFFERENCE, "sq", "census",
                                   "ternary_census", "ncc")
                 and os.environ.get("VWTPU_SWEEP_PALLAS", "1") == "1")
    if pallas_ok and cost_type in ("census", "ternary_census"):
        # all reference census variants are in-kernel (multi-word codes
        # ride extra DMA slabs; integer box sums stay exact)
        from visionworkbench_tpu.ops.sweep import _CENSUS_INFO
        pallas_ok = ((cost_type == "ternary_census",
                      int(census_window)) in _CENSUS_INFO)
    if pallas_ok and engine == "auto":
        from visionworkbench_tpu.stereo.sgm import _pallas_target_platform
        pallas_ok = _pallas_target_platform() == "tpu"
    use_pallas = pallas_ok
    # Parabola subpixel via cost-volume reuse: the reference re-evaluates
    # nine ABSOLUTE window costs per pixel no matter what cost the correlator
    # used — a hard-coded choice its own comment questions
    # (ParabolaSubpixelView.cc:49-51). Here the nine costs are exact entries
    # of the level-0 cost volume the sweep already computed (AD/SD/census),
    # extracted during the sweep instead of re-derived with a per-pixel warp
    # gather + nine box sums (~12 ms/Mpx on v5e; the census config measured
    # 58.6 -> 68.7 Mp/s from this, same-day pair). Set VWTPU_PARA_PATCHES=0
    # for the reference-exact SAD re-evaluation fallback.
    use_patches = (subpixel == "parabola" and not sgm_mode
                   and cost_type in (ABSOLUTE_DIFFERENCE, "sq", "census",
                                     "ternary_census")
                   and os.environ.get("VWTPU_PARA_PATCHES", "1") == "1")
    # The Pallas sweep serves the level-0 patches stage only.
    use_pallas = use_pallas and use_patches

    if sgm_mode:
        from visionworkbench_tpu.stereo.sgm import (
            SUBPIXEL_MODES, _P1_TABLE, _P2_TABLE, sgm_relative_search,
        )
        if subpixel not in SUBPIXEL_MODES:
            raise ArgumentErr(f"unknown SGM subpixel mode {subpixel!r}")
        sgm_cost = ("ternary_census" if cost_type == "ternary_census"
                    else "census")
        tkey = (sgm_cost, int(census_window))
        sgm_p1 = float(_P1_TABLE.get(tkey, 3))
        sgm_p2 = float(_P2_TABLE.get(tkey, 70))

        def _level_search(lbase_, mbase_, offsets_, t_, sx_, sy_, last_,
                          seeds=None, lmask_=None, ranges=(0, 0)):
            sd, sv = (None, None) if seeds is None else seeds
            return sgm_relative_search(
                lbase_, mbase_, offsets_, t_, sx_, sy_, int(census_window),
                sgm_cost == "ternary_census", 2, sgm_p1, sgm_p2,
                stereo_algorithm == "mgm", subpixel if last_ else "none",
                seed_disp=sd, seed_valid=sv,
                search_buffer=int(sgm_search_buffer),
                range_x=int(ranges[0]), range_y=int(ranges[1]),
                lmask=lmask_)
    else:
        def _level_search(lbase_, mbase_, offsets_, t_, sx_, sy_, last_,
                          seeds=None, lmask_=None, ranges=(0, 0)):
            # Level 0 (the forward pass when parabola patches are off, and
            # the RL consistency search) through the VMEM-resident kernel:
            # the plain no-patch variant measures 3.94 ms vs the XLA
            # engine's 6.16 on the flagship stage. Round 5: coarse levels
            # route through the kernel too by DEFAULT — measured 133.2 ->
            # 136.2 Mp/s same-day (the coarse XLA sweeps were 0.46 ms +
            # 0.16 ms of tile gathers) at the cost of one extra remote
            # Mosaic compile per level shape; VWTPU_SWEEP_COARSE=0 keeps
            # the old sub-ms-XLA behavior (faster first compile).
            coarse_kernel = os.environ.get("VWTPU_SWEEP_COARSE", "1") == "1"
            if pallas_ok and (last_ or coarse_kernel):
                from visionworkbench_tpu.ops.sweep import pallas_sweep
                d_, v_, _ = pallas_sweep(lbase_, mbase_, offsets_, t_,
                                         sx_, sy_, kw, kh, cost_type,
                                         want_patches=False,
                                         census_window=int(census_window))
                return d_, v_
            return _tiled_search(lbase_, mbase_, offsets_, t_, sx_, sy_,
                                 kw, kh, cost_type, census_window)
    s_w, s_h = int(search_region.width), int(search_region.height)
    smin_x, smin_y = int(search_region.min_x), int(search_region.min_y)

    levels = max_pyramid_levels_for(w, h, (kw, kh), search_region, max_pyramid_levels)
    up = 1 << levels
    off_x, off_y = half_kw * up, half_kh * up   # region_offset (CorrelationView.cc:89)

    user_masks = left_mask is not None or right_mask is not None
    if left_mask is None:
        left_mask = jnp.ones((h, w), bool)
    else:
        left_mask = jnp.asarray(left_mask).astype(bool)
    if right_mask is None:
        right_mask = jnp.ones(right.shape, bool)
    else:
        right_mask = jnp.asarray(right_mask).astype(bool)

    # ---- base-level regions (CorrelationView.cc:84-120) --------------------
    # Padded so every pyramid level halves exactly; extra `up` margin keeps
    # coarsest-level slices in bounds.
    base_w = w + 2 * off_x
    base_h = h + 2 * off_y
    pad_w = (-base_w) % up + up
    pad_h = (-base_h) % up + up
    base_w += pad_w
    base_h += pad_h
    left_base = crop_extended(left, -off_x, -off_y, base_w, base_h, mode="constant")
    rbase_w = base_w + s_w
    rbase_h = base_h + s_h
    right_base = crop_extended(right, -off_x + smin_x, -off_y + smin_y,
                               rbase_w, rbase_h, mode="constant")
    # Round right base up to a multiple of `up` too.
    rpad_w = (-rbase_w) % up
    rpad_h = (-rbase_h) % up
    rbase_w += rpad_w
    rbase_h += rpad_h
    right_base = crop_extended(right_base, 0, 0, rbase_w, rbase_h, mode="constant")

    # Masks over the padded frames, REPLICATE-extended like the reference
    # (CorrelationView.cc:110-117 crops the masks with ConstantEdgeExtension
    # before the mean fill, so kernel padding counts as valid wherever the
    # nearest real pixel is valid and keeps its replicated intensity instead
    # of being mean-filled; the zero-extended masks below are only for the
    # output-frame disparity_mask, matching :188-199).
    left_base_mask = crop_extended(left_mask, -off_x, -off_y, base_w, base_h,
                                   mode="constant").astype(bool)
    right_base_mask = crop_extended(right_mask, -off_x + smin_x, -off_y + smin_y,
                                    rbase_w, rbase_h, mode="constant").astype(bool)

    # Mean-fill masked pixels (CorrelationView.cc:129-150). The reference's
    # fill value is mean_pixel_value(subsample(masked_image, 2)) over the
    # left_global/right_global frames — the EVEN-index valid pixels only, and
    # not over this implementation's extra power-of-two alignment padding.
    # Reproduced exactly (tests/test_oracle_parity.py): the even-index
    # indicator is a fused elementwise op; a strided slice would lower to a
    # gather on this toolchain.
    def _mean_fill(img, mask, frame_h, frame_w):
        iy = lax.broadcasted_iota(jnp.int32, img.shape, 0)
        ix = lax.broadcasted_iota(jnp.int32, img.shape, 1)
        sel = (mask & (iy % 2 == 0) & (ix % 2 == 0)
               & (iy < frame_h) & (ix < frame_w))
        cnt = jnp.maximum(jnp.sum(sel.astype(jnp.float32)), 1.0)
        mean = jnp.sum(jnp.where(sel, img, 0.0)) / cnt
        return jnp.where(mask, img, mean)
    # Reference frames exclude the alignment padding; the right frame is one
    # short of rbase (the repo sizes the right base for max-exclusive search).
    left_base = _mean_fill(left_base, left_base_mask,
                           h + 2 * off_y, w + 2 * off_x)
    right_base = _mean_fill(right_base, right_base_mask,
                            h + 2 * off_y + s_h - 1, w + 2 * off_x + s_w - 1)

    # Output-frame masks (zero-extended, unpadded; CorrelationView.cc:195-199).
    lmask0 = left_mask
    rmask0 = crop_extended(right_mask, smin_x, smin_y, w + s_w, h + s_h,
                           mode="zero").astype(bool)

    # ---- build pyramids ----------------------------------------------------
    left_pyr, right_pyr = [left_base], [right_base]
    lmask_pyr, rmask_pyr = [lmask0], [rmask0]
    for i in range(1, levels + 1):
        left_pyr.append(_blur_downsample(left_pyr[-1]))
        right_pyr.append(_blur_downsample(right_pyr[-1]))
        lmask_pyr.append(_mask_downsample(lmask_pyr[-1]))
        rmask_pyr.append(_mask_downsample(rmask_pyr[-1]))
    left_pyr = [prefilter_image(im, prefilter_mode, prefilter_width) for im in left_pyr]
    right_pyr = [prefilter_image(im, prefilter_mode, prefilter_width) for im in right_pyr]

    level_results = [] if keep_levels else None
    dm: Optional[DisparityMap] = None

    # Time budget (ref m_corr_timeout, CorrelationView.cc:621-637).
    spent_est = 0.0
    spo = None
    if corr_timeout > 0:
        from visionworkbench_tpu.stereo import cost_model as _cm
        spo = (float(seconds_per_op) if seconds_per_op is not None
               else _cm.seconds_per_op())

    for level in range(levels, -1, -1):
        scaling = 1 << level
        on_last = level == 0
        # Search size at this level (CorrelationView.cc:391-395). Like the
        # reference, disparities are max-exclusive: d_abs in [min, min+size).
        s_w_l = max(s_w // scaling, 1)
        s_h_l = max(s_h // scaling, 1)
        out_h = -(-h // scaling)
        out_w = -(-w // scaling)
        region_off_x = off_x // scaling   # = half_kw * up / scaling
        region_off_y = off_y // scaling

        # Tile grid: pad output dims to a tile multiple.
        t = int(tile_size)
        nty, ntx = _cdiv(out_h, t), _cdiv(out_w, t)

        # Degrade-not-fail: shrink this level's search window until the
        # predicted time fits the remaining budget.
        cap_x, cap_y = s_w_l, s_h_l
        if corr_timeout > 0:
            from visionworkbench_tpu.stereo.cost_model import (
                budget_search_volume, estimate_search_time)
            rem = corr_timeout - spent_est
            if rem <= 0:          # budget exhausted: minimal search
                cap_x, cap_y = 1, 1
            else:
                cap_x, cap_y = budget_search_volume(out_h * out_w,
                                                    (s_w_l, s_h_l), rem, spo)
            if (cap_x, cap_y) != (s_w_l, s_h_l):
                vw_out(DEBUG, "stereo").debug(
                    "level %d: search degraded to (%d, %d) by "
                    "corr_timeout=%s", level, cap_x, cap_y, corr_timeout)

        if level == levels:
            offsets = jnp.zeros((nty, ntx, 2), jnp.int32)
            s_x_eff, s_y_eff = min(s_w_l, cap_x), min(s_h_l, cap_y)
        else:
            prior = disparity_upsample(dm)
            pr_d = prior.disparity[:out_h, :out_w]
            pr_v = prior.valid[:out_h, :out_w]
            # pad prior to tile multiple (invalid padding)
            py, px = nty * t - out_h, ntx * t - out_w
            pr_d = jnp.pad(pr_d, ((0, py), (0, px), (0, 0)))
            pr_v = jnp.pad(pr_v, ((0, py), (0, px)))
            # SGM refines +-sgm_search_buffer around the seed (ref SGM.h:113,
            # default Vector2i(2,2)); BM uses the wider refine window.
            if sgm_mode:
                rw = 2 * int(sgm_search_buffer) + 1
                s_x_eff = min(rw, s_w_l, cap_x)
                s_y_eff = min(rw, s_h_l, cap_y)
                offsets = _tile_offsets_centered(pr_d, pr_v, t,
                                                 int(sgm_search_buffer),
                                                 s_w_l - s_x_eff,
                                                 s_h_l - s_y_eff,
                                                 value_bounds=(s_w_l, s_h_l))
            else:
                s_x_eff = min(int(refine_window), s_w_l, cap_x)
                s_y_eff = min(int(refine_window), s_h_l, cap_y)
                offsets = _tile_offsets(pr_d, pr_v, t, 2,
                                        s_w_l - s_x_eff, s_h_l - s_y_eff)

        if corr_timeout > 0:
            spent_est += estimate_search_time(out_h * out_w,
                                              (s_x_eff, s_y_eff), spo)
            if on_last and consistency_threshold >= 0:
                # the RL pass is charged too (CorrelationView.cc:661-668)
                spent_est += estimate_search_time(out_h * out_w,
                                                  (s_x_eff, s_y_eff), spo)

        # Base (left) frame for tile extraction: tiles at (ty*t, tx*t) must
        # read left_pyr[level] starting at the unpadded region minus half the
        # kernel: bake that origin in with a crop (replicate-extended where
        # tile padding overruns the stored level).
        ly0 = region_off_y - half_kh
        lx0 = region_off_x - half_kw
        lbh = nty * t + kh - 1
        lbw = ntx * t + kw - 1
        lbase = crop_extended(left_pyr[level], lx0, ly0, lbw, lbh, mode="constant")
        # Match frame: right pyramid, same origin (its coordinate frame is
        # already shifted by search.min at full res).
        mh = lbh + s_h_l - 1
        mw = lbw + s_w_l - 1
        mbase = crop_extended(right_pyr[level], lx0, ly0, mw, mh, mode="constant")

        patches = None
        if on_last and use_patches:
            # Extended match frame: origin shifted (-1, -1), +2 per axis, so
            # every tile window also covers the ±1 disparity ring.
            mbase_p = crop_extended(right_pyr[level], lx0 - 1, ly0 - 1,
                                    mw + 2, mh + 2, mode="constant")
            if use_pallas:
                from visionworkbench_tpu.ops.sweep import pallas_sweep
                disp, valid, patches = pallas_sweep(
                    lbase, mbase_p, offsets, t, s_x_eff, s_y_eff, kw, kh,
                    cost_type, want_patches=True,
                    census_window=int(census_window),
                    patches_as_planes=True)
                patches = tuple(p[:out_h, :out_w] for p in patches)
            else:
                disp, valid, patches = _tiled_search_patches(
                    lbase, mbase_p, offsets, t, s_x_eff, s_y_eff, kw, kh,
                    cost_type, census_window=census_window)
                patches = patches[:out_h, :out_w]
        else:
            sgm_kwargs = {}
            if sgm_mode:
                # Per-pixel seeds from the (filtered, upsampled) previous
                # level + the level's left mask — SGM invalidates internally
                # (ref m_disp_bound_image / ZERO_SEARCH_AREA, SGM.h:180-198).
                lm_lvl = lmask_pyr[level][:out_h, :out_w]
                lm_lvl = jnp.pad(lm_lvl, ((0, nty * t - out_h),
                                          (0, ntx * t - out_w)))
                sgm_kwargs["lmask_"] = lm_lvl
                sgm_kwargs["ranges"] = (s_w_l, s_h_l)
                if level < levels:
                    sgm_kwargs["seeds"] = (pr_d.astype(jnp.float32), pr_v)
            disp, valid = _level_search(lbase, mbase, offsets, t,
                                        s_x_eff, s_y_eff, on_last,
                                        **sgm_kwargs)
        disp = disp[:out_h, :out_w]
        valid = valid[:out_h, :out_w]
        dm = DisparityMap(disp, valid)

        # L<->R consistency check at level 0 (CorrelationView.cc:653-695).
        if on_last and consistency_threshold >= 0:
            # RL search: base = right frame, match = left; RL offsets cover
            # the negation of each tile's LR window.
            rl_out_h = min(out_h + s_h, rmask_pyr[level].shape[0])
            rl_out_w = min(out_w + s_w, rmask_pyr[level].shape[1])
            rnty, rntx = _cdiv(rl_out_h, t), _cdiv(rl_out_w, t)
            # Reuse LR tile offsets where available; edge tiles fall back to 0.
            pad_ty, pad_tx = rnty - offsets.shape[0], rntx - offsets.shape[1]
            off_rl_src = jnp.pad(offsets, ((0, max(pad_ty, 0)), (0, max(pad_tx, 0)),
                                           (0, 0)))[:rnty, :rntx]
            # d_rl = -(off + S - 1) + rel, rel in [0, S)
            neg_off = -(off_rl_src + jnp.array([s_x_eff - 1, s_y_eff - 1], jnp.int32))
            rbh = rnty * t + kh - 1
            rbw = rntx * t + kw - 1
            rl_base = crop_extended(right_pyr[level], lx0, ly0, rbw, rbh,
                                    mode="constant")
            # Match = left frame; negative offsets need an origin shift: crop
            # the left pyramid with a (S-1 + max_off) margin on top/left so
            # all shifted offsets stay non-negative.
            max_off_x_v = s_w_l - s_x_eff
            max_off_y_v = s_h_l - s_y_eff
            margin_x = s_x_eff - 1 + max_off_x_v
            margin_y = s_y_eff - 1 + max_off_y_v
            lm_h = rbh + s_y_eff - 1 + margin_y
            lm_w = rbw + s_x_eff - 1 + margin_x
            rl_match = crop_extended(left_pyr[level], lx0 - margin_x,
                                     ly0 - margin_y, lm_w, lm_h, mode="constant")
            rl_origin = jnp.array([margin_x, margin_y], jnp.int32)
            rl_disp, rl_valid = _level_search(rl_base, rl_match,
                                              neg_off + rl_origin,
                                              t, s_x_eff, s_y_eff, on_last)
            rl_disp = rl_disp - rl_origin
            rl_dm = DisparityMap(rl_disp[:rl_out_h, :rl_out_w],
                                 rl_valid[:rl_out_h, :rl_out_w])
            dm = cross_corr_consistency_check(dm, rl_dm, consistency_threshold)

        # Per-level speckle filtering (CorrelationView.cc:707-745).
        if filter_half_kernel > 0:
            # Disparities at this point are integer-valued (per-level search
            # output, pre-subpixel) -> packed-code speckle fast path.
            if not on_last:
                dm = disparity_cleanup_using_thresh(dm, filter_half_kernel,
                                                    filter_half_kernel, 3.0, 0.5,
                                                    integer_disparities=True)
            else:
                dm = rm_outliers_using_thresh(dm, filter_half_kernel,
                                              filter_half_kernel, 3.0, 0.5,
                                              integer_disparities=True)
            if on_last and not user_masks:
                # No user masks at level 0: rmask0 is exactly the rectangle
                # where the (smin-shifted, zero-extended) right crop covers
                # real pixels, so the disparity_mask gather reduces to bounds
                # arithmetic (saves an ~11 ms 1-Mpx mask gather per frame).
                rh_o, rw_o = right.shape
                ra, rb = max(0, -smin_y), min(h + s_h, rh_o - smin_y)
                ca, cb = max(0, -smin_x), min(w + s_w, rw_o - smin_x)
                iy = lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0)
                ix = lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
                ty = iy + dm.disparity[..., 1].astype(jnp.int32)
                tx = ix + dm.disparity[..., 0].astype(jnp.int32)
                ok = (ty >= ra) & (ty < rb) & (tx >= ca) & (tx < cb)
                valid = dm.valid & ok
                dm = DisparityMap(
                    jnp.where(valid[..., None], dm.disparity, 0), valid)
            else:
                lm = lmask_pyr[level][:out_h, :out_w]
                rm = rmask_pyr[level]
                # Disparities at this level are bounded by the level search
                # range [0, s_w_l) x [0, s_h_l) (offsets are clamped to keep
                # offset + window inside it) — a static bound that turns the
                # right-mask gather into a fused select chain.
                dm = disparity_mask(dm, lm, rm,
                                    disparity_bounds=BBox2i(0, 0, s_w_l, s_h_l))

        # Isolated-blob removal (ref disparity_blob_filter,
        # CorrelationView.cc:241-280: area threshold scaled by level).
        if blob_filter_area > 0:
            area = blob_filter_area // scaling
            if area >= 1:
                from visionworkbench_tpu.image.morphology import remove_small_blobs
                keep = remove_small_blobs(dm.valid, area)
                dm = DisparityMap(jnp.where(keep[..., None], dm.disparity, 0), keep)

        if keep_levels:
            level_results.append(dm)

    # Absolute disparities (CorrelationView.cc: final offset add).
    final = DisparityMap(
        jnp.where(dm.valid[..., None],
                  dm.disparity + jnp.array([smin_x, smin_y], dm.disparity.dtype), 0),
        dm.valid)

    if sgm_mode:
        pass  # SGM subpixel already applied inside the last level
    elif subpixel == "parabola":
        if use_patches:
            from visionworkbench_tpu.stereo.subpixel import _fit_parabola
            final = DisparityMap(
                _fit_parabola(patches, final.disparity, final.valid),
                final.valid)
        else:
            final = parabola_subpixel(final, left, right, (kw, kh),
                                      prefilter_mode, prefilter_width)
    elif subpixel in ("affine", "em"):
        # Iterative affine / Bayes-EM refinement (ref PyramidSubpixelView's
        # SUBPIXEL_FAST_AFFINE / SUBPIXEL_BAYES_EM, SubpixelView.h:28-146;
        # stereo_rfne applies these after the integer correlator).
        from visionworkbench_tpu.stereo.subpixel_refine import bayes_em_subpixel
        # Production configuration, measured (256^2 sinusoid, fp32):
        # the integer correlator seeds every pixel within ~0.5 px, from
        # which 3 Gauss-Newton outer iterations are BOTH ~3x faster and
        # more accurate than the reference's 10 (iters 3: 0.92 valid /
        # 0.014 px median err; iters 10: 0.81 / 0.15 — extra iterations
        # let marginal pixels wander to the abort radius). The reference's
        # own coarse-to-fine PyramidSubpixelView loop is available via
        # bayes_em_subpixel(max_pyramid_levels=N) for seeds worse than the
        # correlator's (its dense-kernel variant measured strictly worse
        # when the correlator seed is already sub-pixel).
        final = bayes_em_subpixel(final, left, right, (kw, kh),
                                  em_iters=2 if subpixel == "em" else 0,
                                  prefilter_mode=prefilter_mode,
                                  prefilter_width=prefilter_width,
                                  max_pyramid_levels=0, outer_iters=3)
    elif subpixel != "none":
        raise ValueError(f"unknown subpixel mode {subpixel!r}")

    if keep_levels:
        return PyramidCorrResult(final, level_results)
    return final
