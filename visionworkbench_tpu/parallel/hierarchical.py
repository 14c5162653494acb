"""Fully-sharded hierarchical correlator — row bands at EVERY pyramid level.

``tile_sharding.sharded_pyramid_correlate`` gives each device a collar sized
to the correlator's whole receptive field (O(2^levels) rows) and recomputes
the full pyramid inside it — the reference's per-tile prerasterize model
(``CorrelationView.cc:100-230``) mapped onto devices.  That collar is pure
overhead and grows exponentially with pyramid depth, capping weak-scaling
efficiency.

This module is the TPU-native alternative: the pyramid itself is sharded.
Every level's image lives as row bands across the mesh, and each step that
needs vertical context — the 5-tap downsample, the half-kernel correlation
support, the vertical search reach, the speckle filters — exchanges just the
few rows it needs over ICI (``halo_exchange_rows`` -> ``lax.ppermute``)
*at that level's resolution*.  Per-device overhead is then
``sum_l halo_l / band_l`` — a few percent — instead of ``2*2^L*R / band``,
and no work is replicated.

Level/tile coordinate frames match ``stereo.pyramid_correlation`` (the
monolithic engine) so interior results agree; global image edges use
replicated edge rows exactly like the monolithic ``crop_extended`` padding.

Full feature parity with the monolithic engine: cost correlation, user
masks (mean-fill via cross-band psum, banded 2-of-4 mask pyramids,
disparity_mask with exchanged target rows), L<->R consistency (banded
reverse search + RL row exchange), per-level speckle cleanup, small-blob
removal (exact: a blob below the area threshold fits within
area-threshold rows of any of its pixels, so an area-sized halo
classifies band rows exactly), and parabola subpixel.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.image.edge import crop_extended
from visionworkbench_tpu.parallel.mesh import TILE_AXIS
from visionworkbench_tpu.parallel.tile_sharding import halo_exchange_rows
from visionworkbench_tpu.stereo.correlation import (
    ABSOLUTE_DIFFERENCE, DisparityMap,
)
from visionworkbench_tpu.stereo.disparity import (
    cross_corr_consistency_check, disparity_cleanup_using_thresh,
    disparity_upsample, rm_outliers_using_thresh,
)
from visionworkbench_tpu.stereo.prefilter import PREFILTER_NONE, prefilter_image
from visionworkbench_tpu.stereo.pyramid_correlation import (
    _blur_downsample, _cdiv, _mask_downsample, _tile_offsets, _tiled_search,
    _tiled_search_patches, max_pyramid_levels_for,
)


def _halo_cleanup(dm: DisparityMap, fhk: int, on_last: bool) -> DisparityMap:
    """Per-level speckle filter with ``fhk`` rows of exchanged context so
    band-interior pixels see the same window as the monolithic filter."""
    d = halo_exchange_rows(dm.disparity, fhk, fhk)
    v = halo_exchange_rows(dm.valid, fhk, fhk)
    pdm = DisparityMap(d, v)
    if on_last:
        pdm = rm_outliers_using_thresh(pdm, fhk, fhk, 3.0, 0.5,
                                       integer_disparities=True)
    else:
        pdm = disparity_cleanup_using_thresh(pdm, fhk, fhk, 3.0, 0.5,
                                             integer_disparities=True)
    return DisparityMap(pdm.disparity[fhk:d.shape[0] - fhk],
                        pdm.valid[fhk:d.shape[0] - fhk])


def hierarchical_sharded_correlate(left, right, search_region: BBox2i,
                                   mesh: Mesh,
                                   left_mask=None, right_mask=None,
                                   kernel_size: Tuple[int, int] = (21, 21),
                                   cost_type: str = ABSOLUTE_DIFFERENCE,
                                   consistency_threshold: float = -1.0,
                                   blob_filter_area: int = 0,
                                   prefilter_mode: str = PREFILTER_NONE,
                                   prefilter_width: float = 1.4,
                                   max_pyramid_levels: int = 5,
                                   filter_half_kernel: int = 5,
                                   tile_size: int = 64,
                                   refine_window: int = 11,
                                   census_window: int = 5,
                                   subpixel: str = "none",
                                   stereo_algorithm: str = "bm",
                                   sgm_search_buffer: int = 2) -> DisparityMap:
    """Distributed coarse-to-fine correlator with per-level halo exchange.

    Same output contract as ``pyramid_correlate`` (absolute disparities,
    ``search_region.min`` folded in); rows sharded over ``mesh``'s
    ``TILE_AXIS``.  Requires ``h % (n * 2^levels) == 0``.

    ``stereo_algorithm``: ``"bm"`` (block matching) or ``"sgm"``/``"mgm"``.
    In SGM/MGM mode each band runs the census + 8-path aggregation over its
    rows plus ``tile_size`` rows of exchanged context per side, then crops —
    the reference's per-tile rasterization semantics (``SGM.cc:2462-2531``
    sweeps whole scanlines per tile; paths truncate at tile edges). Band
    seams therefore truncate the vertical/diagonal aggregation paths at the
    collar edge: rows whose winners depend on path context deeper than
    ``tile_size`` rows may differ from the monolithic result (measured:
    exact interior agreement away from seams on textured scenes;
    tests/test_parallel.py pins the exact claim). The L<->R consistency
    check is not offered in SGM mode (the monolithic engine provides it).
    """
    if stereo_algorithm not in ("bm", "sgm", "mgm"):
        raise ArgumentErr(f"unknown stereo_algorithm {stereo_algorithm!r}")
    sgm_mode = stereo_algorithm in ("sgm", "mgm")
    if sgm_mode and consistency_threshold >= 0:
        raise ArgumentErr("hierarchical SGM/MGM does not offer the L<->R "
                          "consistency check; use the monolithic engine")
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    h, w = left.shape
    has_masks = left_mask is not None or right_mask is not None
    lmask_in = (jnp.ones((h, w), bool) if left_mask is None
                else jnp.asarray(left_mask).astype(bool))
    rmask_in = (jnp.ones(right.shape, bool) if right_mask is None
                else jnp.asarray(right_mask).astype(bool))
    if right.shape != (h, w):
        raise ArgumentErr("hierarchical_sharded_correlate: left/right must "
                          "share a shape (fold extra right columns into "
                          "search_region)")
    n = mesh.devices.size
    if h % n != 0:
        raise ArgumentErr(f"rows {h} must divide over {n} devices")
    hb = h // n

    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    if sgm_mode:
        # Census support drives the padding, like the monolithic engine.
        kw = kh = int(census_window)
        from visionworkbench_tpu.stereo.sgm import (
            _P1_TABLE, _P2_TABLE, sgm_relative_search,
        )
        from visionworkbench_tpu.stereo.pyramid_correlation import (
            _tile_offsets_centered,
        )
        sgm_cost = "ternary_census" if cost_type == "ternary_census" \
            else "census"
        tkey = (sgm_cost, kw)
        sgm_p1 = float(_P1_TABLE.get(tkey, 3))
        sgm_p2 = float(_P2_TABLE.get(tkey, 70))
    if kw % 2 != 1 or kh % 2 != 1:
        raise ArgumentErr("kernel dimensions must be odd")
    half_kw, half_kh = kw // 2, kh // 2
    s_w, s_h = int(search_region.width), int(search_region.height)
    smin_x, smin_y = int(search_region.min_x), int(search_region.min_y)
    if s_w <= 0 or s_h <= 0:
        raise ArgumentErr("search region must be non-empty")

    levels = max_pyramid_levels_for(w, h, (kw, kh), search_region,
                                    max_pyramid_levels)
    # Pyramid subsample grids must stay band-aligned: clamp the depth to the
    # band's power-of-two divisibility instead of failing.
    while levels > 0 and hb % (1 << levels) != 0:
        levels -= 1
    up = 1 << levels
    off_x = half_kw * up
    t = int(tile_size)

    # Stored-frame widths (col 0 = global col -off_x), as in the monolithic
    # engine's left_base / right_base.
    base_w = w + 2 * off_x
    base_w += (-base_w) % up + up
    rbase_w = base_w + s_w
    rbase_w += (-rbase_w) % up

    pf_halo = 0
    if prefilter_mode != PREFILTER_NONE:
        pf_halo = int(7 * prefilter_width) // 2 + 2

    # Route band searches through the VMEM-resident Pallas sweep kernel on
    # TPU, same support condition as the monolithic engine (which measured
    # the kernel 1.3-1.6x the XLA zone engine per sweep; the 4096^2
    # hierarchical-1dev row in docs/roofline.md was 2.6x off the flagship
    # largely because these sweeps ran the XLA engine). pallas_call inside
    # shard_map executes per-shard; the CPU virtual meshes (tests, dryrun)
    # keep the XLA engine via the platform check.
    use_kernel = (not sgm_mode
                  and os.environ.get("VWTPU_SWEEP_PALLAS", "1") == "1"
                  and cost_type in (ABSOLUTE_DIFFERENCE, "sq", "census",
                                    "ternary_census", "ncc"))
    if use_kernel and cost_type in ("census", "ternary_census"):
        from visionworkbench_tpu.ops.sweep import _CENSUS_INFO
        use_kernel = ((cost_type == "ternary_census",
                       int(census_window)) in _CENSUS_INFO)
    if use_kernel:
        from visionworkbench_tpu.stereo.sgm import _pallas_target_platform
        use_kernel = _pallas_target_platform() == "tpu"

    def _band_search(lbase_, mbase_, offsets_, sxe, sye):
        """One band-level sweep: Pallas kernel on TPU, XLA engine elsewhere.
        Both take the identical (base, match, per-tile offsets) frames and
        return (disp, valid) in the same tile-relative convention."""
        if use_kernel:
            from visionworkbench_tpu.ops.sweep import pallas_sweep
            d_, v_, _ = pallas_sweep(lbase_, mbase_, offsets_, t, sxe, sye,
                                     kw, kh, cost_type, want_patches=False,
                                     census_window=int(census_window))
            return d_, v_
        return _tiled_search(lbase_, mbase_, offsets_, t, sxe, sye,
                             kw, kh, cost_type, census_window)

    # Parabola via cost-volume patch reuse, exactly like the monolithic
    # engine's level-0 default (pyramid_correlation.py use_patches): the
    # nine parabola costs are entries of the cost volume the band sweep
    # already computed, captured during the sweep instead of re-derived by
    # a full-band SAD re-evaluation pass (which the hierarchical profile
    # measured at ~7.7 of 13.9 ms/frame device at 1024^2/1-dev).
    use_patches = (subpixel == "parabola" and not sgm_mode
                   and cost_type in (ABSOLUTE_DIFFERENCE, "sq", "census",
                                     "ternary_census")
                   and os.environ.get("VWTPU_PARA_PATCHES", "1") == "1")

    def _band_search_patches(lbase_, mbase_p, offsets_, sxe, sye):
        """Level-0 sweep that also captures each winner's 3x3 cost patch.
        ``mbase_p``: the match frame with origin shifted (-1, -1) and +2
        extent per axis (the ±1 disparity ring), like the monolithic call."""
        if use_kernel:
            from visionworkbench_tpu.ops.sweep import pallas_sweep
            d_, v_, p_ = pallas_sweep(lbase_, mbase_p, offsets_, t, sxe, sye,
                                      kw, kh, cost_type, want_patches=True,
                                      census_window=int(census_window),
                                      patches_as_planes=True)
            return d_, v_, p_
        return _tiled_search_patches(lbase_, mbase_p, offsets_, t, sxe, sye,
                                     kw, kh, cost_type,
                                     census_window=census_window)

    def shard_fn(lblock, rblock, lmblock, rmblock):
        # Full-res bands in the stored frames.  The right band is the
        # search-origin-shifted frame: its row r = right row r + smin_y,
        # col c = right col c + smin_x - off_x.
        lband = crop_extended(lblock, -off_x, 0, base_w, hb, mode="constant")
        top = max(-smin_y, 0)
        bot = max(smin_y, 0)
        rpad = halo_exchange_rows(rblock, top, bot)
        rrows = lax.dynamic_slice_in_dim(rpad, top + smin_y, hb, axis=0)
        rband = crop_extended(rrows, smin_x - off_x, 0, rbase_w, hb,
                              mode="constant")

        # Output-frame masks (ref CorrelationView.cc:195-199): left over the
        # (h, w) band, right zero-extended over the shifted (w + s_w) frame.
        lmask0 = lmblock
        rm_pad = halo_exchange_rows(rmblock.astype(jnp.int32), top, bot)
        g0_full = lax.axis_index(TILE_AXIS) * hb
        rm_rows_g = (g0_full - top + jnp.arange(rm_pad.shape[0]))
        rm_pad = rm_pad * ((rm_rows_g >= 0) & (rm_rows_g < h)
                           ).astype(jnp.int32)[:, None]
        rm_rows = lax.dynamic_slice_in_dim(rm_pad, top + smin_y, hb, axis=0)
        rmask0 = crop_extended(rm_rows, smin_x, 0, w + s_w, hb,
                               mode="zero").astype(bool)

        if has_masks:
            # Mean-fill masked pixels with the GLOBAL valid mean
            # (ref CorrelationView.cc:129-150), via cross-band psums.
            lb_mask = crop_extended(lmblock, -off_x, 0, base_w, hb,
                                    mode="zero").astype(bool)
            rb_mask = crop_extended(rmask0, -off_x, 0, rbase_w, hb,
                                    mode="zero").astype(bool)

            def fill(img, mask):
                s = lax.psum(jnp.sum(jnp.where(mask, img, 0.0)), TILE_AXIS)
                c = lax.psum(jnp.sum(mask), TILE_AXIS)
                return jnp.where(mask, img, s / jnp.maximum(c, 1))
            lband = fill(lband, lb_mask)
            rband = fill(rband, rb_mask)

        def level_filter(img):
            if prefilter_mode == PREFILTER_NONE:
                return img
            p = halo_exchange_rows(img, pf_halo, pf_halo)
            p = prefilter_image(p, prefilter_mode, prefilter_width)
            return p[pf_halo:p.shape[0] - pf_halo]

        # Banded pyramids: exchange the 5-tap filter's 2-row support, smooth,
        # and keep this band's aligned half (global subsample grids match the
        # monolithic build because band starts divide by 2^level).
        lpyr, rpyr = [lband], [rband]
        for _ in range(levels):
            def down(x):
                p = halo_exchange_rows(x, 2, 2)
                d = _blur_downsample(p)
                return d[1:1 + x.shape[0] // 2]
            lpyr.append(down(lpyr[-1]))
            rpyr.append(down(rpyr[-1]))
        lpyr = [level_filter(im) for im in lpyr]
        rpyr = [level_filter(im) for im in rpyr]
        # 2-of-4 mask pyramids; the 2x2 blocks never cross band edges
        # (band heights divide by 2^levels), so no exchange is needed.
        lmask_pyr, rmask_pyr = [lmask0], [rmask0]
        for _ in range(levels):
            lmask_pyr.append(_mask_downsample(lmask_pyr[-1]))
            rmask_pyr.append(_mask_downsample(rmask_pyr[-1]))

        dm: Optional[DisparityMap] = None
        patches = None
        for level in range(levels, -1, -1):
            scaling = 1 << level
            on_last = level == 0
            s_w_l = max(s_w // scaling, 1)
            s_h_l = max(s_h // scaling, 1)
            band_l = hb // scaling
            out_w = _cdiv(w, scaling)
            region_off_x = off_x // scaling

            nty, ntx = _cdiv(band_l, t), _cdiv(out_w, t)
            row_pad = nty * t - band_l

            if sgm_mode:
                # Band + one tile-row of exchanged context per side: interior
                # tiles see exactly the monolithic tile grid's content; the
                # aggregation paths truncate at the collar edge (the
                # reference's per-tile semantics).
                ov = t if (band_l % t == 0 and band_l >= t) else 0
                ext_l = band_l + 2 * ov
                nty_e = _cdiv(ext_l, t)
                pad_rows = nty_e * t - ext_l
                cw2 = kw // 2
                if level == levels:
                    offsets_s = jnp.zeros((nty_e, ntx, 2), jnp.int32)
                    s_x_eff, s_y_eff = s_w_l, s_h_l
                    seeds = None
                else:
                    prior = disparity_upsample(dm)
                    pr_d = prior.disparity[:band_l, :out_w]
                    pr_v = prior.valid[:band_l, :out_w]
                    pr_d = halo_exchange_rows(pr_d, ov, ov + pad_rows)
                    pr_v = halo_exchange_rows(pr_v, ov, ov + pad_rows)
                    pr_d = jnp.pad(pr_d, ((0, 0), (0, ntx * t - out_w),
                                          (0, 0)))
                    pr_v = jnp.pad(pr_v, ((0, 0), (0, ntx * t - out_w)))
                    rw_ = 2 * int(sgm_search_buffer) + 1
                    s_x_eff = min(rw_, s_w_l)
                    s_y_eff = min(rw_, s_h_l)
                    offsets_s = _tile_offsets_centered(
                        pr_d, pr_v, t, int(sgm_search_buffer),
                        s_w_l - s_x_eff, s_h_l - s_y_eff,
                        value_bounds=(s_w_l, s_h_l))
                    seeds = (pr_d.astype(jnp.float32), pr_v)
                lbase_s = halo_exchange_rows(lpyr[level], ov + cw2,
                                             ov + cw2 + pad_rows)
                mbase_s = halo_exchange_rows(rpyr[level], ov + cw2,
                                             ov + cw2 + pad_rows
                                             + s_h_l - 1)
                lx0s = region_off_x - cw2
                lbw_s = ntx * t + kw - 1
                lbase_s = crop_extended(lbase_s, lx0s, 0, lbw_s,
                                        lbase_s.shape[0], mode="constant")
                mbase_s = crop_extended(mbase_s, lx0s, 0,
                                        lbw_s + s_w_l - 1,
                                        mbase_s.shape[0], mode="constant")
                lm_lvl = lmask_pyr[level][:band_l, :out_w]
                lm_lvl = halo_exchange_rows(lm_lvl, ov, ov + pad_rows)
                lm_lvl = jnp.pad(lm_lvl, ((0, 0), (0, ntx * t - out_w)))
                sd, sv = (None, None) if seeds is None else seeds
                disp, valid = sgm_relative_search(
                    lbase_s, mbase_s, offsets_s, t, s_x_eff, s_y_eff, kw,
                    sgm_cost == "ternary_census", 2, sgm_p1, sgm_p2,
                    stereo_algorithm == "mgm",
                    subpixel if on_last else "none",
                    seed_disp=sd, seed_valid=sv,
                    search_buffer=int(sgm_search_buffer),
                    range_x=int(s_w_l), range_y=int(s_h_l), lmask=lm_lvl)
                dm = DisparityMap(disp[ov:ov + band_l, :out_w],
                                  valid[ov:ov + band_l, :out_w])
            elif level == levels:
                offsets = jnp.zeros((nty, ntx, 2), jnp.int32)
                s_x_eff, s_y_eff = s_w_l, s_h_l
            else:
                prior = disparity_upsample(dm)
                pr_d = prior.disparity[:band_l, :out_w]
                pr_v = prior.valid[:band_l, :out_w]
                pr_d = jnp.pad(pr_d, ((0, row_pad), (0, ntx * t - out_w),
                                      (0, 0)))
                pr_v = jnp.pad(pr_v, ((0, row_pad), (0, ntx * t - out_w)))
                s_x_eff = min(int(refine_window), s_w_l)
                s_y_eff = min(int(refine_window), s_h_l)
                offsets = _tile_offsets(pr_d, pr_v, t, 2,
                                        s_w_l - s_x_eff, s_h_l - s_y_eff)

            if not sgm_mode:
                # Vertical context over ICI; horizontal from the stored pad.
                lbase = halo_exchange_rows(lpyr[level], half_kh,
                                           half_kh + row_pad)
                mbase = halo_exchange_rows(rpyr[level], half_kh,
                                           half_kh + row_pad + s_h_l - 1)
                lx0 = region_off_x - half_kw
                lbw = ntx * t + kw - 1
                lbase = crop_extended(lbase, lx0, 0, lbw, lbase.shape[0],
                                      mode="constant")
                mbase = crop_extended(mbase, lx0, 0, lbw + s_w_l - 1,
                                      mbase.shape[0], mode="constant")

                if on_last and use_patches:
                    mrows_p = halo_exchange_rows(
                        rpyr[level], half_kh + 1,
                        half_kh + row_pad + s_h_l)
                    mbase_p = crop_extended(mrows_p, lx0 - 1, 0,
                                            lbw + s_w_l + 1,
                                            mrows_p.shape[0],
                                            mode="constant")
                    disp, valid, patches = _band_search_patches(
                        lbase, mbase_p, offsets, s_x_eff, s_y_eff)
                    if isinstance(patches, (list, tuple)):
                        patches = tuple(p[:band_l, :out_w] for p in patches)
                    else:
                        patches = patches[:band_l, :out_w]
                else:
                    disp, valid = _band_search(lbase, mbase, offsets,
                                               s_x_eff, s_y_eff)
                dm = DisparityMap(disp[:band_l, :out_w],
                                  valid[:band_l, :out_w])

            if on_last and consistency_threshold >= 0:
                # Banded L<->R check (ref CorrelationView.cc:653-695 /
                # the monolithic engine's RL block): run the reverse search
                # with the right band as base, margins folded into the
                # offsets so all slices stay non-negative, then exchange the
                # RL rows the forward disparities can reach.
                rl_out_w = out_w + s_w_l
                rntx = _cdiv(rl_out_w, t)
                off_src = jnp.pad(
                    offsets, ((0, 0), (0, max(rntx - offsets.shape[1], 0)),
                              (0, 0)))[:nty, :rntx]
                neg_off = -(off_src + jnp.array([s_x_eff - 1, s_y_eff - 1],
                                                jnp.int32))
                margin_x = s_x_eff - 1 + (s_w_l - s_x_eff)
                margin_y = s_y_eff - 1 + (s_h_l - s_y_eff)
                rl_origin = jnp.array([margin_x, margin_y], jnp.int32)
                rbw = rntx * t + kw - 1
                rl_base = halo_exchange_rows(rpyr[level], half_kh,
                                             half_kh + row_pad)
                rl_base = crop_extended(rl_base, lx0, 0, rbw,
                                        rl_base.shape[0], mode="constant")
                rl_match = halo_exchange_rows(
                    lpyr[level], margin_y + half_kh,
                    half_kh + row_pad + s_y_eff - 1)
                rl_match = crop_extended(rl_match, lx0 - margin_x, 0,
                                         rbw + s_x_eff - 1 + margin_x,
                                         rl_match.shape[0], mode="constant")
                rl_disp, rl_valid = _band_search(
                    rl_base, rl_match, neg_off + rl_origin, s_x_eff, s_y_eff)
                rl_disp = (rl_disp - rl_origin)[:band_l, :rl_out_w]
                rl_valid = rl_valid[:band_l, :rl_out_w]
                rl_dm = DisparityMap(
                    halo_exchange_rows(rl_disp, 0, s_h_l),
                    halo_exchange_rows(rl_valid, 0, s_h_l))
                dm = cross_corr_consistency_check(dm, rl_dm,
                                                  consistency_threshold)

            if filter_half_kernel > 0:
                dm = _halo_cleanup(dm, int(filter_half_kernel), on_last)
                # Right-extent mask (the monolithic engine's disparity_mask
                # against its zero-extended rmask pyramid).  With no user
                # masks the level-l mask is the 2-of-4 downsampled rectangle
                # of the true right image in the shifted frame, whose edges
                # iterate to floor/ceil of /2^l — evaluated analytically in
                # global coordinates so bands need no mask exchange.
                r_lo = max(-smin_y, 0) // scaling
                r_hi = -(-(h - smin_y) // scaling)
                c_lo = max(-smin_x, 0) // scaling
                c_hi = -(-(w - smin_x) // scaling)
                g0 = lax.axis_index(TILE_AXIS) * band_l
                rows_g = (g0 + jnp.arange(band_l))[:, None] \
                    + dm.disparity[..., 1].astype(jnp.int32)
                cols_g = jnp.arange(out_w)[None, :] \
                    + dm.disparity[..., 0].astype(jnp.int32)
                ok = ((rows_g >= r_lo) & (rows_g < r_hi)
                      & (cols_g >= c_lo) & (cols_g < c_hi))
                valid2 = dm.valid & ok
                if has_masks:
                    # disparity_mask against the user masks: the target row
                    # p + dy can land in the next band's rows.
                    lm_l = lmask_pyr[level][:band_l, :out_w]
                    rm_l = rmask_pyr[level]
                    rm_ext = halo_exchange_rows(rm_l, 0, s_h_l)
                    rows_l = jnp.clip(rows_g - g0, 0, rm_ext.shape[0] - 1)
                    cols_l = jnp.clip(cols_g, 0, rm_ext.shape[1] - 1)
                    valid2 = valid2 & lm_l & rm_ext[rows_l, cols_l]
                dm = DisparityMap(
                    jnp.where(valid2[..., None], dm.disparity, 0), valid2)

            if blob_filter_area > 0:
                area = int(blob_filter_area) // scaling
                if area >= 1:
                    # Exact banded small-blob removal: a blob with area < A
                    # fits within A rows of any of its pixels, so labeling a
                    # band extended by A rows classifies the band's own rows
                    # exactly (anything reaching past the halo has area >= A
                    # inside the window and is kept).
                    from visionworkbench_tpu.image.morphology import (
                        remove_small_blobs,
                    )
                    hb_blob = area
                    v_ext = halo_exchange_rows(dm.valid, hb_blob, hb_blob)
                    keep = remove_small_blobs(v_ext, area)[
                        hb_blob:hb_blob + band_l]
                    dm = DisparityMap(
                        jnp.where(keep[..., None], dm.disparity, 0), keep)

        final = DisparityMap(
            jnp.where(dm.valid[..., None],
                      dm.disparity + jnp.array([smin_x, smin_y],
                                               dm.disparity.dtype), 0),
            dm.valid)

        if subpixel == "parabola" and not sgm_mode and patches is not None:
            from visionworkbench_tpu.stereo.subpixel import _fit_parabola
            final = DisparityMap(
                _fit_parabola(patches, final.disparity, final.valid),
                final.valid)
        elif subpixel == "parabola" and not sgm_mode:
            from visionworkbench_tpu.stereo.subpixel import (
                MAX_SUBPIXEL_SHIFT, parabola_subpixel,
            )
            # The parabola fit samples right at dy in [smin_y - 1,
            # smin_y + s_h + MAX_SUBPIXEL_SHIFT); hand it a row-extended right
            # band and temporarily shift dy into that frame.
            m_top = max(-smin_y, 0) + half_kh + int(MAX_SUBPIXEL_SHIFT) + 1
            m_bot = max(smin_y + s_h, 0) + half_kh + int(MAX_SUBPIXEL_SHIFT) + 1
            # Extending BOTH images by the same rows keeps the frames aligned,
            # so the disparity only needs row padding, not a dy shift.
            rext = halo_exchange_rows(rblock, m_top, m_bot)
            lext = halo_exchange_rows(lblock, m_top, m_bot)
            # The parabola's shifted box sums read neighbors' disparities, so
            # the halo rows must carry the REAL neighbor solution (zero
            # padding would poison band-edge windows).
            sd = DisparityMap(
                halo_exchange_rows(final.disparity, m_top, m_bot),
                halo_exchange_rows(final.valid, m_top, m_bot))
            ref = parabola_subpixel(sd, lext, rext, (kw, kh),
                                    prefilter_mode, prefilter_width)
            final = DisparityMap(
                jnp.where(ref.valid[m_top:m_top + hb, :, None],
                          ref.disparity[m_top:m_top + hb], 0),
                ref.valid[m_top:m_top + hb])
        elif subpixel != "none" and not sgm_mode:
            raise ArgumentErr(f"unknown subpixel mode {subpixel!r}")
        return final.disparity, final.valid

    spec = P(TILE_AXIS)
    disp, valid = shard_map(shard_fn, mesh=mesh,
                            in_specs=(spec, spec, spec, spec),
                            out_specs=(spec, spec), check_vma=False)(
        left, right, lmask_in, rmask_in)
    return DisparityMap(disp, valid)
