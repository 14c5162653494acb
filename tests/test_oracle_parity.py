"""Reference-oracle parity tests (VERDICT r1 item 1, the north star).

Asserts the TPU implementation against ``tests/oracle/vw_oracle.py`` — a
literal NumPy transliteration of the reference's ``best_of_search_convolution``
(float64 accumulators, first-best-wins, elif worst-update), ``calc_disparity``,
``subdivide_regions``, ``ParabolaSubpixelView`` and the
``CorrelationView.cc:273-886`` pyramid level loop.

Exactness protocol: inputs are quantized to the 1/256 grid, which makes
SAD/SSD/census window sums EXACT in both the oracle's float64 and the TPU
path's fp32 (sums of 1/256- or 1/65536-grid values stay far below 2^24 units
of the grid), so integer disparities and validity must match bit-for-bit —
no tolerance. NCC multiplies irrational inverse-energy factors, so fp32 vs
f64 can flip near-tied argmins; NCC asserts >= 99.8% agreement instead.

Convention mapping (documented in the oracle module, deviation #3): the
reference's pyramid search is effectively max-INCLUSIVE (the +1 of
CorrelationView.cc:338-340), the TPU framework is max-exclusive; tests pass
the oracle a search box with max reduced by 1.

Known intentional divergences quantified here and in docs/parity.md:
* zone refinement — reference: recursive quadtree ``subdivide_regions``;
  TPU: fixed tile grid with per-tile offsets (multilevel test is therefore
  statistical: valid-pixel disparity agreement >= 97%).
* level-0 L<->R check window — the reference's RL pass can only produce
  RL disparities in [-S, -1] (``CorrelationView.cc:668-686``: searches S
  offsets then subtracts S), so an LR disparity of 0 can never be exactly
  confirmed; the TPU path searches [-(S-1), 0], the exact negated LR range.
  The consistency-check test keeps true disparities >= 1 so both windows
  cover the truth, and asserts near-exact agreement.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.oracle import vw_oracle as vw
from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.stereo.correlation import (
    ABSOLUTE_DIFFERENCE, CENSUS_TRANSFORM, CROSS_CORRELATION,
    SQUARED_DIFFERENCE, TERNARY_CENSUS_TRANSFORM,
    best_of_search_convolution, calc_disparity,
)
from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate
from visionworkbench_tpu.stereo.subpixel import parabola_subpixel
from visionworkbench_tpu.stereo.correlation import DisparityMap

ALL_COSTS = [ABSOLUTE_DIFFERENCE, SQUARED_DIFFERENCE, CROSS_CORRELATION,
             CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM]


def quantized(rng, shape):
    """fp32 image on the 1/256 grid (exactness protocol above)."""
    return (rng.integers(0, 256, shape).astype(np.float32) / 256.0)


def stereo_pair(rng, h, w, sx, sy, shift=(2, 1)):
    """Left noise; right = left embedded at ``shift`` inside wider noise, so
    winners are real but flat/noise regions exercise invalidation too."""
    left = quantized(rng, (h, w))
    right = quantized(rng, (h + sy - 1, w + sx - 1))
    right[shift[1]:shift[1] + h, shift[0]:shift[0] + w] = left
    return left, right


# ---------------------------------------------------------------------------
# best_of_search_convolution / calc_disparity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cost_type", ALL_COSTS)
def test_best_of_search_parity(rng, cost_type):
    h, w, sx, sy = 40, 44, 6, 5
    left, right = stereo_pair(rng, h, w, sx, sy)
    kernel = (7, 5)
    dm = best_of_search_convolution(jnp.asarray(left), jnp.asarray(right),
                                    (sx, sy), kernel, cost_type,
                                    census_window=5)
    disp = np.asarray(dm.disparity)
    valid = np.asarray(dm.valid)
    odisp, ovalid = vw.best_of_search_convolution(left, right, (sx, sy),
                                                  kernel, cost_type, 5)
    if cost_type == CROSS_CORRELATION:
        agree = (valid == ovalid) & (~valid | (disp == odisp).all(axis=-1))
        assert agree.mean() >= 0.998, f"NCC agreement {agree.mean():.4f}"
    else:
        np.testing.assert_array_equal(valid, ovalid)
        np.testing.assert_array_equal(disp[valid], odisp[valid])


def test_calc_disparity_region_parity(rng):
    h, w, sx, sy = 48, 48, 5, 4
    left, right = stereo_pair(rng, h, w, sx, sy, shift=(1, 2))
    region = BBox2i(6, 4, 30, 32)   # repo convention: (minx, miny, w, h)
    dm = calc_disparity(ABSOLUTE_DIFFERENCE, jnp.asarray(left),
                        jnp.asarray(right), region, (sx, sy), (7, 7))
    obox = vw.OBox(6, 4, 36, 36)
    odisp, ovalid = vw.calc_disparity("abs", left, right, obox, (sx, sy),
                                      (7, 7))
    np.testing.assert_array_equal(np.asarray(dm.valid), ovalid)
    np.testing.assert_array_equal(np.asarray(dm.disparity)[ovalid],
                                  odisp[ovalid])


# ---------------------------------------------------------------------------
# subdivide_regions invariants (the oracle piece that has no TPU twin —
# the TPU path replaces it with per-tile offsets; these assert the oracle
# itself is self-consistent so the multilevel comparison below is meaningful)
# ---------------------------------------------------------------------------


def test_subdivide_regions_invariants(rng):
    h, w = 64, 64
    disp = np.zeros((h, w, 2), np.int32)
    disp[..., 0] = (np.arange(w)[None, :] // 16).astype(np.int32)
    disp[..., 1] = (np.arange(h)[:, None] // 24).astype(np.int32)
    valid = rng.random((h, w)) > 0.1
    disp = np.where(valid[..., None], disp, 0)
    zones = []
    vw.subdivide_regions(disp, valid, vw.OBox(0, 0, w, h), zones, (7, 7))
    cover = np.zeros((h, w), np.int32)
    for (region, drange) in zones:
        assert not drange.empty()
        cover[region.miny:region.maxy, region.minx:region.maxx] += 1
        sub_v = valid[region.miny:region.maxy, region.minx:region.maxx]
        sub_d = disp[region.miny:region.maxy, region.minx:region.maxx]
        if sub_v.any():
            vals = sub_d[sub_v]
            assert vals[:, 0].min() >= drange.minx
            assert vals[:, 0].max() < drange.maxx
            assert vals[:, 1].min() >= drange.miny
            assert vals[:, 1].max() < drange.maxy
    assert cover.max() <= 1, "zones overlap"
    # every valid pixel is covered by some zone
    assert (cover[valid] == 1).all()


# ---------------------------------------------------------------------------
# Parabola subpixel vs ParabolaSubpixelView
# ---------------------------------------------------------------------------


def test_parabola_parity(rng):
    """The TPU 'exact' parabola path vs the oracle's zone re-evaluation.
    Compared on the interior (the frames' replicate extensions differ at the
    image border by construction — the oracle replicates at the
    left_region/right_region crops like the reference, the TPU path at the
    image edge)."""
    h, w, sx, sy = 48, 48, 5, 4
    left, right0 = stereo_pair(rng, h, w, sx, sy, shift=(2, 1))
    right = right0[:h, :w]  # parabola operates on same-size frames
    kernel = (7, 7)
    dm = best_of_search_convolution(jnp.asarray(left),
                                    jnp.asarray(right0), (sx, sy), kernel,
                                    ABSOLUTE_DIFFERENCE)
    # pad integer disparity back to full-frame (valid interior only)
    oh, ow = h - kernel[1] + 1, w - kernel[0] + 1
    disp_full = np.zeros((h, w, 2), np.int32)
    valid_full = np.zeros((h, w), bool)
    ky, kx = kernel[1] // 2, kernel[0] // 2
    disp_full[ky:ky + oh, kx:kx + ow] = np.asarray(dm.disparity)
    valid_full[ky:ky + oh, kx:kx + ow] = np.asarray(dm.valid)

    out = parabola_subpixel(
        DisparityMap(jnp.asarray(disp_full), jnp.asarray(valid_full)),
        jnp.asarray(left), jnp.asarray(right), kernel, exact=True)
    got = np.asarray(out.disparity)

    odisp, ovalid = vw.parabola_subpixel(disp_full, valid_full,
                                         left, right, kernel)
    m = 8  # interior margin: half kernel + max disparity + 1
    core = np.s_[m:h - m, m:w - m]
    vv = valid_full[core] & ovalid[core]
    np.testing.assert_allclose(got[core][vv], odisp[core][vv],
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Pyramid correlator: exact at levels=0, statistical multilevel
# ---------------------------------------------------------------------------


def _run_both(rng, h, w, sx, sy, shift, levels, cost="abs",
              consistency=-1.0, masks=False, prefilter="none"):
    left, right = stereo_pair(rng, h, w, sx, sy, shift=shift)
    lmask = rmask = None
    olm = orm = None
    if masks:
        lmask = np.ones((h, w), bool)
        lmask[:, :6] = False
        lmask[h // 2:h // 2 + 5, :] = False
        rmask = np.ones(right.shape, bool)
        rmask[:4, :] = False
        olm, orm = lmask.astype(np.uint8), rmask.astype(np.uint8)
    repo_cost = {"abs": ABSOLUTE_DIFFERENCE, "sq": SQUARED_DIFFERENCE,
                 "ncc": CROSS_CORRELATION, "census": CENSUS_TRANSFORM}[cost]
    dm = pyramid_correlate(
        jnp.asarray(left), jnp.asarray(right), BBox2i(0, 0, sx, sy),
        kernel_size=(7, 7), left_mask=lmask, right_mask=rmask,
        cost_type=repo_cost, prefilter_mode=prefilter,
        consistency_threshold=consistency, max_pyramid_levels=levels,
        filter_half_kernel=5, tile_size=64, subpixel="none")
    odisp, ovalid = vw.pyramid_correlate(
        left, right, vw.OBox(0, 0, sx - 1, sy - 1), (7, 7),
        left_mask=olm, right_mask=orm, cost_type=cost,
        prefilter_mode=prefilter, consistency_threshold=consistency,
        max_pyramid_levels=levels, filter_half_kernel=5)
    return (np.asarray(dm.disparity), np.asarray(dm.valid)), (odisp, ovalid)


@pytest.mark.parametrize("cost", ["abs", "sq", "census"])
def test_pyramid_level0_exact(rng, cost):
    (disp, valid), (odisp, ovalid) = _run_both(
        rng, 64, 64, 6, 5, (2, 1), levels=0, cost=cost)
    np.testing.assert_array_equal(valid, ovalid)
    np.testing.assert_array_equal(disp[valid].astype(np.float32),
                                  odisp[valid])


def test_pyramid_level0_ncc(rng):
    (disp, valid), (odisp, ovalid) = _run_both(
        rng, 64, 64, 6, 5, (2, 1), levels=0, cost="ncc")
    agree = (valid == ovalid) & (~valid | (disp == odisp).all(axis=-1))
    assert agree.mean() >= 0.995, f"NCC pyramid agreement {agree.mean():.4f}"


def test_pyramid_level0_masks(rng):
    """Masked variant: the fill mean crosses an f64->f32 double rounding, so
    a sub-ulp mean difference may flip rare near-ties; asserts >= 99.9%."""
    (disp, valid), (odisp, ovalid) = _run_both(
        rng, 64, 64, 6, 5, (2, 1), levels=0, cost="abs", masks=True)
    agree = (valid == ovalid) & (~valid | (disp == odisp).all(axis=-1))
    assert agree.mean() >= 0.999, f"masked agreement {agree.mean():.4f}"


def test_pyramid_level0_consistency(rng):
    """L<->R check on; true disparities >= 1 (see module docstring on the
    reference's RL window off-by-one)."""
    (disp, valid), (odisp, ovalid) = _run_both(
        rng, 64, 64, 6, 5, (2, 2), levels=0, cost="abs", consistency=1.0)
    agree = (valid == ovalid) & (~valid | (disp == odisp).all(axis=-1))
    assert agree.mean() >= 0.99, f"consistency agreement {agree.mean():.4f}"
    # where both valid, disparities must be identical
    both = valid & ovalid
    np.testing.assert_array_equal(disp[both].astype(np.float32), odisp[both])


def test_pyramid_multilevel_agreement(rng):
    """Levels=2: the zone engines legitimately diverge (quadtree zones vs
    per-tile offsets) — quantify. Measured on this seed at change time:
    96.9% of pixels valid in both engines carry identical disparities and
    the valid sets overlap 95%+; the disagreeing 3% hug the synthetic
    disparity discontinuity where zone boundaries land differently.
    Asserted with margin: agreement >= 95%, overlap >= 90%."""
    h, w = 96, 96
    sx, sy = 9, 5
    base = quantized(rng, (h + 32, w + 32))
    # smooth the noise so coarse levels carry real structure
    k = np.array([1, 4, 6, 4, 1], np.float32) / 16
    sm = vw.separable_convolution_replicate(base, k, k)
    sm = vw.separable_convolution_replicate(sm, k, k)
    sm = np.round(sm * 256) / 256  # back onto the grid
    left = sm[8:8 + h, 8:8 + w].astype(np.float32)
    right = np.zeros((h + sy - 1, w + sx - 1), np.float32)
    # piecewise-constant disparity field: left half shifts (2,1), right (5,2)
    right[:] = quantized(rng, right.shape)
    right[1:1 + h, 2:2 + w // 2] = sm[8:8 + h, 8:8 + w // 2]
    right[2:2 + h, 5 + w // 2:5 + w] = sm[8:8 + h, 8 + w // 2:8 + w]
    dm = pyramid_correlate(
        jnp.asarray(left), jnp.asarray(right), BBox2i(0, 0, sx, sy),
        kernel_size=(7, 7), max_pyramid_levels=2, filter_half_kernel=5,
        tile_size=16, subpixel="none")
    odisp, ovalid = vw.pyramid_correlate(
        left, right, vw.OBox(0, 0, sx - 1, sy - 1), (7, 7),
        max_pyramid_levels=2, filter_half_kernel=5)
    disp = np.asarray(dm.disparity).astype(np.float32)
    valid = np.asarray(dm.valid)
    both = valid & ovalid
    either = valid | ovalid
    overlap = both.sum() / max(either.sum(), 1)
    same = (disp[both] == odisp[both]).all(axis=-1).mean() if both.any() else 1.0
    assert overlap >= 0.90, f"valid-set overlap {overlap:.4f}"
    assert same >= 0.95, f"disparity agreement {same:.4f}"
