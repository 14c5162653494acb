"""Pyramid correlator tests (model:
``src/vw/Stereo/tests/TestPyramidCorrelationView.cxx:83-84`` — statistical
acceptance: fraction of valid pixels with the correct disparity above a
threshold, over prefilter modes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.stereo.correlation import DisparityMap
from visionworkbench_tpu.stereo.disparity import (
    cross_corr_consistency_check, disparity_subsample, disparity_upsample,
    get_disparity_range, rm_outliers_using_thresh,
)
from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate


def _textured_pair(rng, h=96, w=96, shift=(6, 2), search=(12, 6)):
    """Right contains left shifted by `shift`; textured with smooth + noise."""
    ys, xs = np.mgrid[0:h + search[1], 0:w + search[0]].astype(np.float32)
    tex = (np.sin(xs * 0.35) * np.cos(ys * 0.27)
           + 0.5 * np.sin(xs * 0.11 + ys * 0.09)
           + 0.25 * rng.random(xs.shape)).astype(np.float32)
    dx, dy = shift
    left = tex[:h, :w]
    right = np.zeros((h + search[1], w + search[0]), np.float32)
    right[:] = rng.random(right.shape).astype(np.float32)
    right[dy:dy + h, dx:dx + w] = left
    return jnp.asarray(left), jnp.asarray(right)


@pytest.mark.parametrize("prefilter", ["none", "meansub", "log"])
def test_pyramid_known_shift(rng, prefilter):
    shift = (6, 2)
    left, right = _textured_pair(rng, shift=shift)
    dm = pyramid_correlate(left, right, BBox2i(0, 0, 12, 6),
                           kernel_size=(7, 7), prefilter_mode=prefilter,
                           max_pyramid_levels=2, tile_size=16,
                           filter_half_kernel=5)
    disp = np.asarray(dm.disparity)
    valid = np.asarray(dm.valid)
    # Interior statistics (borders legitimately fail)
    core = np.s_[10:-10, 10:-10]
    v = valid[core]
    attempted = v.mean()
    assert attempted > 0.8, f"attempt density too low: {attempted}"
    correct = ((disp[core][..., 0] == shift[0]) & (disp[core][..., 1] == shift[1]))[v]
    assert correct.mean() > 0.9, f"fraction correct: {correct.mean()}"


def test_pyramid_with_consistency_check(rng):
    shift = (5, 1)
    left, right = _textured_pair(rng, shift=shift, search=(8, 4))
    dm = pyramid_correlate(left, right, BBox2i(0, 0, 8, 4),
                           kernel_size=(7, 7), consistency_threshold=2.0,
                           max_pyramid_levels=2, tile_size=16)
    disp = np.asarray(dm.disparity)
    valid = np.asarray(dm.valid)
    core = np.s_[10:-10, 10:-10]
    v = valid[core]
    assert v.mean() > 0.7
    correct = ((disp[core][..., 0] == shift[0]) & (disp[core][..., 1] == shift[1]))[v]
    assert correct.mean() > 0.95


def test_pyramid_with_parabola_subpixel(rng):
    shift = (3, 1)
    left, right = _textured_pair(rng, shift=shift, search=(6, 3))
    dm = pyramid_correlate(left, right, BBox2i(0, 0, 6, 3),
                           kernel_size=(7, 7), max_pyramid_levels=1,
                           tile_size=16, subpixel="parabola")
    assert dm.disparity.dtype == jnp.float32
    disp = np.asarray(dm.disparity)
    valid = np.asarray(dm.valid)
    core = np.s_[10:-10, 10:-10]
    err = np.abs(disp[core][..., 0] - shift[0])[valid[core]]
    assert np.median(err) < 0.5


def test_pyramid_nonzero_search_min(rng):
    # Negative disparities: right shifted left by 4 -> disparity = -4.
    h, w = 80, 80
    ys, xs = np.mgrid[0:h, 0:w + 10].astype(np.float32)
    tex = (np.sin(xs * 0.31) * np.cos(ys * 0.23)
           + 0.3 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:, :w]
    right = tex[:, 4:4 + w]  # right[x] = left[x + 4] -> d = -4
    dm = pyramid_correlate(jnp.asarray(left), jnp.asarray(right),
                           BBox2i(-6, -2, 8, 4), kernel_size=(7, 7),
                           max_pyramid_levels=1, tile_size=16)
    disp = np.asarray(dm.disparity)
    valid = np.asarray(dm.valid)
    core = np.s_[10:-10, 10:-10]
    v = valid[core]
    correct = ((disp[core][..., 0] == -4) & (disp[core][..., 1] == 0))[v]
    assert correct.mean() > 0.9


# ---------------------------------------------------------------- disparity utils
def test_disparity_up_down_sample():
    disp = jnp.ones((6, 6, 2), jnp.float32) * 3
    valid = jnp.ones((6, 6), bool)
    up = disparity_upsample(DisparityMap(disp, valid))
    assert up.disparity.shape == (12, 12, 2)
    np.testing.assert_allclose(np.asarray(up.disparity), 6.0)
    down = disparity_subsample(DisparityMap(disp, valid))
    # Output size 1 + (n-1)//2 per the reference (DisparityMap.h:1262-1263).
    assert down.disparity.shape == (3, 3, 2)
    # Constant field: averaging preserves value, /2 rescales.
    np.testing.assert_allclose(np.asarray(down.disparity), 1.5)


def test_get_disparity_range():
    disp = jnp.zeros((4, 4, 2), jnp.int32)
    disp = disp.at[1, 1].set(jnp.array([3, -2]))
    disp = disp.at[2, 2].set(jnp.array([-1, 5]))
    valid = jnp.ones((4, 4), bool).at[0, 0].set(False)
    box = get_disparity_range(DisparityMap(disp, valid))
    assert box.min() == (-1, -2)
    assert box.max() == (4, 6)  # max-exclusive


def test_rm_outliers():
    disp = jnp.zeros((9, 9, 2), jnp.float32)
    disp = disp.at[4, 4].set(jnp.array([50.0, 50.0]))  # lone outlier
    valid = jnp.ones((9, 9), bool)
    out = rm_outliers_using_thresh(DisparityMap(disp, valid), 2, 2, 3.0, 0.5)
    assert not bool(out.valid[4, 4])
    assert bool(out.valid[0, 0])


def test_rm_outliers_int_path_matches_float_path():
    """The packed-code integer fast path must be bit-identical to the float
    path on integer-valued disparities (what every pyramid level feeds it)."""
    rng = np.random.default_rng(3)
    h = w = 64
    disp = jnp.asarray(
        np.stack([rng.integers(-40, 60, (h, w)),
                  rng.integers(-7, 8, (h, w))], -1).astype(np.float32))
    valid = jnp.asarray(rng.random((h, w)) > 0.2)
    for (hh, hv, t, rej) in [(5, 5, 3.0, 0.5), (1, 1, 3.0, 0.2),
                             (2, 2, 1.0, 0.6)]:
        ref = rm_outliers_using_thresh(DisparityMap(disp, valid), hh, hv, t, rej)
        fast = rm_outliers_using_thresh(DisparityMap(disp, valid), hh, hv, t,
                                        rej, integer_disparities=True)
        np.testing.assert_array_equal(np.asarray(ref.valid),
                                      np.asarray(fast.valid))
        np.testing.assert_array_equal(np.asarray(ref.disparity),
                                      np.asarray(fast.disparity))


def test_speckle_kernel_matches_float_path():
    """ops/speckle.py Pallas stencil (interpret mode) vs the float XLA path."""
    from visionworkbench_tpu.stereo.disparity import (
        _rm_outliers, _pack_code, _min_match)
    from visionworkbench_tpu.ops.speckle import speckle_keep_mask
    rng = np.random.default_rng(5)
    for (h, w, hh, hv, t, rej) in [(128, 128, 5, 5, 3.0, 0.5),
                                   (64, 256, 1, 1, 3.0, 0.2),
                                   (96, 384, 2, 3, 2.0, 0.6)]:
        disp = jnp.asarray(np.stack(
            [rng.integers(-40, 60, (h, w)),
             rng.integers(-7, 8, (h, w))], -1).astype(np.float32))
        valid = jnp.asarray(rng.random((h, w)) > 0.2)
        _, vref = _rm_outliers(disp, valid, hh, hv, t, rej)
        total = (2 * hv + 1) * (2 * hh + 1)
        keep = speckle_keep_mask(_pack_code(disp, valid), hh, hv, int(t),
                                 _min_match(total, rej), interpret=True) != 0
        np.testing.assert_array_equal(np.asarray(vref),
                                      np.asarray(valid & keep))


def test_cross_corr_consistency():
    h = w = 8
    d = jnp.zeros((h, w, 2), jnp.int32).at[..., 0].set(2)
    l2r = DisparityMap(d, jnp.ones((h, w), bool))
    # Consistent R2L: -2 everywhere
    d_rl = jnp.zeros((h, w + 2, 2), jnp.int32).at[..., 0].set(-2)
    r2l = DisparityMap(d_rl, jnp.ones((h, w + 2), bool))
    out = cross_corr_consistency_check(l2r, r2l, 1.0)
    assert np.asarray(out.valid).all()
    # Inconsistent R2L
    d_rl_bad = jnp.zeros((h, w + 2, 2), jnp.int32).at[..., 0].set(5)
    out = cross_corr_consistency_check(
        l2r, DisparityMap(d_rl_bad, jnp.ones((h, w + 2), bool)), 1.0)
    assert not np.asarray(out.valid).any()


def test_parabola_patch_path_matches_gather_path(rng, monkeypatch):
    """The cost-volume-reuse parabola (patches extracted during the level-0
    sweep) must reproduce the warp-gather formulation: identical valid masks
    and integer parts, matching subpixel values away from disparity
    discontinuities (on a constant-shift scene both are exact and equal)."""
    shift = (3, 1)
    left, right = _textured_pair(rng, shift=shift, search=(6, 3))
    kw = dict(kernel_size=(7, 7), max_pyramid_levels=1, tile_size=16,
              subpixel="parabola")
    monkeypatch.setenv("VWTPU_PARA_PATCHES", "0")
    a = pyramid_correlate(left, right, BBox2i(0, 0, 6, 3), **kw)
    monkeypatch.setenv("VWTPU_PARA_PATCHES", "1")
    b = pyramid_correlate(left, right, BBox2i(0, 0, 6, 3), **kw)
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    np.testing.assert_array_equal(va, vb)
    da, db = np.asarray(a.disparity), np.asarray(b.disparity)
    core = np.s_[10:-10, 10:-10]
    m = va[core]
    np.testing.assert_array_equal(np.round(da[core][m]), np.round(db[core][m]))
    # Constant-disparity scene: the locally-constant-disparity approximation
    # is exact, so the two formulations agree to fp32 everywhere valid.
    assert np.abs(da[core][m] - db[core][m]).max() < 1e-4


def test_disparity_mask_bounded_matches_gather(rng):
    from visionworkbench_tpu.stereo.disparity import disparity_mask
    h, w, sw, sh = 33, 47, 9, 5
    disp = np.stack([rng.integers(0, sw, (h, w)),
                     rng.integers(0, sh, (h, w))], -1).astype(np.int32)
    valid = rng.random((h, w)) > 0.2
    lm = rng.random((h, w)) > 0.1
    rm = rng.random((h + sh + 2, w + sw + 1)) > 0.3
    dm = DisparityMap(jnp.asarray(disp), jnp.asarray(valid))
    a = disparity_mask(dm, jnp.asarray(lm), jnp.asarray(rm))
    b = disparity_mask(dm, jnp.asarray(lm), jnp.asarray(rm),
                       disparity_bounds=BBox2i(0, 0, sw, sh))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.disparity), np.asarray(b.disparity))


def test_parabola_census_patch_path(rng, monkeypatch):
    """Census + parabola via cost-volume patches (the reference's parabola
    hard-codes SAD — ParabolaSubpixelView.cc:49-51 questions its own choice;
    we fit on the census costs that chose the winner). On a constant-shift
    scene: integer parts must match the SAD-fallback path away from tile
    borders, subpixel must stay near the true shift."""
    shift = (3, 1)
    left, right = _textured_pair(rng, shift=shift, search=(6, 3))
    kw = dict(kernel_size=(7, 7), max_pyramid_levels=1, tile_size=16,
              cost_type="census", census_window=5, subpixel="parabola")
    monkeypatch.setenv("VWTPU_PARA_PATCHES", "1")
    b = pyramid_correlate(left, right, BBox2i(0, 0, 6, 3), **kw)
    monkeypatch.setenv("VWTPU_PARA_PATCHES", "0")
    a = pyramid_correlate(left, right, BBox2i(0, 0, 6, 3), **kw)
    core = np.s_[10:-10, 10:-10]
    true_d = np.array([shift[0], shift[1]], np.float32)
    # Both formulations recover the constant shift within half a pixel
    # everywhere valid in the core (they may disagree at frame/tile border
    # rings, where the patches path's census codes see one extra pixel of
    # real margin — both stay correct).
    for dm in (a, b):
        v = np.asarray(dm.valid)[core]
        d = np.asarray(dm.disparity)[core]
        assert v.mean() > 0.95
        ok = (np.abs(d - true_d) < 0.5).all(-1)
        assert ok[v].mean() > 0.97
    # Patches-path subpixel: at least 90% of valid core pixels within a
    # quarter pixel of the true shift.
    vb = np.asarray(b.valid)[core]
    db = np.asarray(b.disparity)[core]
    q = (np.abs(db - true_d) < 0.25).all(-1)[vb].mean()
    assert q > 0.85


def test_corr_timeout_degrades_not_fails(rng):
    # ref m_corr_timeout (CorrelationView.cc:621-637): a tiny budget shrinks
    # the search volume (degrading the result) instead of raising.
    import jax.numpy as jnp
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate
    h, w, shift = 64, 64, (5, 2)
    left = rng.random((h, w)).astype(np.float32)
    right = rng.random((h + 3, w + 7)).astype(np.float32)
    right[shift[1]:shift[1] + h, shift[0]:shift[0] + w] = left
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=1, subpixel="none")
    full = pyramid_correlate(jnp.asarray(left), jnp.asarray(right),
                             BBox2i(0, 0, 8, 4), **kwargs)
    # huge s/op + 1 s budget -> every level clamps to a (1, 1) search
    tiny = pyramid_correlate(jnp.asarray(left), jnp.asarray(right),
                             BBox2i(0, 0, 8, 4), corr_timeout=1.0,
                             seconds_per_op=1.0, **kwargs)
    assert tiny.disparity.shape == full.disparity.shape
    fd = np.asarray(full.disparity)[8:-8, 8:-8]
    fv = np.asarray(full.valid)[8:-8, 8:-8]
    assert ((fd[..., 0] == shift[0]) & (fd[..., 1] == shift[1]))[fv].mean() > 0.95
    # the degraded run cannot reach dx=5 with a 1-wide search from offset 0
    td = np.asarray(tiny.disparity)
    assert (td[..., 0] <= 1).all()


def test_budget_search_volume_unit():
    from visionworkbench_tpu.stereo.cost_model import budget_search_volume
    # disabled budget: unchanged
    assert budget_search_volume(1000, (8, 4), 0.0, 1.0) == (8, 4)
    # generous budget: unchanged
    assert budget_search_volume(10, (8, 4), 1e9, 1e-9) == (8, 4)
    # tight budget: shrinks toward (1, 1), larger axis first, never fails
    assert budget_search_volume(1000, (8, 4), 1.0, 1.0) == (1, 1)
    sx, sy = budget_search_volume(10, (8, 4), 10 * 8 * 2 + 1, 1.0)
    assert sx * sy <= 16 and sx >= 1 and sy >= 1
