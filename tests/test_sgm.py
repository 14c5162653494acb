"""SGM/MGM tests (model: ``src/vw/Stereo/tests/TestSGM.cxx`` — known-shift
recovery over cost modes and subpixel modes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.stereo.sgm import SUBPIXEL_MODES, calc_disparity_sgm


def _pair(rng, h=40, w=48, shift=(3, 1), search=(6, 3)):
    sx, sy = search
    dx, dy = shift
    ys, xs = np.mgrid[0:h + sy - 1, 0:w + sx - 1].astype(np.float32)
    tex = (0.5 + 0.25 * np.sin(xs * 0.7) * np.cos(ys * 0.55)
           + 0.25 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = np.array(rng.random((h + sy - 1, w + sx - 1)), np.float32) * 0.5
    right[dy:dy + h, dx:dx + w] = left
    return jnp.asarray(left), jnp.asarray(right)


@pytest.mark.parametrize("cost_type", ["census", "ternary_census"])
def test_sgm_known_shift(rng, cost_type):
    shift = (3, 1)
    left, right = _pair(rng, shift=shift)
    dm = calc_disparity_sgm(left, right, (6, 3), kernel_size=5,
                            cost_type=cost_type, subpixel="none")
    disp = np.asarray(dm.disparity)
    core = np.s_[6:-6, 6:-6]
    correct = ((disp[core][..., 0] == shift[0]) &
               (disp[core][..., 1] == shift[1]))
    assert correct.mean() > 0.95, f"correct: {correct.mean()}"


def test_mgm_known_shift(rng):
    shift = (2, 1)
    left, right = _pair(rng, shift=shift, search=(5, 3))
    dm = calc_disparity_sgm(left, right, (5, 3), kernel_size=5, use_mgm=True,
                            subpixel="none")
    disp = np.asarray(dm.disparity)
    core = np.s_[6:-6, 6:-6]
    correct = ((disp[core][..., 0] == shift[0]) &
               (disp[core][..., 1] == shift[1]))
    assert correct.mean() > 0.95, f"correct: {correct.mean()}"


def test_sgm_smooths_textureless_region(rng):
    # Weak texture band: plain WTA would speckle; SGM should propagate.
    h, w = 40, 48
    shift = (2, 0)
    sx, sy = 5, 1
    ys, xs = np.mgrid[0:h + sy - 1, 0:w + sx - 1].astype(np.float32)
    tex = (0.5 + 0.3 * np.sin(xs * 0.8) * np.cos(ys * 0.6)).astype(np.float32)
    tex[:, 20:34] = 0.5  # flat band
    tex += 0.02 * rng.random(tex.shape).astype(np.float32)
    left = jnp.asarray(tex[:h, :w])
    right_np = np.zeros((h, w + sx - 1), np.float32) + 0.5
    right_np[:, shift[0]:shift[0] + w] = np.asarray(left)
    right = jnp.asarray(right_np)
    dm = calc_disparity_sgm(left, right, (sx, sy), kernel_size=5,
                            subpixel="none")
    disp = np.asarray(dm.disparity)[..., 0]
    core = disp[6:-6, 6:-6]
    assert (core == shift[0]).mean() > 0.9


@pytest.mark.parametrize("mode", ["parabola", "linear", "cosine", "lc_blend"])
def test_sgm_subpixel_modes(rng, mode):
    left, right = _pair(rng, shift=(3, 1), search=(6, 3))
    dm = calc_disparity_sgm(left, right, (6, 3), kernel_size=5, subpixel=mode)
    assert dm.disparity.dtype == jnp.float32
    disp = np.asarray(dm.disparity)
    core = np.s_[6:-6, 6:-6]
    err = np.abs(disp[core][..., 0] - 3)
    assert np.median(err) < 0.5


@pytest.mark.parametrize("algo", ["sgm", "mgm"])
def test_pyramid_sgm_known_shift(rng, algo):
    # SGM inside the pyramid correlator (ref stereo_algorithm switch,
    # CorrelationView.h:45): coarse-to-fine with per-tile relative windows.
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate
    h, w = 96, 128
    shift = (11, 2)
    search = (24, 6)
    ys, xs = np.mgrid[0:h + search[1], 0:w + search[0]].astype(np.float32)
    tex = (np.sin(xs * 0.35) * np.cos(ys * 0.27)
           + 0.5 * np.sin(xs * 0.11 + ys * 0.09)
           + 0.25 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = np.array(rng.random((h + search[1], w + search[0])), np.float32)
    right[shift[1]:shift[1] + h, shift[0]:shift[0] + w] = left
    dm = pyramid_correlate(jnp.asarray(left), jnp.asarray(right),
                           BBox2i(0, 0, *search), stereo_algorithm=algo,
                           subpixel="parabola", max_pyramid_levels=2,
                           tile_size=16, consistency_threshold=2.0)
    disp = np.asarray(dm.disparity)
    valid = np.asarray(dm.valid)
    core = np.s_[10:-10, 14:-14]
    v = valid[core]
    assert v.mean() > 0.8
    ok = ((np.abs(disp[core][..., 0] - shift[0]) < 0.6) &
          (np.abs(disp[core][..., 1] - shift[1]) < 0.6))[v]
    assert ok.mean() > 0.95, f"fraction correct: {ok.mean()}"
    assert disp.dtype == np.float32


def test_sgm_memory_limit_banding(rng):
    # Forcing a tiny memory budget must band the frame and still recover the
    # shift; band interiors should match the single-shot result.
    shift = (3, 1)
    left, right = _pair(rng, h=64, w=48, shift=shift, search=(6, 3))
    whole = calc_disparity_sgm(left, right, (6, 3), kernel_size=5,
                               subpixel="none")
    banded = calc_disparity_sgm(left, right, (6, 3), kernel_size=5,
                                subpixel="none", memory_limit_mb=1,
                                band_overlap=12)
    wd = np.asarray(whole.disparity)
    bd = np.asarray(banded.disparity)
    core = np.s_[6:-6, 6:-6]
    agree = (wd[core] == bd[core]).all(axis=-1)
    assert agree.mean() > 0.97, f"band/whole agreement {agree.mean()}"
    correct = ((bd[core][..., 0] == shift[0]) &
               (bd[core][..., 1] == shift[1]))
    assert correct.mean() > 0.95


def test_sgm_bad_args():
    import jax.numpy as jnp
    from visionworkbench_tpu.core.exceptions import ArgumentErr
    left = jnp.zeros((10, 10))
    with pytest.raises(ArgumentErr):
        calc_disparity_sgm(left, jnp.zeros((10, 12)), (3, 1),
                           cost_type="abs")
    with pytest.raises(ArgumentErr):
        calc_disparity_sgm(left, jnp.zeros((10, 10)), (3, 1))  # wrong shape


def test_sgm_poly4_subpixel(rng):
    # poly4 mode (ref SgmSubpixelMode SUBPIXEL_POLY4, SGM.cc:1417-1419,
    # (x^4+x)/4 ratio fit) — recovers an integer shift with small residual.
    left, right = _pair(rng, shift=(3, 1), search=(6, 3))
    dm = calc_disparity_sgm(left, right, (6, 3), kernel_size=5,
                            subpixel="poly4")
    disp = np.asarray(dm.disparity)
    core = np.s_[6:-6, 6:-6]
    err = np.abs(disp[core][..., 0] - 3)
    assert np.median(err) < 0.5


def test_sgm_left_mask_invalidates(rng):
    # Real invalid outputs (ref ZERO_SEARCH_AREA, SGM.cc:241-470): pixels
    # with left_mask == 0 are invalid, others stay valid.
    left, right = _pair(rng, shift=(2, 1), search=(4, 3))
    lmask = np.ones(left.shape, bool)
    lmask[10:20, 15:30] = False
    dm = calc_disparity_sgm(left, right, (4, 3), kernel_size=5,
                            subpixel="none", left_mask=lmask)
    valid = np.asarray(dm.valid)
    assert not valid[10:20, 15:30].any()
    assert valid[25:-6, 6:-6].all()
    assert (np.asarray(dm.disparity)[10:20, 15:30] == 0).all()


def test_sgm_prev_disparity_seeds(rng):
    # Per-pixel bounds from a half-res seed (ref populate_disp_bound_image,
    # SGM.cc:241-470): with a correct seed the restricted search recovers
    # the shift; with a wrong trusted seed the window clamps around the
    # seed and cannot reach the true disparity (proving the bounds bind).
    from visionworkbench_tpu.stereo.correlation import DisparityMap
    shift = (4, 2)
    left, right = _pair(rng, h=48, w=56, shift=shift, search=(12, 5))
    h, w = left.shape
    hh, hw = (h + 1) // 2, (w + 1) // 2
    good_seed = DisparityMap(
        jnp.broadcast_to(jnp.array([shift[0] / 2, shift[1] / 2], jnp.float32),
                         (hh, hw, 2)).astype(jnp.float32),
        jnp.ones((hh, hw), bool))
    dm = calc_disparity_sgm(left, right, (12, 5), kernel_size=5,
                            subpixel="none", prev_disparity=good_seed,
                            search_buffer=1)
    disp = np.asarray(dm.disparity)
    core = np.s_[6:-6, 6:-6]
    correct = ((disp[core][..., 0] == shift[0]) &
               (disp[core][..., 1] == shift[1]))
    assert correct.mean() > 0.95

    bad = DisparityMap(
        jnp.broadcast_to(jnp.array([4.0, 1.0], jnp.float32),
                         (hh, hw, 2)).astype(jnp.float32),
        jnp.ones((hh, hw), bool))
    dm2 = calc_disparity_sgm(left, right, (12, 5), kernel_size=5,
                             subpixel="none", prev_disparity=bad,
                             search_buffer=1)
    disp2 = np.asarray(dm2.disparity)
    # bad seed (dx=8 scaled) with buffer 1 cannot reach dx=4
    assert (np.abs(disp2[core][..., 0] - 8) <= 1).all()


def test_pyramid_sgm_mask_invalidates(rng):
    # The pyramid SGM path invalidates masked pixels inside SGM itself.
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate
    h, w = 64, 64
    shift = (3, 1)
    ys, xs = np.mgrid[0:h + 3, 0:w + 7].astype(np.float32)
    tex = (0.5 + 0.3 * np.sin(xs * 0.5) * np.cos(ys * 0.4)
           + 0.2 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = np.array(rng.random((h + 3, w + 7)), np.float32)
    right[shift[1]:shift[1] + h, shift[0]:shift[0] + w] = left
    lmask = np.ones((h, w), bool)
    lmask[20:30, 10:40] = False
    dm = pyramid_correlate(jnp.asarray(left), jnp.asarray(right),
                           BBox2i(0, 0, 8, 4), stereo_algorithm="sgm",
                           left_mask=lmask, max_pyramid_levels=1,
                           tile_size=16, subpixel="none")
    valid = np.asarray(dm.valid)
    assert not valid[20:30, 10:40].any()
    assert valid[40:-8, 8:-8].mean() > 0.8


def test_pallas_scan_bidir_matches_lax_scan(rng):
    # The hardware-loop Pallas aggregation kernel is bit-exact vs the
    # lax.scan engine (interpret mode on CPU; the TPU path is A/B'd in the
    # perf log).
    import jax.numpy as jnp
    from visionworkbench_tpu.ops.sgm_scan import pallas_scan_bidir
    from visionworkbench_tpu.stereo.sgm import _scan_bidir
    n, sy, sx, L = 24, 2, 5, 128
    bad = 255.0 + 750.0
    # integer-valued costs/diffs like the real census pipeline
    cost = jnp.asarray(np.floor(rng.random((n, sy, sx, L)) * 30)
                       .astype(np.float32))
    for shifts in [(0,), (0, 1, -1)]:
        b = len(shifts)
        pf = jnp.asarray(np.floor(rng.random((n, b, L)) * 20).astype(np.float32))
        pr = jnp.asarray(np.floor(rng.random((n, b, L)) * 20).astype(np.float32))
        ref = _scan_bidir(cost, pf, pr, shifts, 15.0, 750.0, bad)
        for tb in (1, 4):
            out = pallas_scan_bidir(cost, pf, pr, shifts, 15.0, 750.0, bad,
                                    interpret=True, tb=tb)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_pallas_mgm_kernels_match_lax_scan(rng):
    # The MGM hardware-loop kernels (plain bidirectional + sheared forward)
    # are bit-exact vs the lax.scan engines in interpret mode.
    import jax.numpy as jnp
    from visionworkbench_tpu.ops.sgm_scan import pallas_mgm_bidir, pallas_mgm_fwd
    from visionworkbench_tpu.stereo import sgm as S
    n, sy, sx, L = 16, 2, 5, 128
    p1, p2 = 15.0, 750.0
    bad = 255.0 + p2
    cost = jnp.asarray(np.floor(rng.random((n, sy, sx, L)) * 30)
                       .astype(np.float32))
    pf = jnp.asarray(np.floor(rng.random((n, L)) * 20).astype(np.float32))
    pr = jnp.asarray(np.floor(rng.random((n, L)) * 20).astype(np.float32))
    gf = jnp.asarray(rng.random((n, L)) > 0.2)
    gr = jnp.asarray(rng.random((n, L)) > 0.2)
    old = S._SGM_PALLAS
    try:
        S._SGM_PALLAS = False   # force the lax.scan reference path
        ref = S._mgm_plain_scan(cost, pf, pr, gf, gr, p1, p2, bad)
    finally:
        S._SGM_PALLAS = old
    out = pallas_mgm_bidir(cost, pf, pr, gf, gr, (1, -1), p1, p2, bad,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    # sheared-forward kernel vs its scan body
    b = 4
    cT = jnp.asarray(np.floor(rng.random((n, b, sy, sx, L)) * 30)
                     .astype(np.float32))
    pT = jnp.asarray(np.floor(rng.random((n, b, L)) * 20).astype(np.float32))
    gT = jnp.asarray(rng.random((n, b, L)) > 0.2)

    def step(carry, inp):
        cx, px, gx = inp
        a = S._path_update(carry, cx, px, p1, p2, bad)
        bb = S._path_update(S._shift_lane(carry, 1, bad), cx, px, p1, p2, bad)
        o = jnp.floor((a + bb) * 0.5)
        o = jnp.where(gx[:, None, None, :], o, cx)
        o = S._force_bad(o, cx, bad)
        return o, o

    import jax as _jax
    init = jnp.full((b, sy, sx, L), bad, jnp.float32)
    _, ref2 = _jax.lax.scan(step, init, (cT, pT, gT))
    out2 = pallas_mgm_fwd(cT, pT, gT, (0, 1), p1, p2, bad, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref2), np.asarray(out2))
