"""LK / affine / phase subpixel + CorrEval tests (model:
``src/vw/Stereo/tests/TestSubPixel.cxx`` — sub-integer warp recovery)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.image.interpolation import interpolate
from visionworkbench_tpu.stereo.correlation import DisparityMap
from visionworkbench_tpu.stereo.correval import corr_eval
from visionworkbench_tpu.stereo.subpixel_refine import (
    affine_subpixel, lk_subpixel, phase_subpixel,
)


def _subpixel_pair(shift=(0.3, -0.2), h=48, w=48):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (np.sin(xs * 0.5) * np.cos(ys * 0.45)
           + 0.4 * np.sin(xs * 0.19 + 1.0) * np.cos(ys * 0.23)).astype(np.float32)
    left = jnp.asarray(img)
    # right(p) = left(p - shift)  =>  left(p) = right(p + shift), d = shift
    right = interpolate(left, jnp.asarray(xs - shift[0]),
                        jnp.asarray(ys - shift[1]), "bicubic")
    return left, right


@pytest.mark.parametrize("refiner", [lk_subpixel, affine_subpixel])
def test_iterative_subpixel_recovers_shift(refiner):
    true_d = (0.3, -0.2)
    left, right = _subpixel_pair(true_d)
    zero = DisparityMap(jnp.zeros((48, 48, 2), jnp.int32),
                        jnp.ones((48, 48), bool))
    out = refiner(zero, left, right, (9, 9), iterations=8)
    d = np.asarray(out.disparity)
    core = d[12:-12, 12:-12]
    assert abs(core[..., 0].mean() - true_d[0]) < 0.07
    assert abs(core[..., 1].mean() - true_d[1]) < 0.07
    assert core[..., 0].std() < 0.1


def test_phase_subpixel_recovers_shift():
    true_d = (0.5, 0.25)
    left, right = _subpixel_pair(true_d, h=64, w=64)
    zero = DisparityMap(jnp.zeros((64, 64, 2), jnp.int32),
                        jnp.ones((64, 64), bool))
    out = phase_subpixel(zero, left, right, window=32, stride=8, upsample=8)
    d = np.asarray(out.disparity)
    core = d[20:-20, 20:-20]
    assert abs(core[..., 0].mean() - true_d[0]) < 0.15
    assert abs(core[..., 1].mean() - true_d[1]) < 0.15


def test_corr_eval_high_for_correct_disparity(rng):
    h, w = 40, 40
    img = jnp.asarray(rng.random((h, w)), jnp.float32)
    dm = DisparityMap(jnp.zeros((h, w, 2), jnp.int32), jnp.ones((h, w), bool))
    q = np.asarray(corr_eval(dm, img, img, (7, 7), "ncc"))
    assert q[10:-10, 10:-10].min() > 0.99
    # wrong disparity -> low quality on random texture
    dm_bad = DisparityMap(jnp.full((h, w, 2), 3, jnp.int32),
                          jnp.ones((h, w), bool))
    q_bad = np.asarray(corr_eval(dm_bad, img, img, (7, 7), "ncc"))
    assert q_bad[10:-10, 10:-10].mean() < 0.5
    # stddev metric near 1 for matching windows
    q_std = np.asarray(corr_eval(dm, img, img, (7, 7), "stddev"))
    assert q_std[10:-10, 10:-10].min() > 0.95


def _em_scene(h=48, w=48, true=(2.3, 1.25)):
    # Sinusoid-warp pattern (ref TestSubPixel.cxx): continuous texture
    # sampled at a known fractional shift, normalized to [0, 1] (the
    # reference's EM constants assume normalized images).
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def tex(x, y):
        v = (np.sin(0.55 * x) * np.cos(0.43 * y)
             + 0.5 * np.sin(0.21 * x + 0.33 * y)
             + 0.3 * np.sin(1.3 * x) * np.sin(1.1 * y))
        return (v + 1.8) / 3.6
    left = tex(xx, yy).astype(np.float32)
    right = tex(xx - true[0], yy - true[1]).astype(np.float32)
    disp = np.zeros((h, w, 2), np.float32)
    disp[..., 0] = round(true[0])
    disp[..., 1] = round(true[1])
    valid = np.ones((h, w), bool)
    return left, right, disp, valid


def test_affine_gn_subpixel_accuracy():
    # em_iters=0 = plain weighted affine GN (ref
    # subpixel_optimized_affine_2d, Correlate.cc:848-1080)
    from visionworkbench_tpu.stereo.subpixel_refine import bayes_em_subpixel
    true = (2.3, 1.25)
    left, right, disp, valid = _em_scene(true=true)
    out = bayes_em_subpixel(
        DisparityMap(jnp.asarray(disp), jnp.asarray(valid)),
        jnp.asarray(left), jnp.asarray(right), (7, 7), em_iters=0)
    d = np.asarray(out.disparity)
    core = np.s_[8:-8, 8:-8]
    assert np.asarray(out.valid)[core].all()
    assert np.median(np.abs(d[core][..., 0] - true[0])) < 0.1
    assert np.median(np.abs(d[core][..., 1] - true[1])) < 0.1


def test_bayes_em_subpixel_accuracy():
    # Bayes-EM mixture (ref subpixel_optimized_affine_2d_EM,
    # Correlate.cc:500-845): recovers the fractional shift.
    from visionworkbench_tpu.stereo.subpixel_refine import bayes_em_subpixel
    true = (2.3, 1.25)
    left, right, disp, valid = _em_scene(true=true)
    out = bayes_em_subpixel(
        DisparityMap(jnp.asarray(disp), jnp.asarray(valid)),
        jnp.asarray(left), jnp.asarray(right), (7, 7), em_iters=2)
    d = np.asarray(out.disparity)
    core = np.s_[8:-8, 8:-8]
    assert np.median(np.abs(d[core][..., 0] - true[0])) < 0.2
    assert np.median(np.abs(d[core][..., 1] - true[1])) < 0.2


def test_bayes_em_outlier_robustness():
    # The mixture's reason to exist: windows contaminated by an occlusion
    # stripe refine better with EM weighting than with plain GN.
    from visionworkbench_tpu.stereo.subpixel_refine import bayes_em_subpixel
    rng = np.random.default_rng(1)
    true = (2.3, 1.25)
    left, right, disp, valid = _em_scene(true=true)
    right = right.copy()
    right[:, 24:28] = rng.random((right.shape[0], 4)).astype(np.float32)
    errs = {}
    for em in (2, 0):
        out = bayes_em_subpixel(
            DisparityMap(jnp.asarray(disp), jnp.asarray(valid)),
            jnp.asarray(left), jnp.asarray(right), (7, 7), em_iters=em)
        d = np.asarray(out.disparity)
        band = np.s_[8:-8, 17:22]   # windows overlap the corruption
        errs[em] = np.percentile(np.abs(d[band][..., 0] - true[0]), 90)
    assert errs[2] < errs[0], f"EM p90 {errs[2]} vs plain {errs[0]}"
    assert errs[2] < 0.6


def test_pyramid_em_subpixel_integration(rng):
    # subpixel="em"/"affine" reachable from pyramid_correlate (VERDICT r1
    # item 3 integration requirement).
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate
    h, w = 64, 64
    true = (3.4, 1.0)
    yy, xx = np.mgrid[0:h + 4, 0:w + 8].astype(np.float64)

    def tex(x, y):
        v = (np.sin(0.55 * x) * np.cos(0.43 * y)
             + 0.5 * np.sin(0.21 * x + 0.33 * y))
        return (v + 1.5) / 3.0
    right = tex(xx, yy).astype(np.float32)
    left = tex(xx + true[0], yy + true[1])[:h, :w].astype(np.float32)
    dm = pyramid_correlate(jnp.asarray(left), jnp.asarray(right),
                           BBox2i(0, 0, 8, 4), kernel_size=(7, 7),
                           max_pyramid_levels=1, subpixel="em")
    d = np.asarray(dm.disparity)
    core = np.s_[10:-10, 10:-10]
    v = np.asarray(dm.valid)[core]
    ex = np.abs(d[core][..., 0] - true[0])[v]
    assert v.mean() > 0.8
    assert np.median(ex) < 0.25


def test_pyramid_em_levels_active_accuracy():
    # At production scale (256^2, smooth texture) the coarse-to-fine
    # PyramidSubpixelView loop (SubpixelView.cc:33-210) engages (2 levels)
    # and a 3-iteration finishing pass matches full-iteration accuracy.
    from visionworkbench_tpu.stereo.subpixel_refine import bayes_em_subpixel
    true = (2.3, 1.25)
    h, w = 256, 256
    yy, xx = np.mgrid[0:h, 0:w + 8].astype(np.float64)

    def tex(x, y):
        return (np.sin(0.12 * x) * np.cos(0.09 * y)
                + 0.5 * np.sin(0.05 * x + 0.07 * y) + 1.5) / 3.0

    right = tex(xx, yy).astype(np.float32)
    left = tex(xx + true[0], yy + true[1])[:, :w].astype(np.float32)
    disp = np.zeros((h, w, 2), np.int32)
    disp[..., 0] = 2
    disp[..., 1] = 1
    out = bayes_em_subpixel(
        DisparityMap(jnp.asarray(disp), jnp.asarray(np.ones((h, w), bool))),
        jnp.asarray(left), jnp.asarray(right[:h]), (7, 7), em_iters=2,
        max_pyramid_levels=2, fine_outer_iters=3)
    d = np.asarray(out.disparity)
    v = np.asarray(out.valid)
    core = np.s_[16:-16, 16:-16]
    vc = v[core]
    assert vc.mean() > 0.5
    assert np.median(np.abs(d[core][vc][..., 0] - true[0])) < 0.1
    assert np.median(np.abs(d[core][vc][..., 1] - true[1])) < 0.1
