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
