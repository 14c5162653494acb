"""Parity of the dense TPU Bayes-EM / plain-affine subpixel refiners against
the loop-faithful NumPy oracle (``tests/oracle/vw_oracle_em.py``,
transliterating ``subpixel_optimized_affine_2d[_EM]``,
``src/vw/Stereo/Correlate.cc:500-845 / 848-1199``).

The TPU formulation is dense and vectorized; float32 accumulation order
differs from the serial C++ loops, so the pin is numerical (sub-millipixel
agreement on interior pixels of a clean scene) rather than bit-exact — the
BM/SGM-style bit pins don't transfer to an iterative float solver. What IS
exact: the iteration structure (outer/EM counts, termination rules), the
weight construction, and the validity decisions."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.stereo.correlation import DisparityMap
from visionworkbench_tpu.stereo.subpixel_refine import bayes_em_subpixel

from oracle import vw_oracle_em as ora


def _scene(h=40, w=40, dx=0.3, dy=-0.2):
    """left(p) = right(p + d) for constant subpixel d, from one smooth
    analytic texture (band-limited so bilinear resampling is benign),
    normalized to [0, 1] like the reference's pre-normalized tiles — the
    EM noise model (variance 1e-2) underflow-poisons on wider ranges."""
    def tex(yy, xx):
        raw = (np.sin(xx * 0.35) * np.cos(yy * 0.3)
               + 0.5 * np.sin(xx * 0.11 + yy * 0.17)
               + 0.2 * np.cos(xx * 0.05 - yy * 0.07))
        return ((raw + 1.7) / 3.4).astype(np.float32)

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    left = tex(ys, xs)
    right = tex(ys - dy, xs - dx)   # right(p) = left(p - d) <=> left(p) = right(p + d)
    return left, right


def _weight_template_matches_reference():
    from visionworkbench_tpu.stereo.subpixel_refine import _weight_template
    kw = kh = 9
    two_sigma_sqr = 2.0 * (kw / 5.0) ** 2
    ref = ora.compute_spatial_weight_image(kw, kh, two_sigma_sqr)
    got = np.asarray(_weight_template(kw, kh))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-9)


def test_weight_template_matches_reference():
    _weight_template_matches_reference()


def _run_pair(em_iters, outer_iters, h=40, w=40, kw=9, kh=9):
    left, right = _scene(h, w)
    disp0 = np.zeros((h, w, 2), np.float32)
    valid0 = np.ones((h, w), bool)
    if em_iters > 0:
        od, ov = ora.subpixel_optimized_affine_2d_em(
            disp0.copy(), valid0.copy(), left, right, kw, kh,
            em_inner_iters=em_iters, outer_iters=outer_iters)
    else:
        od, ov = ora.subpixel_optimized_affine_2d(
            disp0.copy(), valid0.copy(), left, right, kw, kh,
            outer_iters=outer_iters)
    import os
    os.environ["VWTPU_EM_REWARP"] = "1"
    try:
        out = bayes_em_subpixel(
            DisparityMap(jnp.asarray(disp0), jnp.asarray(valid0)),
            jnp.asarray(left), jnp.asarray(right), (kw, kh),
            em_iters=em_iters, outer_iters=outer_iters, max_pyramid_levels=0)
    finally:
        del os.environ["VWTPU_EM_REWARP"]
    m = kh  # interior margin: skip border pixels (edge handling differs
    #         by design: replicate pad vs the reference's zero extension)
    core = np.s_[m:h - m, m:w - m]
    return (od[core], ov[core], np.asarray(out.disparity)[core],
            np.asarray(out.valid)[core])


@pytest.mark.parametrize("em_iters", [2, 0], ids=["bayes_em", "plain_affine"])
def test_single_iteration_update_matches_oracle(em_iters):
    """One outer iteration: the update math (sampling, mixture weights,
    moment accumulation, 6x6 solve) must agree to fp-noise level — this is
    the update-for-update pin; no termination branching can hide drift."""
    od, ov, td, tv = _run_pair(em_iters, outer_iters=1)
    assert ov.all() and tv.all()
    delta = np.abs(td - od).max(axis=-1)
    assert np.median(delta) < 1e-5, np.median(delta)
    assert delta.max() < 5e-4, delta.max()


@pytest.mark.parametrize("em_iters", [2, 0], ids=["bayes_em", "plain_affine"])
def test_full_refiner_matches_oracle(em_iters):
    """Full 10-iteration run: an iterative f32 solver's early-stop branches
    flip on last-ulp residual differences, so the pin is statistical —
    identical validity decisions, sub-centipixel median agreement, and both
    converging to the true shift."""
    od, ov, td, tv = _run_pair(em_iters, outer_iters=10)
    np.testing.assert_array_equal(ov, tv)
    delta = np.abs(td - od).max(axis=-1)[ov & tv]
    assert np.median(delta) < 0.03, np.median(delta)
    assert (delta < 0.15).mean() > 0.95, (np.percentile(delta, 97))
    # no max bound: a pixel whose early-stop branch flips can take extra
    # Gauss-Newton steps and land on a different (still sane) local optimum;
    # the fraction bounds keep that tail small.
    assert (delta < 1.0).mean() > 0.98, (delta.max(), (delta >= 1).sum())
    for arr in (od, td):
        assert abs(np.median(arr[..., 0]) - 0.3) < 0.05
        assert abs(np.median(arr[..., 1]) + 0.2) < 0.05


def test_oracle_invalidates_sparse_neighborhoods():
    """good_pixels < kern_pixels/2 invalidates, in oracle and TPU path."""
    h = w = 32
    kw = kh = 9
    left, right = _scene(h, w)
    disp0 = np.zeros((h, w, 2), np.float32)
    valid0 = np.ones((h, w), bool)
    valid0[10:30, 10:30] = False
    valid0[16, 16] = True    # lone valid pixel in an invalid sea
    od, ov = ora.subpixel_optimized_affine_2d_em(
        disp0.copy(), valid0.copy(), left, right, kw, kh)
    assert not ov[16, 16]
    import os
    os.environ["VWTPU_EM_REWARP"] = "1"
    try:
        out = bayes_em_subpixel(
            DisparityMap(jnp.asarray(disp0), jnp.asarray(valid0)),
            jnp.asarray(left), jnp.asarray(right), (kw, kh),
            em_iters=2, outer_iters=10, max_pyramid_levels=0)
    finally:
        del os.environ["VWTPU_EM_REWARP"]
    assert not bool(out.valid[16, 16])
