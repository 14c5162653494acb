"""Stereo correlation tests.

Model: ``src/vw/Stereo/tests/TestCorrelation.cxx:45-64`` — seeded noise left
image; right = shifted copy; every disparity pixel must equal the known shift,
for all cost modes. Plus parabola subpixel accuracy on sub-integer shifts
(model: ``TestSubPixel.cxx``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.stereo.correlation import (
    ABSOLUTE_DIFFERENCE, CENSUS_TRANSFORM, CROSS_CORRELATION,
    SQUARED_DIFFERENCE, TERNARY_CENSUS_TRANSFORM, best_of_search_convolution,
    calc_disparity,
)
from visionworkbench_tpu.stereo.subpixel import parabola_subpixel
from visionworkbench_tpu.image.interpolation import interpolate


def _shifted_pair(rng, h=25, w=25, shift=(2, 1), search=(4, 4)):
    """Left noise image; right such that right[y+dy, x+dx] == left[y, x]."""
    sx, sy = search
    dx, dy = shift
    left = rng.random((h, w), np.float32)
    right_full = np.zeros((h + sy - 1, w + sx - 1), np.float32)
    # Start from noise so non-overlap areas aren't flat (flat -> invalidation).
    right_full[:] = rng.random(right_full.shape).astype(np.float32)
    right_full[dy:dy + h, dx:dx + w] = left
    return jnp.asarray(left), jnp.asarray(right_full)


@pytest.mark.parametrize("cost_type", [
    ABSOLUTE_DIFFERENCE, SQUARED_DIFFERENCE, CROSS_CORRELATION,
    CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM,
])
def test_known_shift_recovered(rng, cost_type):
    shift = (2, 1)
    left, right = _shifted_pair(rng, shift=shift)
    kernel = (5, 5)
    dm = best_of_search_convolution(left, right, (4, 4), kernel, cost_type)
    disp = np.asarray(dm.disparity)
    valid = np.asarray(dm.valid)
    out_h, out_w = disp.shape[:2]
    assert (out_h, out_w) == (25 - 4, 25 - 4)
    # census costs are only exact away from the border of the copied region
    margin = 4 if cost_type in (CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM) else 0
    core = np.s_[margin:out_h - margin, margin:out_w - margin]
    assert valid[core].all()
    np.testing.assert_array_equal(disp[core][..., 0], shift[0])
    np.testing.assert_array_equal(disp[core][..., 1], shift[1])


def test_calc_disparity_region(rng):
    left, right = _shifted_pair(rng, h=30, w=30, shift=(1, 2), search=(3, 3))
    region = BBox2i(4, 4, 20, 20)
    dm = calc_disparity(ABSOLUTE_DIFFERENCE, left, right, region, (3, 3), (5, 5))
    assert dm.disparity.shape[:2] == (16, 16)
    disp = np.asarray(dm.disparity)
    assert np.asarray(dm.valid).all()
    np.testing.assert_array_equal(disp[..., 0], 1)
    np.testing.assert_array_equal(disp[..., 1], 2)


def test_flat_region_invalidated():
    left = jnp.zeros((15, 15), jnp.float32)
    right = jnp.zeros((17, 17), jnp.float32)
    dm = best_of_search_convolution(left, right, (3, 3), (5, 5), ABSOLUTE_DIFFERENCE)
    assert not np.asarray(dm.valid).any()


def test_first_best_tie_breaking():
    # Periodic right image -> two equally good disparities; the first in scan
    # order (dy-major, dx-minor; VW iterates dx inner) must win.
    rng = np.random.default_rng(7)
    base = rng.random((11, 4), np.float32)
    left = jnp.asarray(np.tile(base, (1, 3))[:, :12])
    right_full = np.tile(base, (1, 4))[:11 + 0, :12 + 4]
    right = jnp.asarray(right_full.astype(np.float32))
    dm = best_of_search_convolution(left, right, (5, 1), (3, 3), ABSOLUTE_DIFFERENCE)
    disp = np.asarray(dm.disparity)
    valid = np.asarray(dm.valid)
    # disparities 0 and 4 give identical zero cost; 0 must be chosen
    np.testing.assert_array_equal(disp[valid][..., 0], 0)


def test_parabola_subpixel_recovers_fractional_shift(rng):
    # Build left as a smooth function; right shifted by 0.25 px in x via
    # bilinear sampling. Parabola fit should move disparity toward 0.25.
    h = w = 40
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.sin(xs * 0.55) * np.cos(ys * 0.45) + 0.3 * np.sin(xs * 0.21 + 1.0)
    true_dx = 0.25
    left = jnp.asarray(img)
    # right[y, x] = left[y, x - dx] so that matching offset is +dx
    right = interpolate(left, jnp.asarray(xs - true_dx), jnp.asarray(ys), "bicubic")
    from visionworkbench_tpu.stereo.correlation import DisparityMap
    int_disp = jnp.zeros((h, w, 2), jnp.int32)
    valid = jnp.ones((h, w), bool)
    refined = parabola_subpixel(DisparityMap(int_disp, valid), left, right, (7, 7))
    dx = np.asarray(refined.disparity[..., 0])
    core = dx[10:-10, 10:-10]
    assert abs(core.mean() - true_dx) < 0.12
    assert core.std() < 0.15


def test_parabola_keeps_integer_when_flat():
    from visionworkbench_tpu.stereo.correlation import DisparityMap
    left = jnp.zeros((12, 12), jnp.float32)
    right = jnp.zeros((12, 12), jnp.float32)
    int_disp = jnp.ones((12, 12, 2), jnp.int32)
    valid = jnp.ones((12, 12), bool)
    refined = parabola_subpixel(DisparityMap(int_disp, valid), left, right, (5, 5))
    np.testing.assert_array_equal(np.asarray(refined.disparity), 1.0)


@pytest.mark.parametrize("cost_type", [
    ABSOLUTE_DIFFERENCE, SQUARED_DIFFERENCE, CROSS_CORRELATION,
    CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM,
])
def test_box_modes_identical_disparities(rng, cost_type):
    """All box-sum formulations (reduce_window / cumsum-diff / banded MXU
    matmuls / the row-matmul+col-cumsum hybrids) must produce identical
    integer disparities — they differ only in fp32 summation order, which
    must not flip any argmin on this harness."""
    from visionworkbench_tpu.stereo.correlation import _auto_chunk, _best_of_search
    left, right = _shifted_pair(rng, h=30, w=30, shift=(2, 1), search=(4, 4))
    chunk = _auto_chunk(16, 30 * 30, cost_type)
    outs = {}
    for mode in ("rw", "cumsum", "mxu", "hybrid", "hybrid2"):
        disp, valid, _ = _best_of_search(left, right, 4, 4, 7, 7, cost_type,
                                         chunk=chunk, box_mode=mode)
        outs[mode] = (np.asarray(disp), np.asarray(valid))
    ref_d, ref_v = outs["rw"]
    for mode, (d, v) in outs.items():
        np.testing.assert_array_equal(d, ref_d, err_msg=f"box_mode={mode}")
        np.testing.assert_array_equal(v, ref_v, err_msg=f"box_mode={mode}")
