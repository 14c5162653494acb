"""Image substrate tests, modeled on the reference's exhaustive view-algebra
tests (``src/vw/Image/tests/TestEdgeExtension.cxx``, ``TestInterpolation.cxx``,
``TestManipulation.cxx``, ``TestAlgorithms.cxx``, ``TestStatistics.cxx``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.image import (
    MaskedImage, all_valid, clamp, create_mask, crop, edge_extend, edge_mask,
    flip_horizontal, flip_vertical, histogram, interpolate, masked_binary,
    masked_mean, normalize, rotate_90_ccw, rotate_90_cw, rotate_180, subsample,
    threshold, transpose, upsample,
)
from visionworkbench_tpu.math.bbox import BBox2i, bounding_box, subdivide_bbox


@pytest.fixture
def img34():
    # 3 rows x 4 cols, distinct values
    return jnp.arange(12, dtype=jnp.float32).reshape(3, 4)


# ---------------------------------------------------------------- bbox
def test_bbox_basics():
    b = BBox2i(2, 3, 4, 5)
    assert b.min() == (2, 3) and b.max() == (6, 8)
    assert b.area() == 20
    assert b.contains((2, 3)) and not b.contains((6, 8))
    c = b.copy().expand(1)
    assert c.min() == (1, 2) and c.max() == (7, 9)
    c.crop(BBox2i(0, 0, 5, 5))
    assert c.max() == (5, 5)
    assert BBox2i(0, 0, 2, 2).intersects(BBox2i(1, 1, 2, 2))
    assert not BBox2i(0, 0, 2, 2).intersects(BBox2i(2, 0, 2, 2))


def test_subdivide_bbox():
    tiles = subdivide_bbox(BBox2i(0, 0, 10, 7), 4, 4)
    assert len(tiles) == 6
    assert tiles[0] == BBox2i(0, 0, 4, 4)
    assert tiles[2] == BBox2i(8, 0, 2, 4)
    assert tiles[-1] == BBox2i(8, 4, 2, 3)
    total = sum(t.area() for t in tiles)
    assert total == 70


# ---------------------------------------------------------------- edge
def test_edge_extend_modes(img34):
    np_img = np.asarray(img34)
    # zero
    out = edge_extend(img34, x_pad=1, y_pad=1, mode="zero")
    assert out.shape == (5, 6)
    assert out[0, 0] == 0 and out[1, 1] == np_img[0, 0]
    # constant == replicate edge (VW semantics)
    out = edge_extend(img34, x_pad=2, y_pad=0, mode="constant")
    assert out[0, 0] == np_img[0, 0] and out[0, -1] == np_img[0, -1]
    # value
    out = edge_extend(img34, x_pad=1, y_pad=1, mode="value", value=9.5)
    assert out[0, 0] == 9.5
    # periodic
    out = edge_extend(img34, x_pad=1, y_pad=1, mode="periodic")
    assert out[0, 1] == np_img[-1, 0]
    assert out[1, 0] == np_img[0, -1]
    # reflect (edge pixel not repeated)
    out = edge_extend(img34, x_pad=1, y_pad=1, mode="reflect")
    assert out[1, 0] == np_img[0, 1]
    assert out[0, 1] == np_img[1, 0]
    # cylindrical: wrap x, replicate y
    out = edge_extend(img34, x_pad=1, y_pad=1, mode="cylindrical")
    assert out[1, 0] == np_img[0, -1]
    assert out[0, 1] == np_img[0, 0]


def test_edge_extend_linear():
    img = jnp.array([[1.0, 2.0, 3.0]])
    out = edge_extend(img, x_pad=2, y_pad=0, mode="linear")
    np.testing.assert_allclose(np.asarray(out)[0], [-1, 0, 1, 2, 3, 4, 5])
    col = jnp.array([[1.0], [3.0]])
    out = edge_extend(col, x_pad=0, y_pad=1, mode="linear")
    np.testing.assert_allclose(np.asarray(out)[:, 0], [-1, 1, 3, 5])


# ---------------------------------------------------------------- interpolation
def test_interpolation_exact_at_integers(img34):
    xs = jnp.array([0.0, 1.0, 2.0, 3.0])
    ys = jnp.array([0.0, 1.0, 2.0, 2.0])
    for method in ("nearest", "bilinear", "bicubic"):
        out = interpolate(img34, xs, ys, method)
        expected = np.asarray(img34)[np.int32(ys), np.int32(xs)]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_bilinear_midpoints(img34):
    out = interpolate(img34, jnp.array([0.5]), jnp.array([0.0]), "bilinear")
    assert float(out[0]) == pytest.approx(0.5)
    out = interpolate(img34, jnp.array([0.5]), jnp.array([0.5]), "bilinear")
    assert float(out[0]) == pytest.approx((0 + 1 + 4 + 5) / 4)


def test_bicubic_linear_ramp_preserved():
    # Bicubic reproduces linear functions exactly (away from borders).
    ramp = jnp.arange(8, dtype=jnp.float32)[None, :].repeat(8, axis=0)
    xs = jnp.array([2.25, 3.75, 4.5])
    ys = jnp.array([3.0, 3.0, 3.0])
    out = interpolate(ramp, xs, ys, "bicubic")
    np.testing.assert_allclose(np.asarray(out), np.asarray(xs), atol=1e-5)


def test_interpolation_channels():
    img = jnp.stack([jnp.ones((4, 4)), 2 * jnp.ones((4, 4))], axis=-1)
    out = interpolate(img, jnp.array([1.5]), jnp.array([1.5]), "bilinear")
    np.testing.assert_allclose(np.asarray(out), [[1.0, 2.0]])


# ---------------------------------------------------------------- manipulation
def test_manipulation(img34):
    np_img = np.asarray(img34)
    np.testing.assert_array_equal(np.asarray(crop(img34, 1, 0, 2, 3)), np_img[0:3, 1:3])
    np.testing.assert_array_equal(np.asarray(crop(img34, bbox=BBox2i(1, 1, 2, 2))),
                                  np_img[1:3, 1:3])
    np.testing.assert_array_equal(np.asarray(subsample(img34, 2)), np_img[::2, ::2])
    np.testing.assert_array_equal(np.asarray(upsample(img34, 2)),
                                  np.repeat(np.repeat(np_img, 2, 0), 2, 1))
    np.testing.assert_array_equal(np.asarray(flip_vertical(img34)), np_img[::-1])
    np.testing.assert_array_equal(np.asarray(flip_horizontal(img34)), np_img[:, ::-1])
    np.testing.assert_array_equal(np.asarray(rotate_180(img34)), np_img[::-1, ::-1])
    np.testing.assert_array_equal(np.asarray(transpose(img34)), np_img.T)
    # rot90 cw then ccw = identity
    np.testing.assert_array_equal(np.asarray(rotate_90_ccw(rotate_90_cw(img34))), np_img)
    # rot90 cw twice = rot180
    np.testing.assert_array_equal(np.asarray(rotate_90_cw(rotate_90_cw(img34))),
                                  np_img[::-1, ::-1])


# ---------------------------------------------------------------- algorithms
def test_algorithms(img34):
    out = clamp(img34, 2.0, 5.0)
    assert float(jnp.min(out)) == 2.0 and float(jnp.max(out)) == 5.0
    out = normalize(img34, 0.0, 1.0)
    assert float(jnp.min(out)) == 0.0 and float(jnp.max(out)) == pytest.approx(1.0)
    out = threshold(img34, 5.0)
    np.testing.assert_array_equal(np.asarray(out), (np.asarray(img34) > 5.0).astype(np.float32))


# ---------------------------------------------------------------- masks
def test_create_and_apply_mask():
    data = jnp.array([[1.0, -99.0], [3.0, 4.0]])
    mi = create_mask(data, nodata_value=-99.0)
    assert bool(mi.valid[0, 0]) and not bool(mi.valid[0, 1])
    filled = mi.filled(0.0)
    assert float(filled[0, 1]) == 0.0
    assert float(masked_mean(mi)) == pytest.approx((1 + 3 + 4) / 3)


def test_masked_binary_lattice():
    a = MaskedImage(jnp.ones((2, 2)), jnp.array([[True, False], [True, True]]))
    b = MaskedImage(2 * jnp.ones((2, 2)), jnp.array([[True, True], [False, True]]))
    out = masked_binary(jnp.add, a, b)
    np.testing.assert_array_equal(np.asarray(out.valid),
                                  [[True, False], [False, True]])
    np.testing.assert_allclose(np.asarray(out.data), 3.0)


def test_edge_mask():
    img = jnp.array([
        [0, 0, 0, 0],
        [0, 5, 6, 0],
        [0, 7, 0, 0],  # interior zero stays valid (between valid pixels)
        [0, 0, 0, 0],
    ], dtype=jnp.float32)
    mi = edge_mask(img, 0.0)
    valid = np.asarray(mi.valid)
    assert valid[1, 1] and valid[1, 2] and valid[2, 1]
    assert not valid[0, 0] and not valid[3, 3] and not valid[1, 3]


# ---------------------------------------------------------------- statistics
def test_histogram():
    img = jnp.array([0.0, 0.1, 0.6, 0.9, 1.0])
    h = histogram(img, 2, 0.0, 1.0)
    assert float(h.sum()) == 5
    np.testing.assert_allclose(np.asarray(h), [2, 3])
