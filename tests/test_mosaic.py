"""Mosaic + morphology tests (model: ``src/vw/Mosaic/tests/TestImageComposite.cxx``,
``src/vw/Image/tests/TestBlobIndex.cxx``, ``TestGrassfire``-style checks)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.image.morphology import (
    blob_index, dilate, erode, euclidean_distance_sq, fill_holes, grassfire,
    remove_small_blobs,
)
from visionworkbench_tpu.mosaic import (
    DiskImagePyramid, ImageComposite, QuadTreeGenerator, collapse_pyramid,
    laplacian_pyramid, multiband_blend, write_kml_superoverlay,
)
from visionworkbench_tpu.math.bbox import BBox2, BBox2i


# ------------------------------------------------------------- morphology
def test_grassfire_known_values():
    mask = np.ones((5, 7), bool)
    d = np.asarray(grassfire(jnp.asarray(mask)))
    # border pixels are 1 step from the virtual border
    assert d[0, 0] == 1 and d[0, 3] == 1
    assert d[2, 3] == 3  # center: min(row_dist, col_dist) + 1
    # with an interior hole
    mask[2, 3] = False
    d = np.asarray(grassfire(jnp.asarray(mask)))
    assert d[2, 3] == 0
    assert d[2, 2] == 1 and d[1, 3] == 1
    assert d[2, 5] == 2


def test_grassfire_matches_bruteforce(rng):
    mask = rng.random((12, 15)) > 0.3
    d = np.asarray(grassfire(jnp.asarray(mask)))
    # brute force manhattan distance to nearest invalid-or-border
    h, w = mask.shape
    zeros = [(y, x) for y in range(-1, h + 1) for x in range(-1, w + 1)
             if y < 0 or y >= h or x < 0 or x >= w or not mask[y, x]]
    for y in range(h):
        for x in range(w):
            expected = 0 if not mask[y, x] else min(
                abs(y - zy) + abs(x - zx) for zy, zx in zeros)
            assert d[y, x] == expected, (y, x, d[y, x], expected)


def test_blob_index_and_filter():
    mask = np.zeros((10, 10), bool)
    mask[1:3, 1:3] = True     # area 4
    mask[6:9, 5:9] = True     # area 12
    mask[0, 9] = True         # area 1
    labels = np.asarray(blob_index(jnp.asarray(mask)))
    assert labels[1, 1] == labels[2, 2] != -1
    assert labels[7, 6] == labels[8, 8]
    assert labels[1, 1] != labels[7, 6]
    assert labels[5, 5] == -1
    kept = np.asarray(remove_small_blobs(jnp.asarray(mask), 5))
    assert not kept[1, 1] and kept[7, 6] and not kept[0, 9]


def test_erode_dilate():
    mask = np.zeros((9, 9), bool)
    mask[3:6, 3:6] = True
    er = np.asarray(erode(jnp.asarray(mask), 3))
    assert er[4, 4] and not er[3, 3]
    di = np.asarray(dilate(jnp.asarray(mask), 3))
    assert di[2, 2] and di[6, 6] and not di[1, 1]


def test_fill_holes():
    data = np.full((10, 10), 5.0, np.float32)
    valid = np.ones((10, 10), bool)
    valid[4:6, 4:6] = False
    data[4:6, 4:6] = 0
    filled, ok = fill_holes(jnp.asarray(data), jnp.asarray(valid), 4)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(filled), 5.0, atol=1e-3)


def test_euclidean_distance():
    mask = np.ones((8, 8), bool)
    mask[0, 0] = False
    d2 = np.asarray(euclidean_distance_sq(jnp.asarray(mask)))
    assert d2[0, 0] == 0
    assert d2[3, 4] == pytest.approx(9 + 16)


# ------------------------------------------------------------- pyramids
def test_laplacian_pyramid_collapse_identity(rng):
    img = jnp.asarray(rng.random((33, 47)), jnp.float32)
    lp = laplacian_pyramid(img, 3)
    back = collapse_pyramid(lp)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


# ------------------------------------------------------------- composite
def test_multiband_blend_constant_images():
    # Two overlapping constant images: blend must stay within [lo, hi] and
    # transition smoothly.
    a = jnp.full((40, 60), 1.0, jnp.float32)
    b = jnp.full((40, 60), 3.0, jnp.float32)
    ma = np.zeros((40, 60), bool); ma[:, :35] = True
    mb = np.zeros((40, 60), bool); mb[:, 25:] = True
    out, valid = multiband_blend([a, b], [jnp.asarray(ma), jnp.asarray(mb)])
    out = np.asarray(out)
    assert np.asarray(valid).all()
    assert out[20, 5] == pytest.approx(1.0, abs=0.15)
    assert out[20, 55] == pytest.approx(3.0, abs=0.15)
    # smooth monotonic-ish transition in the overlap
    assert out[20, 30] > 1.2 and out[20, 30] < 2.8


def test_image_composite_positioning():
    comp = ImageComposite("draft")
    comp.insert(np.full((10, 10), 2.0, np.float32), 0, 0)
    comp.insert(np.full((10, 10), 4.0, np.float32), 5, 0)
    out, valid = comp.generate()
    assert out.shape == (10, 15)
    assert valid.all()
    assert out[5, 1] == pytest.approx(2.0, abs=0.2)
    assert out[5, 13] == pytest.approx(4.0, abs=0.2)
    mid = out[5, 7]
    assert 2.0 < mid < 4.0


def test_quadtree_generation(tmp_path, rng):
    img = rng.random((100, 130)).astype(np.float32)
    name = str(tmp_path / "qtree")
    gen = QuadTreeGenerator(img, name, tile_size=64)
    tiles = gen.generate()
    # 130 px at tile 64 needs 2^2 tiles across -> 3 levels (0..2)
    assert gen.tree_levels == 3
    levels = {t[0] for t in tiles}
    assert levels == {0, 1, 2}
    for level, tx, ty, path in tiles:
        assert os.path.exists(path)
    kml = write_kml_superoverlay(name, BBox2.from_bounds(-120, 39, -119, 40),
                                 tiles, 64)
    assert os.path.exists(kml)
    content = open(kml).read()
    assert "GroundOverlay" in content and "LatLonAltBox" in content


def test_disk_image_pyramid(tmp_path, rng):
    from visionworkbench_tpu.fileio import write_tiff
    img = rng.random((256, 256)).astype(np.float32)
    path = str(tmp_path / "big.tif")
    write_tiff(path, img, tile_size=64)
    pyr = DiskImagePyramid(path, min_dimension=32,
                           cache_dir=str(tmp_path / "cache"))
    assert pyr.num_levels >= 3
    clip, level = pyr.get_image_clip(0.25, BBox2i(0, 0, 256, 256))
    assert level == 2
    assert clip.shape == (64, 64)
    clip0, level0 = pyr.get_image_clip(1.0, BBox2i(10, 10, 50, 50))
    assert level0 == 0
    np.testing.assert_allclose(clip0, img[10:60, 10:60])


def test_grassfire_np_matches_device(rng):
    """grassfire_np (the host planner twin) must equal the device
    grassfire bit-for-bit on arbitrary masks."""
    import numpy as np
    from visionworkbench_tpu.image.morphology import grassfire, grassfire_np
    m = rng.random((37, 53)) > 0.3
    m[:, 10:14] = False
    np.testing.assert_array_equal(np.asarray(grassfire(m)), grassfire_np(m))
    full = np.ones((16, 16), bool)
    np.testing.assert_array_equal(np.asarray(grassfire(full)),
                                  grassfire_np(full))
