"""Map2Cam / orthoprojection / bathymetry / shapefile / camera-geometry /
optical-bar tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.camera import (
    OpticalBarModel, PinholeModel, camera_from_points, decompose_camera_matrix,
    fit_camera_matrix,
)
from visionworkbench_tpu.cartography import (
    BathyStereoModel, Datum2CamTrans, make_geographic_georef, orthoproject,
    read_shapefile, snell_refraction, well_known_datum, write_shapefile,
)
from visionworkbench_tpu.geometry import Polygon
from visionworkbench_tpu.math.quaternion import euler_to_rotation_matrix


def _overhead_camera(datum):
    alt = datum.a + 500000.0
    c = np.array([alt, 0.0, 0.0])
    r = np.array([[0.0, 0, -1.0], [0, 1.0, 0], [-1.0, 0, 0]]).T
    return PinholeModel(c, r, (2000.0, 2000.0), (100.0, 100.0))


def test_datum2cam_roundtrip_center():
    d = well_known_datum("WGS84")
    cam = _overhead_camera(d)
    g = make_geographic_georef(-0.05, 0.05, 0.001)
    tx = Datum2CamTrans(cam, g)
    # The georef center (lon 0, lat 0) is directly under the camera -> maps
    # near the principal point.
    px, py = tx.reverse(jnp.asarray([50.0]), jnp.asarray([50.0]))
    assert abs(float(px[0]) - 100.0) < 2.0
    assert abs(float(py[0]) - 100.0) < 2.0


def test_orthoproject_runs_and_centers(rng):
    d = well_known_datum("WGS84")
    cam = _overhead_camera(d)
    img = jnp.asarray(rng.random((200, 200)), jnp.float32)
    g = make_geographic_georef(-0.05, 0.05, 0.001)
    out = orthoproject(img, cam, g, (100, 100))
    assert out.shape == (100, 100)
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out).sum()) > 0


def test_snell_refraction():
    # straight-down ray is unchanged
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    n = jnp.asarray([0.0, 0.0, 1.0])
    out, tir = snell_refraction(d, n, 1.0, 1.34)
    np.testing.assert_allclose(np.asarray(out), [[0, 0, -1.0]], atol=1e-6)
    assert not bool(tir[0])
    # oblique ray bends toward the normal entering denser medium
    inc = jnp.asarray([[np.sin(0.5), 0.0, -np.cos(0.5)]])
    out, _ = snell_refraction(inc, n, 1.0, 1.34)
    sin_out = float(jnp.abs(out[0, 0]))
    np.testing.assert_allclose(sin_out, np.sin(0.5) / 1.34, atol=1e-5)


def test_bathy_stereo_deeper_than_naive():
    # Underwater point: refraction-aware triangulation differs from naive.
    c1 = PinholeModel((0, 0, 10.0), np.eye(3), (500, 500), (100, 100))
    c2 = PinholeModel((2.0, 0, 10.0), np.eye(3), (500, 500), (100, 100))
    # note: cameras look along +z (z up here is negative depth); place water
    # plane at z = 12 with normal -z so "below" the plane is larger z.
    model = BathyStereoModel(c1, c2, (0, 0, 1.0, 12.0))
    pix1 = jnp.asarray([[120.0, 100.0]])
    pix2 = jnp.asarray([[80.0, 100.0]])
    pt, err = model.triangulate(pix1, pix2)
    from visionworkbench_tpu.stereo.stereo_model import StereoModel
    naive, _, _ = StereoModel(c1, c2).triangulate(pix1, pix2)
    assert float(pt[0, 2]) > float(naive[0, 2])  # refraction -> deeper


def test_shapefile_roundtrip(tmp_path):
    p1 = Polygon([[(0, 0), (10, 0), (10, 10), (0, 10)]])
    p2 = Polygon([[(20, 20), (30, 20), (25, 30)]])
    path = str(tmp_path / "polys.shp")
    write_shapefile(path, [p1, p2])
    back, stype = read_shapefile(path)
    assert stype == 5 and len(back) == 2
    np.testing.assert_allclose(back[0].rings[0], p1.rings[0])
    assert back[1].area() == pytest.approx(p2.area(), abs=1e-9)


def test_camera_matrix_fit_and_decompose(rng):
    r = np.asarray(euler_to_rotation_matrix(0.1, -0.15, 0.2))
    cam = PinholeModel((3.0, -2.0, 1.0), r, (800.0, 820.0), (320.0, 240.0))
    pts = rng.random((20, 3)) * 10 + [0, 0, 20]
    pix = np.asarray(cam.point_to_pixel(jnp.asarray(pts, jnp.float32)))
    pm = fit_camera_matrix(pts, pix)
    # projection consistency
    homo = np.hstack([pts, np.ones((20, 1))])
    proj = (pm @ homo.T).T
    proj = proj[:, :2] / proj[:, 2:]
    np.testing.assert_allclose(proj, pix, atol=0.1)
    fitted = camera_from_points(pts, pix)
    np.testing.assert_allclose(fitted.C, cam.C, atol=0.05)
    assert fitted.fu == pytest.approx(cam.fu, rel=0.01)


def test_optical_bar_rays():
    d = well_known_datum("WGS84")
    alt = 200000.0
    pos = np.array([d.a + alt, 0, 0])
    # camera z toward planet (-x), x across-track (y world), y along (z world)
    r = np.stack([np.array([0, 1.0, 0]), np.array([0, 0, 1.0]),
                  np.array([-1.0, 0, 0])], axis=1)
    cam = OpticalBarModel((2000, 1000), (1000, 500), 1e-5, 0.6, 1.0, 0.2,
                          True, pos, r, velocity=(0, 0, 0),
                          use_motion_compensation=False)
    pix = jnp.asarray([[1000.0, 500.0], [0.0, 500.0], [2000.0, 500.0]])
    rays = np.asarray(cam.pixel_to_vector(pix))
    # center pixel looks straight down (-x)
    np.testing.assert_allclose(rays[0], [-1, 0, 0], atol=1e-5)
    # edge pixels tilt across-track symmetric
    assert rays[1][1] == pytest.approx(-rays[2][1], abs=1e-5)
    assert rays[1][0] < -0.9
    # inverse projection recovers the center pixel
    pt = jnp.asarray(pos + 100000.0 * np.asarray(rays[0]), jnp.float32)
    pix_back = np.asarray(cam.point_to_pixel(pt[None]))
    np.testing.assert_allclose(pix_back[0], [1000.0, 500.0], atol=1.0)
