"""Coverage for modules without dedicated tests: orthoprojection, EXIF,
frame trees, and the water-detection classifiers (model:
``TestMap2Cam``-style geometry checks, ``TestExif.cxx``, ``TestFrameStore``,
``detect_water.cc`` behavior)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.camera import PinholeModel
from visionworkbench_tpu.cartography import make_geographic_georef, orthoproject
from visionworkbench_tpu.geometry import ATrans, FrameStore
from visionworkbench_tpu.tools.detect_water import (
    detect_water_sar, detect_water_spectral,
)


def test_orthoproject_nadir_recovers_pattern():
    """A nadir camera over a flat datum: orthoprojection onto a matching map
    grid reproduces the camera image up to the grid mapping."""
    # Camera at ECEF-ish local frame: looking straight down the -z axis from
    # z=1000 over a plane; use a simple georef where ground xy == lonlat
    # degrees scaled small so datum curvature is negligible.
    cam_img = np.zeros((64, 64), np.float32)
    cam_img[16:32, 24:40] = 1.0

    # Local-frame pinhole: world (x, y, 0) plane, camera at (0, 0, 1000)
    # looking down (camera z axis = -world z).
    r = np.diag([1.0, -1.0, -1.0])  # cam x=east, y=-north, z=down
    cam = PinholeModel((0.0, 0.0, 1000.0), r, (1000.0, 1000.0), (32.0, 32.0))

    class FlatGeoref:
        """Minimal georef mapping pixel -> local world xy (meters)."""
        def pixel_to_lonlat(self, px, py):
            return px * 10.0 - 320.0, py * 10.0 - 320.0

    class FlatDatum2Cam:
        pass

    # orthoproject uses Datum2CamTrans(pixel->lonlat->ECEF). Instead test the
    # core warp via a custom transform: monkeypatch by calling the sample
    # path through Datum2CamTrans-compatible reverse.
    from visionworkbench_tpu.cartography import map2cam as m2c

    class LocalTrans:
        def reverse(self, x, y):
            wx = x * 10.0 - 320.0
            wy = y * 10.0 - 320.0
            pts = jnp.stack([wx, wy, jnp.zeros_like(wx)], -1)
            pix = cam.point_to_pixel(pts)
            return pix[..., 0], pix[..., 1]

    xs, ys = m2c._dest_grid(64, 64)
    sx, sy = LocalTrans().reverse(xs, ys)
    out = np.asarray(m2c.sample(jnp.asarray(cam_img), sx, sy,
                                interp="bilinear", edge="zero"))
    # Camera pixel (28, 20) is lit; find where it lands on the map:
    # world xy = ((28-32)/1000*1000, -(20-32)/1000*1000) = (-4, 12)
    # map pixel = ((wx+320)/10, (wy+320)/10) = (31.6, 33.2)
    assert out[33, 32] > 0.5
    assert out[5, 5] == 0.0
    assert out.shape == (64, 64)


def test_orthoproject_datum_runs():
    """End-to-end orthoproject over the real datum path (smoke + shape)."""
    cam_img = jnp.asarray(np.random.default_rng(0).random((32, 32)),
                          jnp.float32)
    # Tiny patch of the real Earth: camera pointing at (lon=0, lat=0).
    from visionworkbench_tpu.cartography import well_known_datum
    datum = well_known_datum("WGS84")
    ground = np.asarray(datum.geodetic_to_cartesian(
        jnp.asarray([0.0, 0.0, 0.0])), np.float64)
    up = ground / np.linalg.norm(ground)
    cam_ctr = ground + up * 5000.0
    # Camera axes: z toward ground, x east, y completes.
    z = -up
    x = np.array([0.0, 1.0, 0.0])
    y = np.cross(z, x)
    r = np.stack([x, y, z], axis=1)
    cam = PinholeModel(cam_ctr, r, (2000.0, 2000.0), (16.0, 16.0))
    georef = make_geographic_georef(-0.01, 0.01, 0.000625)
    out = orthoproject(cam_img, cam, georef, (32, 32))
    assert np.asarray(out).shape == (32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_exif_view_reads_tags(tmp_path):
    from PIL import Image
    from visionworkbench_tpu.camera import ExifView

    path = str(tmp_path / "photo.jpg")
    im = Image.new("L", (8, 8), 128)
    exif = Image.Exif()
    exif[271] = "TestMake"          # Make
    exif[272] = "TestModel"         # Model
    exif[33434] = (1, 250)          # ExposureTime = 1/250
    exif[33437] = (28, 10)          # FNumber = f/2.8
    im.save(path, exif=exif)

    v = ExifView(path)
    assert v.camera_make() == "TestMake"
    assert v.camera_model() == "TestModel"
    assert v.get_exposure_time() == pytest.approx(1 / 250)
    assert v.get_f_number() == pytest.approx(2.8)
    lum = v.get_average_luminance()
    assert lum == pytest.approx(2.8 * 2.8 / (1 / 250 * 100) * 12.5)


def test_frame_store_transforms():
    fs = FrameStore()
    fs.add("world")
    rot = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    fs.add("rover", parent="world", transform=ATrans(rot, (10.0, 0.0, 0.0)))
    fs.add("mast", parent="rover", transform=ATrans(np.eye(3), (0.0, 0.0, 2.0)))

    # mast origin in world coords: rover at (10,0,0) rotated 90deg about z;
    # mast offset (0,0,2) in rover frame -> world (10, 0, 2).
    t = fs.to_world("mast")
    np.testing.assert_allclose(t.apply([0.0, 0.0, 0.0]), [10.0, 0.0, 2.0],
                               atol=1e-6)
    # A point 1m ahead of the rover (+x rover) is +y in world.
    tr = fs.transform_between("rover", "world")
    np.testing.assert_allclose(tr.apply([1.0, 0.0, 0.0]), [10.0, 1.0, 0.0],
                               atol=1e-6)
    # Round trip world->mast->world is identity.
    rt = fs.transform_between("mast", "world").compose(
        fs.transform_between("world", "mast"))
    np.testing.assert_allclose(rt.rotation, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(rt.translation, np.zeros(3), atol=1e-9)


def test_detect_water_spectral_and_sar():
    rng = np.random.default_rng(3)
    img = np.zeros((32, 32, 4), np.float32)
    img[..., 1] = 0.2 + 0.02 * rng.random((32, 32))   # green
    img[..., 3] = 0.4 + 0.02 * rng.random((32, 32))   # nir (land: NDWI < 0)
    img[8:16, 8:16, 1] = 0.5                          # water: green >> nir
    img[8:16, 8:16, 3] = 0.1
    water, ndwi = detect_water_spectral(img, green=1, nir=3)
    assert water[10, 10]
    assert not water[0, 0]
    assert ndwi.shape == (32, 32)

    # SAR: bimodal backscatter -> automatic threshold splits the modes.
    sar = 0.5 + 0.05 * rng.random((64, 64))
    sar[20:40, 20:40] = 0.05 + 0.02 * rng.random((20, 20))
    water_sar, thr = detect_water_sar(sar)
    assert water_sar[30, 30]
    assert not water_sar[0, 0]
    assert 0.07 < thr < 0.5
