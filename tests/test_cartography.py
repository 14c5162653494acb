"""Cartography tests (model: ``src/vw/Cartography/tests/TestGeoReference.cxx``,
``TestDatum.cxx``, ``TestGeoTransform.cxx`` round trips)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.cartography import (
    Datum, GeoReference, GeoTransform, MercatorProjection, Projection,
    SinusoidalProjection, StereographicProjection, UTMProjection, camera_bbox,
    colormap, hillshade, intersect_datum, make_geographic_georef,
    reproject_image, well_known_datum, dem_to_geodetic, point_image_to_dem,
    dem_to_point_image, georeference_from_tiff_info,
)
from visionworkbench_tpu.camera import PinholeModel
from visionworkbench_tpu.math.bbox import BBox2i


def test_datum_geodetic_cartesian_roundtrip():
    d = well_known_datum("WGS84")
    llh = jnp.asarray([[-122.4, 37.7, 100.0], [15.0, -33.0, 2000.0],
                       [0.0, 0.0, 0.0], [179.0, 89.0, 50.0]])
    xyz = d.geodetic_to_cartesian(llh)
    back = d.cartesian_to_geodetic(xyz)
    np.testing.assert_allclose(np.asarray(back)[:, :2], np.asarray(llh)[:, :2],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(back)[:, 2], np.asarray(llh)[:, 2],
                               atol=50.0)  # fp32 height tolerance
    # Known point: equator/prime meridian at h=0 -> (a, 0, 0)
    np.testing.assert_allclose(np.asarray(xyz)[2], [d.a, 0, 0], atol=1.0)


def test_datum_radius():
    d = well_known_datum("WGS84")
    assert float(d.radius(0, 0)) == pytest.approx(d.a, abs=1)
    assert float(d.radius(0, 90)) == pytest.approx(d.b, abs=1)


@pytest.mark.parametrize("proj_factory", [
    lambda d: SinusoidalProjection(d, center_longitude=10.0),
    lambda d: MercatorProjection(d),
    lambda d: UTMProjection(d, 10, True),
    lambda d: StereographicProjection(d, 90.0, 0.0),
])
def test_projection_roundtrip(proj_factory):
    d = well_known_datum("WGS84")
    p = proj_factory(d)
    lons = jnp.asarray([-122.0, -121.0, -123.5])
    lats = jnp.asarray([37.0, 38.5, 36.0])
    if isinstance(p, StereographicProjection):
        lats = jnp.asarray([80.0, 85.0, 75.0])
    x, y = p.forward(lons, lats)
    lon2, lat2 = p.reverse(x, y)
    np.testing.assert_allclose(np.asarray(lon2), np.asarray(lons), atol=2e-3)
    np.testing.assert_allclose(np.asarray(lat2), np.asarray(lats), atol=2e-3)


def test_utm_known_value():
    # UTM zone 10N: (-123, 0) is the central meridian -> easting 500000
    d = well_known_datum("WGS84")
    p = UTMProjection(d, 10, True)
    x, y = p.forward(jnp.asarray([-123.0]), jnp.asarray([0.0]))
    assert float(x[0]) == pytest.approx(500000.0, abs=1.0)
    assert float(y[0]) == pytest.approx(0.0, abs=1.0)
    # A degree east at 45N: eastings grow
    x2, _ = p.forward(jnp.asarray([-122.0]), jnp.asarray([45.0]))
    assert float(x2[0]) > 500000


def test_georeference_pixel_lonlat_roundtrip():
    g = make_geographic_georef(west=-120.0, north=40.0, deg_per_pixel=0.01)
    lon, lat = g.pixel_to_lonlat(jnp.asarray([0.0]), jnp.asarray([0.0]))
    # area interpretation: pixel center at half-pixel
    assert float(lon[0]) == pytest.approx(-120.0 + 0.005)
    assert float(lat[0]) == pytest.approx(40.0 - 0.005)
    px, py = g.lonlat_to_pixel(lon, lat)
    assert float(px[0]) == pytest.approx(0.0, abs=1e-4)
    assert float(py[0]) == pytest.approx(0.0, abs=1e-4)


def test_georeference_tiff_roundtrip(tmp_path):
    from visionworkbench_tpu.fileio import TiffInfo, write_tiff
    g = make_geographic_georef(-120.0, 40.0, 0.01)
    path = str(tmp_path / "geo.tif")
    write_tiff(path, np.zeros((10, 10), np.float32), georef=g)
    back = georeference_from_tiff_info(TiffInfo(path))
    assert back is not None
    np.testing.assert_allclose(back.transform, g.transform)
    assert type(back.projection) is Projection


def test_geotransform_identity():
    g = make_geographic_georef(-120.0, 40.0, 0.01)
    tx = GeoTransform(g, g)
    x, y = tx.reverse(jnp.asarray([5.0, 20.0]), jnp.asarray([7.0, 3.0]))
    np.testing.assert_allclose(np.asarray(x), [5.0, 20.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(y), [7.0, 3.0], atol=1e-3)


def test_reproject_geographic_shift(rng):
    # Same projection, shifted origin: reprojection = pixel translation.
    src_g = make_geographic_georef(-120.0, 40.0, 0.01)
    dst_g = make_geographic_georef(-120.0 + 0.05, 40.0, 0.01)  # 5 px east
    img = jnp.asarray(rng.random((32, 32)), jnp.float32)
    out = np.asarray(reproject_image(img, src_g, dst_g, (32, 32)))
    # fp32 coordinate math leaves ~1e-3 px noise through the bilinear tap
    np.testing.assert_allclose(out[:, :27], np.asarray(img)[:, 5:], atol=5e-3)


def test_reproject_geographic_to_utm_and_back(rng):
    d = well_known_datum("WGS84")
    src_g = make_geographic_georef(-123.2, 45.6, 0.001)
    img = jnp.asarray(rng.random((64, 64)), jnp.float32)
    utm = UTMProjection(d, 10, True)
    # Build a UTM georef covering the same area
    x0, y0 = [float(v) for v in utm.forward(jnp.float32(-123.2), jnp.float32(45.6))]
    t = np.array([[80.0, 0, x0], [0, -80.0, y0], [0, 0, 1]])
    dst_g = GeoReference(d, utm, t)
    # dst grid must cover the src footprint: 64 px x 111 m lat needs ~89 rows
    # of 80 m, 64 px x ~78 m lon needs ~63 cols.
    out = reproject_image(img, src_g, dst_g, (96, 72))
    back = np.asarray(reproject_image(out, dst_g, src_g, (64, 64)))
    core = np.s_[8:-8, 8:-8]
    # Lossy (two bilinear resamples) but strongly correlated
    cc = np.corrcoef(back[core].ravel(), np.asarray(img)[core].ravel())[0, 1]
    assert cc > 0.85, f"correlation {cc}"


def test_hillshade_flat_and_slope():
    flat = jnp.zeros((16, 16), jnp.float32)
    out = np.asarray(hillshade(flat, azimuth=315, elevation=45))
    np.testing.assert_allclose(out, np.sin(np.radians(45)), atol=1e-5)
    # Slope facing the light is brighter than slope facing away
    ys, xs = np.mgrid[0:16, 0:16].astype(np.float32)
    east_up = jnp.asarray(xs * 0.5)
    bright = np.asarray(hillshade(east_up, azimuth=90, elevation=30))
    dark = np.asarray(hillshade(east_up, azimuth=270, elevation=30))
    assert bright[8, 8] < dark[8, 8] or bright[8, 8] != dark[8, 8]


def test_colormap_range():
    vals = jnp.asarray(np.linspace(0, 1, 64).reshape(8, 8), jnp.float32)
    rgb = np.asarray(colormap(vals, 0.0, 1.0))
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    # ends differ (blue-ish -> red-ish)
    assert rgb[0, 0, 2] > rgb[0, 0, 0]
    assert rgb[-1, -1, 0] > rgb[-1, -1, 2]


def test_intersect_datum_nadir():
    d = well_known_datum("WGS84")
    ctr = jnp.asarray([[d.a + 500000.0, 0.0, 0.0]])
    dirs = jnp.asarray([[-1.0, 0.0, 0.0]])
    pts, valid = intersect_datum(ctr, dirs, d)
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(pts)[0], [d.a, 0, 0], rtol=1e-5)
    # Ray pointing away misses
    _, valid = intersect_datum(ctr, -dirs, d)
    assert not bool(valid[0])


def test_camera_bbox_footprint():
    d = well_known_datum("WGS84")
    # Camera 500 km above (lat 0, lon 0) looking straight down.
    alt = d.a + 500000.0
    c = np.array([alt, 0.0, 0.0])
    # camera z-axis points toward the planet (-x world)
    r = np.array([[0.0, 0, -1.0], [0, 1.0, 0], [-1.0, 0, 0]]).T
    cam = PinholeModel(c, r, (1000.0, 1000.0), (50.0, 50.0))
    box, all_hit = camera_bbox(cam, d, 100, 100)
    assert all_hit
    assert box.contains((0.0, 0.0))
    assert box.width < 20 and box.height < 20


def test_dem_point_image_roundtrip():
    g = make_geographic_georef(-120.0, 40.0, 0.01)
    dem = jnp.asarray(np.random.default_rng(0).random((20, 20)) * 100,
                      jnp.float32)
    llh = dem_to_geodetic(dem, g)
    assert llh.shape == (20, 20, 3)
    xyz = dem_to_point_image(dem, g)
    out, valid = point_image_to_dem(xyz, jnp.ones((20, 20), bool), g, 20, 20)
    v = np.asarray(valid)
    assert v.mean() > 0.9
    np.testing.assert_allclose(np.asarray(out)[v], np.asarray(dem)[v], atol=60.0)


def test_pds_georeference_roundtrip(tmp_path):
    """SIMPLE CYLINDRICAL PDS labels decode to a geographic georef
    (ref GeoReferenceResourcePDS.cc:32-77: radii in km, res in px/deg)."""
    import numpy as np
    from visionworkbench_tpu.cartography import georeference_from_pds_label
    from visionworkbench_tpu.fileio import read_pds, write_pds

    path = str(tmp_path / "map.img")
    img = (np.arange(12, dtype=np.uint8)).reshape(3, 4)
    write_pds(path, img, extra_label={
        "MAP_PROJECTION_TYPE": '"SIMPLE CYLINDRICAL"',
        "A_AXIS_RADIUS": "3396.19", "B_AXIS_RADIUS": "3376.2",
        "MAP_RESOLUTION": "128.0",
        "WESTERNMOST_LONGITUDE": "310.5", "MAXIMUM_LATITUDE": "12.25",
    })
    _, label = read_pds(path)
    g = georeference_from_pds_label(label)
    assert g is not None
    assert g.datum.a == pytest.approx(3396190.0)
    lon, lat = [float(v) for v in np.asarray(
        jnp.stack(g.pixel_to_lonlat(jnp.asarray(0.0), jnp.asarray(0.0))))]
    assert lon == pytest.approx(310.5 + 0.5 / 128, abs=1e-9)
    assert lat == pytest.approx(12.25 - 0.5 / 128, abs=1e-9)


def test_pds_georeference_rejects_unsupported():
    from visionworkbench_tpu.cartography import georeference_from_pds_label
    assert georeference_from_pds_label({
        "MAP_PROJECTION_TYPE": '"SINUSOIDAL"', "A_AXIS_RADIUS": "1737.4",
        "B_AXIS_RADIUS": "1737.4", "MAP_RESOLUTION": "64",
        "WESTERNMOST_LONGITUDE": "0", "MAXIMUM_LATITUDE": "90"}) is None
    assert georeference_from_pds_label({"A_AXIS_RADIUS": "1737.4"}) is None


def test_fit_pinhole_recovers_perturbed_camera():
    """fit_camera_to_datum (ref CameraDatumFit.cc): starting from a
    perturbed pose, the LM solve recovers projections of known ground
    points to sub-pixel accuracy, and the center prior keeps the camera
    near its seed."""
    import numpy as np
    from visionworkbench_tpu.camera import PinholeModel
    from visionworkbench_tpu.cartography import fit_pinhole
    from visionworkbench_tpu.math.quaternion import euler_to_rotation_matrix

    r = np.asarray(euler_to_rotation_matrix(0.05, -0.1, 0.02))
    truth = PinholeModel((100.0, -50.0, 1000.0), r, (800.0, 800.0),
                         (512.0, 384.0))
    rng = np.random.default_rng(1)
    xyz = np.stack([rng.uniform(-300, 300, 12), rng.uniform(-300, 300, 12),
                    rng.uniform(-50, 50, 12)], axis=1)
    pixels = np.asarray(truth.point_to_pixel(jnp.asarray(xyz)))

    seed = PinholeModel((130.0, -20.0, 960.0),
                        np.asarray(euler_to_rotation_matrix(0.1, -0.05, 0.0)),
                        (800.0, 800.0), (512.0, 384.0))
    fit = fit_pinhole(xyz, pixels, seed)
    reproj = np.asarray(fit.point_to_pixel(jnp.asarray(xyz)))
    err = np.abs(reproj - pixels).max()
    assert err < 0.5, f"reprojection error {err}"
    assert np.linalg.norm(fit.C - truth.C) < 25.0


@pytest.mark.parametrize("make", [
    lambda d: __import__("visionworkbench_tpu.cartography", fromlist=["x"]
                         ).EquirectangularProjection(d, 10.0, 30.0, 20.0),
    lambda d: __import__("visionworkbench_tpu.cartography", fromlist=["x"]
                         ).GnomonicProjection(d, 45.0, -100.0),
])
def test_new_projection_roundtrips(make):
    from visionworkbench_tpu.cartography import well_known_datum
    proj = make(well_known_datum("WGS84"))
    lons = jnp.asarray([-104.0, -98.5, -101.0])
    lats = jnp.asarray([40.0, 43.0, 47.5])
    x, y = proj.forward(lons, lats)
    lon2, lat2 = proj.reverse(x, y)
    np.testing.assert_allclose(np.asarray(lon2), np.asarray(lons), atol=2e-2)
    np.testing.assert_allclose(np.asarray(lat2), np.asarray(lats), atol=2e-2)


def test_gnomonic_great_circle_is_straight():
    """Gnomonic property: points on a great circle through the center
    project to a straight line (Snyder ch. 22)."""
    from visionworkbench_tpu.cartography import (
        GnomonicProjection, well_known_datum,
    )
    proj = GnomonicProjection(well_known_datum("WGS84"), 0.0, 0.0)
    # equator = great circle through (0, 0)
    lons = jnp.asarray([-30.0, -10.0, 15.0, 40.0])
    x, y = proj.forward(lons, jnp.zeros(4))
    assert np.abs(np.asarray(y)).max() < 1.0  # meters
