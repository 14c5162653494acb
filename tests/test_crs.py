"""CRS ingestion tests: proj4 / EPSG / WKT round trips onto the in-tree
projection families and GeoTIFF geo-key round trips for every family
(ref ``GeoReference::set_proj4_projection_str`` / ``set_wkt``,
``src/vw/Cartography/GeoReference.h:251-254``, ``GeoReferenceResourceGDAL.cc``)."""

import os
import tempfile

import numpy as np
import pytest

from visionworkbench_tpu.cartography import crs
from visionworkbench_tpu.cartography.datum import Datum, well_known_datum
from visionworkbench_tpu.cartography.georeference import (
    GeoReference, georeference_from_tiff_info)
from visionworkbench_tpu.cartography.projection import (
    EquirectangularProjection, GnomonicProjection, LambertAzimuthalProjection,
    LambertConformalProjection, MercatorProjection, OrthographicProjection,
    Projection, SinusoidalProjection, StereographicProjection,
    TransverseMercatorProjection, UTMProjection,
)
from visionworkbench_tpu.core.exceptions import UnsupportedCRSErr
from visionworkbench_tpu.fileio.tiff import read_tiff, write_tiff


PROJ4_STRINGS = [
    ("+proj=longlat +datum=WGS84 +no_defs", Projection),
    ("+proj=utm +zone=12 +datum=WGS84 +units=m +no_defs", UTMProjection),
    ("+proj=utm +zone=33 +south +datum=WGS84 +units=m", UTMProjection),
    ("+proj=tmerc +lon_0=9 +lat_0=0 +k=1 +x_0=3500000 +y_0=0 +ellps=GRS80",
     TransverseMercatorProjection),
    ("+proj=merc +lon_0=10 +k=0.9 +x_0=1000 +y_0=2000 +a=3396190 +b=3376200",
     MercatorProjection),
    ("+proj=merc +lat_ts=30 +lon_0=0 +datum=WGS84", MercatorProjection),
    ("+proj=stere +lat_0=90 +lon_0=-45 +k=0.994 +x_0=2e6 +y_0=2e6 "
     "+datum=WGS84", StereographicProjection),
    ("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +datum=WGS84",
     StereographicProjection),
    ("+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +a=3396190 +b=3376200",
     SinusoidalProjection),
    ("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=40 +lon_0=-97 +datum=NAD83",
     LambertConformalProjection),
    ("+proj=eqc +lat_ts=30 +lat_0=0 +lon_0=0 +datum=WGS84",
     EquirectangularProjection),
    ("+proj=ortho +lat_0=52 +lon_0=10 +datum=WGS84", OrthographicProjection),
    ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80",
     LambertAzimuthalProjection),
    ("+proj=gnom +lat_0=40 +lon_0=-100 +datum=WGS84", GnomonicProjection),
    ("+proj=longlat +a=1737400 +b=1737400 +no_defs", Projection),  # Moon
]


@pytest.mark.parametrize("s,cls", PROJ4_STRINGS,
                         ids=[s.split()[0][6:] + str(i)
                              for i, (s, _) in enumerate(PROJ4_STRINGS)])
def test_proj4_round_trip(s, cls):
    d, p = crs.parse_proj4(s)
    assert type(p) is cls
    out = crs.to_proj4(d, p)
    d2, p2 = crs.parse_proj4(out)
    assert type(p2) is cls
    assert abs(d2.a - d.a) < 1e-6 and abs(d2.b - d.b) < 1e-6
    for attr in ("lon0", "lat0", "k0", "x0", "y0", "sp1", "sp2", "zone",
                 "north", "lat_ts"):
        if hasattr(p, attr):
            assert np.isclose(float(getattr(p, attr)),
                              float(getattr(p2, attr))), (s, attr)


@pytest.mark.parametrize("s,cls", PROJ4_STRINGS,
                         ids=[s.split()[0][6:] + str(i)
                              for i, (s, _) in enumerate(PROJ4_STRINGS)])
def test_wkt_round_trip(s, cls):
    d, p = crs.parse_proj4(s)
    wkt = crs.to_wkt(d, p)
    d2, p2 = crs.parse_wkt(wkt)
    if cls is UTMProjection:
        assert isinstance(p2, (UTMProjection, TransverseMercatorProjection))
    else:
        assert type(p2) is cls
    assert abs(d2.a - d.a) < 1e-3 and abs(d2.b - d.b) < 1e-3
    for attr in ("lon0", "lat0", "k0", "x0", "y0", "sp1", "sp2", "lat_ts"):
        if hasattr(p, attr) and hasattr(p2, attr):
            assert np.isclose(float(getattr(p, attr)),
                              float(getattr(p2, attr)), atol=1e-9), (s, attr)


def test_epsg_round_trip():
    for code in (4326, 4322, 4269, 4267, 32612, 32601, 32660, 32733,
                 26913, 26712, 3395, 3857):
        d, p = crs.from_epsg(code)
        assert crs.epsg_for(d, p) == code
    # projected <-> proj4
    d, p = crs.from_epsg(32612)
    assert "+proj=utm" in crs.to_proj4(d, p) and "+zone=12" in crs.to_proj4(d, p)


def test_epsg_web_mercator_is_spherical():
    d, p = crs.from_epsg(3857)
    assert d.a == d.b == 6378137.0
    # x at lon=180 is a*pi
    x, _ = np.asarray(p.forward(180.0, 0.0)), None
    assert np.isclose(float(x[0] if hasattr(x, '__len__') else x),
                      6378137.0 * np.pi, rtol=1e-6)


def test_unsupported_crs_typed_errors():
    with pytest.raises(UnsupportedCRSErr):
        crs.parse_proj4("+proj=robin +datum=WGS84")
    with pytest.raises(UnsupportedCRSErr):
        crs.parse_proj4("+proj=utm +zone=12 +datum=WGS84 +units=us-ft")
    with pytest.raises(UnsupportedCRSErr):
        crs.parse_proj4("+proj=tmerc +datum=FOO84")
    with pytest.raises(UnsupportedCRSErr):
        crs.from_epsg(2154)          # Lambert-93: outside the in-tree set
    with pytest.raises(UnsupportedCRSErr):
        crs.parse_wkt('PROJCS["x",GEOGCS["y",DATUM["z",SPHEROID["s",'
                      '6378137,298.25]],PRIMEM["Greenwich",0],'
                      'UNIT["degree",0.017]],PROJECTION["Robinson"],'
                      'UNIT["metre",1]]')


def test_parse_gdal_utm_wkt():
    wkt = ('PROJCS["WGS 84 / UTM zone 12N",GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563,'
           'AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
           'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
           'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
           'AUTHORITY["EPSG","4326"]],PROJECTION["Transverse_Mercator"],'
           'PARAMETER["latitude_of_origin",0],'
           'PARAMETER["central_meridian",-111],'
           'PARAMETER["scale_factor",0.9996],'
           'PARAMETER["false_easting",500000],'
           'PARAMETER["false_northing",0],'
           'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
           'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
           'AUTHORITY["EPSG","32612"]]')
    d, p = crs.parse_wkt(wkt)
    assert isinstance(p, UTMProjection) and p.zone == 12 and p.north
    assert crs.epsg_for(d, p) == 32612


def test_parse_polar_stereographic_wkt():
    # NSIDC-style south polar stereographic (the GDAL spelling).
    wkt = ('PROJCS["South Polar",GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Polar_Stereographic"],'
           'PARAMETER["latitude_of_origin",-71],'
           'PARAMETER["central_meridian",0],'
           'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
           'UNIT["metre",1]]')
    d, p = crs.parse_wkt(wkt)
    assert isinstance(p, StereographicProjection)
    assert p.lat0 == -90.0
    assert np.isclose(p.k0, (1 + np.sin(np.radians(71))) / 2)


def test_georeference_proj4_wkt_api():
    g = GeoReference.from_proj4("+proj=utm +zone=12 +datum=WGS84")
    assert isinstance(g.projection, UTMProjection)
    assert "+proj=utm +zone=12" in g.proj4_str()
    g2 = GeoReference.from_wkt(g.wkt_str())
    assert isinstance(g2.projection, UTMProjection) and g2.projection.zone == 12
    g3 = GeoReference()
    g3.set_epsg(3395)
    assert isinstance(g3.projection, MercatorProjection)
    g3.set_proj4_projection_str("+proj=sinu +lon_0=10 +a=3396190 +b=3376200")
    assert isinstance(g3.projection, SinusoidalProjection)


GEOTIFF_PROJ4 = [s for s, _ in PROJ4_STRINGS]


@pytest.mark.parametrize("s", GEOTIFF_PROJ4,
                         ids=[s.split()[0][6:] + str(i)
                              for i, s in enumerate(GEOTIFF_PROJ4)])
def test_geotiff_georef_round_trip(s, tmp_path):
    """Every projection family survives a GeoTIFF write/read round trip
    through the geo-key vocabulary (user-defined datums included)."""
    d, p = crs.parse_proj4(s)
    transform = np.array([[30.0, 0, 400000.0], [0, -30.0, 5000000.0],
                          [0, 0, 1]])
    g = GeoReference(d, p, transform)
    path = str(tmp_path / "t.tif")
    write_tiff(path, np.zeros((8, 8), np.float32), georef=g)
    _, info = read_tiff(path)
    g2 = georeference_from_tiff_info(info, strict=True)
    assert g2 is not None
    if isinstance(p, UTMProjection):
        assert isinstance(g2.projection,
                          (UTMProjection, TransverseMercatorProjection))
    else:
        assert type(g2.projection) is type(p)
    assert abs(g2.datum.a - d.a) < 1e-3 and abs(g2.datum.b - d.b) < 1e-3
    np.testing.assert_allclose(g2.transform, transform)
    for attr in ("lon0", "lat0", "k0", "x0", "y0", "sp1", "sp2", "lat_ts"):
        if hasattr(p, attr) and hasattr(g2.projection, attr):
            assert np.isclose(float(getattr(p, attr)),
                              float(getattr(g2.projection, attr))), (s, attr)
    # forward agreement at a probe point
    lon, lat = 12.0, 47.0
    x1, y1 = p.forward(lon, lat)
    x2, y2 = g2.projection.forward(lon, lat)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5)


def test_geotiff_strict_rejects_unknown(tmp_path):
    """A foreign GeoTIFF whose CRS is outside the vocabulary raises the
    typed error in strict mode and falls back gracefully otherwise."""
    class FakeInfo:
        def geo_transform(self):
            return np.eye(3)

        def geo_keys(self):
            # Lambert-93 (EPSG:2154) by code only, no CT fallback keys.
            return ([(1024, 0, 1, 1), (1025, 0, 1, 1), (3072, 0, 1, 2154)],
                    [], "")

    with pytest.raises(UnsupportedCRSErr):
        georeference_from_tiff_info(FakeInfo(), strict=True)
    g = georeference_from_tiff_info(FakeInfo(), strict=False)
    assert g is not None and type(g.projection) is Projection


def test_reference_dem_fixture_reads():
    """The reference test suite's externally-produced DEM GeoTIFF
    (GDAL-written) must decode its georeference."""
    path = "/root/reference/src/vw/Cartography/tests/tinyDemAN.tif"
    if not os.path.exists(path):
        pytest.skip("reference fixture unavailable")
    arr, info = read_tiff(path)
    g = georeference_from_tiff_info(info)
    assert g is not None
    assert g.transform[0, 0] != 0
