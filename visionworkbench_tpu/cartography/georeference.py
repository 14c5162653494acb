"""GeoReference: datum + projection + pixel<->projected affine
(ref ``src/vw/Cartography/GeoReference.h:46-158`` / ``GeoReference.cc``),
with GeoTIFF key IO (ref ``GeoReferenceResourceGDAL.cc``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.math.bbox import BBox2, BBox2i
from visionworkbench_tpu.cartography.datum import Datum, well_known_datum
from visionworkbench_tpu.cartography.projection import (
    MercatorProjection, Projection, SinusoidalProjection, StereographicProjection,
    TransverseMercatorProjection, UTMProjection,
)

PIXEL_AS_AREA = "PixelAsArea"    # pixel (0,0) covers [0,1)x[0,1); center at (0.5, 0.5)
PIXEL_AS_POINT = "PixelAsPoint"  # pixel (0,0) is the point at the transform origin


class GeoReference:
    def __init__(self, datum: Optional[Datum] = None,
                 projection: Optional[Projection] = None,
                 transform=np.eye(3),
                 pixel_interpretation: str = PIXEL_AS_AREA):
        self.datum = datum or well_known_datum("WGS84")
        self.projection = projection or Projection(self.datum)
        self.transform = np.asarray(transform, np.float64)
        self._inv_transform = np.linalg.inv(self.transform)
        self.pixel_interpretation = pixel_interpretation

    # --- constructors -------------------------------------------------------
    def set_transform(self, transform) -> None:
        self.transform = np.asarray(transform, np.float64)
        self._inv_transform = np.linalg.inv(self.transform)

    def set_well_known_geogcs(self, name: str) -> None:
        self.datum = well_known_datum(name)
        self.projection.datum = self.datum

    # --- pixel <-> projected ------------------------------------------------
    def _pixel_offset(self) -> float:
        return 0.5 if self.pixel_interpretation == PIXEL_AS_AREA else 0.0

    def pixel_to_point(self, px, py):
        """Pixel -> projected coordinates (ref ``pixel_to_point``)."""
        t = self.transform
        off = self._pixel_offset()
        px = jnp.asarray(px, jnp.float32) + off
        py = jnp.asarray(py, jnp.float32) + off
        x = t[0, 0] * px + t[0, 1] * py + t[0, 2]
        y = t[1, 0] * px + t[1, 1] * py + t[1, 2]
        return x, y

    def point_to_pixel(self, x, y):
        it = self._inv_transform
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        off = self._pixel_offset()
        px = it[0, 0] * x + it[0, 1] * y + it[0, 2] - off
        py = it[1, 0] * x + it[1, 1] * y + it[1, 2] - off
        return px, py

    # --- pixel <-> lonlat ---------------------------------------------------
    def pixel_to_lonlat(self, px, py):
        x, y = self.pixel_to_point(px, py)
        return self.projection.reverse(x, y)

    def lonlat_to_pixel(self, lon, lat):
        x, y = self.projection.forward(lon, lat)
        return self.point_to_pixel(x, y)

    def point_to_lonlat(self, x, y):
        return self.projection.reverse(x, y)

    def lonlat_to_point(self, lon, lat):
        return self.projection.forward(lon, lat)

    # --- bounding boxes -----------------------------------------------------
    def pixel_to_lonlat_bbox(self, bbox: BBox2i, samples: int = 32) -> BBox2:
        """Lon/lat box of a pixel box, sampled along the boundary
        (ref ``pixel_to_lonlat_bbox``, GeoReference.cc)."""
        xs = np.linspace(bbox.min_x, bbox.max_x, samples)
        ys = np.linspace(bbox.min_y, bbox.max_y, samples)
        border_x = np.concatenate([xs, xs, np.full(samples, bbox.min_x),
                                   np.full(samples, bbox.max_x)])
        border_y = np.concatenate([np.full(samples, bbox.min_y),
                                   np.full(samples, bbox.max_y), ys, ys])
        lon, lat = self.pixel_to_lonlat(border_x, border_y)
        lon, lat = np.asarray(lon), np.asarray(lat)
        ok = np.isfinite(lon) & np.isfinite(lat)
        return BBox2.from_bounds(lon[ok].min(), lat[ok].min(),
                                 lon[ok].max(), lat[ok].max())

    def lonlat_to_pixel_bbox(self, box: BBox2, samples: int = 32) -> BBox2:
        lons = np.linspace(box.min_x, box.max_x, samples)
        lats = np.linspace(box.min_y, box.max_y, samples)
        border_lon = np.concatenate([lons, lons, np.full(samples, box.min_x),
                                     np.full(samples, box.max_x)])
        border_lat = np.concatenate([np.full(samples, box.min_y),
                                     np.full(samples, box.max_y), lats, lats])
        px, py = self.lonlat_to_pixel(border_lon, border_lat)
        px, py = np.asarray(px), np.asarray(py)
        ok = np.isfinite(px) & np.isfinite(py)
        return BBox2.from_bounds(px[ok].min(), py[ok].min(),
                                 px[ok].max(), py[ok].max())

    # --- GeoTIFF keys -------------------------------------------------------
    def geo_keys(self):
        """(keys, doubles, ascii) for the GeoTIFF writer
        (GeoKeyDirectory layout)."""
        keys = []
        doubles = []
        is_geographic = type(self.projection) in (Projection,)
        # GTModelTypeGeoKey: 1=projected, 2=geographic
        keys.append((1024, 0, 1, 2 if is_geographic else 1))
        # GTRasterTypeGeoKey: 1=PixelIsArea, 2=PixelIsPoint
        keys.append((1025, 0, 1,
                     1 if self.pixel_interpretation == PIXEL_AS_AREA else 2))
        epsg = self._epsg_code()
        if is_geographic:
            keys.append((2048, 0, 1, epsg or 4326))
        else:
            keys.append((3072, 0, 1, epsg or 32767))
        ascii_params = f"{self.datum.spheroid_name}|{self.datum.name}|"
        return keys, doubles, ascii_params

    def _epsg_code(self) -> Optional[int]:
        p = self.projection
        if isinstance(p, UTMProjection) and abs(self.datum.a - 6378137.0) < 1:
            return (32600 if p.north else 32700) + p.zone
        if type(p) is Projection and abs(self.datum.a - 6378137.0) < 1:
            return 4326
        if isinstance(p, MercatorProjection) and abs(self.datum.a - 6378137.0) < 1:
            return 3395
        return None

    def proj4_str(self) -> str:
        """Informal proj4-style description (ref ``proj4_str``)."""
        p = self.projection
        parts = [f"+proj={p.proj4_name}"]
        for k, v in p.params().items():
            parts.append(f"+{k.replace(' ', '_')}={v}")
        parts.append(f"+a={self.datum.a} +b={self.datum.b}")
        return " ".join(parts)

    def __repr__(self):
        return (f"GeoReference({self.projection.name}, {self.datum.name}, "
                f"transform={self.transform.tolist()})")


def georeference_from_tiff_info(info) -> Optional[GeoReference]:
    """Decode a GeoReference from TIFF geo tags
    (ref ``read_georeference``, GeoReferenceResourceGDAL.cc)."""
    t = info.geo_transform()
    if t is None:
        return None
    keys, doubles, ascii_params = info.geo_keys()
    kd = {k: v for (k, loc, cnt, v) in keys}
    datum = well_known_datum("WGS84")
    model_type = kd.get(1024, 2)
    raster_type = kd.get(1025, 1)
    interp = PIXEL_AS_AREA if raster_type == 1 else PIXEL_AS_POINT
    proj: Projection
    if model_type == 2:
        proj = Projection(datum)
    else:
        code = kd.get(3072, 0)
        if 32601 <= code <= 32660:
            proj = UTMProjection(datum, code - 32600, True)
        elif 32701 <= code <= 32760:
            proj = UTMProjection(datum, code - 32700, False)
        elif code == 3395:
            proj = MercatorProjection(datum)
        else:
            proj = Projection(datum)  # unknown: leave as identity
    # The codec's transform maps pixel corners; GeoReference applies the
    # half-pixel shift itself for area pixels, so strip it from the offset.
    g = GeoReference(datum, proj, t, interp)
    return g


def georeference_from_pds_label(label) -> Optional[GeoReference]:
    """Decode a GeoReference from a PDS3 label dict (as returned by
    ``fileio.read_pds``), ref ``GeoReferenceResourcePDS.cc:32-77``: only
    SIMPLE CYLINDRICAL is supported — westernmost longitude / maximum
    latitude as the offset, 1/MAP_RESOLUTION degrees per pixel, radii in km.
    Returns None when required keys are missing or the projection is
    unsupported."""
    def q(key):
        v = label.get(key)
        if v is None:
            return None
        return v.strip().strip('"').strip("'")

    try:
        a_km, b_km = q("A_AXIS_RADIUS"), q("B_AXIS_RADIUS")
        res = q("MAP_RESOLUTION")
        west, north = q("WESTERNMOST_LONGITUDE"), q("MAXIMUM_LATITUDE")
        if None in (a_km, b_km, res, west, north):
            return None
        proj_type = q("MAP_PROJECTION_TYPE")
        if proj_type is not None and proj_type.upper() != "SIMPLE CYLINDRICAL":
            return None
        datum = Datum("PDS Datum", "PDS Spheroid",
                      semi_major_axis=float(a_km) * 1000.0,
                      semi_minor_axis=float(b_km) * 1000.0)
        deg_per_pixel = 1.0 / float(res)
        t = np.array([[deg_per_pixel, 0, float(west)],
                      [0, -deg_per_pixel, float(north)],
                      [0, 0, 1]], np.float64)
        return GeoReference(datum, Projection(datum), t)
    except (ValueError, TypeError):
        return None


def make_geographic_georef(west: float, north: float, deg_per_pixel: float,
                           datum_name: str = "WGS84") -> GeoReference:
    """Convenience: north-up geographic georef with square degrees-per-pixel."""
    datum = well_known_datum(datum_name)
    t = np.array([[deg_per_pixel, 0, west],
                  [0, -deg_per_pixel, north],
                  [0, 0, 1]], np.float64)
    return GeoReference(datum, Projection(datum), t)
