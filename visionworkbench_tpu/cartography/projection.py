"""Map projections (the role of PROJ in the reference's ``GeoReference``,
``src/vw/Cartography/GeoReference.cc`` — this image has no PROJ, so the
framework carries jnp-traceable implementations of the projections the
reference's tools exercise; Snyder, "Map Projections: A Working Manual").

All projections map (lon deg, lat deg) <-> (x m, y m), vectorized and
jittable, so whole-image reprojection warps run fused on device. Ellipsoidal
series are used where Snyder's standard treatment requires them (UTM,
Lambert Conformal); spherical forms elsewhere match the reference's PROJ
setup for those modes.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.cartography.datum import Datum

_D2R = math.pi / 180.0


class Projection:
    """Base: identity 'geographic' projection in degrees
    (ref ``GeoReference::set_geographic``)."""
    name = "geographic"
    proj4_name = "longlat"

    def __init__(self, datum: Datum):
        self.datum = datum

    def forward(self, lon, lat):
        return jnp.asarray(lon, jnp.float32), jnp.asarray(lat, jnp.float32)

    def reverse(self, x, y):
        return jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)

    def params(self) -> dict:
        return {}


class SinusoidalProjection(Projection):
    """(ref ``set_sinusoidal``)"""
    name = "sinusoidal"
    proj4_name = "sinu"

    def __init__(self, datum: Datum, center_longitude=0.0,
                 false_easting=0.0, false_northing=0.0):
        super().__init__(datum)
        self.lon0 = float(center_longitude)
        self.x0 = float(false_easting)
        self.y0 = float(false_northing)

    def forward(self, lon, lat):
        r = self.datum.a
        lon = jnp.asarray(lon, jnp.float32)
        lat = jnp.asarray(lat, jnp.float32)
        x = r * _D2R * (lon - self.lon0) * jnp.cos(jnp.deg2rad(lat)) + self.x0
        y = r * _D2R * lat + self.y0
        return x, y

    def reverse(self, x, y):
        r = self.datum.a
        lat = (jnp.asarray(y, jnp.float32) - self.y0) / (r * _D2R)
        cos_lat = jnp.cos(jnp.deg2rad(lat))
        lon = (jnp.asarray(x, jnp.float32) - self.x0) / (r * _D2R *
                                                         jnp.maximum(cos_lat, 1e-12)) \
            + self.lon0
        return lon, lat

    def params(self):
        return {"center_longitude": self.lon0, "false_easting": self.x0,
                "false_northing": self.y0}


class MercatorProjection(Projection):
    """Spherical Mercator (ref ``set_mercator``)."""
    name = "mercator"
    proj4_name = "merc"

    def __init__(self, datum: Datum, center_longitude=0.0, center_latitude=0.0,
                 scale=1.0, false_easting=0.0, false_northing=0.0):
        super().__init__(datum)
        self.lon0 = float(center_longitude)
        self.k0 = float(scale)
        self.x0 = float(false_easting)
        self.y0 = float(false_northing)

    def forward(self, lon, lat):
        r = self.datum.a * self.k0
        lon = jnp.asarray(lon, jnp.float32)
        lat = jnp.clip(jnp.asarray(lat, jnp.float32), -89.9, 89.9)
        x = r * _D2R * (lon - self.lon0) + self.x0
        y = r * jnp.log(jnp.tan(jnp.pi / 4 + jnp.deg2rad(lat) / 2)) + self.y0
        return x, y

    def reverse(self, x, y):
        r = self.datum.a * self.k0
        lon = (jnp.asarray(x, jnp.float32) - self.x0) / (r * _D2R) + self.lon0
        lat = jnp.rad2deg(2 * jnp.arctan(jnp.exp((jnp.asarray(y, jnp.float32)
                                                  - self.y0) / r)) - jnp.pi / 2)
        return lon, lat

    def params(self):
        return {"center_longitude": self.lon0, "scale": self.k0,
                "false_easting": self.x0, "false_northing": self.y0}


class TransverseMercatorProjection(Projection):
    """Ellipsoidal transverse Mercator, Snyder eq. 8-9..8-17 — the basis of
    UTM (ref ``set_UTM`` / ``set_transverse_mercator``)."""
    name = "transverse mercator"
    proj4_name = "tmerc"

    def __init__(self, datum: Datum, center_longitude=0.0, center_latitude=0.0,
                 scale=0.9996, false_easting=500000.0, false_northing=0.0):
        super().__init__(datum)
        self.lon0 = float(center_longitude)
        self.lat0 = float(center_latitude)
        self.k0 = float(scale)
        self.x0 = float(false_easting)
        self.y0 = float(false_northing)

    def _m(self, lat_rad):
        e2 = self.datum.e2
        e4, e6 = e2 * e2, e2 * e2 * e2
        return self.datum.a * (
            (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat_rad
            - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * jnp.sin(2 * lat_rad)
            + (15 * e4 / 256 + 45 * e6 / 1024) * jnp.sin(4 * lat_rad)
            - (35 * e6 / 3072) * jnp.sin(6 * lat_rad))

    def forward(self, lon, lat):
        a, e2, k0 = self.datum.a, self.datum.e2, self.k0
        ep2 = e2 / (1 - e2)
        phi = jnp.deg2rad(jnp.asarray(lat, jnp.float32))
        lam = jnp.deg2rad(jnp.asarray(lon, jnp.float32) - self.lon0)
        sp, cp = jnp.sin(phi), jnp.cos(phi)
        n = a / jnp.sqrt(1 - e2 * sp * sp)
        t = jnp.tan(phi) ** 2
        c = ep2 * cp * cp
        aa = lam * cp
        m = self._m(phi)
        m0 = self._m(jnp.deg2rad(jnp.float32(self.lat0)))
        x = k0 * n * (aa + (1 - t + c) * aa ** 3 / 6 +
                      (5 - 18 * t + t * t + 72 * c - 58 * ep2) * aa ** 5 / 120) \
            + self.x0
        y = k0 * (m - m0 + n * jnp.tan(phi) * (
            aa ** 2 / 2 + (5 - t + 9 * c + 4 * c * c) * aa ** 4 / 24 +
            (61 - 58 * t + t * t + 600 * c - 330 * ep2) * aa ** 6 / 720)) \
            + self.y0
        return x, y

    def reverse(self, x, y):
        a, e2, k0 = self.datum.a, self.datum.e2, self.k0
        ep2 = e2 / (1 - e2)
        e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
        m0 = self._m(jnp.deg2rad(jnp.float32(self.lat0)))
        m = m0 + (jnp.asarray(y, jnp.float32) - self.y0) / k0
        mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 ** 3 / 256))
        phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * jnp.sin(2 * mu)
                + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * jnp.sin(4 * mu)
                + (151 * e1 ** 3 / 96) * jnp.sin(6 * mu)
                + (1097 * e1 ** 4 / 512) * jnp.sin(8 * mu))
        sp, cp = jnp.sin(phi1), jnp.cos(phi1)
        c1 = ep2 * cp * cp
        t1 = jnp.tan(phi1) ** 2
        n1 = a / jnp.sqrt(1 - e2 * sp * sp)
        r1 = a * (1 - e2) / (1 - e2 * sp * sp) ** 1.5
        d = (jnp.asarray(x, jnp.float32) - self.x0) / (n1 * k0)
        lat = jnp.rad2deg(phi1 - (n1 * jnp.tan(phi1) / r1) * (
            d * d / 2 - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d ** 4 / 24
            + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2
               - 3 * c1 * c1) * d ** 6 / 720))
        lon = self.lon0 + jnp.rad2deg(
            (d - (1 + 2 * t1 + c1) * d ** 3 / 6 +
             (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1)
             * d ** 5 / 120) / cp)
        return lon, lat

    def params(self):
        return {"center_longitude": self.lon0, "center_latitude": self.lat0,
                "scale": self.k0, "false_easting": self.x0,
                "false_northing": self.y0}


class UTMProjection(TransverseMercatorProjection):
    """(ref ``GeoReference::set_UTM``: zone/hemisphere -> tmerc params)"""
    name = "utm"
    proj4_name = "utm"

    def __init__(self, datum: Datum, zone: int, north: bool = True):
        if not 1 <= zone <= 60:
            raise ArgumentErr(f"UTM zone must be 1..60, got {zone}")
        lon0 = -183.0 + 6.0 * zone
        super().__init__(datum, lon0, 0.0, 0.9996, 500000.0,
                         0.0 if north else 10000000.0)
        self.zone = zone
        self.north = north

    def params(self):
        return {"zone": self.zone, "north": self.north}


class StereographicProjection(Projection):
    """Spherical (oblique/polar) stereographic (ref ``set_stereographic``)."""
    name = "stereographic"
    proj4_name = "stere"

    def __init__(self, datum: Datum, center_latitude=90.0, center_longitude=0.0,
                 scale=1.0, false_easting=0.0, false_northing=0.0):
        super().__init__(datum)
        self.lat0 = float(center_latitude)
        self.lon0 = float(center_longitude)
        self.k0 = float(scale)
        self.x0 = float(false_easting)
        self.y0 = float(false_northing)

    def forward(self, lon, lat):
        r = self.datum.a * self.k0
        phi = jnp.deg2rad(jnp.asarray(lat, jnp.float32))
        lam = jnp.deg2rad(jnp.asarray(lon, jnp.float32) - self.lon0)
        phi0 = math.radians(self.lat0)
        den = 1 + math.sin(phi0) * jnp.sin(phi) + \
            math.cos(phi0) * jnp.cos(phi) * jnp.cos(lam)
        k = 2 * r / jnp.maximum(den, 1e-12)
        x = k * jnp.cos(phi) * jnp.sin(lam) + self.x0
        y = k * (math.cos(phi0) * jnp.sin(phi) -
                 math.sin(phi0) * jnp.cos(phi) * jnp.cos(lam)) + self.y0
        return x, y

    def reverse(self, x, y):
        r = self.datum.a * self.k0
        xx = (jnp.asarray(x, jnp.float32) - self.x0)
        yy = (jnp.asarray(y, jnp.float32) - self.y0)
        rho = jnp.sqrt(xx * xx + yy * yy)
        c = 2 * jnp.arctan2(rho, 2 * r)
        phi0 = math.radians(self.lat0)
        sc, cc = jnp.sin(c), jnp.cos(c)
        safe_rho = jnp.maximum(rho, 1e-12)
        lat = jnp.rad2deg(jnp.arcsin(jnp.clip(
            cc * math.sin(phi0) + yy * sc * math.cos(phi0) / safe_rho, -1, 1)))
        lon = self.lon0 + jnp.rad2deg(jnp.arctan2(
            xx * sc, safe_rho * math.cos(phi0) * cc - yy * math.sin(phi0) * sc))
        lat = jnp.where(rho < 1e-9, self.lat0, lat)
        lon = jnp.where(rho < 1e-9, self.lon0, lon)
        return lon, lat

    def params(self):
        return {"center_latitude": self.lat0, "center_longitude": self.lon0,
                "scale": self.k0, "false_easting": self.x0,
                "false_northing": self.y0}


class OrthographicProjection(Projection):
    """Spherical orthographic (ref ``set_orthographic``)."""
    name = "orthographic"
    proj4_name = "ortho"

    def __init__(self, datum: Datum, center_latitude=0.0, center_longitude=0.0,
                 false_easting=0.0, false_northing=0.0):
        super().__init__(datum)
        self.lat0 = float(center_latitude)
        self.lon0 = float(center_longitude)
        self.x0 = float(false_easting)
        self.y0 = float(false_northing)

    def forward(self, lon, lat):
        r = self.datum.a
        phi = jnp.deg2rad(jnp.asarray(lat, jnp.float32))
        lam = jnp.deg2rad(jnp.asarray(lon, jnp.float32) - self.lon0)
        phi0 = math.radians(self.lat0)
        x = r * jnp.cos(phi) * jnp.sin(lam) + self.x0
        y = r * (math.cos(phi0) * jnp.sin(phi) -
                 math.sin(phi0) * jnp.cos(phi) * jnp.cos(lam)) + self.y0
        return x, y

    def reverse(self, x, y):
        r = self.datum.a
        xx = (jnp.asarray(x, jnp.float32) - self.x0) / r
        yy = (jnp.asarray(y, jnp.float32) - self.y0) / r
        rho = jnp.sqrt(xx * xx + yy * yy)
        c = jnp.arcsin(jnp.clip(rho, 0, 1))
        phi0 = math.radians(self.lat0)
        sc, cc = jnp.sin(c), jnp.cos(c)
        safe_rho = jnp.maximum(rho, 1e-12)
        lat = jnp.rad2deg(jnp.arcsin(jnp.clip(
            cc * math.sin(phi0) + yy * sc * math.cos(phi0) / safe_rho, -1, 1)))
        lon = self.lon0 + jnp.rad2deg(jnp.arctan2(
            xx * sc, safe_rho * math.cos(phi0) * cc - yy * math.sin(phi0) * sc))
        lat = jnp.where(rho < 1e-9, self.lat0, lat)
        lon = jnp.where(rho < 1e-9, self.lon0, lon)
        return lon, lat

    def params(self):
        return {"center_latitude": self.lat0, "center_longitude": self.lon0,
                "false_easting": self.x0, "false_northing": self.y0}


class LambertAzimuthalProjection(Projection):
    """Spherical Lambert azimuthal equal-area (ref ``set_lambert_azimuthal``)."""
    name = "lambert azimuthal"
    proj4_name = "laea"

    def __init__(self, datum: Datum, center_latitude=0.0, center_longitude=0.0,
                 false_easting=0.0, false_northing=0.0):
        super().__init__(datum)
        self.lat0 = float(center_latitude)
        self.lon0 = float(center_longitude)
        self.x0 = float(false_easting)
        self.y0 = float(false_northing)

    def forward(self, lon, lat):
        r = self.datum.a
        phi = jnp.deg2rad(jnp.asarray(lat, jnp.float32))
        lam = jnp.deg2rad(jnp.asarray(lon, jnp.float32) - self.lon0)
        phi0 = math.radians(self.lat0)
        den = 1 + math.sin(phi0) * jnp.sin(phi) + \
            math.cos(phi0) * jnp.cos(phi) * jnp.cos(lam)
        kp = jnp.sqrt(2.0 / jnp.maximum(den, 1e-12))
        x = r * kp * jnp.cos(phi) * jnp.sin(lam) + self.x0
        y = r * kp * (math.cos(phi0) * jnp.sin(phi) -
                      math.sin(phi0) * jnp.cos(phi) * jnp.cos(lam)) + self.y0
        return x, y

    def reverse(self, x, y):
        r = self.datum.a
        xx = (jnp.asarray(x, jnp.float32) - self.x0) / r
        yy = (jnp.asarray(y, jnp.float32) - self.y0) / r
        rho = jnp.sqrt(xx * xx + yy * yy)
        c = 2 * jnp.arcsin(jnp.clip(rho / 2, -1, 1))
        phi0 = math.radians(self.lat0)
        sc, cc = jnp.sin(c), jnp.cos(c)
        safe_rho = jnp.maximum(rho, 1e-12)
        lat = jnp.rad2deg(jnp.arcsin(jnp.clip(
            cc * math.sin(phi0) + yy * sc * math.cos(phi0) / safe_rho, -1, 1)))
        lon = self.lon0 + jnp.rad2deg(jnp.arctan2(
            xx * sc, safe_rho * math.cos(phi0) * cc - yy * math.sin(phi0) * sc))
        lat = jnp.where(rho < 1e-9, self.lat0, lat)
        lon = jnp.where(rho < 1e-9, self.lon0, lon)
        return lon, lat

    def params(self):
        return {"center_latitude": self.lat0, "center_longitude": self.lon0,
                "false_easting": self.x0, "false_northing": self.y0}


class LambertConformalProjection(Projection):
    """Spherical Lambert conformal conic, 2 standard parallels
    (ref ``set_lambert_conformal``)."""
    name = "lambert conformal conic"
    proj4_name = "lcc"

    def __init__(self, datum: Datum, std_parallel_1=33.0, std_parallel_2=45.0,
                 center_latitude=0.0, center_longitude=0.0,
                 false_easting=0.0, false_northing=0.0):
        super().__init__(datum)
        self.sp1, self.sp2 = float(std_parallel_1), float(std_parallel_2)
        self.lat0, self.lon0 = float(center_latitude), float(center_longitude)
        self.x0, self.y0 = float(false_easting), float(false_northing)
        p1, p2 = math.radians(self.sp1), math.radians(self.sp2)
        if abs(p1 - p2) < 1e-12:
            self.n = math.sin(p1)
        else:
            self.n = (math.log(math.cos(p1) / math.cos(p2)) /
                      math.log(math.tan(math.pi / 4 + p2 / 2) /
                               math.tan(math.pi / 4 + p1 / 2)))
        self.f = (math.cos(p1) * math.tan(math.pi / 4 + p1 / 2) ** self.n) / self.n
        self.rho0 = (self.datum.a * self.f /
                     math.tan(math.pi / 4 + math.radians(self.lat0) / 2) ** self.n)

    def forward(self, lon, lat):
        a = self.datum.a
        phi = jnp.deg2rad(jnp.clip(jnp.asarray(lat, jnp.float32), -89.9, 89.9))
        lam = jnp.deg2rad(jnp.asarray(lon, jnp.float32) - self.lon0)
        rho = a * self.f / jnp.tan(jnp.pi / 4 + phi / 2) ** self.n
        theta = self.n * lam
        x = rho * jnp.sin(theta) + self.x0
        y = self.rho0 - rho * jnp.cos(theta) + self.y0
        return x, y

    def reverse(self, x, y):
        a = self.datum.a
        xx = jnp.asarray(x, jnp.float32) - self.x0
        yy = self.rho0 - (jnp.asarray(y, jnp.float32) - self.y0)
        sign = 1.0 if self.n >= 0 else -1.0
        rho = sign * jnp.sqrt(xx * xx + yy * yy)
        theta = jnp.arctan2(sign * xx, sign * yy)
        lat = jnp.rad2deg(2 * jnp.arctan((a * self.f / rho) ** (1.0 / self.n))
                          - jnp.pi / 2)
        lon = self.lon0 + jnp.rad2deg(theta / self.n)
        return lon, lat

    def params(self):
        return {"std_parallel_1": self.sp1, "std_parallel_2": self.sp2,
                "center_latitude": self.lat0, "center_longitude": self.lon0,
                "false_easting": self.x0, "false_northing": self.y0}



class EquirectangularProjection(Projection):
    """Spherical equirectangular / plate carree with a latitude of true
    scale (ref ``set_equirectangular``, Snyder eq. 12-1..12-6)."""
    name = "equirectangular"
    proj4_name = "eqc"

    def __init__(self, datum: Datum, center_latitude=0.0, center_longitude=0.0,
                 latitude_of_true_scale=0.0, false_easting=0.0,
                 false_northing=0.0):
        super().__init__(datum)
        self.lat0 = float(center_latitude)
        self.lon0 = float(center_longitude)
        self.lat_ts = float(latitude_of_true_scale)
        self.x0 = float(false_easting)
        self.y0 = float(false_northing)

    def forward(self, lon, lat):
        r = self.datum.a
        import math as _m
        cos_ts = _m.cos(_m.radians(self.lat_ts))
        lon = jnp.asarray(lon, jnp.float32)
        lat = jnp.asarray(lat, jnp.float32)
        x = r * _D2R * (lon - self.lon0) * cos_ts + self.x0
        y = r * _D2R * (lat - self.lat0) + self.y0
        return x, y

    def reverse(self, x, y):
        r = self.datum.a
        import math as _m
        cos_ts = _m.cos(_m.radians(self.lat_ts))
        lon = (jnp.asarray(x, jnp.float32) - self.x0) / (r * _D2R * cos_ts) \
            + self.lon0
        lat = (jnp.asarray(y, jnp.float32) - self.y0) / (r * _D2R) + self.lat0
        return lon, lat

    def params(self):
        return {"center_latitude": self.lat0, "center_longitude": self.lon0,
                "latitude_of_true_scale": self.lat_ts,
                "false_easting": self.x0, "false_northing": self.y0}


class GnomonicProjection(Projection):
    """Spherical gnomonic: project from the sphere's center onto a tangent
    plane (ref ``set_gnomonic``, Snyder eq. 22-3..22-15); great circles map
    to straight lines."""
    name = "gnomonic"
    proj4_name = "gnom"

    def __init__(self, datum: Datum, center_latitude=0.0, center_longitude=0.0,
                 scale=1.0, false_easting=0.0, false_northing=0.0):
        super().__init__(datum)
        self.lat0 = float(center_latitude)
        self.lon0 = float(center_longitude)
        self.k0 = float(scale)
        self.x0 = float(false_easting)
        self.y0 = float(false_northing)

    def forward(self, lon, lat):
        r = self.datum.a * self.k0
        lam = jnp.deg2rad(jnp.asarray(lon, jnp.float32) - self.lon0)
        phi = jnp.deg2rad(jnp.asarray(lat, jnp.float32))
        phi0 = jnp.float32(np.deg2rad(self.lat0))
        cos_c = (jnp.sin(phi0) * jnp.sin(phi)
                 + jnp.cos(phi0) * jnp.cos(phi) * jnp.cos(lam))
        k = 1.0 / jnp.maximum(cos_c, 1e-6)
        x = r * k * jnp.cos(phi) * jnp.sin(lam) + self.x0
        y = r * k * (jnp.cos(phi0) * jnp.sin(phi)
                     - jnp.sin(phi0) * jnp.cos(phi) * jnp.cos(lam)) + self.y0
        return x, y

    def reverse(self, x, y):
        r = self.datum.a * self.k0
        xr = (jnp.asarray(x, jnp.float32) - self.x0) / r
        yr = (jnp.asarray(y, jnp.float32) - self.y0) / r
        rho = jnp.sqrt(xr * xr + yr * yr)
        c = jnp.arctan(rho)
        phi0 = jnp.float32(np.deg2rad(self.lat0))
        sin_c, cos_c = jnp.sin(c), jnp.cos(c)
        safe_rho = jnp.maximum(rho, 1e-12)
        phi = jnp.arcsin(cos_c * jnp.sin(phi0)
                         + yr * sin_c * jnp.cos(phi0) / safe_rho)
        lam = jnp.arctan2(xr * sin_c,
                          safe_rho * jnp.cos(phi0) * cos_c
                          - yr * jnp.sin(phi0) * sin_c)
        lon = jnp.rad2deg(lam) + self.lon0
        lat = jnp.rad2deg(phi)
        lat = jnp.where(rho < 1e-12, self.lat0, lat)
        lon = jnp.where(rho < 1e-12, self.lon0, lon)
        return lon, lat

    def params(self):
        return {"center_latitude": self.lat0, "center_longitude": self.lon0,
                "scale": self.k0, "false_easting": self.x0,
                "false_northing": self.y0}


PROJECTIONS = {
    "geographic": Projection,
    "longlat": Projection,
    "sinusoidal": SinusoidalProjection,
    "mercator": MercatorProjection,
    "transverse mercator": TransverseMercatorProjection,
    "tmerc": TransverseMercatorProjection,
    "utm": UTMProjection,
    "stereographic": StereographicProjection,
    "orthographic": OrthographicProjection,
    "lambert azimuthal": LambertAzimuthalProjection,
    "lambert conformal conic": LambertConformalProjection,
    "equirectangular": EquirectangularProjection,
    "gnomonic": GnomonicProjection,
}
