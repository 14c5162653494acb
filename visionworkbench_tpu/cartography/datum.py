"""Datums / reference ellipsoids (ref ``src/vw/Cartography/Datum.cc``).

Geodetic <-> geocentric (ECEF) conversions are vectorized jnp (whole DEMs
convert in one traced call). Well-known datums match the reference's set.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr


class Datum:
    def __init__(self, name: str = "WGS_1984",
                 spheroid_name: str = "WGS 84",
                 meridian_name: str = "Greenwich",
                 semi_major_axis: float = 6378137.0,
                 semi_minor_axis: float = 6356752.314245,
                 meridian_offset: float = 0.0):
        self.name = name
        self.spheroid_name = spheroid_name
        self.meridian_name = meridian_name
        self.a = float(semi_major_axis)
        self.b = float(semi_minor_axis)
        self.meridian_offset = float(meridian_offset)

    # --- derived quantities -------------------------------------------------
    @property
    def flattening(self) -> float:
        return (self.a - self.b) / self.a

    @property
    def e2(self) -> float:
        """First eccentricity squared."""
        return 1.0 - (self.b * self.b) / (self.a * self.a)

    def inverse_flattening(self) -> float:
        f = self.flattening
        return math.inf if f == 0 else 1.0 / f

    def radius(self, lon, lat):
        """Ellipsoid radius at geodetic latitude (ref ``Datum::radius``)."""
        lat = jnp.deg2rad(jnp.asarray(lat))
        cl, sl = jnp.cos(lat), jnp.sin(lat)
        a2, b2 = self.a ** 2, self.b ** 2
        return jnp.sqrt((a2 * a2 * cl * cl + b2 * b2 * sl * sl) /
                        (a2 * cl * cl + b2 * sl * sl))

    # --- conversions --------------------------------------------------------
    def geodetic_to_cartesian(self, llh):
        """(..., 3) (lon deg, lat deg, height m) -> ECEF (..., 3)
        (ref ``Datum::geodetic_to_cartesian``)."""
        llh = jnp.asarray(llh, jnp.float64 if False else jnp.float32)
        lon = jnp.deg2rad(llh[..., 0] + self.meridian_offset)
        lat = jnp.deg2rad(llh[..., 1])
        h = llh[..., 2]
        sl, cl = jnp.sin(lat), jnp.cos(lat)
        n = self.a / jnp.sqrt(1 - self.e2 * sl * sl)
        x = (n + h) * cl * jnp.cos(lon)
        y = (n + h) * cl * jnp.sin(lon)
        z = (n * (1 - self.e2) + h) * sl
        return jnp.stack([x, y, z], -1)

    def cartesian_to_geodetic(self, xyz, iterations: int = 10):
        """ECEF -> (lon deg, lat deg, height m) via Bowring iteration
        (ref ``Datum::cartesian_to_geodetic``)."""
        xyz = jnp.asarray(xyz, jnp.float32)
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        lon = jnp.rad2deg(jnp.arctan2(y, x)) - self.meridian_offset
        p = jnp.sqrt(x * x + y * y)
        lat = jnp.arctan2(z, p * (1 - self.e2))
        for _ in range(iterations):
            sl = jnp.sin(lat)
            n = self.a / jnp.sqrt(1 - self.e2 * sl * sl)
            h = p / jnp.cos(lat) - n
            lat = jnp.arctan2(z, p * (1 - self.e2 * n / (n + h)))
        sl = jnp.sin(lat)
        n = self.a / jnp.sqrt(1 - self.e2 * sl * sl)
        h = p / jnp.cos(lat) - n
        return jnp.stack([lon, jnp.rad2deg(lat), h], -1)

    def __eq__(self, other):
        return (isinstance(other, Datum) and abs(self.a - other.a) < 1e-6 and
                abs(self.b - other.b) < 1e-6 and
                abs(self.meridian_offset - other.meridian_offset) < 1e-12)

    def __repr__(self):
        return f"Datum({self.name!r}, a={self.a}, b={self.b})"


_WELL_KNOWN = {
    "WGS84": ("WGS_1984", "WGS 84", 6378137.0, 6356752.314245),
    "WGS72": ("WGS_1972", "WGS 72", 6378135.0, 6356750.52),
    "NAD83": ("North_American_Datum_1983", "GRS 1980", 6378137.0, 6356752.314140),
    "NAD27": ("North_American_Datum_1927", "Clarke 1866", 6378206.4, 6356583.8),
    "D_MOON": ("D_MOON", "MOON", 1737400.0, 1737400.0),
    "D_MARS": ("D_MARS", "MARS", 3396190.0, 3376200.0),
    "MOLA": ("D_MARS_MOLA", "MOLA", 3396000.0, 3396000.0),
}


def well_known_datum(name: str) -> Datum:
    """(ref ``Datum::set_well_known_datum``)"""
    key = name.upper().replace(" ", "")
    if key not in _WELL_KNOWN:
        raise ArgumentErr(f"unknown datum {name!r}; one of {sorted(_WELL_KNOWN)}")
    dname, sph, a, b = _WELL_KNOWN[key]
    return Datum(dname, sph, "Greenwich", a, b)
