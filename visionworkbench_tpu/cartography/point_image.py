"""Cartesian <-> geodetic image operations
(ref ``src/vw/Cartography/PointImageManipulation.h``): whole-image conversions
between DEMs, lon/lat/height images, and ECEF point images."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visionworkbench_tpu.cartography.datum import Datum
from visionworkbench_tpu.cartography.georeference import GeoReference


def dem_to_geodetic(dem, georef: GeoReference):
    """(H, W) DEM -> (H, W, 3) lon/lat/height (ref ``dem_to_geodetic``)."""
    dem = jnp.asarray(dem, jnp.float32)
    h, w = dem.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    lon, lat = georef.pixel_to_lonlat(xs, ys)
    return jnp.stack([lon, lat, dem], -1)


def dem_to_point_image(dem, georef: GeoReference):
    """(H, W) DEM -> (H, W, 3) ECEF points (ref ``dem_to_point_image``)."""
    return geodetic_to_cartesian(dem_to_geodetic(dem, georef), georef.datum)


def geodetic_to_cartesian(llh_image, datum: Datum):
    return datum.geodetic_to_cartesian(jnp.asarray(llh_image, jnp.float32))


def cartesian_to_geodetic(xyz_image, datum: Datum):
    return datum.cartesian_to_geodetic(jnp.asarray(xyz_image, jnp.float32))


def point_image_to_dem(xyz_image, valid, georef: GeoReference, rows: int,
                       cols: int):
    """Splat an ECEF point cloud into a gridded DEM in ``georef``'s frame:
    mean height per output cell (a simple rasterizer standing in for the
    reference pipeline's point2dem, which lives in Ames Stereo Pipeline)."""
    xyz = jnp.asarray(xyz_image, jnp.float32).reshape(-1, 3)
    valid = jnp.asarray(valid).reshape(-1)
    llh = georef.datum.cartesian_to_geodetic(xyz)
    px, py = georef.lonlat_to_pixel(llh[..., 0], llh[..., 1])
    xi = jnp.round(px).astype(jnp.int32)
    yi = jnp.round(py).astype(jnp.int32)
    inside = (xi >= 0) & (xi < cols) & (yi >= 0) & (yi < rows) & valid
    xi = jnp.clip(xi, 0, cols - 1)
    yi = jnp.clip(yi, 0, rows - 1)
    wsum = jnp.zeros((rows, cols), jnp.float32).at[yi, xi].add(
        jnp.where(inside, 1.0, 0.0))
    hsum = jnp.zeros((rows, cols), jnp.float32).at[yi, xi].add(
        jnp.where(inside, llh[..., 2], 0.0))
    out_valid = wsum > 0
    dem = hsum / jnp.maximum(wsum, 1.0)
    return jnp.where(out_valid, dem, 0.0), out_valid
