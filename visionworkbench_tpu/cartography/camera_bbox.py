"""Camera-to-ground intersection and footprints
(ref ``src/vw/Cartography/CameraBBox.h:36-103``).

``intersect_datum``: closed-form ray/ellipsoid intersection (the reference's
``datum_intersection``); ``camera_pixel_to_dem_xyz``: iterative ray/DEM
intersection; ``camera_bbox``: ground footprint of the full image.
All batched jnp.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from visionworkbench_tpu.camera.model import CameraModel
from visionworkbench_tpu.cartography.datum import Datum
from visionworkbench_tpu.cartography.georeference import GeoReference
from visionworkbench_tpu.image.interpolation import interpolate
from visionworkbench_tpu.math.bbox import BBox2


def intersect_datum(ctr, dir, datum: Datum, height: float = 0.0):
    """Ray/ellipsoid intersection (ref ``datum_intersection``, CameraBBox.h).

    Returns ((..., 3) ECEF points, (...,) valid). ``height`` inflates the
    ellipsoid (intersection with a constant-height surface).
    """
    ctr = jnp.asarray(ctr, jnp.float32)
    dir = jnp.asarray(dir, jnp.float32)
    a = datum.a + height
    b = datum.b + height
    scale = jnp.asarray([1.0 / a, 1.0 / a, 1.0 / b], jnp.float32)
    o = ctr * scale
    d = dir * scale
    # Solve |o + t d|^2 = 1
    aa = jnp.sum(d * d, -1)
    bb = 2 * jnp.sum(o * d, -1)
    cc = jnp.sum(o * o, -1) - 1.0
    disc = bb * bb - 4 * aa * cc
    valid = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-bb - sq) / (2 * aa)   # nearer root
    valid = valid & (t > 0)
    pts = ctr + t[..., None] * dir
    return jnp.where(valid[..., None], pts, 0.0), valid


def camera_pixel_to_datum_lonlat(pixels, camera: CameraModel, datum: Datum,
                                 height: float = 0.0):
    """(..., 2) pixels -> (lon, lat, valid) on the datum surface."""
    dirs = camera.pixel_to_vector(pixels)
    ctr = jnp.broadcast_to(camera.camera_center(pixels), dirs.shape)
    xyz, valid = intersect_datum(ctr, dirs, datum, height)
    llh = datum.cartesian_to_geodetic(xyz)
    return llh[..., 0], llh[..., 1], valid


def camera_pixel_to_dem_xyz(pixel, camera: CameraModel, dem,
                            dem_georef: GeoReference,
                            dem_nodata: Optional[float] = None,
                            iterations: int = 20):
    """Iterative ray/DEM intersection (ref ``camera_pixel_to_dem_xyz``,
    CameraBBox.h:59): start at the datum-surface hit, then alternate
    project-to-DEM / march-along-ray until the height converges."""
    dem = jnp.asarray(dem, jnp.float32)
    dirs = camera.pixel_to_vector(pixel)
    ctr = jnp.broadcast_to(camera.camera_center(pixel), dirs.shape)
    datum = dem_georef.datum

    def dem_height_at(xyz):
        llh = datum.cartesian_to_geodetic(xyz)
        px, py = dem_georef.lonlat_to_pixel(llh[..., 0], llh[..., 1])
        h = interpolate(dem, px, py, "bilinear")
        inside = ((px >= 0) & (px <= dem.shape[1] - 1) &
                  (py >= 0) & (py <= dem.shape[0] - 1))
        if dem_nodata is not None:
            inside = inside & (h != dem_nodata)
        return h, llh[..., 2], inside

    xyz, valid = intersect_datum(ctr, dirs, datum, 0.0)

    def body(_, state):
        xyz, valid = state
        h_dem, h_ray, inside = dem_height_at(xyz)
        # March along the ray by the height error (projected onto the ray's
        # vertical component, approximated with unit factor).
        err = h_ray - h_dem
        xyz_new = xyz + err[..., None] * dirs
        return (jnp.where(valid[..., None], xyz_new, xyz), valid & inside)

    xyz, valid = jax.lax.fori_loop(0, iterations, body, (xyz, valid))
    return jnp.where(valid[..., None], xyz, 0.0), valid


def camera_bbox(camera: CameraModel, datum: Datum, cols: int, rows: int,
                samples: int = 100) -> Tuple[BBox2, bool]:
    """Lon/lat footprint of the image on the datum (ref ``camera_bbox``,
    CameraBBox.h:72-103). Returns (bbox, all_rays_hit)."""
    n = int(np.sqrt(samples))
    xs = np.linspace(0, cols - 1, n)
    ys = np.linspace(0, rows - 1, n)
    gx, gy = np.meshgrid(xs, ys)
    pix = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)
    lon, lat, valid = camera_pixel_to_datum_lonlat(pix, camera, datum)
    lon, lat, valid = np.asarray(lon), np.asarray(lat), np.asarray(valid)
    if not valid.any():
        return BBox2.empty(), False
    box = BBox2.from_bounds(lon[valid].min(), lat[valid].min(),
                            lon[valid].max(), lat[valid].max())
    return box, bool(valid.all())
