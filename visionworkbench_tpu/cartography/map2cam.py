"""Map-projected pixel <-> camera pixel transforms and orthoprojection
(ref ``Map2CamTrans`` / ``Datum2CamTrans``, ``src/vw/Cartography/Map2CamTrans.h:48-120``,
and ``OrthoImageView``, ``OrthoImageView.h:45-253``)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from visionworkbench_tpu.camera.model import CameraModel
from visionworkbench_tpu.cartography.georeference import GeoReference
from visionworkbench_tpu.cartography.camera_bbox import intersect_datum
from visionworkbench_tpu.image.interpolation import interpolate
from visionworkbench_tpu.image.transform import sample, _dest_grid


class Datum2CamTrans:
    """Map-projected pixel -> camera pixel assuming ground on the datum at a
    fixed height (ref ``Datum2CamTrans``, Map2CamTrans.h)."""

    def __init__(self, camera: CameraModel, image_georef: GeoReference,
                 height: float = 0.0):
        self.camera = camera
        self.georef = image_georef
        self.height = float(height)

    def reverse(self, x, y):
        """map pixel -> camera pixel (the warping direction)."""
        lon, lat = self.georef.pixel_to_lonlat(x, y)
        h = jnp.full(jnp.shape(lon), self.height, jnp.float32)
        xyz = self.georef.datum.geodetic_to_cartesian(
            jnp.stack([lon, lat, h], -1))
        pix = self.camera.point_to_pixel(xyz)
        return pix[..., 0], pix[..., 1]


class Map2CamTrans(Datum2CamTrans):
    """Map-projected pixel -> camera pixel through a DEM
    (ref ``Map2CamTrans``, Map2CamTrans.h:48-120)."""

    def __init__(self, camera: CameraModel, image_georef: GeoReference,
                 dem, dem_georef: GeoReference,
                 dem_nodata: Optional[float] = None):
        super().__init__(camera, image_georef, 0.0)
        self.dem = jnp.asarray(dem, jnp.float32)
        self.dem_georef = dem_georef
        self.dem_nodata = dem_nodata

    def reverse(self, x, y):
        lon, lat = self.georef.pixel_to_lonlat(x, y)
        dpx, dpy = self.dem_georef.lonlat_to_pixel(lon, lat)
        h = interpolate(self.dem, dpx, dpy, "bilinear")
        if self.dem_nodata is not None:
            h = jnp.where(h == self.dem_nodata, 0.0, h)
        xyz = self.georef.datum.geodetic_to_cartesian(
            jnp.stack([lon, lat, h], -1))
        pix = self.camera.point_to_pixel(xyz)
        return pix[..., 0], pix[..., 1]


def orthoproject(camera_image, camera: CameraModel, output_georef: GeoReference,
                 out_shape: Tuple[int, int], dem=None,
                 dem_georef: Optional[GeoReference] = None,
                 dem_nodata: Optional[float] = None, height: float = 0.0,
                 interp: str = "bilinear"):
    """Render a camera image onto a map grid (ref ``OrthoImageView``): each
    output map pixel looks up its ground point (datum surface or DEM) and
    samples the camera image at that point's projection — one fused warp."""
    if dem is not None:
        tx = Map2CamTrans(camera, output_georef, dem,
                          dem_georef or output_georef, dem_nodata)
    else:
        tx = Datum2CamTrans(camera, output_georef, height)
    oh, ow = int(out_shape[0]), int(out_shape[1])
    xs, ys = _dest_grid(oh, ow)
    sx, sy = tx.reverse(xs, ys)
    return sample(jnp.asarray(camera_image), sx, sy, interp=interp, edge="zero")
