"""Full-system integration: DEM -> rendered stereo pair (camera model +
ray/DEM intersection) -> pyramid correlation -> triangulation -> recovered
terrain heights vs truth. Exercises cartography + camera + stereo together —
the closest in-tree analogue of running the whole reference pipeline on real
data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.camera import PinholeModel
from visionworkbench_tpu.cartography import (
    camera_pixel_to_dem_xyz, make_geographic_georef, well_known_datum,
)
from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.stereo import StereoModel, pyramid_correlate


def test_dem_stereo_reconstruction(rng):
    datum = well_known_datum("WGS84")
    # Local scene at (lon 0, lat 0): DEM of smooth hills, ~1 m/px.
    n = 160
    deg_pp = 1.0 / 111320.0  # ~1 m
    georef = make_geographic_georef(-n / 2 * deg_pp, n / 2 * deg_pp, deg_pp)
    ys, xs = np.mgrid[0:n, 0:n].astype(np.float32)
    dem_np = (25.0 * np.exp(-((xs - 60) ** 2 + (ys - 70) ** 2) / 800.0)
              + 15.0 * np.exp(-((xs - 110) ** 2 + (ys - 50) ** 2) / 500.0))
    dem = jnp.asarray(dem_np)

    # Ground texture: band-limited noise as a function of lon/lat.
    from scipy.ndimage import gaussian_filter as blur
    tex_grid = blur(rng.random((n * 2, n * 2)), 1.2).astype(np.float32)
    tex_georef = make_geographic_georef(-n * deg_pp, n * deg_pp, deg_pp)
    tex = jnp.asarray(tex_grid)

    # Two nadir cameras 400 m up, 12 m baseline along x (ECEF +y here).
    alt = 400.0
    f = 500.0
    w = h = 128
    surf = np.array([datum.a, 0.0, 0.0])
    # camera axes: z toward planet (-x world), x across (+y world), y (+z)
    r = np.stack([np.array([0, 1.0, 0]), np.array([0, 0, 1.0]),
                  np.array([-1.0, 0, 0])], axis=1)
    cam1 = PinholeModel(surf + [alt, -6.0, 0], r, (f, f), (w / 2, h / 2))
    cam2 = PinholeModel(surf + [alt, 6.0, 0], r, (f, f), (w / 2, h / 2))

    def render(cam):
        pys, pxs = np.mgrid[0:h, 0:w].astype(np.float32)
        pix = jnp.asarray(np.stack([pxs.ravel(), pys.ravel()], -1))
        xyz, valid = camera_pixel_to_dem_xyz(pix, cam, dem, georef,
                                             iterations=30)
        llh = datum.cartesian_to_geodetic(xyz)
        tx, ty = tex_georef.lonlat_to_pixel(llh[..., 0], llh[..., 1])
        from visionworkbench_tpu.image.interpolation import interpolate
        vals = interpolate(tex, tx, ty, "bilinear")
        return np.asarray(vals).reshape(h, w), np.asarray(valid).reshape(h, w)

    left, lv = render(cam1)
    right, rv = render(cam2)
    assert lv.all() and rv.all()

    # Disparity geometry: cam2 is +y of cam1; ground point appears shifted in
    # x (pixel) between images by ~ f * B / Z (Z = alt - height).
    d_lo = f * 12.0 / alt        # 15 px at ground level
    d_hi = f * 12.0 / (alt - 30.0)
    dm = pyramid_correlate(jnp.asarray(left), jnp.asarray(right),
                           BBox2i(-int(np.ceil(d_hi)) - 2, 0,
                                  int(np.ceil(d_hi)) - int(d_lo) + 5, 1),
                           kernel_size=(11, 11), max_pyramid_levels=1,
                           tile_size=16, subpixel="parabola")
    valid = np.asarray(dm.valid)
    core = np.s_[16:-16, 24:-24]
    assert valid[core].mean() > 0.8

    # Triangulate and compare heights to the DEM.
    model = StereoModel(cam1, cam2)
    pts, err, tri_valid = model.point_cloud(dm)
    llh = np.asarray(datum.cartesian_to_geodetic(pts))
    heights = llh[..., 2]
    ok = valid & np.asarray(tri_valid)
    # Truth height at each left pixel = DEM height at the ray's ground point.
    pys, pxs = np.mgrid[0:h, 0:w].astype(np.float32)
    pix = jnp.asarray(np.stack([pxs.ravel(), pys.ravel()], -1))
    xyz_true, _ = camera_pixel_to_dem_xyz(pix, cam1, dem, georef, iterations=30)
    h_true = np.asarray(datum.cartesian_to_geodetic(xyz_true))[..., 2]
    h_true = h_true.reshape(h, w)

    err_h = np.abs(heights - h_true)[core][ok[core]]
    assert np.median(err_h) < 2.0, f"median height error {np.median(err_h):.2f} m"
    # Geometry: 1 px disparity ~ Z^2/(f B) ~ 26 m here, so ~0.2 px subpixel
    # noise is ~5 m sigma — bound the tail at 8 m.
    assert (err_h < 8.0).mean() > 0.85
