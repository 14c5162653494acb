"""reproject_mosaic: BASELINE config 5 pipeline (multi-image cartographic
reprojection + multiband mosaic, sharded rows) — sharded == unsharded is the
``TestBlockRasterize.cxx`` tiled==whole analogue."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.cartography.georeference import GeoReference
from visionworkbench_tpu.mosaic.geomosaic import reproject_mosaic
from visionworkbench_tpu.parallel.mesh import make_tile_mesh


def _georef(scale, x0, y0):
    t = np.array([[scale, 0.0, x0], [0.0, -scale, y0], [0.0, 0.0, 1.0]])
    return GeoReference(transform=t)


def _tex(rng, h, w):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return (np.sin(xs * 0.2) * np.cos(ys * 0.23)
            + 0.3 * rng.random((h, w))).astype(np.float32)


def test_identity_reprojection(rng):
    img = _tex(rng, 64, 64)
    g = _georef(0.01, 0.0, 0.64)
    out, valid = reproject_mosaic([img], [g], g, (64, 64), levels=3)
    assert bool(jnp.all(valid))
    # Identity map: bilinear sampling is exact at integer coordinates and the
    # blend of one fully-valid source is the source itself.
    np.testing.assert_allclose(np.asarray(out), img, atol=2e-5)


def test_multi_image_valid_union(rng):
    h = w = 64
    dst = _georef(0.01, 0.0, 0.64)
    srcs, georefs = [], []
    # Two half-canvas sources: left half and right half (in lon), overlapping
    # by a strip in the middle.
    for x0 in (0.0, 0.22):
        srcs.append(_tex(rng, h, 40))
        georefs.append(_georef(0.01, x0, 0.64))
    out, valid = reproject_mosaic(srcs, georefs, dst, (h, w), levels=3)
    v = np.asarray(valid)
    assert v[:, 2:38].all()          # left source interior
    assert v[:, 24:60].all()         # right source interior
    assert not v[:, 63].any()        # past both sources
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_matches_unsharded(rng):
    h = w = 64
    dst = _georef(0.01, 0.0, 0.64)
    srcs, georefs = [], []
    specs = [(0.011, -0.02, 0.70), (0.0095, 0.20, 0.66),
             (0.010, -0.01, 0.40), (0.012, 0.18, 0.44)]
    for scale, x0, y0 in specs:
        srcs.append(_tex(rng, 48, 48))
        georefs.append(_georef(scale, x0, y0))
    ref_out, ref_valid = jax.jit(
        lambda a: reproject_mosaic(a, georefs, dst, (h, w), levels=3)
    )([jnp.asarray(s) for s in srcs])

    mesh = make_tile_mesh(8)
    sh_out, sh_valid = jax.jit(
        lambda a: reproject_mosaic(a, georefs, dst, (h, w), levels=3,
                                   mesh=mesh)
    )([jnp.asarray(s) for s in srcs])
    np.testing.assert_array_equal(np.asarray(ref_valid), np.asarray(sh_valid))
    np.testing.assert_allclose(np.asarray(ref_out), np.asarray(sh_out),
                               atol=1e-5)
