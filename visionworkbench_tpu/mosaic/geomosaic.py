"""Multi-image cartographic reprojection + mosaic compositing
(ref the ``image2qtree``/``geoblend`` pipeline: per-source
``transform(src, GeoTransform(src_georef, out_georef))`` warps composited by
``ImageComposite`` multiband blending — ``src/vw/tools/geoblend.cc:62-180``,
``src/vw/Mosaic/ImageComposite.h:53-592``; BASELINE config 5).

TPU formulation: the reverse maps are evaluated on coarse host grids with the
``ApproximateTransform`` error bound (``Transform.h:142-238``), warped with
the gather-free banded sampler, and blended in one traced call. Sharded
execution is GSPMD row sharding — a ``with_sharding_constraint`` on the
warped canvases and the output lets XLA partition the shifted-slice warp
stencils and pyramid blurs with its own halo exchange, instead of a manual
``shard_map`` (the stencil structure is static, which is exactly the case the
SPMD partitioner handles at speed-of-light; the manual engines in
``parallel/`` remain for the dynamic correlator pipelines).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.cartography.georeference import GeoReference
from visionworkbench_tpu.cartography.geotransform import GeoTransform
from visionworkbench_tpu.image.transform import (
    reverse_map_grid, warp_from_grid,
)
from visionworkbench_tpu.mosaic.composite import multiband_blend
from visionworkbench_tpu.parallel.mesh import TILE_AXIS


def _host_interp_grid(sx_g, sy_g, step: int, out_shape):
    """NumPy twin of ``interp_map_grid`` for mask planning: bilinear
    upsample of the coarse reverse-map grids to per-pixel coordinates."""
    oh, ow = int(out_shape[0]), int(out_shape[1])

    def up(g):
        g = np.asarray(g, np.float64)
        fy = np.arange(oh) / step
        fx = np.arange(ow) / step
        ky = np.clip(np.floor(fy).astype(int), 0, g.shape[0] - 2)
        kx = np.clip(np.floor(fx).astype(int), 0, g.shape[1] - 2)
        ty = (fy - ky)[:, None]
        tx = (fx - kx)[None, :]
        return ((1 - ty) * (1 - tx) * g[np.ix_(ky, kx)]
                + (1 - ty) * tx * g[np.ix_(ky, kx + 1)]
                + ty * (1 - tx) * g[np.ix_(ky + 1, kx)]
                + ty * tx * g[np.ix_(ky + 1, kx + 1)]).astype(np.float32)

    return up(sx_g), up(sy_g)


def plan_reproject_grids(src_georefs: List[GeoReference],
                         dst_georef: GeoReference,
                         out_shape: Tuple[int, int],
                         grid_step: int = 16, tolerance: float = 0.5):
    """Host phase: per-source reverse-map grids dst pixel -> src pixel
    (``GeoTransform.reverse`` through the ``ApproximateTransform`` error
    bound). Returns a list of ``(sx_g, sy_g, step)``."""
    plans = []
    # The reverse maps are host-time planning even when called under a jit
    # trace (ensure_compile_time_eval keeps the jnp projection math eager,
    # so the grids embed as constants — ref ApproximateTransform builds its
    # grid at view-construction time too, Transform.h:142-238).
    with jax.ensure_compile_time_eval():
        for g in src_georefs:
            tx = GeoTransform(g, dst_georef)

            def rev(x, y, _tx=tx):
                sx, sy = _tx.reverse(np.asarray(x, np.float64),
                                     np.asarray(y, np.float64))
                return np.asarray(sx, np.float64), np.asarray(sy, np.float64)

            plans.append(reverse_map_grid(rev, out_shape, grid_step,
                                          tolerance))
    return plans


def reproject_mosaic(srcs, src_georefs: List[GeoReference],
                     dst_georef: GeoReference, out_shape: Tuple[int, int],
                     levels: Optional[int] = None, interp: str = "bilinear",
                     grid_step: int = 16, tolerance: float = 0.5,
                     mesh: Optional[Mesh] = None, plans=None):
    """Reproject every source into ``dst_georef``'s grid and multiband-blend
    (BASELINE config 5: multi-image warp + mosaic compositing with
    cartographic reprojection across sharded tiles).

    Jit-safe: the host grid planning only touches shapes and georefs, so the
    whole function traces (grids embed as constants). Pass ``mesh`` to shard
    the canvas rows across devices (GSPMD partitioning, see module doc).
    Returns ``(mosaic (H, W), valid (H, W))``.
    """
    if len(srcs) != len(src_georefs) or not srcs:
        raise ArgumentErr("reproject_mosaic: need equal non-empty src lists")
    oh, ow = int(out_shape[0]), int(out_shape[1])
    if plans is None:
        plans = plan_reproject_grids(src_georefs, dst_georef, (oh, ow),
                                     grid_step, tolerance)
    shard = None
    if mesh is not None:
        shard = NamedSharding(mesh, P(TILE_AXIS))

    warped, masks, alphas = [], [], []
    for src, (sx_g, sy_g, step) in zip(srcs, plans):
        src = jnp.asarray(src, jnp.float32)
        h, w = src.shape[0], src.shape[1]
        img = warp_from_grid(src, sx_g, sy_g, step, (oh, ow),
                             interp=interp, edge="zero")
        # The validity mask depends only on the PLAN (static grids), so it
        # and its grassfire alpha are host precomputations — the device
        # associative scans they replace measured 10.6 of the config-5
        # frame's 12.6 ms device time (tools_profile_config --config 5;
        # the reference likewise computes per-source alphas once and
        # caches them, ImageComposite.h:184).
        sx, sy = _host_interp_grid(sx_g, sy_g, step, (oh, ow))
        mask_np = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
        from visionworkbench_tpu.image.morphology import grassfire_np
        alphas.append(grassfire_np(mask_np).astype(np.float32))
        mask = jnp.asarray(mask_np)
        if shard is not None:
            img = jax.lax.with_sharding_constraint(img, shard)
            mask = jax.lax.with_sharding_constraint(mask, shard)
        warped.append(img)
        masks.append(mask)

    out, valid = multiband_blend(warped, masks, levels=levels, alphas=alphas)
    if shard is not None:
        out = jax.lax.with_sharding_constraint(out, shard)
        valid = jax.lax.with_sharding_constraint(valid, shard)
    return out, valid
