"""Tile (row-band) sharding with halo exchange.

The reference recomputes each tile's collar independently
(``CorrelationView.cc:100-230`` pads every tile's pyramid by
``half_kernel * 2^levels``). Multi-chip, the halo is instead *exchanged over
ICI* with ``lax.ppermute`` (SURVEY.md section 2.14): each device holds one row
band; before an operation with spatial reach ``halo``, it receives the
neighboring bands' edge rows, computes, and crops.

``map_overlap`` is the generic combinator (the analogue of
``BlockRasterizeView`` + collar); ``sharded_pyramid_correlate`` is the
flagship use — the full hierarchical correlator running data-parallel over
row bands, allclose to the single-device result away from collar truncation
(collar is sized to the correlator's full receptive field, so interior rows
are exact).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.parallel.mesh import TILE_AXIS
from visionworkbench_tpu.stereo.correlation import DisparityMap


def halo_exchange_rows(block, halo_top: int, halo_bottom: int, axis_name: str = TILE_AXIS):
    """Inside ``shard_map``: extend a row band with neighbor rows.

    Global edges receive replicated edge rows, matching the monolithic
    pipeline's ``ConstantEdgeExtension``.

    When the halo fits in one band, edge rows are exchanged with single-hop
    ``ppermute`` over ICI; the deep-halo case (pyramid collars spanning
    multiple bands) falls back to ``all_gather`` + slice, which costs the full
    image over the ring — acceptable because it happens once per correlate
    call, not per level.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    hb = block.shape[0]
    if halo_top == 0 and halo_bottom == 0:
        return block

    if halo_top < hb and halo_bottom < hb:
        parts = []
        if halo_top > 0:
            send_down = [(i, i + 1) for i in range(n - 1)]
            from_prev = lax.ppermute(block[hb - halo_top:], axis_name, send_down)
            own_edge = jnp.repeat(block[:1], halo_top, axis=0)
            parts.append(jnp.where(idx == 0, own_edge, from_prev))
        parts.append(block)
        if halo_bottom > 0:
            send_up = [(i + 1, i) for i in range(n - 1)]
            from_next = lax.ppermute(block[:halo_bottom], axis_name, send_up)
            own_edge = jnp.repeat(block[-1:], halo_bottom, axis=0)
            parts.append(jnp.where(idx == n - 1, own_edge, from_next))
        return jnp.concatenate(parts, axis=0)

    # Deep halo: reconstruct the full column of bands, pad global edges, and
    # slice this band's extended window.
    full = lax.all_gather(block, axis_name, tiled=True)   # (n*hb, W[, C])
    pad = [(halo_top, halo_bottom)] + [(0, 0)] * (block.ndim - 1)
    padded = jnp.pad(full, pad, mode="edge")
    start = (idx * hb,) + (0,) * (block.ndim - 1)
    size = (hb + halo_top + halo_bottom,) + block.shape[1:]
    return lax.dynamic_slice(padded, start, size)


def map_overlap(fn: Callable, image, mesh: Mesh, halo: int,
                out_channels: Optional[int] = None):
    """Apply ``fn`` to row bands of ``image`` with ``halo`` rows of overlap
    exchanged over the mesh; ``fn`` maps an (h + 2*halo, W) array to an
    (h + 2*halo, W[, C]) array (same spatial size); the halo is cropped after.

    Equivalent to running ``fn`` on the whole image when ``fn``'s receptive
    field is <= halo (the ``BlockRasterizeView`` tiled==whole guarantee that
    ``TestBlockRasterize.cxx`` checks).
    """
    h = image.shape[0]
    n = mesh.devices.size
    if h % n != 0:
        raise ArgumentErr(f"map_overlap: rows {h} must divide over {n} devices")

    def shard_fn(block):
        padded = halo_exchange_rows(block, halo, halo)
        out = fn(padded)
        return out[halo:out.shape[0] - halo]

    spec = P(TILE_AXIS)
    return shard_map(shard_fn, mesh=mesh, in_specs=(spec,), out_specs=spec)(image)


def sharded_pyramid_correlate(left, right, search_region: BBox2i, mesh: Mesh,
                              collar: Optional[int] = None,
                              **corr_kwargs) -> DisparityMap:
    """Distributed pyramid correlator: row bands x devices with collar halos.

    Each device receives its band plus ``collar`` rows of context from
    neighbors (over ICI), runs the full coarse-to-fine correlator on the
    padded band, and keeps its interior rows — the distributed equivalent of
    the reference's per-tile prerasterize with collar
    (``CorrelationView.h:124-133``). The right image is broadcast in full
    rows? No — it is sharded the same way and halo-exchanged with
    ``collar + search`` rows so vertical search stays in-shard.

    ``collar`` defaults to the correlator's receptive field:
    ``2^levels * (max_kernel + refine_window) + search_height``.
    """
    from visionworkbench_tpu.stereo.pyramid_correlation import (
        max_pyramid_levels_for, pyramid_correlate,
    )
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    h, w = left.shape
    n = mesh.devices.size
    if h % n != 0:
        raise ArgumentErr(f"rows {h} must divide over {n} devices")

    kernel_size = corr_kwargs.get("kernel_size", (21, 21))
    max_levels = corr_kwargs.get("max_pyramid_levels", 5)
    tile = int(corr_kwargs.get("tile_size", 32))
    levels = max_pyramid_levels_for(w, h // n, kernel_size, search_region, max_levels)
    corr_kwargs = dict(corr_kwargs)
    corr_kwargs["max_pyramid_levels"] = levels
    if collar is None:
        # Receptive-field radius of the coarse-to-fine pipeline: each level
        # contributes its half-kernel, cleanup-filter, and pyramid-build /
        # upsample supports at 2^level spacing, plus the level-0 refine
        # window.  (Tighter than the old full-kernel bound; halo rows are
        # pure overhead, so this directly sets the scaling efficiency.)
        k_half = max(kernel_size) // 2 + 1
        fhk = int(corr_kwargs.get("filter_half_kernel", 5))
        per_level = k_half + fhk + 4
        collar = (((1 << levels) - 1) * per_level
                  + int(corr_kwargs.get("refine_window", 11)) + k_half)
    if levels > 1:
        # Round the collar to a tile multiple so every band's refine-tile
        # grid is aligned with the monolithic grid (exact shard==whole
        # interior parity).  Single-level runs have no tile grid, so any
        # collar works and rounding would only add halo traffic.
        collar = -(-collar // tile) * tile
    if (h // n) % tile != 0:
        raise ArgumentErr(f"band height {h // n} must be a multiple of "
                          f"tile_size {tile} for grid-aligned sharding")
    s_h = int(search_region.height)
    smin_y = int(search_region.min_y)
    smin_x = int(search_region.min_x)
    s_w = int(search_region.width)
    # Right halos must also cover the vertical search reach.
    extra_top = max(-smin_y, 0)
    extra_bot = max(smin_y + s_h, 0)
    r_top = collar + extra_top
    r_bot = collar + extra_bot

    if right.shape[0] != h:
        raise ArgumentErr("sharded_pyramid_correlate: left/right must have "
                          "equal heights (fold the search margin into "
                          "search_region instead)")

    # Inside a shard, rpad row 0 is left-frame row (-collar - extra_top) while
    # lpad row 0 is left-frame row (-collar): the right image is presented
    # shifted down by extra_top rows, so the y search window shifts up by the
    # same amount in the local frame.
    local_sr = BBox2i(smin_x, smin_y + extra_top, s_w, s_h)

    def shard_fn(lblock, rblock):
        lpad = halo_exchange_rows(lblock, collar, collar)
        rpad = halo_exchange_rows(rblock, r_top, r_bot)
        dm = pyramid_correlate(lpad, rpad, local_sr, **corr_kwargs)
        lo, hi = collar, lpad.shape[0] - collar
        disp = dm.disparity[lo:hi]
        # Convert local-frame absolute disparities back to the global frame.
        disp = disp - jnp.array([0, extra_top], disp.dtype)
        valid = dm.valid[lo:hi]
        return jnp.where(valid[..., None], disp, 0), valid

    spec = P(TILE_AXIS)
    disp, valid = shard_map(shard_fn, mesh=mesh, in_specs=(spec, spec),
                            out_specs=(spec, spec))(left, right)
    return DisparityMap(disp, valid)
