"""Integer block-matching correlation (ref ``src/vw/Stereo/Correlation.cc:30-137``
and ``CostFunctions.h:143-236``).

The reference's ``best_of_search_convolution`` loops over the (dx, dy) search
volume, shifting the right image, computing per-pixel costs, box-summing over
the kernel window, and keeping a running best/worst cost and arg-best
disparity per pixel. Here the disparity loop is a ``lax.scan`` with a running
(best, worst, argbest) carry — memory stays O(H*W), never materializing the
full cost volume, which is also the shape the disparity-sharded multi-chip
path reduces over (allreduce of (best, worst, arg) triples).

Semantics preserved exactly:
* strict-inequality updates → first-best wins on ties (``Correlation.cc:95-109``)
* the best/worst ``elif``: a cost that improves best does not touch worst
* flat-region invalidation where best == worst (``Correlation.cc:121-133``)
* NCC multiplies in sqrt of precomputed inverse window energies
  (``NCCCost::cost_modification``, CostFunctions.h:204-236)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.ops.box_filter import box_sum_valid, box_sum_valid_int
from visionworkbench_tpu.image.census import (
    census_transform, hamming_distance, ternary_census_transform,
)

# Cost function types (ref CostFunctionType enum, CostFunctions.h:143-150)
ABSOLUTE_DIFFERENCE = "abs"
SQUARED_DIFFERENCE = "sq"
CROSS_CORRELATION = "ncc"
CENSUS_TRANSFORM = "census"
TERNARY_CENSUS_TRANSFORM = "ternary_census"

COST_TYPES = (ABSOLUTE_DIFFERENCE, SQUARED_DIFFERENCE, CROSS_CORRELATION,
              CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM)


class DisparityMap(NamedTuple):
    """Integer or float disparity + validity (the reference's
    ``ImageView<PixelMask<Vector2i>>`` / ``Vector2f``)."""
    disparity: jax.Array  # (H, W, 2) — channels (dx, dy)
    valid: jax.Array      # (H, W) bool


def _check_args(search_volume, kernel_size):
    sx, sy = int(search_volume[0]), int(search_volume[1])
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    if kw % 2 != 1 or kh % 2 != 1:
        raise ArgumentErr("calc_disparity: Kernel input not sized with odd values.")
    if sx <= 0 or sy <= 0:
        raise ArgumentErr("calc_disparity: Search volume must be greater than 0.")
    return sx, sy, kw, kh


@functools.partial(jax.jit, static_argnames=("sx", "sy", "kw", "kh", "cost_type",
                                             "census_window"))
def _best_of_search(left, right, sx: int, sy: int, kw: int, kh: int,
                    cost_type: str, census_window: int = 5):
    h, w = left.shape
    out_h, out_w = h - kh + 1, w - kw + 1
    n_disp = sx * sy
    is_max = cost_type == CROSS_CORRELATION

    if cost_type in (CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM):
        # Hamming costs over packed census codes; images are quantized to u8
        # levels like the reference's census path (SGM.cc uses uint8 inputs).
        lq = jnp.clip(left * 255.0, 0, 255).astype(jnp.int32)
        rq = jnp.clip(right * 255.0, 0, 255).astype(jnp.int32)
        if cost_type == CENSUS_TRANSFORM:
            lcodes = census_transform(lq, census_window)
            rcodes = census_transform(rq, census_window)
        else:
            lcodes = ternary_census_transform(lq, census_window)
            rcodes = ternary_census_transform(rq, census_window)

        def cost_at(dx, dy):
            rc = lax.dynamic_slice(rcodes, (dy, dx, 0), (h, w, rcodes.shape[-1]))
            c = hamming_distance(lcodes, rc).astype(jnp.float32)
            return box_sum_valid(c, kw, kh)
    else:
        left_prec = right_prec = None
        if is_max:
            left_prec = 1.0 / box_sum_valid(left * left, kw, kh)
            right_prec = 1.0 / box_sum_valid(right * right, kw, kh)

        def cost_at(dx, dy):
            rc = lax.dynamic_slice(right, (dy, dx), (h, w))
            if cost_type == ABSOLUTE_DIFFERENCE:
                c = jnp.abs(left - rc)
            elif cost_type == SQUARED_DIFFERENCE:
                c = (left - rc) * (left - rc)
            else:  # NCC numerator
                c = left * rc
            m = box_sum_valid(c, kw, kh)
            if is_max:
                rp = lax.dynamic_slice(right_prec, (dy, dx), (out_h, out_w))
                m = m * jnp.sqrt(left_prec * rp)
            return m

    def cost_at_flat(d):
        return cost_at(d % sx, d // sx)

    m0 = cost_at_flat(0)
    # zeros_like (not zeros) so the carry inherits m0's varying-axis type
    # under shard_map (disparity-sharded path).
    init = (m0, m0, jnp.zeros_like(m0, dtype=jnp.int32))

    def step(carry, d):
        best, worst, arg = carry
        m = cost_at_flat(d)
        if is_max:
            better = m > best
            not_worse = m > worst
        else:
            better = m < best
            not_worse = m < worst
        new_best = jnp.where(better, m, best)
        new_arg = jnp.where(better, d, arg)
        # VW's elif: only non-improving costs can update worst
        new_worst = jnp.where(~better & ~not_worse, m, worst)
        return (new_best, new_worst, new_arg), None

    if n_disp > 1:
        (best, worst, arg), _ = lax.scan(step, init, jnp.arange(1, n_disp))
    else:
        best, worst, arg = init

    valid = best != worst  # flat-region invalidation (Correlation.cc:121-133)
    disp = jnp.stack([arg % sx, arg // sx], axis=-1).astype(jnp.int32)
    disp = jnp.where(valid[..., None], disp, 0)
    return disp, valid, best


def best_of_search_convolution(left, right, search_volume, kernel_size,
                               cost_type: str = ABSOLUTE_DIFFERENCE,
                               census_window: int = 5,
                               return_cost: bool = False):
    """Low-level search (ref ``best_of_search_convolution``, Correlation.cc:33-137).

    ``left``: (H, W) f32; ``right``: (H+sy-1, W+sx-1) f32. Returns a
    :class:`DisparityMap` of shape (H-kh+1, W-kw+1) whose dx/dy are offsets in
    [0, sx) x [0, sy) — callers add the search-region minimum.
    """
    sx, sy, kw, kh = _check_args(search_volume, kernel_size)
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    h, w = left.shape
    if right.shape != (h + sy - 1, w + sx - 1):
        raise ArgumentErr(
            f"best_of_search_convolution: right must be (H+sy-1, W+sx-1) = "
            f"{(h + sy - 1, w + sx - 1)}, got {right.shape}")
    if cost_type not in COST_TYPES:
        raise ArgumentErr(f"Unknown cost type {cost_type!r}")
    disp, valid, best = _best_of_search(left, right, sx, sy, kw, kh, cost_type,
                                        census_window)
    if return_cost:
        return DisparityMap(disp, valid), best
    return DisparityMap(disp, valid)


def calc_disparity(cost_type: str, left_in, right_in, left_region: BBox2i,
                   search_volume, kernel_size,
                   census_window: int = 5) -> DisparityMap:
    """Region-level wrapper (ref ``calc_disparity``, Correlation.cc:330-375):
    crops left to ``left_region`` and right to
    ``left_region + search_volume - 1``, then searches. Output size is
    ``left_region.size - kernel_size + 1``.
    """
    left_in = jnp.asarray(left_in, jnp.float32)
    right_in = jnp.asarray(right_in, jnp.float32)
    sx, sy, kw, kh = _check_args(search_volume, kernel_size)
    if kw > left_region.width or kh > left_region.height:
        raise ArgumentErr("calc_disparity: Kernel size too large for active region.")
    lrs = left_region.slices()
    left = left_in[lrs]
    right_region = left_region.copy()
    right_region.max_x += sx - 1
    right_region.max_y += sy - 1
    right = right_in[right_region.slices()]
    return best_of_search_convolution(left, right, (sx, sy), (kw, kh),
                                      cost_type, census_window)
