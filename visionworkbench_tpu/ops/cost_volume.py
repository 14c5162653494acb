"""First-generation fused Pallas cost-volume kernel — SUPERSEDED by
``ops/sweep.py`` (round 3), which fixed this kernel's failure mode
(per-disparity small matmuls serialized through Mosaic) with lane-packed
per-group matmuls and BEATS the XLA engine 1.5x. This module is kept for
the offset-search variant's tests and as the documented negative result
(ref the hottest loop ``best_of_search_convolution``,
``src/vw/Stereo/Correlation.cc:62-119`` + ``fast_box_sum``,
``Stereo/Algorithms.h:41-131``; SURVEY.md section 2.13 items 1-2).

The XLA formulation re-reads the shifted right image and writes the cost
metric through HBM once per disparity. This kernel DMAs one output tile's
left block and right search block into VMEM once, then sweeps the whole
(static) disparity volume on-chip: per disparity an elementwise |L - R_d|
on the VPU, both separable box sums as banded 0/1-matrix matmuls on the
MXU (exact: products are x*1.0 and accumulation is fp32; HIGHEST precision
splits the fp32 operand), and a compare/update of the running
(best, worst, argbest) planes.  The right block advances one lane per dx
via an incremental pltpu.roll carried through the fori_loop.

Mosaic constraints shape the code: DMA start offsets must be provably
(8, 128)-aligned — dynamic per-tile offsets are aligned down and the
remainder is rolled inside VMEM; sliced sublane extents are padded to 8.

Measured (v5e, 1024^2 pipeline, tile 128): this MXU formulation runs the
full pipeline at 392 ms vs 214 ms for the chunked-volume XLA engine
(int disparities agree to 99.997%) — still ~1.8x behind, so the XLA engine
remains the default; a fully static unroll of dx was slower still (429 ms)
and cost an 18-minute remote compile.

Semantics identical to the scan path: strict-improve best (first-best wins),
worst = running max, flat invalidation via best == worst.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visionworkbench_tpu.core.exceptions import ArgumentErr


def _ceil8(x: int) -> int:
    return -(-x // 8) * 8


def _ceil128(x: int) -> int:
    return -(-x // 128) * 128


def _make_kernel(tile_h: int, tile_w: int, kw: int, kh: int,
                 sx: int, sy: int, cost_type: str):
    lh = tile_h + kh - 1          # true left-block rows
    lw = tile_w + kw - 1
    lh8 = _ceil8(lh)              # loaded (aligned) rows
    rh8 = _ceil8(lh8 + sy - 1)
    rw = lw + sx - 1
    w_all = _ceil128(rw)          # common lane width: slices stay aligned,
    #                               lane shifts become pltpu.roll

    def kernel(l_hbm, r_hbm, best_ref, worst_ref, arg_ref, l_s, r_s, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ldma = pltpu.make_async_copy(
            l_hbm.at[pl.ds(i * tile_h, lh8), pl.ds(j * tile_w, w_all)], l_s,
            sems.at[0])
        rdma = pltpu.make_async_copy(
            r_hbm.at[pl.ds(i * tile_h, rh8), pl.ds(j * tile_w, w_all)], r_s,
            sems.at[1])
        ldma.start()
        rdma.start()
        ldma.wait()
        rdma.wait()
        left = l_s[:]             # (lh8, w_all)
        # Box sums as banded 0/1 matmuls on the MXU (see _make_offset_kernel);
        # the VPU only computes the cost map and one 1-lane roll per dx.
        oi = lax.broadcasted_iota(jnp.int32, (tile_h, lh8), 0)
        ii = lax.broadcasted_iota(jnp.int32, (tile_h, lh8), 1)
        b_row = ((ii >= oi) & (ii < oi + kh)).astype(jnp.float32)
        ci = lax.broadcasted_iota(jnp.int32, (w_all, tile_w), 0)
        co = lax.broadcasted_iota(jnp.int32, (w_all, tile_w), 1)
        b_col = ((ci >= co) & (ci < co + kw)).astype(jnp.float32)

        def boxsum(c):
            # Band operands are 0/1 (exact in bf16); only the cost operand
            # needs the multi-pass split, halving MXU passes vs HIGHEST/both.
            rs = lax.dot_general(b_row, c, (((1,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
            return lax.dot_general(rs, b_col, (((1,), (0,)), ((), ())),
                                   precision=lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)

        state = (jnp.full((tile_h, tile_w), 3.4e38, jnp.float32),
                 jnp.full((tile_h, tile_w), -3.4e38, jnp.float32),
                 jnp.zeros((tile_h, tile_w), jnp.int32))

        # dy is a small static unroll; dx runs in a fori_loop carrying the
        # incrementally-rolled right block — keeps the compiled program ~sx
        # times smaller than a full unroll (remote Mosaic compiles are
        # expensive) and replaces v1's per-dx dynamic full-width roll.
        for dy in range(sy):
            r_dy = lax.slice(r_s[:], (dy, 0), (dy + lh8, w_all))

            def body(dx, carry, dy=dy):
                best, worst, arg, r_cur = carry
                if cost_type == "abs":
                    c = jnp.abs(left - r_cur)
                else:
                    dd = left - r_cur
                    c = dd * dd
                m = boxsum(c)
                d = dy * sx + dx
                better = m < best
                return (jnp.where(better, m, best),
                        jnp.maximum(worst, m),
                        jnp.where(better, d, arg),
                        pltpu.roll(r_cur, w_all - 1, 1))

            out = lax.fori_loop(0, sx, body, state + (r_dy,))
            state = out[:3]
        best_ref[:] = state[0]
        worst_ref[:] = state[1]
        arg_ref[:] = state[2]

    return kernel, lh8, w_all, rh8, w_all


@functools.partial(jax.jit, static_argnames=("sx", "sy", "kw", "kh",
                                             "cost_type", "tile", "interpret"))
def pallas_best_of_search(left, right, sx: int, sy: int, kw: int, kh: int,
                          cost_type: str = "abs", tile: int = 128,
                          interpret: bool = False):
    """Fused disparity search. ``left`` (H, W); ``right`` (H+sy-1, W+sx-1).
    Returns (disp (H-kh+1, W-kw+1, 2) int32, valid bool, best f32) matching
    the scan path's contract for abs/sq costs."""
    if cost_type not in ("abs", "sq"):
        raise ArgumentErr("pallas_best_of_search supports abs/sq costs")
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    h, w = left.shape
    out_h, out_w = h - kh + 1, w - kw + 1
    tile_h = min(tile, _ceil8(out_h))
    tile_w = min(tile, max(_ceil8(out_w), 128))
    nty = -(-out_h // tile_h)
    ntx = -(-out_w // tile_w)
    kernel, lh8, lw, rh8, rw = _make_kernel(tile_h, tile_w, kw, kh, sx, sy,
                                            cost_type)
    # Pad inputs so the last tile's blocks stay in bounds (replicate edges;
    # padded outputs are cropped away).
    need_h = (nty - 1) * tile_h + rh8
    need_w = (ntx - 1) * tile_w + rw
    lpad = jnp.pad(left, ((0, max(need_h - h, 0)), (0, max(need_w - w, 0))),
                   mode="edge")
    rpad = jnp.pad(right, ((0, max(need_h - right.shape[0], 0)),
                           (0, max(need_w - right.shape[1], 0))), mode="edge")

    out_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    best, worst, arg = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nty * tile_h, ntx * tile_w), jnp.float32),
            jax.ShapeDtypeStruct((nty * tile_h, ntx * tile_w), jnp.float32),
            jax.ShapeDtypeStruct((nty * tile_h, ntx * tile_w), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((lh8, lw), jnp.float32),
            pltpu.VMEM((rh8, rw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lpad, rpad)

    best = best[:out_h, :out_w]
    worst = worst[:out_h, :out_w]
    arg = arg[:out_h, :out_w]
    valid = best != worst
    disp = jnp.stack([arg % sx, arg // sx], -1)
    disp = jnp.where(valid[..., None], disp, 0)
    return disp, valid, best


def _make_offset_kernel(tile: int, kw: int, kh: int, sx: int, sy: int,
                        cost_type: str):
    """Kernel variant with per-tile (dx, dy) search offsets scalar-prefetched
    — the fused engine for the pyramid correlator's refine levels (the
    reference's per-zone search ranges, Correlation.h:66-99)."""
    lh = tile + kh - 1
    lh8 = _ceil8(lh)
    rh8 = _ceil8(lh8 + sy - 1)
    lw = tile + kw - 1
    w_all = _ceil128(lw + sx - 1)

    def kernel(offs_ref, l_hbm, r_hbm, best_ref, worst_ref, arg_ref,
               l_s, r_s, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nx = pl.num_programs(1)
        t = i * nx + j
        off_x = offs_ref[t, 0]
        off_y = offs_ref[t, 1]
        # Mosaic requires DMA start indices aligned to the (8, 128) tiling:
        # fetch from the aligned-down corner and roll the sub-tile remainder
        # inside VMEM (dynamic pltpu.roll shifts are allowed).
        off_y_al = (off_y // 8) * 8
        off_x_al = (off_x // 128) * 128
        rem_y = off_y - off_y_al
        rem_x = off_x - off_x_al
        ldma = pltpu.make_async_copy(
            l_hbm.at[pl.ds(i * tile, lh8), pl.ds(j * tile, w_all)], l_s,
            sems.at[0])
        rdma = pltpu.make_async_copy(
            r_hbm.at[pl.ds(i * tile + off_y_al, rh8 + 8),
                     pl.ds(j * tile + off_x_al, w_all + 128)], r_s,
            sems.at[1])
        ldma.start()
        rdma.start()
        ldma.wait()
        rdma.wait()
        r_all = pltpu.roll(r_s[:], rh8 + 8 - rem_y, 0)
        r_all = pltpu.roll(r_all, w_all + 128 - rem_x, 1)
        r_use = lax.slice(r_all, (0, 0), (rh8, w_all))
        left = l_s[:]
        # Both box sums run as banded 0/1-matrix matmuls on the MXU
        # (exact: products are x*1.0, accumulation is fp32), leaving the VPU
        # with just the cost map and a single 1-lane roll per dx — the
        # shift-add formulation spent ~30 VPU passes per disparity instead.
        oi = lax.broadcasted_iota(jnp.int32, (tile, lh8), 0)
        ii = lax.broadcasted_iota(jnp.int32, (tile, lh8), 1)
        b_row = ((ii >= oi) & (ii < oi + kh)).astype(jnp.float32)
        ci = lax.broadcasted_iota(jnp.int32, (w_all, tile), 0)
        co = lax.broadcasted_iota(jnp.int32, (w_all, tile), 1)
        b_col = ((ci >= co) & (ci < co + kw)).astype(jnp.float32)

        def boxsum(c):
            # Band operands are 0/1 (exact in bf16); only the cost operand
            # needs the multi-pass split, halving MXU passes vs HIGHEST/both.
            rs = lax.dot_general(b_row, c, (((1,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
            return lax.dot_general(rs, b_col, (((1,), (0,)), ((), ())),
                                   precision=lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)

        state = (jnp.full((tile, tile), 3.4e38, jnp.float32),
                 jnp.full((tile, tile), -3.4e38, jnp.float32),
                 jnp.zeros((tile, tile), jnp.int32))
        for dy in range(sy):
            r_dy = lax.slice(r_use, (dy, 0), (dy + lh8, w_all))

            def body(dx, carry, dy=dy):
                best, worst, arg, r_cur = carry
                if cost_type == "abs":
                    c = jnp.abs(left - r_cur)
                else:
                    dd = left - r_cur
                    c = dd * dd
                m = boxsum(c)
                d = dy * sx + dx
                better = m < best
                return (jnp.where(better, m, best),
                        jnp.maximum(worst, m),
                        jnp.where(better, d, arg),
                        pltpu.roll(r_cur, w_all - 1, 1))

            out = lax.fori_loop(0, sx, body, state + (r_dy,))
            state = out[:3]
        best_ref[:] = state[0]
        worst_ref[:] = state[1]
        arg_ref[:] = state[2]

    return kernel, lh8, rh8, w_all


@functools.partial(jax.jit, static_argnames=("tile", "s_x", "s_y", "kw", "kh",
                                             "cost_type", "interpret"))
def pallas_tiled_search(base, match, offsets, tile: int, s_x: int, s_y: int,
                        kw: int, kh: int, cost_type: str = "abs",
                        interpret: bool = False):
    """Fused per-tile offset search matching ``_tiled_search``'s contract
    (pyramid_correlation.py): ``base`` carries half-kernel padding in its
    frame; tile (ty, tx) searches ``match`` from its (pre-clamped) offset.
    Returns (disp, valid) of size (nty*tile, ntx*tile, ...); disp = offset +
    in-window argbest."""
    if cost_type not in ("abs", "sq"):
        raise ArgumentErr("pallas_tiled_search supports abs/sq costs")
    if tile % 128 != 0 and not interpret:
        raise ArgumentErr("pallas_tiled_search: tile must be a multiple of "
                          "128 (TPU output-block alignment)")
    base = jnp.asarray(base, jnp.float32)
    match = jnp.asarray(match, jnp.float32)
    nty, ntx = offsets.shape[0], offsets.shape[1]
    kernel, lh8, rh8, w_all = _make_offset_kernel(tile, kw, kh, s_x, s_y,
                                                  cost_type)
    # Pad both frames so worst-case slices stay in bounds.
    need_bh = (nty - 1) * tile + lh8
    need_bw = (ntx - 1) * tile + w_all
    bpad = jnp.pad(base, ((0, max(need_bh - base.shape[0], 0)),
                          (0, max(need_bw - base.shape[1], 0))), mode="edge")
    max_off_y = int(s_y)  # caller clamps offsets to valid range; pad generously
    need_mh = (nty - 1) * tile + rh8 + 64
    need_mw = (ntx - 1) * tile + w_all + 128
    mpad = jnp.pad(match, ((0, max(need_mh - match.shape[0], 0)),
                           (0, max(need_mw - match.shape[1], 0))), mode="edge")
    offs_flat = offsets.reshape(-1, 2).astype(jnp.int32)

    # Index maps under PrefetchScalarGridSpec receive the scalar ref too.
    out_spec = pl.BlockSpec((tile, tile), lambda i, j, offs: (i, j),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[out_spec, out_spec, out_spec],
        scratch_shapes=[
            pltpu.VMEM((lh8, w_all), jnp.float32),
            pltpu.VMEM((rh8 + 8, w_all + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    best, worst, arg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nty * tile, ntx * tile), jnp.float32),
            jax.ShapeDtypeStruct((nty * tile, ntx * tile), jnp.float32),
            jax.ShapeDtypeStruct((nty * tile, ntx * tile), jnp.int32),
        ],
        interpret=interpret,
    )(offs_flat, bpad, mpad)

    valid = best != worst
    rel = jnp.stack([arg % s_x, arg // s_x], -1)
    # add per-tile offsets back (broadcast per tile block)
    off_map = jnp.repeat(jnp.repeat(offsets.astype(jnp.int32), tile, 0), tile, 1)
    disp = rel + off_map
    disp = jnp.where(valid[..., None], disp, 0)
    return disp, valid
