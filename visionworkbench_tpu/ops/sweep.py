"""VMEM-resident Pallas TPU kernel for the block-matching cost-volume sweep
(ref the two hottest loops: ``best_of_search_convolution``,
``src/vw/Stereo/Correlation.cc:62-119`` + ``fast_box_sum``,
``Stereo/Algorithms.h:41-131``; SURVEY.md §2.13 items 1-2).

Second-generation kernel. The round-1 kernel (``ops/cost_volume.py``) lost
1.8x to the XLA chunked-volume engine because it issued one small
(64x78)x(78x128) matmul pair PER DISPARITY, serialized through Mosaic's loop
machinery (docs/roofline.md:58-70). This kernel fixes exactly that:

* The whole per-tile cost volume lives in VMEM scratch — HBM sees only the
  left/right tile blocks in (~55 KB) and the per-tile winner products out
  (arg/best/worst + the 9-entry parabola patch), ~70x less traffic than the
  volume-materializing XLA formulation (4.6 GB/frame -> ~65 MB at 1024^2).
* Box sums run as banded 0/1-matrix matmuls BATCHED over a whole
  disparity-row group: one (T, lh8) x (lh8, ex_pad*W) MXU pass per group
  instead of ex_pad small ones.
* fp32 operands take a two-term bf16 split (``hi = bf16(x)``,
  ``lo = bf16(x - hi)``; the 0/1 band is exact in bf16) — 2 MXU passes per
  matmul instead of fp32-HIGHEST's 6. Error per box sum is ~|x|*2^-18*sqrt(k)
  — BELOW fp32 sequential-accumulation rounding, so results are
  fp32-grade (and bit-exact when costs are bf16-representable, e.g. 8-bit
  quantized inputs; see tests/test_sweep_kernel.py).
* The running (best, worst, first-argmin) reduction happens in VMEM per
  disparity-row group; the 3x3 parabola patch of each winner is extracted
  from the resident volume in one accumulation pass over the group slabs —
  no second sweep, no per-pixel gather.

Round-4 cost coverage (every first-class BM cost now runs in-kernel):

* **NCC** (``CostFunctions.h:204-236``): the numerator ``boxsum(l*r)`` and
  the right window energies ``boxsum(r*r)`` share ONE lane-packed group
  matmul (the energy planes ride as extra lanes); the left energy is two
  small banded matmuls per tile; ``cost_modification`` multiplies
  ``sqrt(1/lbox * 1/rbox)`` into the metric exactly like the XLA engine.
  Max-metric semantics (first-BEST-wins argmax, running worst = min).
  No parabola-patch mode — the XLA ``_search_with_patches`` has no NCC
  either (the reference's parabola re-evaluates SAD regardless of cost).
* **Multi-word census** (census 7, ternary 5/7/9 — 2 packed int32 words,
  ``Image/CensusTransform.h:64-300``): each word gets its own DMA/slab;
  the cost plane is the popcount-XOR sum over words. All census variants
  are single-pass-exact through the integer band matmuls (cost <= 256).

Semantics match ``stereo.correlation._search_with_patches`` /
``_best_of_search`` exactly: first-best-wins argbest over the interior
window in (dy, dx) row-major order, running worst = max (min for NCC),
flat-region invalidation via best == worst (``Correlation.cc:95-133``).

Mosaic constraints shaped the code: DMA start offsets are aligned down to
(8, 128) with the remainder rolled inside VMEM; VMEM slice extents are
(8-sublane)-aligned (the disparity-row group width ``ex_pad`` is padded to
a multiple of 8 — see the measured note at its definition: packing the
unpadded width is 2.4x slower); ``pltpu.roll`` takes non-negative shifts
only.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visionworkbench_tpu.core.exceptions import ArgumentErr

_BIGF = 3.0e38   # python floats: jnp scalars fail pallas tracing
_BIGI = 2 ** 30


def _ceil8(x: int) -> int:
    return -(-x // 8) * 8


def _ceil128(x: int) -> int:
    return -(-x // 128) * 128


def _split_dot(a_bf16, x, dims, precision: str):
    """dot_general(band, x) where ``a_bf16`` is an exact-in-bf16 0/1 band.
    ``split2``: two bf16 passes via x = hi + lo (see module docstring);
    ``highest``: one fp32 HIGHEST dot (6 passes, bit-exact reference)."""
    if precision == "highest":
        return lax.dot_general(a_bf16.astype(jnp.float32), x, dims,
                               precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    if precision == "bf16":   # single-pass (ablation / quantized-exact inputs)
        return lax.dot_general(a_bf16, x.astype(jnp.bfloat16), dims,
                               preferred_element_type=jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = lax.dot_general(a_bf16, hi, dims,
                          preferred_element_type=jnp.float32)
    return out + lax.dot_general(a_bf16, lo, dims,
                                 preferred_element_type=jnp.float32)


def _split_dot_rhs(x, b_bf16, dims, precision: str):
    """Mirror of :func:`_split_dot` with the band on the right."""
    if precision == "highest":
        return lax.dot_general(x, b_bf16.astype(jnp.float32), dims,
                               precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    if precision == "bf16":
        return lax.dot_general(x.astype(jnp.bfloat16), b_bf16, dims,
                               preferred_element_type=jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = lax.dot_general(hi, b_bf16, dims,
                          preferred_element_type=jnp.float32)
    return out + lax.dot_general(lo, b_bf16, dims,
                                 preferred_element_type=jnp.float32)


def _int_dot(a_bf16, x, dims, xmax: int, rhs: bool = False):
    """Bit-exact banded dot for INTEGER-valued fp32 operands (census
    hamming costs): integers <= 256 are exact in bf16, so one pass when
    ``xmax <= 256`` and a 256-split (x = 256*hi + lo, both exact) when
    larger — 1-2 MXU passes, exact, vs split2's fp32-grade 2 passes
    (the in-kernel twin of ``stereo.correlation._exact_int_band_einsum``)."""
    def dot(y):
        if rhs:
            return lax.dot_general(y.astype(jnp.bfloat16), a_bf16, dims,
                                   preferred_element_type=jnp.float32)
        return lax.dot_general(a_bf16, y.astype(jnp.bfloat16), dims,
                               preferred_element_type=jnp.float32)

    if xmax <= 256:
        return dot(x)
    hi = jnp.floor(x * (1.0 / 256.0))
    lo = x - hi * 256.0
    return dot(hi) * 256.0 + dot(lo)


def _popcount(x):
    """Bit-population count of int32 words (census hamming)."""
    return lax.population_count(x)


def _rollup(x, s: int, axis: int):
    """y[i] = x[(i + s) mod n] along ``axis`` (pltpu.roll takes non-negative
    DOWN shifts only, so up-shift s = roll by n - s)."""
    if s == 0:
        return x
    return pltpu.roll(x, x.shape[axis] - s, axis)


def _sliding_sum(x, k: int, axis: int):
    """out[i] = sum_{j<k} x[i+j] along ``axis`` — binary roll-tree window
    sum (2*ceil(log2 k) VPU roll+add passes; no MXU). The roll-tree's
    summation ORDER differs from both the banded matmuls and the XLA
    engine, so results are bit-exact only for integer-scaled costs whose
    window sums stay below 2^24 (order-independent in fp32 — census
    hamming, 8-bit-quantized abs); arbitrary float costs are fp32-grade.
    Entries past index n-k wrap cyclically; callers read only the valid
    prefix (out rows + k - 1 <= n guarantees every read stays in range)."""
    if k == 1:
        return x
    pows = [(1, x)]
    p, a = 1, x
    while p * 2 <= k:
        a = a + _rollup(a, p, axis)
        p *= 2
        pows.append((p, a))
    out, off, rem = None, 0, k
    for p, a in reversed(pows):
        if rem >= p:                      # each power appears <= once
            term = _rollup(a, off, axis)
            out = term if out is None else out + term
            off += p
            rem -= p
    return out


# (max per-pixel hamming cost, packed int32 words) by (ternary?, window) —
# every reference census variant (CensusTransform.h:64-300). Words follow
# image.census packing: census 3/5/9 + ternary 3 fit one word; census 7
# (48 bits) and ternary 5/7/9 (48/64/64 bits) pack two.
_CENSUS_INFO = {
    (False, 3): (8, 1), (False, 5): (24, 1), (False, 7): (48, 2),
    (False, 9): (32, 1),
    (True, 3): (16, 1), (True, 5): (48, 2), (True, 7): (64, 2),
    (True, 9): (64, 2),
}
# Legacy view (bits only) — kept for importers.
_CENSUS_BITS = {k: v[0] for k, v in _CENSUS_INFO.items()}


def _make_sweep_kernel(tile_h: int, tile_w: int, kw: int, kh: int,
                       sx: int, sy: int, cost_type: str, want_patches: bool,
                       precision: str, census_bits: int = 0,
                       boxsum: str = "matmul", n_words: int = 1):
    """Kernel factory. Extended search grid (ey, ex) in
    [0, sy_e) x [0, ex_pad): with patches the grid carries the ±1 parabola
    ring (sy_e = sy + 2, candidate disparity = off + (ex-1, ey-1)); without
    it the grid is the plain window (candidate = off + (ex, ey))."""
    ring = 1 if want_patches else 0
    sx_e, sy_e = sx + 2 * ring, sy + 2 * ring
    # Group width: multiple of 8 so every op touching the ex dim (reshape,
    # batched stage-2 matmul, reduces, vol2 slab stores) stays
    # sublane-aligned. Packing only the sx_e REAL planes (e.g. 13 vs 16 at
    # the flagship shape) measured 2.4x SLOWER (14.3 vs 6.1 ms same-day,
    # 2026-08-21): Mosaic pays misalignment relayouts on every non-8-multiple
    # sublane dim that dwarf the 19% matmul-FLOP saving. ceil8 (not pow2)
    # keeps alignment while dropping the pure pow2 padding (33 -> 40, not 64).
    ex_pad = max(_ceil8(sx_e), 8)
    is_max = cost_type == "ncc"
    # NCC rides the right-window energy planes as extra lanes of the same
    # group matmuls: chunk width doubles, one MXU pass covers both.
    n_lanes = 2 * ex_pad if is_max else ex_pad
    lh = tile_h + kh - 1
    lw = tile_w + kw - 1
    lh8 = _ceil8(lh)
    rh8 = _ceil8(lh8 + sy_e - 1)
    w_all = _ceil128(lw + sx_e - 1)
    n_groups = sy_e
    # interior (searched-window) bounds in extended coords
    ex_lo, ex_hi = ring, ring + sx - 1
    ey_lo, ey_hi = ring, ring + sy - 1

    def kernel(offs_ref, *refs):
        l_hbms = refs[:n_words]
        r_hbms = refs[n_words:2 * n_words]
        rest = refs[2 * n_words:]
        arg_ref, best_ref, worst_ref = rest[0], rest[1], rest[2]
        if want_patches:
            pat_refs = rest[3:12]
            scr = rest[12:]
        else:
            scr = rest[3:]
        l_ss = scr[:n_words]
        r_ss = scr[n_words:2 * n_words]
        if want_patches:
            vol2, sems = scr[2 * n_words], scr[2 * n_words + 1]
        else:
            sems = scr[2 * n_words]
        i = pl.program_id(0)
        j = pl.program_id(1)
        nx = pl.num_programs(1)
        t = i * nx + j
        off_x = offs_ref[0, t]
        off_y = offs_ref[1, t]

        # ---- DMA (aligned-down starts; remainder rolled in VMEM) ----------
        bx = j * tile_w
        bx_al = (bx // 128) * 128
        brem = bx - bx_al
        ry = i * tile_h + off_y
        rx = bx + off_x
        ry_al = (ry // 8) * 8
        rx_al = (rx // 128) * 128
        rrem_y = ry - ry_al
        rrem_x = rx - rx_al
        dmas = []
        for wi in range(n_words):
            dmas.append(pltpu.make_async_copy(
                l_hbms[wi].at[pl.ds(i * tile_h, lh8),
                              pl.ds(bx_al, w_all + 128)],
                l_ss[wi], sems.at[2 * wi]))
            dmas.append(pltpu.make_async_copy(
                r_hbms[wi].at[pl.ds(ry_al, rh8 + 8),
                              pl.ds(rx_al, w_all + 128)],
                r_ss[wi], sems.at[2 * wi + 1]))
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()
        lefts, r_uses = [], []
        for wi in range(n_words):
            l_all = pltpu.roll(l_ss[wi][:], w_all + 128 - brem, 1)
            lefts.append(lax.slice(l_all, (0, 0), (lh8, w_all)))
            r_all = pltpu.roll(r_ss[wi][:], rh8 + 8 - rrem_y, 0)
            r_all = pltpu.roll(r_all, w_all + 128 - rrem_x, 1)
            r_uses.append(lax.slice(r_all, (0, 0), (rh8, w_all)))
        left = lefts[0]

        # ---- banded box-sum matrices (in-kernel iotas; bf16-exact 0/1) ----
        rows_mm = boxsum in ("matmul", "roll_cols")
        cols_mm = boxsum in ("matmul", "roll_rows")
        if rows_mm:
            oi = lax.broadcasted_iota(jnp.int32, (tile_h, lh8), 0)
            ii = lax.broadcasted_iota(jnp.int32, (tile_h, lh8), 1)
            b_row = ((ii >= oi) & (ii < oi + kh)).astype(jnp.bfloat16)
        if cols_mm:
            ci = lax.broadcasted_iota(jnp.int32, (w_all, tile_w), 0)
            co = lax.broadcasted_iota(jnp.int32, (w_all, tile_w), 1)
            b_col = ((ci >= co) & (ci < co + kw)).astype(jnp.bfloat16)

        lprec = None
        if is_max:
            # Left window energies once per tile (NCCCost's precomputed
            # inverse energies, CostFunctions.h:204-236); two small banded
            # matmuls. Same op order as the XLA engine: 1/boxsum first,
            # sqrt(lprec * rprec) multiplied into the metric.
            l2 = left * left
            if rows_mm:
                lrow = _split_dot(b_row, l2, (((1,), (0,)), ((), ())),
                                  precision)
            else:
                lrow = lax.slice(_sliding_sum(l2, kh, 0), (0, 0),
                                 (tile_h, w_all))
            if cols_mm:
                lbox = _split_dot_rhs(lrow, b_col, (((1,), (0,)), ((), ())),
                                      precision)
            else:
                lbox = lax.slice(_sliding_sum(lrow, kw, 1), (0, 0),
                                 (tile_h, tile_w))
            lprec = 1.0 / lbox

        bad = -_BIGF if is_max else _BIGF
        best = jnp.full((tile_h, tile_w), bad, jnp.float32)
        worst = jnp.full((tile_h, tile_w), -bad, jnp.float32)
        argp = jnp.zeros((tile_h, tile_w), jnp.int32)

        exm3 = lax.broadcasted_iota(jnp.int32, (tile_h, ex_pad, tile_w), 1)
        in_ex = (exm3 >= ex_lo) & (exm3 <= ex_hi)

        for ey in range(n_groups):
            if cost_type == "ncc":
                # r*r keeps its operand's layout: a bare (ey, 0) slice
                # carries a sublane offset that mismatches the rolled
                # planes in the chunk concat (Mosaic "offset mismatch on
                # non-concat dimension"). Roll-normalize the group slice
                # to offset {0,0} instead (costs one sublane roll/group).
                r_eys = [lax.slice(_rollup(r, ey, 0), (0, 0), (lh8, w_all))
                         for r in r_uses]
            else:
                r_eys = [lax.slice(r, (ey, 0), (ey + lh8, w_all))
                         for r in r_uses]
            planes = []
            en_planes = []
            r_curs = list(r_eys)
            # Independent rolls from the group base (default): the
            # round-3 incremental chain serialized ex_pad single-lane
            # rolls; independent shifts schedule in parallel (measured
            # 6.04 -> 5.79 ms at the flagship stage, same-day A/B;
            # VWTPU_SWEEP_CHAINROLL=1 keeps the chain measurable).
            chain = os.environ.get("VWTPU_SWEEP_CHAINROLL", "0") == "1"
            for ex in range(ex_pad):
                if ex > 0:
                    if chain:
                        r_curs = [pltpu.roll(rc, w_all - 1, 1)
                                  for rc in r_curs]
                    else:
                        r_curs = [_rollup(rb, ex, 1) for rb in r_eys]
                if ex < sx_e:
                    if cost_type == "abs":
                        planes.append(jnp.abs(left - r_curs[0]))
                    elif cost_type == "census":
                        c = _popcount(jnp.bitwise_xor(left, r_curs[0]))
                        for wi in range(1, n_words):
                            c = c + _popcount(
                                jnp.bitwise_xor(lefts[wi], r_curs[wi]))
                        planes.append(c.astype(jnp.float32))
                    elif cost_type == "ncc":
                        planes.append(left * r_curs[0])
                        en_planes.append(r_curs[0] * r_curs[0])
                    else:
                        d = left - r_curs[0]
                        planes.append(d * d)
                else:
                    planes.append(planes[-1])   # pad plane, never selected
                    if is_max:
                        en_planes.append(en_planes[-1])
            # Lane-pack the group's planes side by side: stage 1 becomes ONE
            # clean (tile, lh8) x (lh8, n_lanes*W) 2D matmul instead of
            # ex_pad small ones serialized through Mosaic (the round-1
            # kernel's failure mode; measured ~10% MXU efficiency). NCC's
            # energy planes append after the cost planes — same matmul.
            chunk2d = jnp.concatenate(planes + en_planes, axis=1)
            # Stage 1 (row sums): banded matmul or pure-VPU roll-tree
            # window sums (bit-exact for integer-scaled costs only; see
            # _sliding_sum). See the measured A/B note at ``boxsum``.
            if rows_mm:
                if cost_type == "census":    # integer: exact 1-2 passes
                    rs2d = _int_dot(b_row, chunk2d, (((1,), (0,)), ((), ())),
                                    census_bits)
                else:
                    rs2d = _split_dot(b_row, chunk2d, (((1,), (0,)), ((), ())),
                                      precision)         # (tile, n_lanes*W)
            else:
                rows = _sliding_sum(chunk2d, kh, 0)       # (lh8, n_lanes*W)
                rs2d = lax.slice(rows, (0, 0), (tile_h, n_lanes * w_all))
            rs = rs2d.reshape(tile_h, n_lanes, w_all)
            # Stage 2 (column sums)
            if cols_mm:
                if cost_type == "census":
                    cs = _int_dot(b_col, rs, (((2,), (0,)), ((), ())),
                                  census_bits * kh, rhs=True)
                else:
                    cs = _split_dot_rhs(rs, b_col, (((2,), (0,)), ((), ())),
                                        precision)     # (tile, n_lanes, T)
            else:
                csw = _sliding_sum(rs, kw, 2)             # (tile, n_l, W)
                cs = lax.slice(csw, (0, 0, 0), (tile_h, n_lanes, tile_w))
            if is_max:
                num = lax.slice(cs, (0, 0, 0), (tile_h, ex_pad, tile_w))
                ren = lax.slice(cs, (0, ex_pad, 0),
                                (tile_h, 2 * ex_pad, tile_w))
                cs = num * jnp.sqrt(lprec[:, None, :] * (1.0 / ren))
            if want_patches:
                vol2[:, ey * ex_pad:(ey + 1) * ex_pad, :] = cs
            if ey_lo <= ey <= ey_hi:
                cmin = jnp.where(in_ex, cs, bad)
                if is_max:
                    gbest = jnp.max(cmin, axis=1, keepdims=True)
                    gworst = jnp.min(jnp.where(in_ex, cs, _BIGF), axis=1)
                else:
                    gbest = jnp.min(cmin, axis=1, keepdims=True)
                    gworst = jnp.max(jnp.where(in_ex, cs, -_BIGF), axis=1)
                ids = jnp.where(cmin == gbest, exm3, _BIGI)
                exarg = jnp.min(ids, axis=1)             # first-best ex
                g = gbest[:, 0, :]
                better = (g > best) if is_max else (g < best)
                best = jnp.where(better, g, best)
                argp = jnp.where(better, ey * ex_pad + exarg, argp)
                worst = (jnp.minimum(worst, gworst) if is_max
                         else jnp.maximum(worst, gworst))

        arg_ref[0, 0] = argp
        best_ref[0, 0] = best
        worst_ref[0, 0] = worst

        if want_patches:
            ey_w = argp // ex_pad                        # (tile, tile)
            ex_w = argp - ey_w * ex_pad
            eyk = ey_w[:, None, :]
            exk = ex_w[:, None, :]
            # One accumulation pass over the resident volume: each group
            # slab is read ONCE and routed to whichever of the three winner
            # rows (ey-1, ey, ey+1) it matches (round-3 did 3 x n_groups
            # masked sweeps — 3x the VMEM slab reads for the same selects).
            rows3 = [jnp.zeros((tile_h, ex_pad, tile_w), jnp.float32)
                     for _ in range(3)]
            for g in range(n_groups):
                slab = vol2[:, g * ex_pad:(g + 1) * ex_pad, :]
                d = eyk - g
                rows3[0] = rows3[0] + jnp.where(d == 1, slab, 0.0)
                rows3[1] = rows3[1] + jnp.where(d == 0, slab, 0.0)
                rows3[2] = rows3[2] + jnp.where(d == -1, slab, 0.0)
            for ri, row in enumerate(rows3):
                for c in (-1, 0, 1):
                    k = ri * 3 + (c + 1)
                    pat_refs[k][0, 0] = jnp.sum(
                        jnp.where(exm3 == exk + c, row, 0.0), axis=1)

    return kernel, lh8, rh8, w_all, ex_pad


def pallas_sweep(base, match, offsets, tile: int, s_x: int, s_y: int,
                 kw: int, kh: int, cost_type: str = "abs",
                 want_patches: bool = True, precision: str = "split2",
                 census_window: int = 5, tile_w: int = None,
                 interpret: bool = False, boxsum: str = None,
                 patches_as_planes: bool = False):
    """Fused per-tile disparity sweep, matching the contracts of
    ``stereo.pyramid_correlation._tiled_search_patches`` (``want_patches``)
    and ``_tiled_search`` (plain window).

    ``base``: padded left frame — tile (ty, tx) reads rows
    ``ty*tile .. ty*tile + tile + kh - 2``. ``match``: the frame searched;
    with patches its origin is shifted (-1, -1) and each tile window covers
    the ±1 ring (size ``tile + k - 1 + s + 1`` per axis), exactly like the
    XLA path. ``offsets`` (nty, ntx, 2) int32 per-tile (dx, dy), pre-clamped
    by the caller.

    Costs: abs/sq/ncc + every census/ternary-census window (multi-word
    codes ride extra DMA slabs). NCC is ``want_patches=False`` only — the
    XLA patches engine has no NCC either (the reference's parabola subpixel
    re-evaluates SAD regardless of correlator cost,
    ParabolaSubpixelView.cc:49-51).

    Returns ``(disp, valid, patch)`` with patch None when
    ``want_patches=False``; sizes (nty*tile, ntx*tile, ...); disp = offset +
    in-window argbest (int32).

    This thin un-jitted wrapper resolves the ``VWTPU_SWEEP_BOXSUM`` env
    default BEFORE the jitted core so the resolved value is a static cache
    key (changing the env var mid-process takes effect on the next call,
    not just in fresh processes).
    """
    if cost_type not in ("abs", "sq", "census", "ternary_census", "ncc"):
        raise ArgumentErr("pallas_sweep supports abs/sq/ncc/census costs")
    if cost_type == "ncc" and want_patches:
        raise ArgumentErr(
            "pallas_sweep: NCC has no parabola-patch mode (parity target "
            "_search_with_patches is SAD/SSD/census only); use "
            "want_patches=False")
    if boxsum is None:
        boxsum = os.environ.get("VWTPU_SWEEP_BOXSUM", "matmul")
    if boxsum not in ("matmul", "roll", "roll_cols", "roll_rows"):
        raise ArgumentErr(
            "pallas_sweep boxsum must be matmul/roll/roll_cols/roll_rows")
    if tile_w is None:
        tile_w = tile
    return _pallas_sweep(base, match, offsets, tile=tile, s_x=s_x, s_y=s_y,
                         kw=kw, kh=kh, cost_type=cost_type,
                         want_patches=want_patches, precision=precision,
                         census_window=census_window, tile_w=tile_w,
                         interpret=interpret, boxsum=boxsum,
                         patches_as_planes=patches_as_planes)


@functools.partial(jax.jit, static_argnames=(
    "tile", "s_x", "s_y", "kw", "kh", "cost_type", "want_patches",
    "precision", "census_window", "tile_w", "interpret", "boxsum",
    "patches_as_planes"))
def _pallas_sweep(base, match, offsets, tile: int, s_x: int, s_y: int,
                  kw: int, kh: int, cost_type: str,
                  want_patches: bool, precision: str,
                  census_window: int, tile_w: int,
                  interpret: bool, boxsum: str,
                  patches_as_planes: bool = False):
    census_bits = 0
    n_words = 1
    if cost_type in ("census", "ternary_census"):
        key = (cost_type == "ternary_census", int(census_window))
        if key not in _CENSUS_INFO:
            raise ArgumentErr(
                f"pallas_sweep: unknown census variant {key}")
        census_bits, n_words = _CENSUS_INFO[key]
        from visionworkbench_tpu.image.census import (
            census_transform, ternary_census_transform,
        )

        def _codes(img):
            q = jnp.clip(jnp.asarray(img, jnp.float32) * 255.0,
                         0, 255).astype(jnp.int32)
            if cost_type == "ternary_census":
                c = ternary_census_transform(q, int(census_window))
            else:
                c = census_transform(q, int(census_window))
            return [lax.bitcast_convert_type(c[..., wi], jnp.int32)
                    for wi in range(n_words)]

        # Codes are computed on the FULL frames (global supports) — unlike
        # the XLA tiled path whose per-tile census sees replicated crop
        # edges within the census half-window of tile borders (the
        # documented _search_with_patches deviation); interior pixels are
        # identical.
        bases = _codes(base)
        matches = _codes(match)
        in_dtype = jnp.int32
        cost_kernel = "census"
    else:
        bases = [jnp.asarray(base, jnp.float32)]
        matches = [jnp.asarray(match, jnp.float32)]
        in_dtype = jnp.float32
        cost_kernel = cost_type
    tile_h = tile
    nty, ntx = offsets.shape[0], offsets.shape[1]
    kernel, lh8, rh8, w_all, ex_pad = _make_sweep_kernel(
        tile_h, tile_w, kw, kh, s_x, s_y, cost_kernel, want_patches,
        precision, census_bits, boxsum, n_words)
    ring = 1 if want_patches else 0
    sy_e = s_y + 2 * ring

    # Pad frames so worst-case (aligned-down + extended) DMAs stay in bounds.
    bh, bw = bases[0].shape
    need_bh = (nty - 1) * tile_h + lh8
    need_bw = _ceil128((ntx - 1) * tile_w) + w_all + 128
    bpads = [jnp.pad(b, ((0, max(need_bh - bh, 0)),
                         (0, max(need_bw - bw, 0))), mode="edge")
             for b in bases]
    mh_in, mw_in = matches[0].shape
    need_mh = (nty - 1) * tile_h + rh8 + 8 + s_y + sy_e
    need_mw = _ceil128((ntx - 1) * tile_w) + w_all + 256
    mpads = [jnp.pad(m, ((0, max(need_mh - mh_in, 0)),
                         (0, max(need_mw - mw_in, 0))), mode="edge")
             for m in matches]
    # (2, N) not (N, 2): an SMEM prefetch array pads its MINOR dim to 128
    # words, so (N, 2) costs N*512 B and blows the 1 MB SMEM budget at the
    # 4096^2 frame's 64x64 tile grid (measured: 'prefetched SMEM operand
    # 0' u8[2097152] > 1048576); the transposed layout is N*8 B.
    offs_flat = offsets.reshape(-1, 2).astype(jnp.int32).T

    out4 = pl.BlockSpec((1, 1, tile_h, tile_w),
                        lambda i, j, offs: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    f32t = jax.ShapeDtypeStruct((nty, ntx, tile_h, tile_w), jnp.float32)
    i32t = jax.ShapeDtypeStruct((nty, ntx, tile_h, tile_w), jnp.int32)
    n_out = 12 if want_patches else 3
    scratch = (
        [pltpu.VMEM((lh8, w_all + 128), in_dtype)] * n_words
        + [pltpu.VMEM((rh8 + 8, w_all + 128), in_dtype)] * n_words
    )
    if want_patches:
        scratch.append(pltpu.VMEM((tile_h, sy_e * ex_pad, tile_w),
                                  jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2 * n_words,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (2 * n_words),
        out_specs=[out4] * n_out,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[i32t, f32t, f32t] + ([f32t] * 9 if want_patches else []),
        compiler_params=pltpu.CompilerParams(
            # The resident volume + batched-matmul temporaries exceed the
            # conservative 16 MB default scoped-vmem budget; the chip has
            # plenty (measured: 21 MB at the flagship shape compiles fine
            # with the cap raised).
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(offs_flat, *bpads, *mpads)
    argp, best, worst = outs[0], outs[1], outs[2]

    def untile(a):
        return a.transpose(0, 2, 1, 3).reshape(nty * tile_h, ntx * tile_w)

    argp, best, worst = untile(argp), untile(best), untile(worst)
    valid = best != worst
    ey = argp // ex_pad
    ex = argp - ey * ex_pad
    rel = jnp.stack([ex - ring, ey - ring], -1)
    off_map = jnp.repeat(jnp.repeat(offsets.astype(jnp.int32), tile_h, 0),
                         tile_w, 1)
    # contract parity with _tiled_search(_patches): the in-window argbest is
    # zeroed where invalid BEFORE the per-tile offset is added (invalid
    # pixels carry their tile offset, which downstream masks ignore)
    disp = jnp.where(valid[..., None], rel, 0) + off_map
    patch = None
    if want_patches:
        if patches_as_planes:
            # tuple of nine (H, W) planes: the parabola fit consumes them
            # directly (stereo/subpixel._fit_parabola planes form), skipping
            # the (H, W, 9) stack materialization.
            patch = tuple(untile(p) for p in outs[3:12])
        else:
            patch = jnp.stack([untile(p) for p in outs[3:12]], axis=-1)
    return disp, valid, patch
