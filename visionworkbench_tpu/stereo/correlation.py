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
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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

# Max per-pixel hamming cost (= code bits) per census variant/window — bounds
# the integer range for the exact-bf16 box-sum path.
_CENSUS_MAX_COST = {
    (CENSUS_TRANSFORM, 3): 8, (CENSUS_TRANSFORM, 5): 24,
    (CENSUS_TRANSFORM, 7): 48, (CENSUS_TRANSFORM, 9): 32,
    (TERNARY_CENSUS_TRANSFORM, 3): 16, (TERNARY_CENSUS_TRANSFORM, 5): 48,
    (TERNARY_CENSUS_TRANSFORM, 7): 62, (TERNARY_CENSUS_TRANSFORM, 9): 64,
}

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


def _volume_chunk(cost_fn, right_like, sx: int, d0, n: int, h: int, w: int):
    """(n, H, W) stack of per-disparity cost planes for flat disparities
    d0..d0+n-1 — one batched gather instead of n small slices."""
    def slc(dd):
        return lax.dynamic_slice(right_like, (dd // sx, dd % sx), (h, w))
    return jax.vmap(cost_fn)(jax.vmap(slc)(d0 + jnp.arange(n)))


def _volume_chunk_static(cost_fn, right_like, sx: int, d0: int, n: int,
                         h: int, w: int):
    """Like :func:`_volume_chunk` but with *static* disparity offsets: each
    plane is a ``lax.slice`` view XLA fuses into the cost computation — no
    gather through HBM (measured faster on TPU than the vmapped
    dynamic_slice, which lowers to a gather)."""
    planes = []
    for dd in range(d0, d0 + n):
        dy, dx = dd // sx, dd % sx
        planes.append(cost_fn(lax.slice(
            right_like, (dy, dx) + (0,) * (right_like.ndim - 2),
            (dy + h, dx + w) + right_like.shape[2:])))
    return jnp.stack(planes)


def _band_matrix(n_out: int, n_in: int, k: int):
    """(n_out, n_in) 0/1 band: row o sums inputs [o, o+k), built with
    in-graph iotas. NOTE(perf): building these host-side as embedded
    constants was measured SLOWER (single-level BM 123.8 -> 102.4 Mp/s on
    v5e) — XLA assigns generated bands a layout the banded einsum likes,
    while constants arrive in a layout that forces a relayout."""
    oi = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    ii = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    return ((ii >= oi) & (ii < oi + k)).astype(jnp.float32)


def _exact_int_band_einsum(spec: str, band, x, xmax: int):
    """Banded 0/1 einsum of an *integer-valued* fp32 operand, bit-exactly, in
    single-pass bf16 MXU matmuls instead of fp32 HIGHEST's 6-pass split.

    Exactness: integers up to 256 are exact in bf16 (8 significand bits), the
    band is 0/1 (exact), and the MXU accumulates bf16 products in fp32, which
    is exact for integer sums < 2^24. Operands over 256 are split into
    ``x = 256*hi + lo`` words (each ≤ 256, exact) and recombined — 2 passes.
    Used for census hamming costs (≤ 64); measured end-to-end before wiring
    in (tools_bench_configs config 4)."""
    bb = band.astype(jnp.bfloat16)
    if xmax <= 256:
        return jnp.einsum(spec, bb, x.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    hi = jnp.floor(x * (1.0 / 256.0))
    lo = x - hi * 256.0
    return (jnp.einsum(spec, bb, hi.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) * 256.0
            + jnp.einsum(spec, bb, lo.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32))


def _box_sum_volume(vol, kw: int, kh: int, box_mode: str,
                    max_int: Optional[int] = None):
    """Separable 'valid' box sum over the trailing two axes of a (..., H, W)
    cost volume. ``box_mode``:

    * ``"rw"``     — two 1D ``lax.reduce_window`` sums (O(k)/px, exact order)
    * ``"cumsum"`` — prefix-sum difference (O(1)/px; fp32 cancellation is
      benign at correlation-window magnitudes)
    * ``"mxu"``    — banded 0/1 matmuls on the MXU (fp32 HIGHEST)

    ``max_int``: when the volume is integer-valued with values in
    ``[0, max_int]`` (census hamming costs), the matmul modes switch to the
    bit-exact single-pass bf16 path (:func:`_exact_int_band_einsum`).
    """
    h, w = vol.shape[-2], vol.shape[-1]
    if not _CENSUS_BF16:
        max_int = None
    if box_mode == "mxu" and max_int is not None:
        oh, ow = h - kh + 1, w - kw + 1
        b_row = _band_matrix(oh, h, kh)
        b_col = _band_matrix(ow, w, kw)
        out = _exact_int_band_einsum("oh,...hw->...ow", b_row, vol, max_int)
        return _exact_int_band_einsum("pw,...ow->...op", b_col, out,
                                      max_int * kh)
    if box_mode in ("hybrid", "hybrid2"):
        # Mixed formulations: sublane (row) axis and lane (col) axis have
        # different fast paths on TPU; measure end-to-end per workload.
        oh, ow = h - kh + 1, w - kw + 1
        if box_mode == "hybrid":   # rows via banded MXU matmul, cols cumsum
            b_row = _band_matrix(oh, h, kh)
            out = jnp.einsum("oh,...hw->...ow", b_row, vol,
                             precision=lax.Precision.HIGHEST)
            c = jnp.cumsum(out, axis=-1)
            zcol = jnp.zeros_like(c[..., :, :1])
            cp = jnp.concatenate([zcol, c], axis=-1)
            return cp[..., :, kw:] - cp[..., :, :-kw]
        c = jnp.cumsum(vol, axis=-2)  # hybrid2: rows cumsum, cols matmul
        zrow = jnp.zeros_like(c[..., :1, :])
        cp = jnp.concatenate([zrow, c], axis=-2)
        out = cp[..., kh:, :] - cp[..., :-kh, :]
        b_col = _band_matrix(ow, w, kw).T
        return jnp.einsum("...ow,wp->...op", out, b_col,
                          precision=lax.Precision.HIGHEST)
    if box_mode == "rw":
        ones = (1,) * (vol.ndim - 2)
        out = lax.reduce_window(vol, 0.0, lax.add, ones + (kh, 1),
                                (1,) * vol.ndim, "VALID")
        return lax.reduce_window(out, 0.0, lax.add, ones + (1, kw),
                                 (1,) * vol.ndim, "VALID")
    if box_mode == "cumsum":
        c = jnp.cumsum(vol, axis=-2)
        zrow = jnp.zeros_like(c[..., :1, :])
        cp = jnp.concatenate([zrow, c], axis=-2)
        out = cp[..., kh:, :] - cp[..., :-kh, :]
        c = jnp.cumsum(out, axis=-1)
        zcol = jnp.zeros_like(c[..., :, :1])
        cp = jnp.concatenate([zcol, c], axis=-1)
        return cp[..., :, kw:] - cp[..., :, :-kw]
    if box_mode == "mxu":
        oh, ow = h - kh + 1, w - kw + 1
        b_row = _band_matrix(oh, h, kh)
        b_col = _band_matrix(ow, w, kw).T
        out = jnp.einsum("oh,...hw->...ow", b_row, vol,
                         precision=lax.Precision.HIGHEST)
        return jnp.einsum("...ow,wp->...op", out, b_col,
                          precision=lax.Precision.HIGHEST)
    raise ArgumentErr(f"unknown box_mode {box_mode!r}")


# Experiment knobs (read once at import). End-to-end measured on v5e
# (1024^2 pyramid bench, Mp/s): with output shipping in the loop, cumsum
# 12.8 < hybrid2 15.8 < hybrid 16.6; after the digest-sync bench + the
# cost-volume-reuse parabola, hybrid2 36.5 < hybrid 44.7 < mxu 55.4 — the
# all-matmul form keeps one layout through both axes (the hybrid's
# matmul->cumsum handoff costs two full relayout fusions, and the column
# cumsum lowers to an O(n^2) reduce_window at coarse levels). MXU is the
# default; re-measure modes whenever the surrounding pipeline changes.
# Disparities are bit-identical across modes on the CPU parity harness
# (all 5 cost types; tests/test_correlation.py).
_BOX_MODE = os.environ.get("VWTPU_BOX_MODE", "mxu")
_UNROLL = os.environ.get("VWTPU_UNROLL", "1") == "1"
# Exact single-pass bf16 MXU box sums for integer census costs (A/B knob;
# bit-identical to the fp32 HIGHEST path — see _exact_int_band_einsum).
# Default OFF: measured NEUTRAL on v5e (config 4 same-day A/B: 68.1 Mp/s
# fp32-HIGHEST vs 67.3 bf16) — the banded volume matmuls are HBM-bound, so
# cutting MXU passes 12 -> 3 buys nothing; kept for reuse on compute-bound
# tile shapes.
_CENSUS_BF16 = os.environ.get("VWTPU_CENSUS_BF16", "0") == "1"


@functools.partial(jax.jit, static_argnames=("sx", "sy", "kw", "kh", "cost_type",
                                             "census_window", "chunk", "unroll",
                                             "box_mode"))
def _best_of_search(left, right, sx: int, sy: int, kw: int, kh: int,
                    cost_type: str, census_window: int = 5,
                    chunk: int = 0, unroll: Optional[bool] = None,
                    box_mode: Optional[str] = None):
    """Disparity sweep. ``chunk > 0`` selects the batched-volume formulation:
    the sweep runs in chunks of ``chunk`` disparities materialized as one
    (chunk, H, W) tensor — a handful of large fused ops per chunk instead of
    per-disparity dispatches (the TPU-efficient shape; memory is bounded by
    ``chunk * H * W`` floats). ``chunk == 0`` keeps the one-at-a-time scan
    (lowest memory). ``unroll`` makes the chunk loop a Python loop with
    *static* slice offsets (fusable views instead of a gather); ``box_mode``
    picks the box-sum formulation (see :func:`_box_sum_volume`). Semantics
    identical across all paths: first-best-wins argmin, running worst = max,
    flat invalidation."""
    if unroll is None:
        unroll = _UNROLL
    if box_mode is None:
        box_mode = _BOX_MODE
    h, w = left.shape
    out_h, out_w = h - kh + 1, w - kw + 1
    n_disp = sx * sy
    is_max = cost_type == CROSS_CORRELATION

    if chunk > 0:
        left_prec = right_prec = None
        lcodes = rcodes = None
        if is_max:
            left_prec = 1.0 / box_sum_valid(left * left, kw, kh)
            right_prec = 1.0 / box_sum_valid(right * right, kw, kh)
        if cost_type in (CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM):
            lq = jnp.clip(left * 255.0, 0, 255).astype(jnp.int32)
            rq = jnp.clip(right * 255.0, 0, 255).astype(jnp.int32)
            xform = (census_transform if cost_type == CENSUS_TRANSFORM
                     else ternary_census_transform)
            lcodes = xform(lq, census_window)
            rcodes = xform(rq, census_window)

        def chunk_metrics(d0, n, static):
            if cost_type in (CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM):
                nw = rcodes.shape[-1]
                if static:
                    rvol = jnp.stack([
                        lax.slice(rcodes, (dd // sx, dd % sx, 0),
                                  (dd // sx + h, dd % sx + w, nw))
                        for dd in range(d0, d0 + n)])
                else:
                    def code_slc(dd):
                        return lax.dynamic_slice(
                            rcodes, (dd // sx, dd % sx, 0), (h, w, nw))
                    rvol = jax.vmap(code_slc)(d0 + jnp.arange(n))
                vol = hamming_distance(lcodes[None], rvol).astype(jnp.float32)
                return _box_sum_volume(
                    vol, kw, kh, box_mode,
                    max_int=_CENSUS_MAX_COST[(cost_type, census_window)])
            else:
                if cost_type == ABSOLUTE_DIFFERENCE:
                    cost_fn = lambda r: jnp.abs(left - r)          # noqa: E731
                elif cost_type == SQUARED_DIFFERENCE:
                    cost_fn = lambda r: (left - r) * (left - r)    # noqa: E731
                else:
                    cost_fn = lambda r: left * r                   # noqa: E731
                mk = _volume_chunk_static if static else _volume_chunk
                vol = mk(cost_fn, right, sx, d0, n, h, w)
            m = _box_sum_volume(vol, kw, kh, box_mode)
            if is_max:
                if static:
                    pvol = jnp.stack([
                        lax.slice(right_prec, (dd // sx, dd % sx),
                                  (dd // sx + out_h, dd % sx + out_w))
                        for dd in range(d0, d0 + n)])
                else:
                    def prec(dd):
                        return lax.dynamic_slice(
                            right_prec, (dd // sx, dd % sx), (out_h, out_w))
                    pvol = jax.vmap(prec)(d0 + jnp.arange(n))
                m = m * jnp.sqrt(left_prec[None] * pvol)
            return m

        if unroll:
            # NOTE(perf): a single variadic lax.reduce computing
            # (min, max, argmin) in one chunk read was tried here; the fused
            # form SIGABRTs this toolchain's backend ("Attempted to compile
            # convolution/iota as an elementwise vector operation") when the
            # box-sum matmul fuses into the reduce, and with an
            # optimization_barrier it loses the conv+reduce epilogue fusion
            # (single-level BM 122 -> 102 Mp/s). The separate passes below
            # keep that epilogue. (The level-0 patches path in
            # _search_with_patches DOES win with variadic reduces — its
            # volume is already materialized.)
            best = worst = arg = None
            for d0 in range(0, n_disp, chunk):
                n = min(chunk, n_disp - d0)
                m = chunk_metrics(d0, n, True)
                if is_max:
                    cb, cw = jnp.max(m, 0), jnp.min(m, 0)
                    ca = jnp.argmax(m, 0).astype(jnp.int32)
                else:
                    cb, cw = jnp.min(m, 0), jnp.max(m, 0)
                    ca = jnp.argmin(m, 0).astype(jnp.int32)
                if best is None:
                    best, worst, arg = cb, cw, ca
                else:
                    better = (cb > best) if is_max else (cb < best)
                    best = jnp.where(better, cb, best)
                    arg = jnp.where(better, d0 + ca, arg)
                    worst = (jnp.minimum(worst, cw) if is_max
                             else jnp.maximum(worst, cw))
            valid = best != worst
            disp = jnp.stack([arg % sx, arg // sx], axis=-1).astype(jnp.int32)
            disp = jnp.where(valid[..., None], disp, 0)
            return disp, valid, best

        n_chunks = -(-n_disp // chunk)

        def combine(carry, d0):
            best, worst, arg = carry
            m = chunk_metrics(d0, chunk, False)
            # mask out-of-range disparities in the ragged final chunk
            dids = d0 + jnp.arange(chunk)
            in_range = (dids < n_disp)[:, None, None]
            bad = jnp.where(is_max, -jnp.inf, jnp.inf)
            m_masked = jnp.where(in_range, m, bad)
            if is_max:
                cb = jnp.max(m_masked, 0)
                ca = jnp.argmax(m_masked, 0).astype(jnp.int32)
                cw = jnp.max(jnp.where(in_range, -m, -bad), 0) * -1
                better = cb > best
            else:
                cb = jnp.min(m_masked, 0)
                ca = jnp.argmin(m_masked, 0).astype(jnp.int32)
                cw = jnp.max(jnp.where(in_range, m, -jnp.inf), 0)
                better = cb < best
            new_best = jnp.where(better, cb, best)
            new_arg = jnp.where(better, d0 + ca, arg)
            new_worst = jnp.where(is_max, jnp.minimum(worst, cw),
                                  jnp.maximum(worst, cw))
            return (new_best, new_worst, new_arg), None

        # Derive inits from the input so the carry inherits its varying-axis
        # type under shard_map (same trick as the scan path below).
        seed = left[:out_h, :out_w] * 0.0
        init_best = seed + (-jnp.inf if is_max else jnp.inf)
        init_worst = seed + (jnp.inf if is_max else -jnp.inf)
        init = (init_best, init_worst, seed.astype(jnp.int32))
        starts = jnp.arange(n_chunks) * chunk
        (best, worst, arg), _ = lax.scan(combine, init, starts)
        valid = best != worst
        disp = jnp.stack([arg % sx, arg // sx], axis=-1).astype(jnp.int32)
        disp = jnp.where(valid[..., None], disp, 0)
        return disp, valid, best

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


def _search_with_patches(left, right, sx: int, sy: int, kw: int, kh: int,
                         cost_type: str, chunk: int,
                         box_mode: Optional[str] = None,
                         census_window: int = 5):
    """Disparity sweep over an EXTENDED ±1 disparity ring that also returns
    the 3x3 cost neighborhood of each winner for parabola subpixel.

    ``right`` must be sized (H + sy + 1, W + sx + 1): one extra disparity of
    margin on every side of the ``[0, sx) x [0, sy)`` search window, so the
    costs at ``d ± 1`` exist for every searched ``d``. Returns
    ``(disp, valid, best, patch)`` where disp/valid/best are bit-identical to
    :func:`_best_of_search` over the interior window (same first-best-wins
    argmin, running-max worst, flat invalidation) and ``patch`` is
    ``(out_h, out_w, 9)`` — the costs at ``d + (dy, dx)``, dy/dx in
    ``(-1, 0, 1)``, dx fastest.

    This is how parabola subpixel (ref ``ParabolaSubpixelView.cc:40-344``)
    becomes nearly free on TPU: the reference re-evaluates the nine window
    costs from scratch per pixel; here they are exact rows of the cost volume
    the integer sweep already computed, extracted by a fused one-hot
    contraction — no per-pixel gather, no extra box sums.

    Census costs are supported too: the patches are then census (hamming)
    costs, a deliberate deviation from the reference, whose parabola
    re-evaluates ABSOLUTE costs no matter what the correlator used — a
    hard-coded choice its own comment questions (ParabolaSubpixelView.cc:
    49-51 "TODO: Why is this hard-coded to a cost function that we did not
    use"). Fitting the quadratic on the costs that actually chose the winner
    is both cheaper (no warp gather) and self-consistent; near tile borders
    census codes see one extra pixel of real margin versus the plain sweep,
    so disp may differ within the census half-window of a tile edge.
    """
    if box_mode is None:
        box_mode = _BOX_MODE
    if cost_type not in (ABSOLUTE_DIFFERENCE, SQUARED_DIFFERENCE,
                         CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM):
        raise ArgumentErr("_search_with_patches: unsupported cost "
                          f"{cost_type!r}")
    h, w = left.shape
    out_h, out_w = h - kh + 1, w - kw + 1
    sx_e, sy_e = sx + 2, sy + 2
    n_ext = sx_e * sy_e
    # Materialize the extended box-summed volume, reduce over the interior
    # planes, then extract the 3x3 winner neighborhoods by two one-hot
    # contraction stages (rows, then columns). Alternatives measured SLOWER
    # end-to-end on v5e (1024^2 bench, clean machine): folding running
    # chunked reductions into the sweep + a lax.scan over planes for the
    # patches = 15.6 Mp/s (the scan rewrites a (9, oh, ow) carry per plane);
    # a fused-in-theory where+sum over (n, 9, oh, ow) = 11.7 Mp/s (XLA
    # materializes the broadcast); this version = 18.9 Mp/s.
    if cost_type in (CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM):
        lq = jnp.clip(left * 255.0, 0, 255).astype(jnp.int32)
        rq = jnp.clip(right * 255.0, 0, 255).astype(jnp.int32)
        xform = (census_transform if cost_type == CENSUS_TRANSFORM
                 else ternary_census_transform)
        lcodes = xform(lq, census_window)
        rcodes = xform(rq, census_window)
        nw = rcodes.shape[-1]

        def plane_cost(dd):
            code = lax.slice(rcodes, (dd // sx_e, dd % sx_e, 0),
                             (dd // sx_e + h, dd % sx_e + w, nw))
            return hamming_distance(lcodes, code).astype(jnp.float32)

        def make_chunk(d0, n):
            return jnp.stack([plane_cost(dd) for dd in range(d0, d0 + n)])

        vol_max_int = _CENSUS_MAX_COST[(cost_type, census_window)]
    else:
        if cost_type == ABSOLUTE_DIFFERENCE:
            cost_fn = lambda r: jnp.abs(left - r)          # noqa: E731
        else:
            cost_fn = lambda r: (left - r) * (left - r)    # noqa: E731

        def make_chunk(d0, n):
            return _volume_chunk_static(cost_fn, right, sx_e, d0, n, h, w)

        vol_max_int = None

    planes = []
    for d0 in range(0, n_ext, chunk):
        n = min(chunk, n_ext - d0)
        planes.append(_box_sum_volume(make_chunk(d0, n), kw, kh, box_mode,
                                      max_int=vol_max_int))
    vol = jnp.concatenate(planes, axis=0)                  # (n_ext, oh, ow)
    ve = vol.reshape(sy_e, sx_e, out_h, out_w)

    # Single-pass (best, worst, argmin) over the interior planes: one
    # variadic lax.reduce over the extended volume with the ring masked out.
    # The separate interior-slice + min/max pass + argmin pass formulation
    # cost three HBM traversals of the volume (one of them a materialized
    # interior copy); this is one. Tie-breaking is lexicographic (value,
    # plane id), i.e. first-best-wins in vi row-major order — bit-identical
    # to jnp.argmin over the interior and associative, so XLA may
    # reassociate the reduction freely.
    ys_idx = jnp.arange(sy_e, dtype=jnp.int32)[:, None, None, None]
    xs_idx = jnp.arange(sx_e, dtype=jnp.int32)[None, :, None, None]
    interior = ((ys_idx >= 1) & (ys_idx <= sy_e - 2)
                & (xs_idx >= 1) & (xs_idx <= sx_e - 2))
    inf = jnp.float32(jnp.inf)
    big_id = jnp.int32(sx * sy)
    ids = jnp.broadcast_to(
        jnp.where(interior, (ys_idx - 1) * sx + (xs_idx - 1), big_id),
        ve.shape)

    def _comb(acc, x):
        bv, wv, bi = acc
        v, wx, i = x
        lt = v < bv
        eq = v == bv
        nbi = jnp.where(lt, i, jnp.where(eq, jnp.minimum(bi, i), bi))
        return jnp.minimum(bv, v), jnp.maximum(wv, wx), nbi

    best, worst, arg = lax.reduce(
        (jnp.where(interior, ve, inf), jnp.where(interior, ve, -inf), ids),
        (inf, -inf, big_id), _comb, dimensions=(0, 1))
    valid = best != worst
    ax, ay = arg % sx, arg // sx
    disp = jnp.where(valid[..., None], jnp.stack([ax, ay], axis=-1), 0)
    # Winner coordinates in the extended grid.
    ey, ex = ay + 1, ax + 1

    def _sum_tuple(acc, x):
        return tuple(a + b for a, b in zip(acc, x))

    # All three winner rows in ONE volume read (a 3-operand variadic reduce
    # over y) instead of three separate one-hot contractions, then all nine
    # patch entries in one read of the three rows.
    zero = jnp.float32(0.0)
    rows = lax.reduce(
        tuple(jnp.where(ys_idx == (ey + r)[None, None], ve, 0.0)
              for r in (-1, 0, 1)),
        (zero,) * 3, _sum_tuple, dimensions=(0,))          # 3 x (sx_e, oh, ow)
    xs3 = jnp.arange(sx_e, dtype=jnp.int32)[:, None, None]
    patch = lax.reduce(
        tuple(jnp.where(xs3 == (ex + c)[None], rp, 0.0)
              for rp in rows for c in (-1, 0, 1)),
        (zero,) * 9, _sum_tuple, dimensions=(0,))
    return disp, valid, best, jnp.stack(patch, axis=-1)


def _auto_chunk(n_disp: int, pixels: int, cost_type: str,
                budget_bytes: float = 3.0e9) -> int:
    """Disparity-chunk size for the batched-volume sweep: as many planes per
    step as fit the working-set budget (~3 live volumes; census carries the
    extra packed-code planes). Budget 3.0e9 keeps the 1024^2 bench's level-0
    extended sweep (130 planes) in ONE chunk — the inter-chunk concat alone
    cost ~1.7 ms/frame (measured 55.4 -> 59.3 Mp/s raising 1.5e9 -> 3.0e9)."""
    per_plane = pixels * 4 * 3
    if cost_type in (CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM):
        per_plane *= 2
    return max(1, min(n_disp, int(budget_bytes / max(per_plane, 1))))


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
    if not return_cost:
        out = _maybe_pallas_search(left, right, sx, sy, kw, kh, cost_type,
                                   census_window)
        if out is not None:
            return out
    chunk = _auto_chunk(sx * sy, h * w, cost_type)
    disp, valid, best = _best_of_search(left, right, sx, sy, kw, kh, cost_type,
                                        census_window, chunk)
    if return_cost:
        return DisparityMap(disp, valid), best
    return DisparityMap(disp, valid)


def _maybe_pallas_search(left, right, sx, sy, kw, kh, cost_type,
                         census_window) -> Optional[DisparityMap]:
    """Route the uniform-window sweep through the VMEM-resident Pallas
    kernel on TPU (``ops/sweep.py``; 1.3-2x the XLA engine depending on
    cost) when the shape qualifies: any BM cost since round 4 (abs/sq/ncc
    + every census variant incl. two-word codes), frame big enough to
    amortize the tile grid, per-group working set within VMEM.
    ``VWTPU_SWEEP_PALLAS=0`` disables. Returns None to use the XLA engine
    (always on CPU — the bit-reproducible reference path the parity oracle
    pins)."""
    if os.environ.get("VWTPU_SWEEP_PALLAS", "1") != "1":
        return None
    from visionworkbench_tpu.stereo.sgm import _pallas_target_platform
    if _pallas_target_platform() != "tpu":
        return None
    from visionworkbench_tpu.ops.sweep import _CENSUS_INFO, _ceil8
    if cost_type in (CENSUS_TRANSFORM, TERNARY_CENSUS_TRANSFORM):
        if (cost_type == TERNARY_CENSUS_TRANSFORM,
                int(census_window)) not in _CENSUS_INFO:
            return None
    elif cost_type not in (ABSOLUTE_DIFFERENCE, SQUARED_DIFFERENCE,
                           CROSS_CORRELATION):
        return None
    h, w = left.shape
    out_h, out_w = h - kh + 1, w - kw + 1
    tile = 64
    if out_h < 2 * tile or out_w < 2 * tile:
        return None                      # too small to amortize the grid
    lh8 = -(-(tile + kh - 1) // 8) * 8
    w_all = -(-(tile + kw - 1 + sx - 1) // 128) * 128
    chunk_bytes = lh8 * max(_ceil8(sx), 8) * w_all * 4
    if cost_type == CROSS_CORRELATION:
        chunk_bytes *= 2                 # energy planes ride as extra lanes
    if chunk_bytes > 8 * 1024 * 1024:
        return None                      # per-group chunk beyond VMEM budget
    from visionworkbench_tpu.ops.sweep import pallas_sweep
    nty, ntx = -(-out_h // tile), -(-out_w // tile)
    offsets = jnp.zeros((nty, ntx, 2), jnp.int32)
    disp, valid, _ = pallas_sweep(left, right, offsets, tile, sx, sy, kw, kh,
                                  cost_type, want_patches=False,
                                  census_window=int(census_window))
    return DisparityMap(disp[:out_h, :out_w], valid[:out_h, :out_w])


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
