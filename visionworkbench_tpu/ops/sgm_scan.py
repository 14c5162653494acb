"""Pallas TPU kernels for the SGM/MGM aggregation scans
(ref ``SemiGlobalMatcher::accum_sgm_multithread`` /
``accum_mgm_multithread``, SGM.cc:2462-2700 — the scanline sweeps; here each
whole multi-direction sweep runs as ONE kernel with the recurrence carry
resident in VMEM scratch).

Why: the XLA ``lax.scan`` formulation pays ~2 µs/step of while-loop machinery
plus a small (20 KB) ``dynamic_update_slice`` per step against ~0.15 µs of
actual VPU work — the 512-step scans are latency-bound, 2.4 ms of the 3.19 ms
SGM frame (docs/roofline.md). A Pallas sequential grid is a hardware loop:
the grid dimension iterates on-chip, the carry lives in VMEM scratch across
grid steps, and block outputs pipeline with compute.

Semantics are identical to ``stereo.sgm``'s lax.scan engines (same update
math; the reverse direction's step t writes output column N-1-t so the
result is pre-aligned; the caller adds the two output arrays).

NOTE: ``_grid_min3`` / ``_path_update`` / the lane shift are twins of the
pure-jnp helpers in ``stereo/sgm.py`` — the pallas copies differ only in
Python-float scalars (jnp scalars become captured constants and fail pallas
tracing) and the pltpu.roll lane shift. Any P1/P2/BAD semantic change must
be made in BOTH modules; equivalence is pinned bit-exactly by
tests/test_sgm.py (interpret-mode kernels vs lax.scan).
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


def _shift_lane_kernel(a, d: int, bad: float):
    """out[..., i] = a[..., i-d] with ``bad`` fill — pltpu.roll (non-negative
    shifts only on this toolchain) + an iota edge mask."""
    if d == 0:
        return a
    nl = a.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    if d > 0:
        rolled = pltpu.roll(a, d, axis=a.ndim - 1)
        return jnp.where(lane < d, bad, rolled)
    rolled = pltpu.roll(a, nl + d, axis=a.ndim - 1)
    return jnp.where(lane >= nl + d, bad, rolled)


def _grid_min3(p, bad: float):
    """Exact 3x3 neighborhood min over the (sy, sx) axes of (..., sy, sx, L);
    out-of-grid neighbors count as ``bad`` (twin of stereo.sgm._grid_min3)."""
    sy, sx = p.shape[-3], p.shape[-2]
    q = p
    if sy > 1:
        big = jnp.full_like(p[..., :1, :, :], bad)
        q = jnp.minimum(q, jnp.concatenate([big, p[..., :-1, :, :]], -3))
        q = jnp.minimum(q, jnp.concatenate([p[..., 1:, :, :], big], -3))
    if sx > 1:
        big = jnp.full_like(q[..., :, :1, :], bad)
        r = jnp.minimum(q, jnp.concatenate([big, q[..., :, :-1, :]], -2))
        q = jnp.minimum(r, jnp.concatenate([q[..., :, 1:, :], big], -2))
    return q


def _path_update(prior, cost, pdiff, p1: float, p2: float, bad: float):
    """C + min(prior, nbhd3x3(prior)+P1, min_prior+P2') - min_prior with
    P2' = max(P2 // max(|dI|, 1), P1) — integer division like the
    reference's uint16 ``p2_mod /=`` (ref evaluate_path, SGM.cc:806-850)."""
    min_prior = jnp.min(prior, axis=(-3, -2))                    # (..., L)
    p2m = jnp.maximum(jnp.floor(p2 / jnp.maximum(pdiff, 1.0)), p1)
    nb = _grid_min3(prior, bad) + p1
    best = jnp.minimum(jnp.minimum(prior, nb),
                       (min_prior + p2m)[..., None, None, :])
    return cost + (best - min_prior[..., None, None, :])


def _make_kernel(b: int, sy: int, sx: int, nl: int, shifts: Tuple[int, ...],
                 p1: float, p2: float, bad: float, tb: int):
    def step(c, cost, pd):
        prior = jnp.stack([_shift_lane_kernel(c[:, i], s, bad)
                           for i, s in enumerate(shifts)], 1)
        out = _path_update(prior, cost[:, None], pd, p1, p2, bad)
        return jnp.where(cost[:, None] >= bad, bad, out)

    def kernel(cf_ref, cr_ref, pf_ref, pr_ref, yf_ref, yr_ref, carry):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            carry[:] = jnp.full((2, b, sy, sx, nl), bad, jnp.float32)

        if tb == 1:
            out = step(carry[:], jnp.stack([cf_ref[0], cr_ref[0]], 0),
                       jnp.stack([pf_ref[0], pr_ref[0]], 0))
            carry[:] = out
            yf_ref[0] = jnp.sum(out[0], 0)
            yr_ref[0] = jnp.sum(out[1], 0)
        else:
            # Multi-column block: the sequential recurrence runs in an
            # in-kernel fori_loop (register loop) so the per-grid-step
            # pipeline overhead amortizes over tb columns.
            def body(i, c):
                out = step(c, jnp.stack([cf_ref[i], cr_ref[tb - 1 - i]], 0),
                           jnp.stack([pf_ref[i], pr_ref[tb - 1 - i]], 0))
                yf_ref[i] = jnp.sum(out[0], 0)
                yr_ref[tb - 1 - i] = jnp.sum(out[1], 0)
                return out

            carry[:] = lax.fori_loop(0, tb, body, carry[:])

    return kernel


# Columns per grid step: >1 amortizes Mosaic's per-grid-step pipeline cost
# over an in-kernel register loop. Measured ~2% (tb=8) on the 512^2 SGM
# bench — kept as an A/B knob, default 1 (docs/roofline.md).
_TB = int(os.environ.get("VWTPU_SGM_TB", "1"))


@functools.partial(jax.jit, static_argnames=("shifts", "p1", "p2", "bad",
                                             "interpret", "tb"))
def pallas_scan_bidir(cost_t, pdiffs_f, pdiffs_r, shifts: Tuple[int, ...],
                      p1: float, p2: float, bad: float,
                      interpret: bool = False, tb: int = None):
    """Drop-in replacement for ``stereo.sgm._scan_bidir``: both directions of
    all ``shifts`` path directions in one Pallas kernel.

    ``cost_t`` (N, sy, sx, L); ``pdiffs_f``/``pdiffs_r`` (N, B, L). Returns
    the per-step sum over directions of both groups, (N, sy, sx, L).
    """
    n, sy, sx, nl = cost_t.shape
    b = pdiffs_f.shape[1]
    assert b == len(shifts)
    if tb is None:
        tb = _TB
    if tb < 1 or n % tb != 0:
        tb = 1
    kernel = _make_kernel(b, sy, sx, nl, tuple(shifts), float(p1), float(p2),
                          float(bad), tb)
    ng = n // tb
    fwd = lambda t: (t, 0, 0, 0)                       # noqa: E731
    rev = lambda t: (ng - 1 - t, 0, 0, 0)              # noqa: E731
    fwd3 = lambda t: (t, 0, 0)                         # noqa: E731
    rev3 = lambda t: (ng - 1 - t, 0, 0)                # noqa: E731
    yf, yr = pl.pallas_call(
        kernel,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((tb, sy, sx, nl), fwd),
            pl.BlockSpec((tb, sy, sx, nl), rev),
            pl.BlockSpec((tb, b, nl), fwd3),
            pl.BlockSpec((tb, b, nl), rev3),
        ],
        out_specs=[
            pl.BlockSpec((tb, sy, sx, nl), fwd),
            pl.BlockSpec((tb, sy, sx, nl), rev),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, sy, sx, nl), jnp.float32),
            jax.ShapeDtypeStruct((n, sy, sx, nl), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, b, sy, sx, nl), jnp.float32)],
        interpret=interpret,
    )(cost_t, cost_t, pdiffs_f, pdiffs_r)
    return yf + yr


def _mgm_step(carry, cx, px, gx, shifts: Tuple[int, int],
              p1: float, p2: float, bad: float):
    """One MGM task step (twin of the steps in stereo.sgm._mgm_plain_scan /
    _mgm_sheared_scan): integer-average of the two prior-shift evaluations,
    guard-reset to local cost, absent-candidate forcing."""
    a = _path_update(_shift_lane_kernel(carry, shifts[0], bad), cx, px,
                     p1, p2, bad)
    b = _path_update(_shift_lane_kernel(carry, shifts[1], bad), cx, px,
                     p1, p2, bad)
    out = jnp.floor((a + b) * 0.5)
    out = jnp.where(gx[..., None, None, :], out, cx)
    return jnp.where(cx >= bad, bad, out)


@functools.partial(jax.jit, static_argnames=("shifts", "p1", "p2", "bad",
                                             "interpret"))
def pallas_mgm_bidir(cost_t, pd_f, pd_r, g_f, g_r, shifts: Tuple[int, int],
                     p1: float, p2: float, bad: float,
                     interpret: bool = False):
    """Hardware-loop twin of ``stereo.sgm._mgm_plain_scan``: the forward and
    reverse diagonal-pair MGM tasks in one kernel. ``cost_t`` (N, sy, sx, L);
    ``pd_*``/``g_*`` (N, L). Returns the summed (N, sy, sx, L)."""
    n, sy, sx, nl = cost_t.shape

    def kernel(cf, cr, pf, pr, gf, gr, yf, yr, carry):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            carry[:] = jnp.full((2, sy, sx, nl), bad, jnp.float32)

        cx = jnp.stack([cf[0], cr[0]], 0)
        px = jnp.stack([pf[0, 0], pr[0, 0]], 0)
        gx = jnp.stack([gf[0, 0], gr[0, 0]], 0) > 0
        out = _mgm_step(carry[:], cx, px, gx, shifts, p1, p2, bad)
        carry[:] = out
        yf[0] = out[0]
        yr[0] = out[1]

    fwd = lambda t: (t, 0, 0, 0)                       # noqa: E731
    rev = lambda t: (n - 1 - t, 0, 0, 0)               # noqa: E731
    fwd3 = lambda t: (t, 0, 0)                         # noqa: E731
    rev3 = lambda t: (n - 1 - t, 0, 0)                 # noqa: E731
    # pd/guard ride as (N, 1, L): Mosaic requires the last TWO block dims
    # to divide (8, 128) or equal the array dims — a 2D (1, L) block puts
    # the 1 in the sublane slot and fails at L < 128.
    gf32 = g_f.astype(jnp.float32)[:, None, :]
    gr32 = g_r.astype(jnp.float32)[:, None, :]
    pf3 = pd_f[:, None, :]
    pr3 = pd_r[:, None, :]
    yf, yr = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, sy, sx, nl), fwd),
            pl.BlockSpec((1, sy, sx, nl), rev),
            pl.BlockSpec((1, 1, nl), fwd3),
            pl.BlockSpec((1, 1, nl), rev3),
            pl.BlockSpec((1, 1, nl), fwd3),
            pl.BlockSpec((1, 1, nl), rev3),
        ],
        out_specs=[
            pl.BlockSpec((1, sy, sx, nl), fwd),
            pl.BlockSpec((1, sy, sx, nl), rev),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, sy, sx, nl), jnp.float32),
            jax.ShapeDtypeStruct((n, sy, sx, nl), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, sy, sx, nl), jnp.float32)],
        interpret=interpret,
    )(cost_t, cost_t, pf3, pr3, gf32, gr32)
    return yf + yr


@functools.partial(jax.jit, static_argnames=("shifts", "p1", "p2", "bad",
                                             "interpret"))
def pallas_mgm_fwd(cost_t, pd_t, g_t, shifts: Tuple[int, int],
                   p1: float, p2: float, bad: float,
                   interpret: bool = False):
    """Hardware-loop twin of the sheared-scan body in
    ``stereo.sgm._mgm_sheared_scan``: a forward column scan over a batch of
    B pre-flipped orientations. ``cost_t`` (N, B, sy, sx, L);
    ``pd_t``/``g_t`` (N, B, L). Returns (N, B, sy, sx, L)."""
    n, b, sy, sx, nl = cost_t.shape

    def kernel(c_ref, p_ref, g_ref, y_ref, carry):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            carry[:] = jnp.full((b, sy, sx, nl), bad, jnp.float32)

        out = _mgm_step(carry[:], c_ref[0], p_ref[0], g_ref[0] > 0,
                        shifts, p1, p2, bad)
        carry[:] = out
        y_ref[0] = out

    fwd5 = lambda t: (t, 0, 0, 0, 0)                   # noqa: E731
    fwd3 = lambda t: (t, 0, 0)                         # noqa: E731
    ys = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, b, sy, sx, nl), fwd5),
            pl.BlockSpec((1, b, nl), fwd3),
            pl.BlockSpec((1, b, nl), fwd3),
        ],
        out_specs=pl.BlockSpec((1, b, sy, sx, nl), fwd5),
        out_shape=jax.ShapeDtypeStruct((n, b, sy, sx, nl), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, sy, sx, nl), jnp.float32)],
        interpret=interpret,
    )(cost_t, pd_t, g_t.astype(jnp.float32))
    return ys
