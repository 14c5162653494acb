"""Pallas TPU kernel for the SGM aggregation scans
(ref ``SemiGlobalMatcher::two_trip_path_accumulation``, SGM.cc:2462-2531 —
the scanline sweeps; here the whole bidirectional multi-direction sweep runs
as ONE kernel with the recurrence carry resident in VMEM scratch).

Why: the XLA ``lax.scan`` formulation pays ~2 µs/step of while-loop machinery
plus a small (20 KB) ``dynamic_update_slice`` per step against ~0.15 µs of
actual VPU work — the 512-step scans are latency-bound, 2.4 ms of the 3.19 ms
SGM frame (docs/roofline.md). A Pallas sequential grid is a hardware loop:
the grid dimension iterates on-chip, the carry lives in VMEM scratch across
grid steps, and block outputs pipeline with compute.

Semantics are identical to ``stereo.sgm._scan_bidir`` (same update math,
the reverse direction's step t writes output column N-1-t so the result is
pre-aligned; caller adds the two output arrays).
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

_BIG = 1e9  # python float: jnp scalars become captured consts in pallas kernels


def _shift_lane_kernel(a, d: int):
    """out[..., i] = a[..., i-d] with BIG fill — pltpu.roll (non-negative
    shifts only on this toolchain) + an iota edge mask."""
    if d == 0:
        return a
    nl = a.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    if d > 0:
        rolled = pltpu.roll(a, d, axis=a.ndim - 1)
        return jnp.where(lane < d, _BIG, rolled)
    rolled = pltpu.roll(a, nl + d, axis=a.ndim - 1)
    return jnp.where(lane >= nl + d, _BIG, rolled)


def _grid_min3(p):
    """Exact 3x3 neighborhood min over the (sy, sx) axes of (..., sy, sx, L);
    out-of-grid neighbors count as +BIG.

    NOTE: twin of ``stereo.sgm._grid_min3`` / ``_path_update`` — the pallas
    copies differ only in the Python-float _BIG (jnp scalars become captured
    constants and fail pallas tracing) and the pltpu.roll lane shift. Any
    P1/P2 semantic change must be made in BOTH modules; equivalence is pinned
    bit-exactly by tests/test_sgm.py (interpret-mode kernel vs lax.scan)."""
    sy, sx = p.shape[-3], p.shape[-2]
    q = p
    if sy > 1:
        big = jnp.full_like(p[..., :1, :, :], _BIG)
        q = jnp.minimum(q, jnp.concatenate([big, p[..., :-1, :, :]], -3))
        q = jnp.minimum(q, jnp.concatenate([p[..., 1:, :, :], big], -3))
    if sx > 1:
        big = jnp.full_like(q[..., :, :1, :], _BIG)
        r = jnp.minimum(q, jnp.concatenate([big, q[..., :, :-1, :]], -2))
        q = jnp.minimum(r, jnp.concatenate([q[..., :, 1:, :], big], -2))
    return q


def _path_update(prior, cost, pdiff, p1: float, p2: float):
    """C + min(prior, nbhd3x3(prior)+P1, min_prior+P2') - min_prior with
    P2' = max(P2/|dI|, P1) (ref evaluate_path, SGM.cc:806-850)."""
    min_prior = jnp.min(prior, axis=(-3, -2))                    # (..., L)
    p2m = jnp.maximum(p2 / jnp.maximum(pdiff, 1.0), p1)
    nb = _grid_min3(prior) + p1
    best = jnp.minimum(jnp.minimum(prior, nb),
                       (min_prior + p2m)[..., None, None, :])
    valid = (min_prior < _BIG / 2)[..., None, None, :]
    return cost + jnp.where(valid, best - min_prior[..., None, None, :], 0.0)


def _make_kernel(b: int, sy: int, sx: int, nl: int, shifts: Tuple[int, ...],
                 p1: float, p2: float, tb: int):
    def step(c, cost, pd):
        prior = jnp.stack([_shift_lane_kernel(c[:, i], s)
                           for i, s in enumerate(shifts)], 1)
        return _path_update(prior, cost[:, None], pd, p1, p2)

    def kernel(cf_ref, cr_ref, pf_ref, pr_ref, yf_ref, yr_ref, carry):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            carry[:] = jnp.full((2, b, sy, sx, nl), _BIG, jnp.float32)

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
# over an in-kernel register loop (the lever the tb=1 measurement pointed
# at). Opt-in until A/B'd on hardware.
_TB = int(os.environ.get("VWTPU_SGM_TB", "1"))


@functools.partial(jax.jit, static_argnames=("shifts", "p1", "p2",
                                             "interpret", "tb"))
def pallas_scan_bidir(cost_t, pdiffs_f, pdiffs_r, shifts: Tuple[int, ...],
                      p1: float, p2: float, interpret: bool = False,
                      tb: int = None):
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
                          tb)
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
