"""Pallas TPU kernel for the neighborhood-agreement speckle filter
(ref ``rm_outliers_using_thresh``, ``src/vw/Stereo/DisparityMap.h:405-433``).

Why: the XLA formulation (``stereo/disparity.py:_rm_outliers``) is
operand-stream bound — XLA loop fusions re-read the shifted disparity
planes from HBM for every one of the (2h+1)(2v+1) window offsets (an 11x11
level-0 window re-streams ~0.5 GB per 1-Mpx frame; measured 1.1-1.2 ms,
~15% of the flagship frame). A stencil wants each input tile in VMEM
exactly once; this kernel DMAs a (band + halo) row slab per grid step and
evaluates every window offset from VMEM with ``pltpu.roll`` shifts
(non-negative shifts only on this toolchain; sublane slab starts stay
8-aligned, lane widths 128-aligned).

Semantics are identical to the packed-integer fast path
(``_rm_outliers_int``): disparities are integer-valued, (dx, dy, valid)
pack into one int32 code plane — dx field << 14, dy in the low 14 bits,
invalid pixels code 0 whose field difference always exceeds the threshold —
and a pixel keeps iff at least ``min_match`` window neighbours agree within
``t`` in both channels. Bit-equivalence vs the XLA paths is pinned by
tests/test_pyramid_correlation.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_BAND = 64   # output rows per grid step


def _roll2(x, i: int, j: int):
    """x shifted so out[r, c] = x[(r + i) % R, (c + j) % C]."""
    r, c = x.shape
    if i:
        x = pltpu.roll(x, (r - i) % r, axis=0)
    if j:
        x = pltpu.roll(x, (c - j) % c, axis=1)
    return x


def _make_kernel(tr: int, wp: int, b: int, w: int, half_h: int, half_v: int,
                 t: int, min_match: int):
    def kernel(code_hbm, out_ref, tile, sem):
        g = pl.program_id(0)
        copy = pltpu.make_async_copy(
            code_hbm.at[pl.ds(g * b, tr), pl.ds(0, wp)], tile, sem)
        copy.start()
        copy.wait()
        full = tile[:]
        center = _roll2(full, half_v, half_h)[:b, :w]
        cdx = center >> 14
        cdy = center & 0x3FFF
        acc = jnp.zeros((b, w), jnp.int32)
        for j in range(2 * half_h + 1):
            tj = pltpu.roll(full, (wp - j) % wp, axis=1) if j else full
            for i in range(2 * half_v + 1):
                nb = (pltpu.roll(tj, (tr - i) % tr, axis=0) if i else tj)[:b, :w]
                ok = ((jnp.abs(cdx - (nb >> 14)) <= t)
                      & (jnp.abs(cdy - (nb & 0x3FFF)) <= t))
                acc = acc + ok.astype(jnp.int32)
        out_ref[:, :] = (acc >= min_match).astype(jnp.int32)
    return kernel


@functools.partial(jax.jit, static_argnames=("half_h", "half_v", "t",
                                             "min_match", "interpret"))
def speckle_keep_mask(code, half_h: int, half_v: int, t: int, min_match: int,
                      interpret: bool = False):
    """(H, W) int32 packed-code plane -> (H, W) int32 0/1 keep mask.

    ``code`` packs one pixel's (dx, dy, valid) as
    ``(dx + 8192) << 14 | (dy + 8192)`` with 0 for invalid (see
    ``stereo/disparity.py``). Edge-replicated padding and the window count
    happen here; a pixel keeps iff >= ``min_match`` of its
    (2*half_h+1) x (2*half_v+1) neighbours (itself included) agree within
    ``t`` in both fields."""
    h, w = code.shape
    assert w % 128 == 0 and h % 8 == 0, (h, w)
    b = min(_BAND, h)
    ng = -(-h // b)
    tr = ((b + 2 * half_v + 7) // 8) * 8
    wp = ((w + 2 * half_h + 127) // 128) * 128
    pc = jnp.pad(code, ((half_v, half_v), (half_h, half_h)), mode="edge")
    pc = jnp.pad(pc, ((0, (ng - 1) * b + tr - pc.shape[0]),
                      (0, wp - pc.shape[1])))
    kernel = _make_kernel(tr, wp, b, w, half_h, half_v, t, min_match)
    out = pl.pallas_call(
        kernel,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((b, w), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((ng * b, w), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tr, wp), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            # The roll temporaries of the unrolled window loop scale with
            # the full row width (the slab is full-width by design): at
            # W = 4096 the scoped-vmem need is ~25 MB vs the conservative
            # 16 MB default. Same cap raise as ops/sweep.py.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pc)
    return out[:h]
