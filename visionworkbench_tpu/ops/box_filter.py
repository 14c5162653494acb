"""Sliding box sums — the workhorse of block-matching correlation
(ref ``fast_box_sum``, ``src/vw/Stereo/Algorithms.h:41-131``).

The reference keeps running column/row sums for O(1)/pixel cost. On TPU the
same result comes from two 1D ``reduce_window`` sums, which XLA vectorizes on
the VPU with no sequential dependence and no cumsum cancellation error —
matching the reference's direct-summation numerics more closely than an
integral-image formulation. A fused Pallas path for the correlator lives in
:mod:`visionworkbench_tpu.ops.cost_volume`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.core.exceptions import ArgumentErr


def box_sum_valid(image, kernel_w: int, kernel_h: int):
    """'valid'-mode box sum: output (H-kh+1, W-kw+1); accumulates in f32
    (the reference promotes to f64 for float inputs, CostFunctions.h:56-69 —
    f32 direct summation stays allclose for correlation-window sizes)."""
    image = jnp.asarray(image, jnp.float32)
    if image.shape[0] < kernel_h or image.shape[1] < kernel_w:
        raise ArgumentErr("box_sum_valid: image smaller than kernel")
    out = lax.reduce_window(image, 0.0, lax.add,
                            window_dimensions=(kernel_h, 1),
                            window_strides=(1, 1), padding="VALID")
    out = lax.reduce_window(out, 0.0, lax.add,
                            window_dimensions=(1, kernel_w),
                            window_strides=(1, 1), padding="VALID")
    return out


def box_sum_same(image, kernel_w: int, kernel_h: int, edge: str = "zero",
                 formulation: str = "auto"):
    """Same-size box sum with edge extension (centered window).

    ``formulation``: 'rw' (two reduce_window passes, exact direct sums) or
    'cumsum' (prefix-sum differences, O(1)/px — a full-frame 15-tap
    reduce_window pass costs ~3 ms/Mpx on this toolchain while the cumsum
    form is bandwidth-bound; cancellation is benign at correlation-window
    magnitudes). 'auto' picks cumsum for large planes."""
    from visionworkbench_tpu.image.edge import edge_extend
    padded = edge_extend(image, x_pad=(kernel_w // 2, kernel_w - 1 - kernel_w // 2),
                         y_pad=(kernel_h // 2, kernel_h - 1 - kernel_h // 2), mode=edge)
    h, w = padded.shape[0], padded.shape[1]
    if formulation == "auto":
        formulation = "cumsum" if image.ndim == 2 and image.size >= 64 * 64 else "rw"
    if formulation == "cumsum":
        c = jnp.cumsum(padded, axis=0)
        cp = jnp.concatenate([jnp.zeros_like(c[:1]), c], axis=0)
        out = cp[kernel_h:] - cp[:-kernel_h]
        c = jnp.cumsum(out, axis=1)
        cp = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=1)
        return cp[:, kernel_w:] - cp[:, :-kernel_w]
    return box_sum_valid(padded, kernel_w, kernel_h)


def box_filter_same(image, kernel_w: int, kernel_h: int, edge: str = "constant"):
    """Mean (box) filter, same size."""
    return box_sum_same(image, kernel_w, kernel_h, edge) / float(kernel_w * kernel_h)


def box_sum_valid_int(image, kernel_w: int, kernel_h: int):
    """Integer-accumulator variant for census hamming costs."""
    image = jnp.asarray(image, jnp.int32)
    out = lax.reduce_window(image, jnp.int32(0), lax.add,
                            window_dimensions=(kernel_h, 1),
                            window_strides=(1, 1), padding="VALID")
    out = lax.reduce_window(out, jnp.int32(0), lax.add,
                            window_dimensions=(1, kernel_w),
                            window_strides=(1, 1), padding="VALID")
    return out
