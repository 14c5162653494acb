"""Disparity quality evaluation (ref ``src/vw/Stereo/CorrEval.h:37-117``):
per-pixel NCC or stddev-ratio of the left window vs the disparity-warped
right window — a confidence image for a computed disparity map."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.stereo.correlation import DisparityMap


@functools.partial(jax.jit, static_argnames=("kw", "kh", "metric"))
def _corr_eval(disp, valid, left, right, kw: int, kh: int, metric: str):
    h, w = left.shape
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    k2w, k2h = kw // 2, kh // 2
    n = float(kw * kh)

    def samp(img, x, y):
        hh, ww = img.shape
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx, ty = x - x0, y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, ww - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, hh - 1)
        x1i = jnp.clip(x0i + 1, 0, ww - 1)
        y1i = jnp.clip(y0i + 1, 0, hh - 1)
        return ((img[y0i, x0i] * (1 - tx) + img[y0i, x1i] * tx) * (1 - ty) +
                (img[y1i, x0i] * (1 - tx) + img[y1i, x1i] * tx) * ty)

    sl = jnp.zeros((h, w))
    sl2 = jnp.zeros((h, w))
    sr = jnp.zeros((h, w))
    sr2 = jnp.zeros((h, w))
    slr = jnp.zeros((h, w))
    dx = disp[..., 0].astype(jnp.float32)
    dy = disp[..., 1].astype(jnp.float32)
    lpad = jnp.pad(left, ((k2h, k2h), (k2w, k2w)), mode="edge")
    for wy in range(-k2h, k2h + 1):
        for wx in range(-k2w, k2w + 1):
            lv = lax.dynamic_slice(lpad, (wy + 2 * k2h - k2h, wx + 2 * k2w - k2w),
                                   (h, w))
            rv = samp(right, xs + wx + dx, ys + wy + dy)
            sl += lv
            sl2 += lv * lv
            sr += rv
            sr2 += rv * rv
            slr += lv * rv
    var_l = jnp.maximum(sl2 - sl * sl / n, 0.0)
    var_r = jnp.maximum(sr2 - sr * sr / n, 0.0)
    if metric == "ncc":
        cov = slr - sl * sr / n
        q = cov / jnp.maximum(jnp.sqrt(var_l * var_r), 1e-9)
    else:  # stddev ratio
        q = jnp.sqrt(jnp.minimum(var_l, var_r) /
                     jnp.maximum(jnp.maximum(var_l, var_r), 1e-9))
    return jnp.where(valid, q, 0.0)


def corr_eval(disparity: DisparityMap, left, right, kernel_size=(11, 11),
              metric: str = "ncc"):
    """Quality image in [-1, 1] (ncc) or [0, 1] (stddev)
    (ref ``corr_eval``, CorrEval.h)."""
    if metric not in ("ncc", "stddev"):
        raise ArgumentErr("corr_eval metric must be 'ncc' or 'stddev'")
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    return _corr_eval(disparity.disparity, disparity.valid, left, right,
                      kw, kh, metric)
