"""Iterative subpixel refinement beyond the parabola fit
(ref ``PyramidSubpixelView`` / ``subpixel_optimized_affine_2d`` / Lucas-Kanade
and Bayes-EM kernels, ``src/vw/Stereo/SubpixelView.h:28-146``,
``Correlate.cc``; phase correlation ``PhaseSubpixelView.cc``).

All refiners are dense and vectorized: every pixel's window system is
assembled from unrolled window-tap gathers (no per-pixel loops), and the
per-pixel 2x2 / 6x6 normal equations solve in closed form / batched
``jnp.linalg.solve`` on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.stereo.correlation import DisparityMap
from visionworkbench_tpu.stereo.prefilter import PREFILTER_NONE, prefilter_image


def _grid(h, w):
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return xs, ys


def _sample(img, x, y):
    """Bilinear gather with clamping (keeps everything in one fused kernel)."""
    h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    p00 = img[y0i, x0i]
    p10 = img[y0i, x1i]
    p01 = img[y1i, x0i]
    p11 = img[y1i, x1i]
    return ((p00 * (1 - tx) + p10 * tx) * (1 - ty) +
            (p01 * (1 - tx) + p11 * tx) * ty)


@functools.partial(jax.jit, static_argnames=("kw", "kh", "iters"))
def _lk_refine(disp, valid, left, right, kw: int, kh: int, iters: int):
    """Translation-only Lucas-Kanade: per pixel solve the 2x2 system
    [sum gx^2, sum gxgy; ., sum gy^2] d = -[sum gx e, sum gy e]."""
    h, w = left.shape
    xs, ys = _grid(h, w)
    k2w, k2h = kw // 2, kh // 2
    gx_r = (jnp.roll(right, -1, 1) - jnp.roll(right, 1, 1)) * 0.5
    gy_r = (jnp.roll(right, -1, 0) - jnp.roll(right, 1, 0)) * 0.5
    d = disp.astype(jnp.float32)

    def body(_, d):
        a11 = jnp.zeros((h, w))
        a12 = jnp.zeros((h, w))
        a22 = jnp.zeros((h, w))
        b1 = jnp.zeros((h, w))
        b2 = jnp.zeros((h, w))
        for wy in range(-k2h, k2h + 1):
            for wx in range(-k2w, k2w + 1):
                xw = xs + wx
                yw = ys + wy
                tx = xw + d[..., 0]
                ty = yw + d[..., 1]
                lv = _sample(left, xw, yw)
                rv = _sample(right, tx, ty)
                gx = _sample(gx_r, tx, ty)
                gy = _sample(gy_r, tx, ty)
                e = rv - lv
                a11 += gx * gx
                a12 += gx * gy
                a22 += gy * gy
                b1 += gx * e
                b2 += gy * e
        det = a11 * a22 - a12 * a12
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        ddx = -(a22 * b1 - a12 * b2) / det
        ddy = -(-a12 * b1 + a11 * b2) / det
        step = jnp.stack([jnp.clip(ddx, -1.0, 1.0),
                          jnp.clip(ddy, -1.0, 1.0)], -1)
        return d + step

    d = lax.fori_loop(0, iters, body, d)
    drift = jnp.linalg.norm(d - disp.astype(jnp.float32), axis=-1)
    ok = valid & (drift < 2.0) & jnp.all(jnp.isfinite(d), -1)
    return jnp.where(ok[..., None], d, disp.astype(jnp.float32)), valid


def lk_subpixel(disparity: DisparityMap, left, right, kernel_size,
                iterations: int = 5, prefilter_mode: str = PREFILTER_NONE,
                prefilter_width: float = 1.4) -> DisparityMap:
    """Dense Lucas-Kanade subpixel (ref the LK variant of
    ``PyramidSubpixelView``)."""
    left = prefilter_image(jnp.asarray(left, jnp.float32), prefilter_mode,
                           prefilter_width)
    right = prefilter_image(jnp.asarray(right, jnp.float32), prefilter_mode,
                            prefilter_width)
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    d, valid = _lk_refine(disparity.disparity, disparity.valid, left, right,
                          kw, kh, int(iterations))
    return DisparityMap(d, valid)


@functools.partial(jax.jit, static_argnames=("kw", "kh", "iters"))
def _affine_refine(disp, valid, left, right, kw: int, kh: int, iters: int):
    """6-parameter affine-window Gauss-Newton
    (ref ``subpixel_optimized_affine_2d``, Correlate.cc): right window is
    warped by [1+a, b, dx; c, 1+e, dy] about the window center; Gaussian
    window weights like the reference's weighted variants."""
    h, w = left.shape
    xs, ys = _grid(h, w)
    k2w, k2h = kw // 2, kh // 2
    gx_r = (jnp.roll(right, -1, 1) - jnp.roll(right, 1, 1)) * 0.5
    gy_r = (jnp.roll(right, -1, 0) - jnp.roll(right, 1, 0)) * 0.5
    # params per pixel: [a, b, dx, c, e, dy]
    p = jnp.zeros((h, w, 6))
    p = p.at[..., 2].set(disp[..., 0].astype(jnp.float32))
    p = p.at[..., 5].set(disp[..., 1].astype(jnp.float32))
    sig = 0.5 * max(k2w, 1)

    def body(_, p):
        ata = jnp.zeros((h, w, 6, 6))
        atb = jnp.zeros((h, w, 6))
        for wy in range(-k2h, k2h + 1):
            for wx in range(-k2w, k2w + 1):
                import math
                wgt = math.exp(-0.5 * (wx * wx + wy * wy) / (sig * sig * 4))
                lv = _sample(left, xs + wx, ys + wy)
                tx = xs + wx + p[..., 0] * wx + p[..., 1] * wy + p[..., 2]
                ty = ys + wy + p[..., 3] * wx + p[..., 4] * wy + p[..., 5]
                rv = _sample(right, tx, ty)
                gx = _sample(gx_r, tx, ty)
                gy = _sample(gy_r, tx, ty)
                e = rv - lv
                # Jacobian of residual wrt [a b dx c e dy]
                j = jnp.stack([gx * wx, gx * wy, gx,
                               gy * wx, gy * wy, gy], -1)
                ata = ata + wgt * j[..., :, None] * j[..., None, :]
                atb = atb + wgt * j * e[..., None]
        ata = ata + 1e-4 * jnp.eye(6)
        delta = jnp.linalg.solve(ata, -atb[..., None])[..., 0]
        delta = jnp.clip(delta, -0.5, 0.5)
        return p + delta

    p = lax.fori_loop(0, iters, body, p)
    d = jnp.stack([p[..., 2], p[..., 5]], -1)
    drift = jnp.linalg.norm(d - disp.astype(jnp.float32), axis=-1)
    ok = valid & (drift < 2.0) & jnp.all(jnp.isfinite(d), -1)
    return jnp.where(ok[..., None], d, disp.astype(jnp.float32)), valid


def affine_subpixel(disparity: DisparityMap, left, right, kernel_size,
                    iterations: int = 5, prefilter_mode: str = PREFILTER_NONE,
                    prefilter_width: float = 1.4) -> DisparityMap:
    """Affine-adaptive-window subpixel (ref ``subpixel_optimized_affine_2d``
    / the Bayes-EM family's deterministic core)."""
    left = prefilter_image(jnp.asarray(left, jnp.float32), prefilter_mode,
                           prefilter_width)
    right = prefilter_image(jnp.asarray(right, jnp.float32), prefilter_mode,
                            prefilter_width)
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    d, valid = _affine_refine(disparity.disparity, disparity.valid, left,
                              right, kw, kh, int(iterations))
    return DisparityMap(d, valid)


@functools.partial(jax.jit, static_argnames=("window", "stride", "upsample"))
def _phase_windows(left, right, int_dx, int_dy, window: int, stride: int,
                   upsample: int):
    h, w = left.shape
    gy = jnp.arange(window // 2, h - window // 2, stride)
    gx = jnp.arange(window // 2, w - window // 2, stride)
    win = jnp.hanning(window)
    win2 = jnp.asarray(win[:, None] * win[None, :], jnp.float32)

    def one(cy, cx):
        y0 = cy - window // 2
        x0 = cx - window // 2
        lp = lax.dynamic_slice(left, (y0, x0), (window, window)) * win2
        dy0 = y0 + int_dy
        dx0 = x0 + int_dx
        dy0 = jnp.clip(dy0, 0, h - window)
        dx0 = jnp.clip(dx0, 0, w - window)
        rp = lax.dynamic_slice(right, (dy0, dx0), (window, window)) * win2
        f1 = jnp.fft.fft2(lp)
        f2 = jnp.fft.fft2(rp)
        # Unnormalized cross spectrum: full phase-correlation whitening would
        # amplify empty bins on narrow-band content; windows are already
        # integer-aligned so the plain correlation peak is unambiguous.
        cross = f1 * jnp.conj(f2)
        # Fourier upsampling: zero-pad the spectrum, inverse transform, find
        # the (sub-pixel) correlation peak — which sits at -shift.
        m_up = window * upsample
        hw = window // 2
        padded = jnp.zeros((m_up, m_up), jnp.complex64)
        padded = padded.at[:hw, :hw].set(cross[:hw, :hw])
        padded = padded.at[:hw, -hw:].set(cross[:hw, -hw:])
        padded = padded.at[-hw:, :hw].set(cross[-hw:, :hw])
        padded = padded.at[-hw:, -hw:].set(cross[-hw:, -hw:])
        corr = jnp.real(jnp.fft.ifft2(padded))
        peak = jnp.argmax(corr.reshape(-1))
        py = (peak // m_up).astype(jnp.int32)
        px = (peak % m_up).astype(jnp.int32)
        py = jnp.where(py > m_up // 2, py - m_up, py).astype(jnp.float32) / upsample
        px = jnp.where(px > m_up // 2, px - m_up, px).astype(jnp.float32) / upsample
        # disparity d satisfies left(p) = right(p + d); peak at -d.
        return jnp.stack([-px, -py])

    cyy, cxx = jnp.meshgrid(gy, gx, indexing="ij")
    offs = jax.vmap(jax.vmap(one))(cyy, cxx)
    return gx, gy, offs


def phase_subpixel(disparity: DisparityMap, left, right, window: int = 32,
                   stride: int = 8, upsample: int = 8) -> DisparityMap:
    """Phase-correlation subpixel on a window grid with Fourier upsampling
    (ref ``PhaseSubpixelView.cc``). The per-window offset refines the median
    integer disparity of the window; offsets are bilinearly spread back to
    pixels."""
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    h, w = left.shape
    # Use the global median integer disparity as the window alignment
    # (phase correlation then measures the residual shift).
    dsum = jnp.where(disparity.valid[..., None], disparity.disparity, 0)
    cnt = jnp.maximum(disparity.valid.sum(), 1)
    dmean = (dsum.reshape(-1, 2).sum(0) / cnt).astype(jnp.int32)
    gx, gy, offs = _phase_windows(left, right, dmean[0], dmean[1],
                                  int(window), int(stride), int(upsample))
    # Interpolate the window-grid offsets to full resolution.
    from visionworkbench_tpu.image.interpolation import interpolate
    xs, ys = _grid(h, w)
    fx = (xs - gx[0]) / max(int(stride), 1)
    fy = (ys - gy[0]) / max(int(stride), 1)
    off_x = interpolate(offs[..., 0], fx, fy, "bilinear")
    off_y = interpolate(offs[..., 1], fx, fy, "bilinear")
    d = jnp.stack([dmean[0] + off_x, dmean[1] + off_y], -1)
    return DisparityMap(jnp.where(disparity.valid[..., None], d, 0.0),
                        disparity.valid)
