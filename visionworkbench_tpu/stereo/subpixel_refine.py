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
import os
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
    [sum gx^2, sum gxgy; ., sum gy^2] d = -[sum gx e, sum gy e].

    Gather-based (4 bilinear gathers x kw*kh taps x iters): fine on the
    small tiles it is offered for, but NOT a production full-frame path —
    use :func:`affine_subpixel` / :func:`bayes_em_subpixel` (dense,
    gather-free) at scale."""
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


def affine_subpixel(disparity: DisparityMap, left, right, kernel_size,
                    iterations: int = 5, prefilter_mode: str = PREFILTER_NONE,
                    prefilter_width: float = 1.4) -> DisparityMap:
    """Affine-adaptive-window subpixel (ref ``subpixel_optimized_affine_2d``,
    Correlate.cc:848-1080): the plain weighted affine Gauss-Newton core of
    the Bayes-EM family — the dense gather-free kernel with the EM mixture
    weighting disabled (``em_iters=0``), production-scale on full frames.

    Semantic change vs rounds <= 1: failed fits (divergent affine params /
    degenerate weights) are now INVALIDATED (disparity zeroed, valid=False)
    like the EM kernel, instead of silently reverting to the integer
    disparity with valid kept — callers see sparser but honest masks."""
    return bayes_em_subpixel(disparity, left, right, kernel_size,
                             em_iters=0, outer_iters=int(iterations),
                             prefilter_mode=prefilter_mode,
                             prefilter_width=prefilter_width)


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


# ---------------------------------------------------------------------------
# Bayes-EM affine subpixel (ref subpixel_optimized_affine_2d_EM,
# Correlate.cc:500-845, and bayes_em_subpixel, SubpixelView.h:128-146)
# ---------------------------------------------------------------------------

def _weight_template(kw: int, kh: int) -> "np.ndarray":
    """Gaussian window weights (ref compute_spatial_weight_image,
    Correlate.cc:36-55): exp(-(di^2+dj^2)/two_sigma_sqr) normalized, with
    two_sigma_sqr = 2*(kw/5)^2 (Correlate.cc:519)."""
    import numpy as np
    two_sigma_sqr = 2.0 * (float(kw) / 5.0) ** 2
    ii = np.arange(kw) - kw // 2
    jj = np.arange(kh) - kh // 2
    w = np.exp(-(ii[None, :] ** 2 + jj[:, None] ** 2) / two_sigma_sqr)
    return (w / w.sum()).astype("float32")


def _solve6(A, b):
    """Unrolled 6x6 Cholesky solve, elementwise over (H, W) maps.

    ``A``: dict {(i, j): map} upper-triangular entries (i <= j) of the SPD
    normal matrix; ``b``: list of 6 maps. Everything stays as fused
    elementwise ops — no (H, W, 6, 6) materialization, no batched LAPACK.
    Non-SPD pixels produce NaNs which the caller's final NaN check
    invalidates (the reference's posv failure path degrades the same way)."""
    L = {}
    for j in range(6):
        s = A[(j, j)]
        for k in range(j):
            s = s - L[(j, k)] * L[(j, k)]
        L[(j, j)] = jnp.sqrt(s)
        inv = 1.0 / L[(j, j)]
        for i in range(j + 1, 6):
            s = A[(j, i)]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            L[(i, j)] = s * inv
    # forward substitution L y = b
    y = []
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y.append(s / L[(i, i)])
    # back substitution L^T x = y
    x = [None] * 6
    for i in range(5, -1, -1):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    return x


@functools.partial(jax.jit, static_argnames=("kw", "kh", "em_iters",
                                             "outer_iters"))
def _em_affine_dense(disp, valid, left, right, kw: int, kh: int,
                     em_iters: int, outer_iters: int):
    """Dense, gather-light Bayes-EM affine subpixel — every pixel of the
    frame refines simultaneously (ref ``subpixel_optimized_affine_2d_EM``,
    Correlate.cc:500-845, transliterated update-for-update; ``em_iters=0``
    disables the Gaussian+uniform mixture weighting, leaving the plain
    weighted affine Gauss-Newton core of ``subpixel_optimized_affine_2d``,
    Correlate.cc:848-1080).

    Reference semantics preserved per pixel: identity-initialized 6-param
    affine window model in row-major [d0 d1 d2; d3 d4 d5]; Gaussian window
    weights zeroed at invalid-neighbor taps and renormalized
    (``adjust_weight_image``; pixels with < kern_pixels/2 valid neighbors
    invalidate); the EM mixture (plane model N(0, 1e-3) vs uniform-noise
    model N(mean_noise, 1e-2), priors 0.8/0.2, exponent guard at -75, the
    full-affine ``delta`` quirk of Correlate.cc:659-663); per-pixel 6x6
    normal-equation Cholesky solves; the |translation| > kern_width/2 abort;
    the rising-|sum I_e| early stop; final NaN / max-translation
    invalidation with the offset added to the ORIGINAL disparity.

    TPU formulation (the gather-free part): instead of per-tap bilinear
    gathers into the right image (the reference's ``right_interp_image(xx,
    yy)``, 4 gathers x k^2 taps x iters — ~11 ms per 1-Mpx gather on this
    toolchain), the right image is warped ONCE per outer iteration by the
    per-pixel integer part of the current solution (one gather), and each
    tap's fractional sample is a 3x3-slice hat-weighted stencil over the
    warped frame (offsets stay within [-1, 1) because the rounded
    translation folds into the warp field each iteration; larger per-tap
    affine deviations clip). This is exact wherever the integer
    warp field is locally constant across the window — post-filtering,
    almost everywhere; the same documented approximation as the fast
    parabola path. Border pixels read replicate-extended samples instead of
    the reference's zero extension.
    """
    import numpy as np
    h, w = left.shape
    k2w, k2h = kw // 2, kh // 2
    kern_pixels = kw * kh
    max_trans = float(kw) / 2.0
    m = k2w + 2  # stencil margin: tap + cell shift + bilinear
    mh = k2h + 2

    from visionworkbench_tpu.image.filters import derivative_filter
    x_deriv = derivative_filter(left, 1, 0)
    y_deriv = derivative_filter(left, 0, 1)

    wt = _weight_template(kw, kh)

    # Per-pixel window weight normalization (adjust_weight_image).
    validf = valid.astype(jnp.float32)
    vpad = jnp.pad(validf, ((k2h, k2h), (k2w, k2w)))
    wsum = jnp.zeros((h, w), jnp.float32)
    good = jnp.zeros((h, w), jnp.float32)
    for jj in range(kh):
        for ii in range(kw):
            vtap = lax.slice(vpad, (jj, ii), (jj + h, ii + w))
            wsum = wsum + wt[jj, ii] * vtap
            good = good + vtap
    ok_weights = good >= (kern_pixels // 2)
    wsum = jnp.maximum(wsum, 1e-20)

    lpad = jnp.pad(left, ((k2h, k2h), (k2w, k2w)), mode="edge")
    xpad = jnp.pad(x_deriv, ((k2h, k2h), (k2w, k2w)), mode="edge")
    ypad = jnp.pad(y_deriv, ((k2h, k2h), (k2w, k2w)), mode="edge")

    dispf = disp.astype(jnp.float32)
    dint = jnp.round(dispf).astype(jnp.int32)
    frac0 = dispf - dint.astype(jnp.float32)

    rh, rw = right.shape
    qy = lax.broadcasted_iota(jnp.int32, (h + 2 * mh, w + 2 * m), 0) - mh
    qx = lax.broadcasted_iota(jnp.int32, (h + 2 * mh, w + 2 * m), 1) - m
    rflat = right.reshape(-1)

    def warp_once(fold):
        """G(q) = right(q + dint(q) + fold(q)) on the margin-extended grid
        (edge-replicated warp field; clipped reads)."""
        wx = jnp.pad(dint[..., 0] + fold[..., 0], ((mh, mh), (m, m)),
                     mode="edge")
        wy = jnp.pad(dint[..., 1] + fold[..., 1], ((mh, mh), (m, m)),
                     mode="edge")
        ty = jnp.clip(qy + wy, 0, rh - 1)
        tx = jnp.clip(qx + wx, 0, rw - 1)
        return jnp.take(rflat, (ty * rw + tx).reshape(-1)).reshape(ty.shape)

    n_em = max(em_iters, 1)
    use_em = em_iters > 0

    # Re-warp policy (round 4): the per-outer-iteration re-warp costs one
    # 1-Mpx gather per iteration (measured 7.1 ms each at 1024^2 — 3 of the
    # EM config's ~80 ms device frame, tools_profile_config --config 7).
    # fold0 = round(frac0) is identically 0, so iteration 1's gather is by
    # dint alone; warp-once mode reuses that G for every iteration and lets
    # later offsets ride the ±1 stencil clip instead (production seeds come
    # from the integer correlator within ~0.5 px, so |d2| rarely approaches
    # 1; pixels drifting further clip -> rising residual -> early stop,
    # the same degradation class as the documented locally-constant-warp
    # approximation; accuracy pinned by tests/test_subpixel_refine.py).
    # VWTPU_EM_REWARP=1 restores the reference-faithful re-warp.
    rewarp = os.environ.get("VWTPU_EM_REWARP", "0") == "1"
    fold0_static = jnp.round(frac0).astype(jnp.int32)
    G0 = None if rewarp else warp_once(fold0_static)

    def outer_body(it, carry):
        d, fold, prev_sum, frozen, poisoned = carry
        # abort check at iteration top (Correlate.cc:212-217)
        aborted = jnp.sqrt(d[2] * d[2] + d[5] * d[5]) > max_trans
        active = ~frozen & ~aborted

        G = warp_once(fold) if rewarp else G0
        tfx = d[2] + frac0[..., 0] - fold[..., 0].astype(jnp.float32)
        tfy = d[5] + frac0[..., 1] - fold[..., 1].astype(jnp.float32)

        d_em = list(d)
        mean_noise = jnp.zeros((h, w), jnp.float32)
        w_plane = jnp.full((h, w), 0.8, jnp.float32)
        w_noise = jnp.full((h, w), 0.2, jnp.float32)
        var2_plane, var2_noise = 1e-3, 1e-2
        lhs_sol = None
        sum_ie = jnp.zeros((h, w), jnp.float32)
        nonlocal_poison = []

        for em_iter in range(n_em):
            A = {}
            for i in range(6):
                for j in range(i, 6):
                    A[(i, j)] = jnp.zeros((h, w), jnp.float32)
            b = [jnp.zeros((h, w), jnp.float32) for _ in range(6)]
            sum_ie = jnp.zeros((h, w), jnp.float32)
            mean_noise_tmp = jnp.zeros((h, w), jnp.float32)
            sg_plane = jnp.zeros((h, w), jnp.float32)
            sg_noise = jnp.zeros((h, w), jnp.float32)
            pnf = 1.0 / np.sqrt(2 * np.pi * var2_plane)
            nnf = 1.0 / np.sqrt(2 * np.pi * var2_noise)

            # Window rows vectorized on a leading tap axis (T = kw): keeps
            # the traced body ~10x smaller than a fully unrolled tap loop
            # (compile-time bound through the remote-compile tunnel) while
            # all math stays fused elementwise.
            iiv = jnp.asarray(np.arange(-k2w, k2w + 1,
                                        dtype=np.float32))[:, None, None]
            for jj in range(-k2h, k2h + 1):
                j0 = jj + k2h

                def row_stack(padded):
                    return jnp.stack([
                        lax.slice(padded, (j0, i), (j0 + h, i + w))
                        for i in range(kw)])
                L_row = row_stack(lpad)               # (T, H, W)
                Ix = row_stack(xpad)
                Iy = row_stack(ypad)
                v_row = row_stack(vpad)
                wt_row = jnp.asarray(wt[j0])[:, None, None]
                w_row = wt_row * v_row / wsum[None]

                ox = (d[0] - 1.0)[None] * iiv + (d[1] * jj + tfx)[None]
                oy = d[3][None] * iiv + ((d[4] - 1.0) * jj + tfy)[None]
                ox = jnp.clip(ox, -1.0, 1.0 - 1e-6)
                oy = jnp.clip(oy, -1.0, 1.0 - 1e-6)
                # 3x3 hat-weighted stencil sample of G at (jj+oy, ii+ox);
                # the x-stencil reads are axis-0 slices of one wide row
                # stack, shared across taps.
                sample = jnp.zeros((kw, h, w), jnp.float32)
                for sy in (-1, 0, 1):
                    gy0 = jj + sy + mh
                    wide = jnp.stack([
                        lax.slice(G, (gy0, c + m), (gy0 + h, c + m + w))
                        for c in range(-k2w - 1, k2w + 2)])  # (T+2, H, W)
                    wy_ = jnp.maximum(0.0, 1.0 - jnp.abs(oy - sy))
                    row_acc = jnp.zeros((kw, h, w), jnp.float32)
                    for sx in (-1, 0, 1):
                        gsl = lax.slice_in_dim(wide, sx + 1, sx + 1 + kw, 1, 0)
                        wx_ = jnp.maximum(0.0, 1.0 - jnp.abs(ox - sx))
                        row_acc = row_acc + wx_ * gsl
                    sample = sample + wy_ * row_acc

                I_e = sample - L_row
                if use_em:
                    delta_x = (d_em[0][None] * iiv
                               + (d_em[1] * jj + d_em[2])[None])
                    delta_y = (d_em[3][None] * iiv
                               + (d_em[4] * jj + d_em[5])[None])
                    temp_plane = I_e - delta_x * Ix - delta_y * Iy
                    temp_noise = sample - mean_noise[None]
                    ppe = -(temp_plane * temp_plane) / (2 * var2_plane)
                    plane_prob = jnp.where(ppe < -75.0, 0.0,
                                           pnf * jnp.exp(ppe))
                    npe = -(temp_noise * temp_noise) / (2 * var2_noise)
                    noise_prob = jnp.where(npe < -75.0, 0.0,
                                           nnf * jnp.exp(npe))
                    denom = (plane_prob * w_plane[None]
                             + noise_prob * w_noise[None])
                    safe = jnp.where(denom > 0, denom, 1.0)
                    gamma_plane = jnp.where(denom > 0,
                                            plane_prob * w_plane[None] / safe,
                                            0.0)
                    gamma_noise = jnp.where(denom > 0,
                                            noise_prob * w_noise[None] / safe,
                                            0.0)
                    # A zero denominator (both mixture probs underflowed)
                    # NaN-poisons the reference's accumulators and the pixel
                    # ends up invalidated (Correlate.cc:676-678 has no
                    # guard; the NaN rides through posv into d and the final
                    # isnan check kills it). The dense path computes with
                    # gamma=0 instead and records the poisoning explicitly.
                    poison_row = jnp.any(denom <= 0, axis=0)
                    nonlocal_poison.append(poison_row)
                    weight = gamma_plane * w_row
                else:
                    weight = w_row

                Ixw = weight * Ix
                Iyw = weight * Iy
                P1 = Ixw * Ix
                P2 = Iyw * Iy
                P3 = Ixw * Iy
                ii2 = iiv * iiv
                # All tap-axis reductions of this window row in ONE
                # variadic lax.reduce: 13 moment sums (+3 EM stats) share a
                # single traversal of the shared producers instead of 13-16
                # separate multiply_reduce fusions, each re-executing its
                # producer chain (measured 27 ms of the 64 ms EM frame at
                # 1024^2, tools_profile_config --config 7 — the same
                # one-volume-read trick as SGM's fused WTA stats).
                ops_r = [I_e,
                         Ixw * I_e, iiv * (Ixw * I_e),
                         Iyw * I_e, iiv * (Iyw * I_e),
                         P1, iiv * P1, ii2 * P1,
                         P2, iiv * P2, ii2 * P2,
                         P3, iiv * P3, ii2 * P3]
                if use_em:
                    ops_r += [sample * gamma_noise, gamma_plane, gamma_noise]
                red = lax.reduce(
                    tuple(ops_r), tuple(jnp.float32(0.0) for _ in ops_r),
                    lambda a_, b_: tuple(x + y for x, y in zip(a_, b_)),
                    (0,))
                (sie, bx0, bx1, by0, by1,
                 s0_1, s1_1, s2_1, s0_2, s1_2, s2_2,
                 s0_3, s1_3, s2_3) = red[:14]
                sum_ie = sum_ie + sie
                if use_em:
                    mean_noise_tmp = mean_noise_tmp + red[14]
                    sg_plane = sg_plane + red[15]
                    sg_noise = sg_noise + red[16]
                b[0] = b[0] - bx1
                b[1] = b[1] - jj * bx0
                b[2] = b[2] - bx0
                b[3] = b[3] - by1
                b[4] = b[4] - jj * by0
                b[5] = b[5] - by0
                # three moments (1, ii, ii^2) per gradient product; the jj
                # factors are row constants
                for (base, (s0, s1, s2)) in ((0, (s0_1, s1_1, s2_1)),
                                             (3, (s0_2, s1_2, s2_2))):
                    A[(base, base)] = A[(base, base)] + s2
                    A[(base, base + 1)] = A[(base, base + 1)] + jj * s1
                    A[(base, base + 2)] = A[(base, base + 2)] + s1
                    A[(base + 1, base + 1)] = (A[(base + 1, base + 1)]
                                               + jj * jj * s0)
                    A[(base + 1, base + 2)] = (A[(base + 1, base + 2)]
                                               + jj * s0)
                    A[(base + 2, base + 2)] = A[(base + 2, base + 2)] + s0
                s0, s1, s2 = s0_3, s1_3, s2_3   # full UR block (IxIy)
                A[(0, 3)] = A[(0, 3)] + s2
                A[(0, 4)] = A[(0, 4)] + jj * s1
                A[(0, 5)] = A[(0, 5)] + s1
                A[(1, 3)] = A[(1, 3)] + jj * s1
                A[(1, 4)] = A[(1, 4)] + jj * jj * s0
                A[(1, 5)] = A[(1, 5)] + jj * s0
                A[(2, 3)] = A[(2, 3)] + s1
                A[(2, 4)] = A[(2, 4)] + jj * s0
                A[(2, 5)] = A[(2, 5)] + s0

            lhs_sol = _solve6(A, b)
            if use_em:
                mean_noise = jnp.where(sg_noise > 0,
                                       mean_noise_tmp / jnp.maximum(sg_noise,
                                                                    1e-20),
                                       mean_noise)
                w_plane = sg_plane / kern_pixels
                w_noise = sg_noise / kern_pixels
                d_em = [d[k] + lhs_sol[k] for k in range(6)]

        d_new = [d[k] + lhs_sol[k] for k in range(6)]
        curr_sum = jnp.abs(sum_ie)
        if use_em:
            # rising-residual early stop (applies AFTER the update, like
            # the reference's d += lhs; break — Correlate.cc:824-832)
            stop = (prev_sum < curr_sum) & (it > 0)
        else:
            # the plain-affine refiner stops on a small quarter-kernel-
            # weighted update norm instead (Correlate.cc:1167-1175)
            kqw, kqh = float(k2w // 2), float(k2h // 2)
            wl = (kqw * lhs_sol[0] * (kqw * lhs_sol[0])
                  + kqh * lhs_sol[1] * (kqh * lhs_sol[1])
                  + lhs_sol[2] * lhs_sol[2]
                  + kqw * lhs_sol[3] * (kqw * lhs_sol[3])
                  + kqh * lhs_sol[4] * (kqh * lhs_sol[4])
                  + lhs_sol[5] * lhs_sol[5])
            stop = jnp.sqrt(wl) < 0.05
        upd = active
        d_out = [jnp.where(upd, d_new[k], d[k]) for k in range(6)]
        new_frozen = frozen | aborted | (upd & stop)
        new_poisoned = poisoned
        for pr in nonlocal_poison:
            new_poisoned = new_poisoned | (upd & pr)
        new_prev = jnp.where(upd & ~stop, curr_sum, prev_sum)
        if rewarp:
            # fold integer translation into the warp field for the next
            # iteration (reference-faithful re-warp mode)
            nfx = jnp.round(d_out[2] + frac0[..., 0]).astype(jnp.int32)
            nfy = jnp.round(d_out[5] + frac0[..., 1]).astype(jnp.int32)
            new_fold = jnp.where(upd[..., None],
                                 jnp.stack([nfx, nfy], -1), fold)
        else:
            new_fold = fold   # warp-once: G is fixed, offsets ride the clip
        return (tuple(d_out), new_fold, new_prev, new_frozen,
                new_poisoned)

    d0 = (jnp.ones((h, w), jnp.float32), jnp.zeros((h, w), jnp.float32),
          jnp.zeros((h, w), jnp.float32), jnp.zeros((h, w), jnp.float32),
          jnp.ones((h, w), jnp.float32), jnp.zeros((h, w), jnp.float32))
    fold0 = jnp.round(frac0).astype(jnp.int32)
    prev0 = jnp.zeros((h, w), jnp.float32)
    frozen0 = jnp.zeros((h, w), bool)
    poisoned0 = jnp.zeros((h, w), bool)
    carry = (d0, fold0, prev0, frozen0, poisoned0)
    if outer_iters <= 4:
        # Static unroll of the small production iteration counts: measured
        # perf-NEUTRAL vs fori_loop (XLA already handles the invariant
        # window stacks), kept because it exposes the per-iteration ops to
        # the profiler instead of one opaque while op.
        for it in range(outer_iters):
            carry = outer_body(it, carry)
    else:
        carry = lax.fori_loop(0, outer_iters, outer_body, carry)
    d = carry[0]

    trans = jnp.sqrt(d[2] * d[2] + d[5] * d[5])
    bad = (trans > max_trans) | ~jnp.isfinite(d[2]) | ~jnp.isfinite(d[5])
    bad = bad | carry[4]   # mixture-denominator poisoning (see above)
    out_valid = valid & ok_weights & ~bad
    out = dispf + jnp.stack([jnp.where(bad, 0.0, d[2]),
                             jnp.where(bad, 0.0, d[5])], -1)
    return jnp.where(out_valid[..., None], out, 0.0), out_valid


def _decimate2(img):
    """Plain subsample-by-2 (ref ``subsample(x, 2)``, SubpixelView.cc:110-124
    — the reference deliberately skips the blur: "deemed not worth the
    computation time"). Strided slices lower to gathers on this TPU
    toolchain, so the decimation runs as two banded selection matmuls."""
    from visionworkbench_tpu.stereo.pyramid_correlation import _decimate_bands
    h, w = img.shape
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    dr = _decimate_bands(h2, h, (1.0,))
    dc = _decimate_bands(w2, w, (1.0,))
    out = jnp.einsum("oh,hw->ow", dr, img, precision=lax.Precision.HIGHEST)
    return jnp.einsum("ow,pw->op", out, dc, precision=lax.Precision.HIGHEST)


def bayes_em_subpixel(disparity: DisparityMap, left, right, kernel_size,
                      em_iters: int = 2, outer_iters: int = 10,
                      prefilter_mode: str = PREFILTER_NONE,
                      prefilter_width: float = 1.4,
                      max_pyramid_levels: int = 2,
                      fine_outer_iters: int = 0) -> DisparityMap:
    """Bayes-EM affine subpixel refinement over its own image pyramid
    (ref ``PyramidSubpixelView`` SUBPIXEL_BAYES_EM, SubpixelView.h:36-146 +
    SubpixelView.cc:33-210 / ``subpixel_optimized_affine_2d_EM``,
    Correlate.cc:500-845): a Gaussian "plane" inlier model + uniform-noise
    outlier model EM-weighted affine window fit, refined coarse-to-fine.
    The reference's quality mode. ``em_iters=0`` degrades to the plain
    weighted affine GN (``subpixel_optimized_affine_2d`` /
    SUBPIXEL_FAST_AFFINE).

    Pyramid flow mirrors the reference: plain subsample-by-2 patches (no
    blur, SubpixelView.cc:104-108), ``disparity_subsample`` seeds
    (validity-weighted average, values halved), per-level refinement with
    the SAME kernel size, ``disparity_upsample`` between levels, final pass
    at native resolution. ``max_pyramid_levels=0`` is the round-2 behavior
    (single full-resolution solve).

    ``fine_outer_iters``: Gauss-Newton outer iterations at the FINEST level
    (0 = same as ``outer_iters``). With a pyramid seed the full-resolution
    pass starts sub-pixel-close, so production configs run the full
    ``outer_iters`` only on the coarse (4x-16x smaller) levels and 2-3
    finishing iterations at full res — the rising-residual early-stop makes
    extra full-res iterations nearly pure waste (measured: identical
    sinusoid accuracy, ~3x throughput; tools_bench_configs config 7)."""
    left = prefilter_image(jnp.asarray(left, jnp.float32), prefilter_mode,
                           prefilter_width)
    right = prefilter_image(jnp.asarray(right, jnp.float32), prefilter_mode,
                            prefilter_width)
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    levels = max(int(max_pyramid_levels), 0)
    # Coarse levels only help when they still hold far more than a kernel's
    # worth of structure; the reference's blur-free subsample aliases tiny /
    # high-frequency patches into useless seeds. (The reference runs on
    # >=1024-px tiles where this never bites.)
    h0, w0 = left.shape[0], left.shape[1]
    min_dim = max(64, 8 * max(kw, kh))
    while levels > 0 and min(h0 >> levels, w0 >> levels) < min_dim:
        levels -= 1
    fine_iters = int(fine_outer_iters) if fine_outer_iters else int(outer_iters)
    if levels == 0:
        fine_iters = int(outer_iters)   # no seed to lean on

    from visionworkbench_tpu.stereo.disparity import (
        disparity_subsample, disparity_upsample,
    )
    lp, rp = [left], [right]
    dms = [disparity]
    for i in range(levels):
        lp.append(_decimate2(lp[-1]))
        rp.append(_decimate2(rp[-1]))
        dms.append(disparity_subsample(dms[-1]))

    def _boxmean(a, wf, rad):
        """Valid-weighted separable box mean of a (H, W, 2) field."""
        num, den = a * wf[..., None], wf
        for ax in (0, 1):
            n2, d2 = num, den
            for k in range(1, rad + 1):
                n2 = n2 + jnp.roll(num, k, ax) + jnp.roll(num, -k, ax)
                d2 = d2 + jnp.roll(den, k, ax) + jnp.roll(den, -k, ax)
            num, den = n2, d2
        return num / jnp.maximum(den, 1.0)[..., None]

    dm = dms[-1]
    for i in range(levels, 0, -1):
        d, v = _em_affine_dense(dm.disparity, dm.valid, lp[i], rp[i],
                                kw, kh, int(em_iters), int(outer_iters))
        # Feed forward a SMOOTH low-frequency CORRECTION, not the raw
        # refined values: the dense EM kernel warps the right frame by the
        # per-pixel INTEGER part of its seed (the gather-free formulation's
        # locally-constant-warp assumption), and raw per-pixel coarse
        # outputs carry enough divergence noise to flip that integer across
        # windows and wreck the finer level (measured: raw feed-forward
        # collapsed the 256^2 sinusoid final pass to 7% valid). A coarse
        # level's legitimate information is the smooth part of
        # (refined - seed); per-pixel detail is re-estimated at the finer
        # level anyway. The reference's per-pixel gather kernel
        # (Correlate.cc:500-845) needs no such hygiene.
        delta = d - dm.disparity
        ok = v & (jnp.max(jnp.abs(delta), -1) <= 1.25)
        sm = _boxmean(jnp.where(ok[..., None], delta, 0.0),
                      ok.astype(jnp.float32), 4)
        up = jnp.repeat(jnp.repeat(sm * 2.0, 2, 0), 2, 1)
        th, tw = lp[i - 1].shape
        corr = up[:th, :tw]
        ph, pw = th - corr.shape[0], tw - corr.shape[1]
        if ph or pw:
            corr = jnp.pad(corr, ((0, ph), (0, pw), (0, 0)), mode="edge")
        seed = dms[i - 1]
        dm = DisparityMap(seed.disparity + corr, seed.valid)

    d, valid = _em_affine_dense(dm.disparity, dm.valid, left, right,
                                kw, kh, int(em_iters), fine_iters)
    return DisparityMap(d, valid)
