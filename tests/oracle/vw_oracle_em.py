"""Reference-parity oracle: a slow, literal NumPy transliteration of the
NASA Vision Workbench affine / Bayes-EM subpixel refiners, used ONLY as a
test oracle (the third oracle family, next to ``vw_oracle`` (BM) and
``vw_oracle_sgm`` (SGM/MGM)).

Transliterated components (each follows the C++ loop-for-loop: same
iteration order, same float32 accumulators, same in-place disparity-map
mutation, same termination conditions):

* ``compute_spatial_weight_image`` — ``src/vw/Stereo/Correlate.cc:36-55``
  (normalized Gaussian window; ImageView(i=x, j=y) index order).
* ``adjust_weight_image``          — ``src/vw/Stereo/Correlate.cc:1393-1435``
  (template weights zeroed at invalid-disparity taps, normalized by the
  float32 running sum; returns the good-pixel count).
* bilinear / zero-edge sampling    — ``src/vw/Image/Interpolation.h:76-111``
  + ZeroEdgeExtension (the exact-integer shortcut included).
* ``subpixel_optimized_affine_2d_EM`` — ``src/vw/Stereo/Correlate.cc:500-845``
  (identity-initialized row-major 6-param affine; the 10-outer /
  M_MAX_EM_ITER=2 inner iteration; the plane/noise Gaussian mixture with
  exponent guard -75; the weight<1e-26 skip path; the < 1e-3 conv_error
  early stop; d += lhs AFTER the EM loop; the rising-|sum I_e| outer stop;
  the integer-division kern_width/2 translation cap; final NaN /
  max-translation invalidation; serial in-place disparity mutation so
  earlier pixels' invalidations feed later windows' weights).
* ``subpixel_optimized_affine_2d`` — ``src/vw/Stereo/Correlate.cc:848-1199``
  (plain weighted Gauss-Newton: no mixture, no skip path, robust_weight=1,
  and the quarter-kernel-weighted ``norm_2(weighted_lhs) < 0.05`` stop
  AFTER the ``d += lhs`` update).

Like the other oracles this is deliberately unoptimized and MUST stay
confined to ``tests/`` (never imported by ``visionworkbench_tpu``).
"""

from __future__ import annotations

import math

import numpy as np

F = np.float32


def compute_spatial_weight_image(kern_width: int, kern_height: int,
                                 two_sigma_sqr: float) -> np.ndarray:
    """(kh, kw) normalized Gaussian (Correlate.cc:36-55; returned in
    [row, col] = (j, i) numpy order)."""
    cx, cy = kern_width // 2, kern_height // 2
    weight = np.zeros((kern_height, kern_width), F)
    s = F(0.0)
    for j in range(kern_height):
        for i in range(kern_width):
            weight[j, i] = F(math.exp(-((i - cx) ** 2 + (j - cy) ** 2)
                                      / two_sigma_sqr))
            s = F(s + weight[j, i])
    return (weight / s).astype(F)


def adjust_weight_image(disp_patch_valid: np.ndarray,
                        weight_template: np.ndarray):
    """-> (weight (kh, kw) float32, num_good_pix)  (Correlate.cc:1393-1435).
    ``disp_patch_valid``: (kh, kw) bool validity of the disparity patch."""
    kh, kw = weight_template.shape
    weight = np.zeros((kh, kw), F)
    s = F(0.0)
    good = 0
    for j in range(kh):
        for i in range(kw):
            if not disp_patch_valid[j, i]:
                weight[j, i] = F(0.0)
            else:
                weight[j, i] = weight_template[j, i]
                s = F(s + weight[j, i])
                good += 1
    if s == 0:
        raise ArithmeticError("subpixel_weight: sum of weight image was zero")
    return (weight / s).astype(F), good


def bilinear_zero_edge(img: np.ndarray, xx: float, yy: float) -> F:
    """Interpolation.h:76-111 with ZeroEdgeExtension: float32 math, the
    exact-integer shortcut, out-of-bounds taps read 0."""
    rows, cols = img.shape

    def at(x, y):
        if 0 <= x < cols and 0 <= y < rows:
            return img[y, x]
        return F(0.0)

    x = int(math.floor(xx))
    y = int(math.floor(yy))
    if x == xx and y == yy:
        return at(x, y)
    nx = F(F(xx) - F(x))
    ny = F(F(yy) - F(y))
    result = F(F(at(x, y) * F(1 - nx) + at(x + 1, y) * nx) * F(1 - ny))
    row = F(at(x, y + 1) * F(1 - nx) + at(x + 1, y + 1) * nx)
    return F(result + row * ny)


def derivative_filter_15(img: np.ndarray, x_deriv: int,
                         y_deriv: int) -> np.ndarray:
    """The default [0.5, 0, -0.5] first-derivative filter with constant
    (zero) edge extension (Filter.h:252-290 / Filter.tcc:85-140) — matches
    visionworkbench_tpu.image.filters.derivative_filter."""
    out = np.zeros_like(img, F)
    rows, cols = img.shape
    pad = np.pad(img, 1).astype(F)
    if x_deriv == 1:
        for y in range(rows):
            for x in range(cols):
                out[y, x] = F(0.5) * pad[y + 1, x + 2] - F(0.5) * pad[y + 1, x]
    elif y_deriv == 1:
        for y in range(rows):
            for x in range(cols):
                out[y, x] = F(0.5) * pad[y + 2, x + 1] - F(0.5) * pad[y, x + 1]
    else:
        raise ValueError("only first derivatives")
    return out


def subpixel_optimized_affine_2d_em(disparity: np.ndarray, valid: np.ndarray,
                                    left: np.ndarray, right: np.ndarray,
                                    kern_width: int, kern_height: int,
                                    em_inner_iters: int = 2,
                                    outer_iters: int = 10):
    """Correlate.cc:500-845, loop-for-loop. ``disparity`` (H, W, 2) float32
    (dx, dy), ``valid`` (H, W) bool; both are MUTATED in place (serial
    raster order, like the reference's in-place ImageView writes) and also
    returned. ``em_inner_iters=0`` keeps this skeleton with the mixture
    disabled (gamma_plane = 1); the reference's distinct plain-affine
    termination lives in ``subpixel_optimized_affine_2d`` below."""
    disparity = disparity.astype(F)
    rows, cols = left.shape
    M_MAX_EM_ITER = max(em_inner_iters, 1)
    use_em = em_inner_iters > 0
    two_sigma_sqr = F(2.0 * (float(kern_width) / 5.0) ** 2)
    max_translation = F(kern_width // 2)      # int division, like the C++
    khh, khw = kern_height // 2, kern_width // 2
    kern_pixels = kern_height * kern_width
    weight_threshold = kern_pixels // 2

    x_deriv = derivative_filter_15(left, 1, 0)
    y_deriv = derivative_filter_15(left, 0, 1)
    weight_template = compute_spatial_weight_image(kern_width, kern_height,
                                                   two_sigma_sqr)

    for y in range(khh, rows - khh):
        for x in range(khw, cols - khw):
            if not valid[y, x]:
                continue
            d = np.array([1, 0, 0, 0, 1, 0], F)

            py0, px0 = y - khh, x - khw
            patch_valid = valid[py0:py0 + kern_height, px0:px0 + kern_width]
            left_patch = left[py0:py0 + kern_height, px0:px0 + kern_width]
            ix_patch = x_deriv[py0:py0 + kern_height, px0:px0 + kern_width]
            iy_patch = y_deriv[py0:py0 + kern_height, px0:px0 + kern_width]

            try:
                w, good_pixels = adjust_weight_image(patch_valid,
                                                     weight_template)
            except ArithmeticError:
                valid[y, x] = False
                continue
            if good_pixels < weight_threshold:
                valid[y, x] = False
                continue

            curr_sum_ie = F(0.0)
            prev_sum_ie = F(0.0)
            for it in range(outer_iters):
                if math.hypot(d[2], d[5]) > max_translation:
                    break
                if math.isnan(d[2]) or math.isnan(d[5]):
                    # A zero mixture denominator NaN-poisons lhs and then d
                    # (the C++ has no guard: gamma = 0*w/0, Correlate.cc:
                    # 676-678); the C++ keeps looping on NaN (its interp
                    # clamps the insane coordinates to zero reads) but d
                    # stays NaN and the final isnan check invalidates —
                    # breaking here is result-equivalent and avoids
                    # floor(NaN).
                    break
                x_base = F(F(x) + disparity[y, x, 0])
                y_base = F(F(y) + disparity[y, x, 1])

                lhs = np.zeros(6, F)
                prev_lhs = np.zeros(6, F)
                var2_plane = F(1e-3)
                mean_noise = F(0.0)
                var2_noise = F(1e-2)
                w_plane = F(0.8)
                w_noise = F(0.2)
                in_curr_sum_ie = F(0.0)
                d_em = d.copy()

                for em_iter in range(M_MAX_EM_ITER):
                    noise_nf = F(1.0 / math.sqrt(2 * math.pi * var2_noise))
                    plane_nf = F(1.0 / math.sqrt(2 * math.pi * var2_plane))
                    lhs = np.zeros(6, F)
                    rhs = np.zeros((6, 6), F)
                    in_curr_sum_ie = F(0.0)
                    mean_noise_tmp = F(0.0)
                    sum_gamma_noise = F(0.0)
                    sum_gamma_plane = F(0.0)
                    skip = 0
                    for jj in range(-khh, khh + 1):
                        xx_partial = F(x_base + d[1] * jj + d[2])
                        yy_partial = F(y_base + d[4] * jj + d[5])
                        dx_partial = F(d_em[1] * jj + d_em[2])
                        dy_partial = F(d_em[4] * jj + d_em[5])
                        for ii in range(-khw, khw + 1):
                            wj, wi = jj + khh, ii + khw
                            xx = F(d[0] * ii + xx_partial)
                            yy = F(d[3] * ii + yy_partial)
                            ipx = bilinear_zero_edge(right, xx, yy)
                            ie = F(ipx - left_patch[wj, wi])
                            in_curr_sum_ie = F(in_curr_sum_ie + ie)
                            if use_em:
                                delta_x = F(d_em[0] * ii + dx_partial)
                                delta_y = F(d_em[3] * ii + dy_partial)
                                tp = F(ie - delta_x * ix_patch[wj, wi]
                                       - delta_y * iy_patch[wj, wi])
                                tn = F(ipx - mean_noise)
                                ppe = F(-(tp * tp) / (2 * var2_plane))
                                pp = F(0.0) if ppe < -75 else F(plane_nf
                                                                * math.exp(ppe))
                                npe = F(-(tn * tn) / (2 * var2_noise))
                                npr = F(0.0) if npe < -75 else F(noise_nf
                                                                 * math.exp(npe))
                                ssum = F(pp * w_plane + npr * w_noise)
                                gamma_plane = F(pp * w_plane / ssum)
                                gamma_noise = F(npr * w_noise / ssum)
                                mean_noise_tmp = F(mean_noise_tmp
                                                   + ipx * gamma_noise)
                                sum_gamma_plane = F(sum_gamma_plane
                                                    + gamma_plane)
                                sum_gamma_noise = F(sum_gamma_noise
                                                    + gamma_noise)
                            else:
                                gamma_plane = F(1.0)
                            weight = F(gamma_plane * w[wj, wi])
                            if weight < 1e-26:
                                skip += 1
                                continue
                            ixv = F(weight * ix_patch[wj, wi])
                            iyv = F(weight * iy_patch[wj, wi])
                            ix2 = F(ixv * ix_patch[wj, wi])
                            iy2 = F(iyv * iy_patch[wj, wi])
                            ixy = F(ixv * iy_patch[wj, wi])
                            lhs[0] -= F(ii * ixv * ie)
                            lhs[1] -= F(jj * ixv * ie)
                            lhs[2] -= F(ixv * ie)
                            lhs[3] -= F(ii * iyv * ie)
                            lhs[4] -= F(jj * iyv * ie)
                            lhs[5] -= F(iyv * ie)
                            m0, m1, m2 = F(ii * ii), F(ii * jj), F(jj * jj)
                            rhs[0, 0] += F(m0 * ix2)
                            rhs[0, 1] += F(m1 * ix2)
                            rhs[0, 2] += F(ii * ix2)
                            rhs[1, 1] += F(m2 * ix2)
                            rhs[1, 2] += F(jj * ix2)
                            rhs[2, 2] += F(ix2)
                            rhs[0, 3] += F(m0 * ixy)
                            rhs[0, 4] += F(m1 * ixy)
                            rhs[0, 5] += F(ii * ixy)
                            rhs[1, 4] += F(m2 * ixy)
                            rhs[1, 5] += F(jj * ixy)
                            rhs[2, 5] += F(ixy)
                            rhs[3, 3] += F(m0 * iy2)
                            rhs[3, 4] += F(m1 * iy2)
                            rhs[3, 5] += F(ii * iy2)
                            rhs[4, 4] += F(m2 * iy2)
                            rhs[4, 5] += F(jj * iy2)
                            rhs[5, 5] += F(iy2)
                    if skip == kern_pixels:
                        break
                    # symmetric fills incl. the cross-block aliases
                    # (Correlate.cc:784-795)
                    rhs[1, 0] = rhs[0, 1]
                    rhs[2, 0] = rhs[0, 2]
                    rhs[2, 1] = rhs[1, 2]
                    rhs[3, 0] = rhs[0, 3]
                    rhs[1, 3] = rhs[3, 1] = rhs[4, 0] = rhs[0, 4]
                    rhs[2, 3] = rhs[3, 2] = rhs[5, 0] = rhs[0, 5]
                    rhs[4, 1] = rhs[1, 4]
                    rhs[2, 4] = rhs[4, 2] = rhs[5, 1] = rhs[1, 5]
                    rhs[5, 2] = rhs[2, 5]
                    rhs[4, 3] = rhs[3, 4]
                    rhs[5, 3] = rhs[3, 5]
                    rhs[5, 4] = rhs[4, 5]
                    try:
                        if not np.isfinite(rhs).all():
                            raise np.linalg.LinAlgError  # NaN-poisoned: the
                            # C++ posv returns garbage/NaN and d goes NaN
                        c = np.linalg.cholesky(rhs.astype(F))
                        sol = np.linalg.solve(
                            c.T.astype(F),
                            np.linalg.solve(c.astype(F),
                                            lhs.astype(F)).astype(F))
                        lhs = sol.astype(F)
                    except np.linalg.LinAlgError:
                        pass    # posv info != 0: reference ignores it
                    if use_em:
                        mean_noise = F(mean_noise_tmp / sum_gamma_noise)
                        w_plane = F(sum_gamma_plane / F(kern_pixels))
                        w_noise = F(sum_gamma_noise / F(kern_pixels))
                    conv_error = F(np.linalg.norm(
                        (prev_lhs - lhs).astype(F)))
                    d_em = (d + lhs).astype(F)
                    if in_curr_sum_ie < 0:
                        in_curr_sum_ie = F(-in_curr_sum_ie)
                    curr_sum_ie = in_curr_sum_ie
                    prev_lhs = lhs.copy()
                    if conv_error < 1e-3 and em_iter > 0:
                        break

                d = (d + lhs).astype(F)
                if curr_sum_ie < 0:
                    curr_sum_ie = F(-curr_sum_ie)
                if prev_sum_ie < curr_sum_ie and it > 0:
                    break
                prev_sum_ie = curr_sum_ie

            if (math.hypot(d[2], d[5]) > max_translation
                    or math.isnan(d[2]) or math.isnan(d[5])):
                valid[y, x] = False
            else:
                disparity[y, x, 0] = F(disparity[y, x, 0] + d[2])
                disparity[y, x, 1] = F(disparity[y, x, 1] + d[5])
    return disparity, valid


def subpixel_optimized_affine_2d(disparity: np.ndarray, valid: np.ndarray,
                                 left: np.ndarray, right: np.ndarray,
                                 kern_width: int, kern_height: int,
                                 outer_iters: int = 10):
    """Correlate.cc:848-1199, loop-for-loop: the plain weighted affine
    Gauss-Newton refiner (no mixture, no skip path, robust_weight = 1), with
    the reference's quarter-kernel-weighted ``norm_2(weighted_lhs) < 0.05``
    termination taken AFTER ``d += lhs``. Mutates (disparity, valid) in
    serial raster order like the reference's in-place writes."""
    disparity = disparity.astype(F)
    rows, cols = left.shape
    two_sigma_sqr = F(2.0 * (float(kern_width) / 5.0) ** 2)
    max_translation = F(kern_width // 2)      # int division, like the C++
    khh, khw = kern_height // 2, kern_width // 2
    kern_pixels = kern_height * kern_width
    min_good = kern_pixels // 2
    kqh, kqw = khh // 2, khw // 2

    x_deriv = derivative_filter_15(left, 1, 0)
    y_deriv = derivative_filter_15(left, 0, 1)
    weight_template = compute_spatial_weight_image(kern_width, kern_height,
                                                   two_sigma_sqr)

    for y in range(khh, rows - khh):
        for x in range(khw, cols - khw):
            if not valid[y, x]:
                continue
            d = np.array([1, 0, 0, 0, 1, 0], F)
            py0, px0 = y - khh, x - khw
            patch_valid = valid[py0:py0 + kern_height, px0:px0 + kern_width]
            left_patch = left[py0:py0 + kern_height, px0:px0 + kern_width]
            ix_patch = x_deriv[py0:py0 + kern_height, px0:px0 + kern_width]
            iy_patch = y_deriv[py0:py0 + kern_height, px0:px0 + kern_width]
            try:
                w, good_pixels = adjust_weight_image(patch_valid,
                                                     weight_template)
            except ArithmeticError:
                valid[y, x] = False
                continue
            if good_pixels < min_good:
                valid[y, x] = False
                continue

            for it in range(outer_iters):
                if math.hypot(d[2], d[5]) > max_translation:
                    break
                x_base = F(F(x) + disparity[y, x, 0])
                y_base = F(F(y) + disparity[y, x, 1])
                lhs = np.zeros(6, F)
                rhs = np.zeros((6, 6), F)
                for jj in range(-khh, khh + 1):
                    xx_partial = F(x_base + d[1] * jj + d[2])
                    yy_partial = F(y_base + d[4] * jj + d[5])
                    for ii in range(-khw, khw + 1):
                        wj, wi = jj + khh, ii + khw
                        xx = F(d[0] * ii + xx_partial)
                        yy = F(d[3] * ii + yy_partial)
                        ipx = bilinear_zero_edge(right, xx, yy)
                        ie = F(ipx - left_patch[wj, wi])
                        weight = w[wj, wi]
                        ixv = F(weight * ix_patch[wj, wi])
                        iyv = F(weight * iy_patch[wj, wi])
                        ix2 = F(ixv * ix_patch[wj, wi])
                        iy2 = F(iyv * iy_patch[wj, wi])
                        ixy = F(ixv * iy_patch[wj, wi])
                        ixie = F(ixv * ie)
                        iyie = F(iyv * ie)
                        lhs[0] -= F(ii * ixie)
                        lhs[1] -= F(jj * ixie)
                        lhs[2] -= ixie
                        lhs[3] -= F(ii * iyie)
                        lhs[4] -= F(jj * iyie)
                        lhs[5] -= iyie
                        m0, m1, m2 = F(ii * ii), F(ii * jj), F(jj * jj)
                        rhs[0, 0] += F(m0 * ix2)
                        rhs[0, 1] += F(m1 * ix2)
                        rhs[0, 2] += F(ii * ix2)
                        rhs[1, 1] += F(m2 * ix2)
                        rhs[1, 2] += F(jj * ix2)
                        rhs[2, 2] += F(ix2)
                        rhs[0, 3] += F(m0 * ixy)
                        rhs[0, 4] += F(m1 * ixy)
                        rhs[0, 5] += F(ii * ixy)
                        rhs[1, 4] += F(m2 * ixy)
                        rhs[1, 5] += F(jj * ixy)
                        rhs[2, 5] += F(ixy)
                        rhs[3, 3] += F(m0 * iy2)
                        rhs[3, 4] += F(m1 * iy2)
                        rhs[3, 5] += F(ii * iy2)
                        rhs[4, 4] += F(m2 * iy2)
                        rhs[4, 5] += F(jj * iy2)
                        rhs[5, 5] += F(iy2)
                rhs[1, 0] = rhs[0, 1]
                rhs[2, 0] = rhs[0, 2]
                rhs[2, 1] = rhs[1, 2]
                rhs[3, 0] = rhs[0, 3]
                rhs[1, 3] = rhs[3, 1] = rhs[4, 0] = rhs[0, 4]
                rhs[2, 3] = rhs[3, 2] = rhs[5, 0] = rhs[0, 5]
                rhs[4, 1] = rhs[1, 4]
                rhs[2, 4] = rhs[4, 2] = rhs[5, 1] = rhs[1, 5]
                rhs[5, 2] = rhs[2, 5]
                rhs[4, 3] = rhs[3, 4]
                rhs[5, 3] = rhs[3, 5]
                rhs[5, 4] = rhs[4, 5]
                try:
                    c = np.linalg.cholesky(rhs.astype(F))
                    sol = np.linalg.solve(
                        c.T.astype(F),
                        np.linalg.solve(c.astype(F), lhs.astype(F)).astype(F))
                    lhs = sol.astype(F)
                except np.linalg.LinAlgError:
                    pass    # posv info != 0: reference ignores it
                d = (d + lhs).astype(F)
                weighted = lhs.copy()
                weighted[0] = F(weighted[0] * kqw)
                weighted[1] = F(weighted[1] * kqh)
                weighted[3] = F(weighted[3] * kqw)
                weighted[4] = F(weighted[4] * kqh)
                if F(np.linalg.norm(weighted.astype(F))) < 0.05:
                    break

            if (math.hypot(d[2], d[5]) > max_translation
                    or math.isnan(d[2]) or math.isnan(d[5])):
                valid[y, x] = False
            else:
                disparity[y, x, 0] = F(disparity[y, x, 0] + d[2])
                disparity[y, x, 1] = F(disparity[y, x, 1] + d[5])
    return disparity, valid
