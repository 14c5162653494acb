"""Disparity-map utilities (ref ``src/vw/Stereo/DisparityMap.h``) and the
L-R consistency check (ref ``src/vw/Stereo/Correlate.cc:1441-1502``)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visionworkbench_tpu.math.bbox import BBox2, BBox2i
from visionworkbench_tpu.stereo.correlation import DisparityMap


def get_disparity_range(dm: DisparityMap) -> BBox2i:
    """Min/max disparity over valid pixels (ref ``get_disparity_range``,
    DisparityMap.h:52-66; unlike the reference we skip invalid pixels — its
    in-tree TODO notes that including them is a bug). Host-side: concretizes.
    Returns a max-exclusive integer box containing the (dx, dy) range."""
    disp = np.asarray(dm.disparity)
    valid = np.asarray(dm.valid)
    if not valid.any():
        return BBox2i(0, 0, 0, 0)
    vals = disp[valid]
    mn = np.floor(vals.min(axis=0)).astype(int)
    mx = np.ceil(vals.max(axis=0)).astype(int)
    return BBox2i.from_bounds(int(mn[0]), int(mn[1]), int(mx[0]) + 1, int(mx[1]) + 1)


def disparity_mask(dm: DisparityMap, left_mask, right_mask,
                   disparity_bounds: Optional[BBox2i] = None) -> DisparityMap:
    """Invalidate disparities whose left pixel is masked or whose right-image
    target pixel is masked (ref ``disparity_mask``, DisparityMap.h:248).

    ``disparity_bounds``: optional *static* max-exclusive box known to contain
    every (integer) disparity. When given and small, the right-mask lookup is
    evaluated as a fused select over statically-shifted mask slices instead of
    a per-pixel gather — 1-Mpx mask gathers cost ~3-11 ms on this toolchain
    while the select chain fuses into one elementwise pass."""
    h, w = dm.valid.shape
    rh, rw = right_mask.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dxp = dm.disparity[..., 0].astype(jnp.int32)
    dyp = dm.disparity[..., 1].astype(jnp.int32)
    tx = xs + dxp
    ty = ys + dyp
    in_bounds = (tx >= 0) & (tx < rw) & (ty >= 0) & (ty < rh)
    use_select = (
        disparity_bounds is not None
        and disparity_bounds.width * disparity_bounds.height <= 160
        and disparity_bounds.min_y >= 0 and disparity_bounds.min_x >= 0
        and disparity_bounds.max_y - 1 + h <= rh
        and disparity_bounds.max_x - 1 + w <= rw)
    if use_select:
        right_ok = jnp.zeros((h, w), bool)
        for sy in range(int(disparity_bounds.min_y), int(disparity_bounds.max_y)):
            for sx in range(int(disparity_bounds.min_x), int(disparity_bounds.max_x)):
                hit = (dyp == sy) & (dxp == sx)
                shifted = jax.lax.slice(right_mask, (sy, sx), (sy + h, sx + w))
                right_ok = right_ok | (hit & shifted)
    else:
        txc = jnp.clip(tx, 0, rw - 1)
        tyc = jnp.clip(ty, 0, rh - 1)
        right_ok = right_mask[tyc, txc]
    right_ok = jnp.where(in_bounds, right_ok, False)
    valid = dm.valid & left_mask & right_ok
    return DisparityMap(jnp.where(valid[..., None], dm.disparity, 0), valid)


def _tree_sum(planes):
    """Pairwise-tree sum of equal-shape planes (log-depth add chain: XLA
    fuses several adds per kernel, so the accumulator round-trips HBM
    O(log n) times instead of O(n))."""
    while len(planes) > 1:
        nxt = [planes[i] + planes[i + 1] for i in range(0, len(planes) - 1, 2)]
        if len(planes) % 2:
            nxt.append(planes[-1])
        planes = nxt
    return planes[0]


@functools.partial(jax.jit, static_argnames=("half_h", "half_v"))
def _rm_outliers(disp, valid, half_h: int, half_v: int,
                 pixel_threshold: float, rejection_threshold: float):
    h, w = valid.shape
    dx = disp[..., 0].astype(jnp.float32)
    dy = disp[..., 1].astype(jnp.float32)
    # Replicated-edge neighborhoods (ref wraps in ConstantEdgeExtension).
    # Each window offset is a *static* slice of the padded planes — XLA fuses
    # the whole agreement count into one elementwise kernel, with no gather
    # and no (n_offsets, H, W) volume through HBM (the earlier vmapped
    # dynamic_slice formulation profiled at ~11 ms on a 1024^2 frame).
    pdx = jnp.pad(dx, ((half_v, half_v), (half_h, half_h)), mode="edge")
    pdy = jnp.pad(dy, ((half_v, half_v), (half_h, half_h)), mode="edge")
    pva = jnp.pad(valid, ((half_v, half_v), (half_h, half_h)), mode="edge")
    nx = 2 * half_h + 1
    oks = []
    for i in range(2 * half_v + 1):
        for j in range(nx):
            ndx = jax.lax.slice(pdx, (i, j), (i + h, j + w))
            ndy = jax.lax.slice(pdy, (i, j), (i + h, j + w))
            nva = jax.lax.slice(pva, (i, j), (i + h, j + w))
            ok = (nva & (jnp.abs(dx - ndx) <= pixel_threshold)
                  & (jnp.abs(dy - ndy) <= pixel_threshold))
            oks.append(ok.astype(jnp.int32))
    matched = _tree_sum(oks)
    total = (2 * half_v + 1) * nx
    keep = (matched.astype(jnp.float32) / total) >= rejection_threshold
    new_valid = valid & keep
    return jnp.where(new_valid[..., None], disp, jnp.zeros_like(disp)), new_valid


def _pack_code(disp, valid):
    """(dx, dy, valid) -> one int32 code plane: dx field << 14, dy low 14
    bits (both offset by 8192), invalid or out-of-band (|d| >= 8191) pixels
    code 0, whose dx-field difference vs any in-band value exceeds any
    threshold <= 26 — so they can never falsely agree."""
    dxi = jnp.round(disp[..., 0]).astype(jnp.int32)
    dyi = jnp.round(disp[..., 1]).astype(jnp.int32)
    in_band = valid & (jnp.abs(dxi) < 8191) & (jnp.abs(dyi) < 8191)
    code = ((dxi + 8192) << 14) | (dyi + 8192)
    return jnp.where(in_band, code, 0)


def _min_match(total: int, rejection_threshold: float) -> int:
    """Smallest integer m with float32(m)/float32(total) >= rej — the exact
    integer form of the float-path keep test."""
    rej = np.float32(rejection_threshold)
    for m in range(total + 1):
        if np.float32(m) / np.float32(total) >= rej:
            return m
    return total + 1


@functools.partial(jax.jit, static_argnames=("half_h", "half_v",
                                             "pixel_threshold"))
def _rm_outliers_int(disp, valid, half_h: int, half_v: int,
                     pixel_threshold: float, rejection_threshold: float):
    """Integer-disparity XLA fast path (packed one-plane form of
    ``_rm_outliers``; bit-identical on integer-valued disparities with
    |d| < 8191). Fallback for shapes the Pallas stencil kernel
    (``ops/speckle.py``) does not take."""
    h, w = valid.shape
    t = int(np.floor(pixel_threshold))
    code = _pack_code(disp, valid)
    pc = jnp.pad(code, ((half_v, half_v), (half_h, half_h)), mode="edge")
    cdx = code >> 14
    cdy = code & 0x3FFF
    nx = 2 * half_h + 1
    oks = []
    for i in range(2 * half_v + 1):
        for j in range(nx):
            nc = jax.lax.slice(pc, (i, j), (i + h, j + w))
            ok = ((jnp.abs(cdx - (nc >> 14)) <= t)
                  & (jnp.abs(cdy - (nc & 0x3FFF)) <= t))
            oks.append(ok.astype(jnp.int32))
    matched = _tree_sum(oks)
    total = (2 * half_v + 1) * nx
    keep = (matched.astype(jnp.float32) / total) >= rejection_threshold
    # A center pixel with in-band integer disparity always matches itself,
    # so `matched` counts exactly the reference's agreeing neighbours; the
    # final valid mask still gates on the incoming validity.
    new_valid = valid & keep
    return jnp.where(new_valid[..., None], disp, jnp.zeros_like(disp)), new_valid


def _rm_outliers_int_dispatch(disp, valid, half_h: int, half_v: int,
                              pixel_threshold: float,
                              rejection_threshold: float):
    """Route integer-disparity speckle filtering to the Pallas stencil
    kernel (VMEM-resident window; ops/speckle.py) when the frame is
    TPU-tile aligned, else to the packed-XLA path."""
    import os
    h, w = valid.shape
    t = int(np.floor(pixel_threshold))
    use_kernel = (os.environ.get("VWTPU_SPECKLE_KERNEL", "1") == "1"
                  and w % 128 == 0 and h % 8 == 0 and h >= 64
                  and jax.default_backend() == "tpu")
    if not use_kernel:
        return _rm_outliers_int(disp, valid, half_h, half_v,
                                float(pixel_threshold),
                                float(rejection_threshold))
    from visionworkbench_tpu.ops.speckle import speckle_keep_mask
    total = (2 * half_v + 1) * (2 * half_h + 1)
    code = _pack_code(disp, valid)
    keep = speckle_keep_mask(code, half_h, half_v, t,
                             _min_match(total, rejection_threshold)) != 0
    new_valid = valid & keep
    return jnp.where(new_valid[..., None], disp, jnp.zeros_like(disp)), new_valid


def rm_outliers_using_thresh(dm: DisparityMap, half_h_kernel: int, half_v_kernel: int,
                             pixel_threshold: float,
                             rejection_threshold: float,
                             integer_disparities: bool = False) -> DisparityMap:
    """Neighborhood-agreement speckle filter (ref ``rm_outliers_using_thresh``,
    DisparityMap.h:405-433): a valid pixel survives iff the fraction of window
    neighbors that are valid and within ``pixel_threshold`` in both disparity
    channels is at least ``rejection_threshold``.

    ``integer_disparities``: promise that every disparity is integer-valued
    (true for all pre-subpixel pyramid levels) — enables the packed-code
    fast path (bit-identical result, ~2x less HBM traffic)."""
    fn = _rm_outliers_int_dispatch if integer_disparities else _rm_outliers
    disp, valid = fn(dm.disparity, dm.valid, int(half_h_kernel),
                     int(half_v_kernel), float(pixel_threshold),
                     float(rejection_threshold))
    return DisparityMap(disp, valid)


def disparity_cleanup_using_thresh(dm: DisparityMap, half_h_kernel: int,
                                   half_v_kernel: int, pixel_threshold: float,
                                   rejection_threshold: float,
                                   integer_disparities: bool = False) -> DisparityMap:
    """Two-pass cleanup; second pass hard-coded to (1, 1, 3.0, 0.20)
    (ref ``disparity_cleanup_using_thresh``, DisparityMap.h:426-447)."""
    out = rm_outliers_using_thresh(dm, half_h_kernel, half_v_kernel,
                                   pixel_threshold, rejection_threshold,
                                   integer_disparities)
    return rm_outliers_using_thresh(out, 1, 1, 3.0, 0.20,
                                    integer_disparities)


@jax.jit
def _cross_corr(l2r_disp, l2r_valid, r2l_disp, r2l_valid, threshold):
    h, w = l2r_valid.shape
    rh, rw = r2l_valid.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    tx = xs + l2r_disp[..., 0].astype(jnp.int32)
    ty = ys + l2r_disp[..., 1].astype(jnp.int32)
    in_bounds = (tx >= 0) & (tx < rw) & (ty >= 0) & (ty < rh)
    txc = jnp.clip(tx, 0, rw - 1)
    tyc = jnp.clip(ty, 0, rh - 1)
    rvalid = r2l_valid[tyc, txc]
    rdx = r2l_disp[..., 0][tyc, txc].astype(jnp.float32)
    rdy = r2l_disp[..., 1][tyc, txc].astype(jnp.float32)
    diff = jnp.maximum(jnp.abs(l2r_disp[..., 0].astype(jnp.float32) + rdx),
                       jnp.abs(l2r_disp[..., 1].astype(jnp.float32) + rdy))
    valid = l2r_valid & in_bounds & rvalid & (diff <= threshold)
    return jnp.where(valid[..., None], l2r_disp, jnp.zeros_like(l2r_disp)), valid, diff


def cross_corr_consistency_check(l2r: DisparityMap, r2l: DisparityMap,
                                 cross_corr_threshold: float = 2.0,
                                 return_diff: bool = False):
    """L-to-R vs R-to-L agreement test (ref ``cross_corr_consistency_check``,
    Correlate.cc:1441-1502): pixel survives iff the R-L disparity at its match
    target negates its own disparity to within the threshold."""
    disp, valid, diff = _cross_corr(l2r.disparity, l2r.valid,
                                    r2l.disparity, r2l.valid,
                                    jnp.float32(cross_corr_threshold))
    out = DisparityMap(disp, valid)
    if return_diff:
        return out, diff
    return out


@jax.jit
def _disparity_subsample(disp, valid):
    h, w = valid.shape
    oh, ow = 1 + (h - 1) // 2, 1 + (w - 1) // 2
    dispf = disp.astype(jnp.float32)
    pd = jnp.pad(dispf, ((1, 2), (1, 2), (0, 0)), mode="edge")
    pv = jnp.pad(valid, ((1, 2), (1, 2)), mode="edge")
    # Weights per the reference (DisparityMap.h:1267-1305): center 10,
    # 4-neighbors 5, diagonals 2; result = weighted sum / (2 * weight_sum)
    # (the /2 rescales disparities to the coarser level).
    offsets = [(0, 0, 10.0), (1, 0, 5.0), (0, 1, 5.0), (-1, 0, 5.0), (0, -1, 5.0),
               (1, 1, 2.0), (-1, -1, 2.0), (-1, 1, 2.0), (1, -1, 2.0)]
    ci = 2 * jax.lax.broadcasted_iota(jnp.int32, (oh, ow), 1) + 1
    cj = 2 * jax.lax.broadcasted_iota(jnp.int32, (oh, ow), 0) + 1
    acc = jnp.zeros((oh, ow, 2), jnp.float32)
    cnt = jnp.zeros((oh, ow), jnp.float32)
    for (di, dj, wgt) in offsets:
        yy = cj + dj
        xx = ci + di
        v = pv[yy, xx]
        acc = acc + jnp.where(v[..., None], wgt * pd[yy, xx], 0.0)
        cnt = cnt + jnp.where(v, wgt, 0.0)
    out_valid = cnt > 0
    safe = jnp.maximum(cnt, 1.0)
    out = acc / (safe[..., None] * 2.0)
    return jnp.where(out_valid[..., None], out, 0.0), out_valid


def disparity_subsample(dm: DisparityMap) -> DisparityMap:
    """Half-resolution disparity with validity-weighted averaging and /2
    disparity rescale (ref ``DisparitySubsampleView``, DisparityMap.h:1253-1320)."""
    disp, valid = _disparity_subsample(dm.disparity, dm.valid)
    return DisparityMap(disp, valid)


def disparity_upsample(dm: DisparityMap) -> DisparityMap:
    """2x nearest upsample with disparities doubled
    (ref ``DisparityUpsampleView``, DisparityMap.h:1326-1360)."""
    disp = jnp.repeat(jnp.repeat(dm.disparity * 2, 2, axis=0), 2, axis=1)
    valid = jnp.repeat(jnp.repeat(dm.valid, 2, axis=0), 2, axis=1)
    return DisparityMap(disp, valid)


def std_dev_image(image, kernel_w: int, kernel_h: int):
    """Windowed standard deviation (ref ``UnaryPerPixelAccessorView`` StdDev
    functor in DisparityMap.h): sqrt(E[x^2] - E[x]^2) over the kernel window."""
    from visionworkbench_tpu.ops.box_filter import box_sum_same
    image = jnp.asarray(image, jnp.float32)
    n = float(kernel_w * kernel_h)
    s1 = box_sum_same(image, kernel_w, kernel_h, edge="constant") / n
    s2 = box_sum_same(image * image, kernel_w, kernel_h, edge="constant") / n
    return jnp.sqrt(jnp.maximum(s2 - s1 * s1, 0.0))


def transform_disparities(dm: DisparityMap, transform_fn) -> DisparityMap:
    """Apply a 2D point transform to the *target* coordinates of each
    disparity (ref ``transform_disparities``, DisparityMap.h:1048): new
    disparity = T(p + d) - p."""
    h, w = dm.valid.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    tx = xs + dm.disparity[..., 0].astype(jnp.float32)
    ty = ys + dm.disparity[..., 1].astype(jnp.float32)
    nx, ny = transform_fn(tx, ty)
    out = jnp.stack([nx - xs, ny - ys], axis=-1)
    return DisparityMap(jnp.where(dm.valid[..., None], out, 0.0), dm.valid)
