"""Semi-global matching (SGM/MGM)
(ref ``SemiGlobalMatcher``, ``src/vw/Stereo/SGM.h:75-375``, ``SGM.cc``,
``SGMAssist.h:36-553``).

Reference semantics preserved:
* census / ternary-census hamming costs over the 2D (dx, dy) search volume
  with the reference's per-kernel default penalties (``SGM.cc:104-160``)
* path update ``L(p,d) = C(p,d) + min(prior[d], min_nbhd(prior)+P1,
  min_prior+P2') - min_prior`` with the adaptive jump cost
  ``P2' = max(P2/|dI|, P1)`` (``evaluate_path``, SGM.cc:806-850); the P1 band
  is the 3x3 neighborhood in the (dx, dy) disparity grid
* 8-path aggregation; subpixel modes none/parabola/linear/cosine/lc-blend
  (``SgmSubpixelMode``)

TPU formulation: the reference sweeps scanlines with SSE kernels across a
thread pool (``SGM.cc:2462-2531``). Here each direction is one ``lax.scan``
along the scan axis with the full perpendicular line x disparity plane as the
carry — the per-step update is pure VPU work over (H, D) lanes, and the
disparity-grid neighborhood min is a 3x3 ``reduce_window``. Diagonal paths
shift the carry by one row per step. MGM's two-neighbor causal dependency is
rotated into a pure column scan by shearing the image (x' = x + y makes both
causal neighbors live in column x'-1), so it runs as the same scan.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.image.census import (
    census_transform, hamming_distance, ternary_census_transform,
)
from visionworkbench_tpu.stereo.correlation import DisparityMap

_BIG = jnp.float32(1e9)

# Default penalties by (cost, census kernel size) (ref SGM.cc:104-160).
_P1_TABLE = {("census", 3): 3, ("census", 5): 15, ("census", 7): 30,
             ("census", 9): 20,
             ("ternary_census", 3): 12, ("ternary_census", 5): 30,
             ("ternary_census", 7): 40, ("ternary_census", 9): 40}
_P2_TABLE = {("census", 3): 70, ("census", 5): 750, ("census", 7): 1500,
             ("census", 9): 1000,
             ("ternary_census", 3): 600, ("ternary_census", 5): 1500,
             ("ternary_census", 7): 2000, ("ternary_census", 9): 2000}

SUBPIXEL_MODES = ("none", "parabola", "linear", "cosine", "lc_blend")


def _census_cost_volume(left_u8, right_u8, sx: int, sy: int, window: int,
                        ternary: bool, thresh: int):
    """(H, W, sy, sx) float32 hamming cost volume."""
    h, w = left_u8.shape
    if ternary:
        lc = ternary_census_transform(left_u8, window, thresh)
        rc = ternary_census_transform(right_u8, window, thresh)
    else:
        lc = census_transform(left_u8, window)
        rc = census_transform(right_u8, window)
    vols = []
    for dy in range(sy):
        row = []
        for dx in range(sx):
            rshift = lax.dynamic_slice(rc, (dy, dx, 0), (h, w, rc.shape[-1]))
            row.append(hamming_distance(lc, rshift).astype(jnp.float32))
        vols.append(jnp.stack(row, -1))
    return jnp.stack(vols, -2)  # (H, W, sy, sx)


def _nbhd_min(plane, sy: int, sx: int):
    """3x3 min over the (sy, sx) disparity grid; plane (..., sy, sx)."""
    if sy == 1 and sx == 1:
        return plane
    return lax.reduce_window(plane, float("inf"), lax.min,
                             (1,) * (plane.ndim - 2) + (min(3, sy), min(3, sx)),
                             (1,) * plane.ndim, "SAME")


def _path_update(prior, cost, pdiff, p1: float, p2: float, sy: int, sx: int):
    """One SGM step for a whole line: prior/cost (L, sy, sx), pdiff (L,)."""
    min_prior = jnp.min(prior, axis=(-2, -1))                    # (L,)
    p2m = jnp.maximum(p2 / jnp.maximum(pdiff, 1.0), p1)          # (L,)
    nb = _nbhd_min(prior, sy, sx) + p1
    best = jnp.minimum(jnp.minimum(prior, nb),
                       (min_prior + p2m)[..., None, None])
    valid = (min_prior < _BIG / 2)[..., None, None]
    return cost + jnp.where(valid, best - min_prior[..., None, None], 0.0)


def _scan_cols(cost, image, dx_dir: int, dy_dir: int, p1: float, p2: float):
    """Directional pass with scan axis x. cost (H, W, sy, sx); image (H, W).
    dx_dir: +1 scans left->right (predecessor x-1), -1 the reverse.
    dy_dir in {-1, 0, +1} selects the row shift (diagonal paths)."""
    h, w, sy, sx = cost.shape
    c = cost
    img = image
    if dx_dir < 0:
        c = jnp.flip(c, 1)
        img = jnp.flip(img, 1)
    # pdiff along the path: |I(y, x) - I(y - dy, x - 1)| in scan space.
    prev_img = jnp.pad(img, ((0, 0), (1, 0)), mode="edge")[:, :-1]
    if dy_dir > 0:
        prev_img = jnp.pad(prev_img, ((1, 0), (0, 0)), mode="edge")[:-1]
    elif dy_dir < 0:
        prev_img = jnp.pad(prev_img, ((0, 1), (0, 0)), mode="edge")[1:]
    pdiff = jnp.abs(img - prev_img)

    cT = jnp.moveaxis(c, 1, 0)          # (W, H, sy, sx)
    pT = jnp.moveaxis(pdiff, 1, 0)      # (W, H)

    def shift_prior(prior):
        if dy_dir > 0:
            return jnp.concatenate([jnp.full((1, sy, sx), _BIG), prior[:-1]], 0)
        if dy_dir < 0:
            return jnp.concatenate([prior[1:], jnp.full((1, sy, sx), _BIG)], 0)
        return prior

    def step(carry, inp):
        cx, px = inp
        prior = shift_prior(carry)
        out = _path_update(prior, cx, px, p1, p2, sy, sx)
        return out, out

    init = cT[0]
    _, rest = lax.scan(step, init, (cT[1:], pT[1:]))
    out = jnp.concatenate([init[None], rest], 0)
    out = jnp.moveaxis(out, 0, 1)       # (H, W, sy, sx)
    if dx_dir < 0:
        out = jnp.flip(out, 1)
    return out


def _mgm_pass(cost, image, flip_x: bool, flip_y: bool, p1: float, p2: float):
    """One MGM pass combining the two causal neighbors (left and up in scan
    orientation) by averaging their path contributions
    (ref SGMAssist.h:930-947). Implemented by shearing rows (x' = x + y) so
    both neighbors live in the previous sheared column, then scanning x'."""
    h, w, sy, sx = cost.shape
    c = cost
    img = image
    if flip_x:
        c = jnp.flip(c, 1)
        img = jnp.flip(img, 1)
    if flip_y:
        c = jnp.flip(c, 0)
        img = jnp.flip(img, 0)
    ww = w + h
    # Shear: row y occupies columns [y, y+w).
    rows_c = []
    rows_i = []
    for y in range(h):
        pad_l = y
        pad_r = ww - w - y
        rows_c.append(jnp.pad(c[y], ((pad_l, pad_r), (0, 0), (0, 0)),
                              constant_values=0.0))
        rows_i.append(jnp.pad(img[y], (pad_l, pad_r), mode="edge"))
    cs = jnp.stack(rows_c, 0)           # (H, W+H, sy, sx)
    imgs = jnp.stack(rows_i, 0)
    inside = jnp.zeros((h, ww), bool)
    for y in range(h):
        inside = inside.at[y, y:y + w].set(True)

    prev_left = jnp.pad(imgs, ((0, 0), (1, 0)), mode="edge")[:, :-1]
    prev_up = jnp.pad(prev_left, ((1, 0), (0, 0)), mode="edge")[:-1]
    pd_left = jnp.abs(imgs - prev_left)
    pd_up = jnp.abs(imgs - prev_up)

    cT = jnp.moveaxis(cs, 1, 0)
    plT = jnp.moveaxis(pd_left, 1, 0)
    puT = jnp.moveaxis(pd_up, 1, 0)
    inT = jnp.moveaxis(inside, 1, 0)

    def step(carry, inp):
        cx, pl, pu, ins = inp
        up_prior = jnp.concatenate([jnp.full((1, sy, sx), _BIG), carry[:-1]], 0)
        a = _path_update(carry, cx, pl, p1, p2, sy, sx)
        b = _path_update(up_prior, cx, pu, p1, p2, sy, sx)
        both = 0.5 * (a + b)
        # If only one neighbor is inside the image, its term stands alone;
        # path_update already degrades to local cost when the prior is BIG.
        out = jnp.where(ins[:, None, None], both, cx)
        return out, out

    init = cT[0]
    _, rest = lax.scan(step, init, (cT[1:], plT[1:], puT[1:], inT[1:]))
    out_s = jnp.concatenate([init[None], rest], 0)
    out_s = jnp.moveaxis(out_s, 0, 1)   # (H, W+H, sy, sx)
    # Un-shear.
    rows = [out_s[y, y:y + w] for y in range(h)]
    out = jnp.stack(rows, 0)
    if flip_y:
        out = jnp.flip(out, 0)
    if flip_x:
        out = jnp.flip(out, 1)
    return out


def _subpixel_1d(sm1, s0, sp1, mode: str):
    """1D subpixel offset from three costs (ref SGM subpixel modes)."""
    denom = sm1 - 2 * s0 + sp1
    para = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (sm1 - sp1) / denom, 0.0)
    if mode == "parabola":
        off = para
    elif mode == "linear":
        # Two-plane (V-shape) fit: offset toward the smaller side.
        off = 0.5 * (sm1 - sp1) / jnp.maximum(
            jnp.maximum(sm1, sp1) - s0, 1e-9)
    elif mode == "cosine":
        denom2 = jnp.maximum(sm1 + sp1 - 2 * s0, 1e-9)
        z = jnp.clip((sm1 - sp1) / denom2, -1.0, 1.0)
        off = jnp.arcsin(z) * (2.0 / jnp.pi)
    elif mode == "lc_blend":
        lin = 0.5 * (sm1 - sp1) / jnp.maximum(
            jnp.maximum(sm1, sp1) - s0, 1e-9)
        denom2 = jnp.maximum(sm1 + sp1 - 2 * s0, 1e-9)
        z = jnp.clip((sm1 - sp1) / denom2, -1.0, 1.0)
        cos = jnp.arcsin(z) * (2.0 / jnp.pi)
        off = 0.5 * (lin + cos)
    else:
        off = jnp.zeros_like(s0)
    return jnp.clip(off, -0.95, 0.95)


@functools.partial(jax.jit, static_argnames=("sx", "sy", "window", "ternary",
                                             "thresh", "use_mgm", "subpixel",
                                             "p1", "p2"))
def _sgm_core(left_u8, right_u8, sx: int, sy: int, window: int, ternary: bool,
              thresh: int, p1: float, p2: float, use_mgm: bool, subpixel: str):
    h, w = left_u8.shape
    cost = _census_cost_volume(left_u8, right_u8, sx, sy, window, ternary, thresh)
    img = left_u8.astype(jnp.float32)
    if use_mgm:
        acc = (_mgm_pass(cost, img, False, False, p1, p2) +
               _mgm_pass(cost, img, True, False, p1, p2) +
               _mgm_pass(cost, img, False, True, p1, p2) +
               _mgm_pass(cost, img, True, True, p1, p2))
    else:
        acc = (_scan_cols(cost, img, 1, 0, p1, p2) +
               _scan_cols(cost, img, -1, 0, p1, p2))
        # vertical: transpose so the scan axis is x
        costT = jnp.swapaxes(cost, 0, 1)
        imgT = img.T
        accT = (_scan_cols(costT, imgT, 1, 0, p1, p2) +
                _scan_cols(costT, imgT, -1, 0, p1, p2))
        acc = acc + jnp.swapaxes(accT, 0, 1)
        # diagonals
        acc = acc + (_scan_cols(cost, img, 1, 1, p1, p2) +
                     _scan_cols(cost, img, 1, -1, p1, p2) +
                     _scan_cols(cost, img, -1, 1, p1, p2) +
                     _scan_cols(cost, img, -1, -1, p1, p2))

    flat = acc.reshape(h, w, sy * sx)
    best = jnp.argmin(flat, axis=-1).astype(jnp.int32)
    dx = best % sx
    dy = best // sx
    disp = jnp.stack([dx, dy], -1)

    if subpixel == "none":
        return disp.astype(jnp.float32), jnp.ones((h, w), bool), flat
    # 1D fits along dx and dy of the aggregated volume.
    vol = acc  # (H, W, sy, sx)
    padded = jnp.pad(vol, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    s0 = padded[yy, xx, dy + 1, dx + 1]
    sxm = padded[yy, xx, dy + 1, dx]
    sxp = padded[yy, xx, dy + 1, dx + 2]
    sym = padded[yy, xx, dy, dx + 1]
    syp = padded[yy, xx, dy + 2, dx + 1]
    off_x = jnp.where((dx > 0) & (dx < sx - 1),
                      _subpixel_1d(sxm, s0, sxp, subpixel), 0.0)
    off_y = jnp.where((dy > 0) & (dy < sy - 1),
                      _subpixel_1d(sym, s0, syp, subpixel), 0.0)
    fdisp = disp.astype(jnp.float32) + jnp.stack([off_x, off_y], -1)
    return fdisp, jnp.ones((h, w), bool), flat


def calc_disparity_sgm(left, right, search_volume, kernel_size: int = 5,
                       cost_type: str = "census", use_mgm: bool = False,
                       subpixel: str = "parabola",
                       p1: Optional[float] = None, p2: Optional[float] = None,
                       ternary_census_threshold: int = 2,
                       left_mask=None, right_mask=None) -> DisparityMap:
    """SGM/MGM disparity (ref ``calc_disparity_sgm``, SGM.cc:167-229).

    ``left``: (H, W) f32 in [0, 1]; ``right``: (H+sy-1, W+sx-1). Returns
    float disparities (subpixel) in [0, sx) x [0, sy), left-image frame.
    """
    sx, sy = int(search_volume[0]), int(search_volume[1])
    if sx < 1 or sy < 1:
        raise ArgumentErr("calc_disparity_sgm: search volume must be >= 1")
    if subpixel not in SUBPIXEL_MODES:
        raise ArgumentErr(f"unknown SGM subpixel mode {subpixel!r}")
    ternary = cost_type == "ternary_census"
    if cost_type not in ("census", "ternary_census"):
        raise ArgumentErr("SGM supports census / ternary_census costs")
    key = (cost_type, int(kernel_size))
    p1v = float(p1 if p1 is not None else _P1_TABLE.get(key, 3))
    p2v = float(p2 if p2 is not None else _P2_TABLE.get(key, 70))
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    h, w = left.shape
    if right.shape != (h + sy - 1, w + sx - 1):
        raise ArgumentErr(f"calc_disparity_sgm: right must be "
                          f"{(h + sy - 1, w + sx - 1)}, got {right.shape}")
    lq = jnp.clip(left * 255.0, 0, 255).astype(jnp.int32)
    rq = jnp.clip(right * 255.0, 0, 255).astype(jnp.int32)
    disp, valid, _ = _sgm_core(lq, rq, sx, sy, int(kernel_size), ternary,
                               int(ternary_census_threshold), p1v, p2v,
                               bool(use_mgm), subpixel)
    if left_mask is not None:
        valid = valid & jnp.asarray(left_mask).astype(bool)
    disp = jnp.where(valid[..., None], disp, 0.0)
    return DisparityMap(disp, valid)
