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
thread pool (``SGM.cc:2462-2531``). Here the 8 directions run as FOUR
``lax.scan``s (forward-x, reverse-x, forward-y, reverse-y), each carrying the
full perpendicular image line x disparity plane with the image line on the
minor (lane) axis — ``(B, sy, sx, L)`` — so the per-step VPU work is fully
lane-occupied regardless of search-volume shape. The three dx=+1 paths
(horizontal + both diagonals) batch into one scan: a diagonal is just a
one-lane shift of the carry. The disparity-grid 3x3 neighborhood min is two
separable shifted-min passes (exact 3x3 semantics even for 2-wide search
axes). MGM's two-neighbor causal dependency is rotated into a pure column
scan by shearing the image (x' = x + y makes both causal neighbors live in
column x'-1); all four MGM orientations batch into one sheared scan via
flipped copies.
"""

from __future__ import annotations

import functools
import os
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

# Scan-body unroll factor for the aggregation scans. Measured (512^2
# pyramid SGM, queue-protocol digest sync, v5e): unroll=1 4.00 ms/frame,
# unroll=8 5.72 — unrolling only bloats the step body here, so 1 is the
# default. (Scan iteration count is NOT a relay cost: the relay's ~26 ms
# roundtrip floor is fixed per readback, amortized by queueing frames.)
_SCAN_UNROLL = int(os.environ.get("VWTPU_SGM_UNROLL", "1"))

# Default penalties by (cost, census kernel size) (ref SGM.cc:104-160).
_P1_TABLE = {("census", 3): 3, ("census", 5): 15, ("census", 7): 30,
             ("census", 9): 20,
             ("ternary_census", 3): 12, ("ternary_census", 5): 30,
             ("ternary_census", 7): 40, ("ternary_census", 9): 40}
_P2_TABLE = {("census", 3): 70, ("census", 5): 750, ("census", 7): 1500,
             ("census", 9): 1000,
             ("ternary_census", 3): 600, ("ternary_census", 5): 1500,
             ("ternary_census", 7): 2000, ("ternary_census", 9): 2000}

SUBPIXEL_MODES = ("none", "parabola", "linear", "poly4", "cosine", "lc_blend")

# Pseudoinverse of the 9-point quadratic design matrix (rows [x^2 y^2 xy x y 1]
# at (x, y) in [-1,1]^2, x fastest) — ref ParabolaFit2d, SGMAssist.h:86-94.
import numpy as _np
_PINV_A_SGM = _np.array([
    [1/6, -1/3, 1/6, 1/6, -1/3, 1/6, 1/6, -1/3, 1/6],    # a
    [1/6, 1/6, 1/6, -1/3, -1/3, -1/3, 1/6, 1/6, 1/6],    # b
    [1/4, 0.0, -1/4, 0.0, 0.0, 0.0, -1/4, 0.0, 1/4],     # c
    [-1/6, 0.0, 1/6, -1/6, 0.0, 1/6, -1/6, 0.0, 1/6],    # d
    [-1/6, -1/6, -1/6, 0.0, 0.0, 0.0, 1/6, 1/6, 1/6],    # e
    [-1/9, 2/9, -1/9, 2/9, 5/9, 2/9, -1/9, 2/9, -1/9],   # f
], dtype=_np.float32)


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


def _grid_min3(p):
    """Exact 3x3 neighborhood min over the (sy, sx) disparity grid.
    ``p`` is (..., sy, sx, L); out-of-grid neighbors count as +BIG.
    Two separable shifted-min passes (VPU-friendly; no reduce_window)."""
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
    """One SGM step for a batch of whole lines.

    ``prior``/``cost`` (B, sy, sx, L) with the image line on lanes (L);
    ``pdiff`` (B, L). Update: ``C + min(prior, nbhd3x3(prior)+P1,
    min_prior+P2') - min_prior`` with ``P2' = max(P2/|dI|, P1)``
    (ref ``evaluate_path``, SGM.cc:806-850)."""
    min_prior = jnp.min(prior, axis=(-3, -2))                    # (B, L)
    p2m = jnp.maximum(p2 / jnp.maximum(pdiff, 1.0), p1)          # (B, L)
    nb = _grid_min3(prior) + p1
    best = jnp.minimum(jnp.minimum(prior, nb),
                       (min_prior + p2m)[..., None, None, :])
    valid = (min_prior < _BIG / 2)[..., None, None, :]
    return cost + jnp.where(valid, best - min_prior[..., None, None, :], 0.0)


def _shift_lane(a, d: int):
    """Shift along the minor (lane) axis: out[..., i] = a[..., i-d], BIG fill."""
    if d == 0:
        return a
    big = jnp.full_like(a[..., :1], _BIG)
    if d > 0:
        return jnp.concatenate([big, a[..., :-1]], -1)
    return jnp.concatenate([a[..., 1:], big], -1)


def _shift_img(img, dy: int, dx: int):
    """Edge-extended shift: out[y, x] = img[y-dy, x-dx]."""
    out = img
    if dx > 0:
        out = jnp.pad(out, ((0, 0), (dx, 0)), mode="edge")[:, :-dx]
    elif dx < 0:
        out = jnp.pad(out, ((0, 0), (0, -dx)), mode="edge")[:, -dx:]
    if dy > 0:
        out = jnp.pad(out, ((dy, 0), (0, 0)), mode="edge")[:-dy]
    elif dy < 0:
        out = jnp.pad(out, ((0, -dy), (0, 0)), mode="edge")[-dy:]
    return out


def _scan_bidir(cost_t, pdiffs_f, pdiffs_r, shifts, p1: float, p2: float):
    """Both scan directions in ONE ``lax.scan``: step t updates column t of
    the forward paths and column N-1-t of the reverse paths (independent
    recurrences, merged because the per-step tensors are small enough that
    scans here are overhead-bound, not FLOP-bound).

    ``cost_t`` (N, sy, sx, L): N scan steps of a line-x-disparity plane;
    ``pdiffs_f``/``pdiffs_r`` (N, B, L): per-direction path gradients at
    original positions for the forward / reverse direction groups;
    ``shifts``: lane shift of the carry per direction (0 = straight,
    +-1 = diagonal). Returns the per-step SUM over the B directions of both
    groups, (N, sy, sx, L)."""
    n, sy, sx, nl = cost_t.shape
    b = len(shifts)
    xs_c = jnp.stack([cost_t, jnp.flip(cost_t, 0)], 1)      # (N, 2, sy, sx, L)
    xs_p = jnp.stack([pdiffs_f, jnp.flip(pdiffs_r, 0)], 1)  # (N, 2, B, L)

    def step(carry, inp):
        cx, px = inp
        prior = jnp.stack([_shift_lane(carry[:, i], s)
                           for i, s in enumerate(shifts)], 1)
        out = _path_update(prior, cx[:, None], px, p1, p2)  # (2, B, sy, sx, L)
        return out, jnp.sum(out, 1)

    # Derive init from the (possibly shard_map-varying) input so the scan
    # carry's varying manual axes match the body output's.
    init = jnp.broadcast_to(cost_t[0] * 0 + _BIG, (2, b, sy, sx, nl))
    _, ys = lax.scan(step, init, (xs_c, xs_p), unroll=_SCAN_UNROLL)
    return ys[:, 0] + jnp.flip(ys[:, 1], 0)                 # (N, sy, sx, L)


# Hardware-loop Pallas kernel for the aggregation scans (carry in VMEM
# scratch; kills the ~2 us/step XLA while-loop + per-step DUS overhead that
# dominates the SGM profile — docs/roofline.md). Bit-exact vs the lax.scan
# path (tests/test_sgm.py); knob for A/B and CPU fallbacks.
_SGM_PALLAS = os.environ.get("VWTPU_SGM_PALLAS", "1") == "1"


def _pallas_target_platform() -> str:
    """Platform the computation will actually lower for: respects
    ``jax.default_device`` / ``jax_platforms`` overrides, not just device 0
    (a TPU-present process running SGM on CPU must not compile Mosaic)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def _scan_engine(cost_t, pf, pr, shifts, p1, p2):
    if _SGM_PALLAS and _pallas_target_platform() == "tpu":
        from visionworkbench_tpu.ops.sgm_scan import pallas_scan_bidir
        return pallas_scan_bidir(cost_t, pf, pr, shifts, p1, p2)
    return _scan_bidir(cost_t, pf, pr, shifts, p1, p2)


def _sgm_aggregate(cost, img, p1: float, p2: float):
    """8-path SGM aggregation as two bidirectional batched scans.
    cost (H, W, sy, sx)."""
    h, w, sy, sx = cost.shape
    cost_tx = jnp.transpose(cost, (1, 2, 3, 0))     # (W, sy, sx, H)

    def pdx(dx):
        # (W, 3, H) for dy = 0, +1, -1 at the given dx predecessor offset.
        pd = jnp.stack([jnp.abs(img - _shift_img(img, dy, dx))
                        for dy in (0, 1, -1)], 0)   # (3, H, W)
        return jnp.transpose(pd, (2, 0, 1))

    acc_x = _scan_engine(cost_tx, pdx(1), pdx(-1), (0, 1, -1), p1, p2)
    del cost_tx

    cost_ty = jnp.transpose(cost, (0, 2, 3, 1))     # (H, sy, sx, W)
    pd_d = jnp.abs(img - _shift_img(img, 1, 0))[:, None, :]    # (H, 1, W)
    pd_u = jnp.abs(img - _shift_img(img, -1, 0))[:, None, :]
    acc_y = _scan_engine(cost_ty, pd_d, pd_u, (0,), p1, p2)
    return (jnp.transpose(acc_x, (3, 0, 1, 2)) +
            jnp.transpose(acc_y, (0, 3, 1, 2)))     # (H, W, sy, sx)


def _mgm_aggregate(cost, img, p1: float, p2: float):
    """All four MGM orientations in one sheared scan (ref SGMAssist.h:930-947).

    Each MGM pass averages the two causal neighbors (left and up in scan
    orientation). Shearing rows (x' = x + y) puts both neighbors in sheared
    column x'-1, turning the 2D recurrence into a column scan; the four
    orientations are flipped copies batched on a leading axis."""
    h, w, sy, sx = cost.shape
    ww = w + h
    cb = jnp.stack([cost, jnp.flip(cost, 1), jnp.flip(cost, 0),
                    jnp.flip(jnp.flip(cost, 0), 1)], 0)   # (4, H, W, sy, sx)
    ib = jnp.stack([img, jnp.flip(img, 1), jnp.flip(img, 0),
                    jnp.flip(jnp.flip(img, 0), 1)], 0)    # (4, H, W)

    # Shear via gather: sheared[b, y, x'] = src[b, y, x'-y].
    src_x = (jnp.arange(ww)[None, :] - jnp.arange(h)[:, None])   # (H, WW)
    inside = (src_x >= 0) & (src_x < w)
    xc = jnp.clip(src_x, 0, w - 1)
    cs = jnp.take_along_axis(cb, xc[None, :, :, None, None], axis=2)
    imgs = jnp.take_along_axis(ib, xc[None, :, :], axis=2)       # (4, H, WW)

    prev_left = jnp.pad(imgs, ((0, 0), (0, 0), (1, 0)), mode="edge")[..., :-1]
    prev_up = jnp.pad(prev_left, ((0, 0), (1, 0), (0, 0)), mode="edge")[:, :-1]
    pd_left = jnp.abs(imgs - prev_left)
    pd_up = jnp.abs(imgs - prev_up)

    cT = jnp.transpose(cs, (2, 0, 3, 4, 1))       # (WW, 4, sy, sx, H)
    plT = jnp.transpose(pd_left, (2, 0, 1))       # (WW, 4, H)
    puT = jnp.transpose(pd_up, (2, 0, 1))
    inT = jnp.transpose(inside, (1, 0))           # (WW, H)

    def step(carry, inp):
        cx, pl, pu, ins = inp
        up_prior = _shift_lane(carry, 1)
        a = _path_update(carry, cx, pl, p1, p2)
        b = _path_update(up_prior, cx, pu, p1, p2)
        both = 0.5 * (a + b)
        # If only one neighbor is inside the image, its term stands alone;
        # path_update already degrades to local cost when the prior is BIG.
        out = jnp.where(ins[None, None, None, :], both, cx)
        return out, out

    init = jnp.broadcast_to(cT[0] * 0 + _BIG, (4, sy, sx, h))
    _, ys = lax.scan(step, init, (cT, plT, puT, inT), unroll=_SCAN_UNROLL)
    out_s = jnp.transpose(ys, (1, 4, 0, 2, 3))    # (4, H, WW, sy, sx)
    # Un-shear: out[b, y, x] = out_s[b, y, x+y].
    dst_x = jnp.arange(h)[:, None] + jnp.arange(w)[None, :]
    out = jnp.take_along_axis(out_s, dst_x[None, :, :, None, None], axis=2)
    return (out[0] + jnp.flip(out[1], 1) + jnp.flip(out[2], 0) +
            jnp.flip(jnp.flip(out[3], 0), 1))


def _subpixel_1d(sm1, s0, sp1, mode: str, left_bound, right_bound):
    """1D subpixel offset from three accumulated costs, the reference's exact
    ratio framework (``compute_subpixel_offset``, SGM.cc:1445-1479): with
    ``ld = prev-center`` and ``rd = next-center``, fit the ratio
    ``x = smaller/larger`` and return ``(fit(x) - 0.5) * direction``. Fits
    (SGM.cc:1411-1437): linear ``x/2``, poly4 ``(x^4+x)/4``, cosine
    ``1-cos(x*pi/3)``, lc_blend factor-blended cosine/linear. At search-range
    bounds the two-value interpolation applies (``two_value_subpixel``,
    SGM.cc:1440-1443). Center is the volume argmin, so ld, rd >= 0."""
    ld = sm1 - s0
    rd = sp1 - s0
    both_zero = (ld == 0) & (rd == 0)
    use_pos = ld < rd
    x = jnp.where(use_pos,
                  ld / jnp.where(rd == 0, 1.0, rd),
                  rd / jnp.where(ld == 0, 1.0, ld))
    mult = jnp.where(use_pos, 1.0, -1.0)
    linear = 0.5 * x
    if mode == "linear":
        value = linear
    elif mode == "poly4":
        value = (x * x * x * x + x) * 0.25
    elif mode == "cosine":
        value = 1.0 - jnp.cos(x * (jnp.pi / 3.0))
    elif mode == "lc_blend":
        factor = 1.195 - jnp.cos(x * (jnp.pi / 2.3))
        cosv = 1.0 - jnp.cos(x * (jnp.pi / 3.0))
        value = cosv * factor + linear * (1.0 - factor)
    else:
        raise ArgumentErr(f"_subpixel_1d: unknown 1D mode {mode!r}")
    off = (value - 0.5) * mult
    # Range-bound pixels: interpolate toward the interior from two values.
    off = jnp.where(left_bound, 0.5 * s0 / jnp.maximum(sp1, 1e-9), off)
    off = jnp.where(right_bound, -0.5 * s0 / jnp.maximum(sm1, 1e-9), off)
    return jnp.where(both_zero | (left_bound & right_bound), 0.0, off)


def _parabola_2d(z, dx, dy, sx: int, sy: int):
    """The reference SGM parabola: 2D 9-point quadratic fit + erf squashing +
    norm clamp at 0.5; |denom| < 0.01 keeps the integer disparity
    (``ParabolaFit2d::find_peak``, SGMAssist.h:97-135). ``z``: (H, W, 9),
    dx fastest."""
    v = jnp.einsum("ij,hwj->hwi", jnp.asarray(_PINV_A_SGM), z)
    a, b, c, d, e = v[..., 0], v[..., 1], v[..., 2], v[..., 3], v[..., 4]
    denom = 4.0 * a * b - c * c
    ok = jnp.abs(denom) >= 0.01
    safe = jnp.where(ok, denom, 1.0)
    ox = (c * e - 2.0 * b * d) / safe
    oy = (c * d - 2.0 * a * e) / safe
    sqrt2 = jnp.sqrt(jnp.float32(2.0))
    ox = jax.scipy.special.erf(ox / (0.34574 * sqrt2)) * 0.5
    oy = jax.scipy.special.erf(oy / (0.38944 * sqrt2)) * 0.5
    norm = jnp.sqrt(ox * ox + oy * oy)
    scale = jnp.where(norm >= 0.5, norm / 0.5, 1.0)
    ox = jnp.where(ok, ox / scale, 0.0)
    oy = jnp.where(ok, oy / scale, 0.0)
    return ox, oy


def _volume_argmin_subpixel(acc, subpixel: str):
    """WTA argmin over the aggregated volume (H, W, sy, sx) + subpixel
    (ref ``create_disparity_view_subpixel``, SGM.cc:1498-1605): 2D 9-point
    parabola fit for ``parabola``, per-axis ratio interpolation with
    two-value bound handling for the 1D modes.

    Bound flags come from the volume edge OR a masked (>= BIG/2) neighbor —
    the latter reproduces the reference's per-pixel disparity-range bounds
    (``m_disp_bound_image``): candidates outside a pixel's allowed window
    carry BIG costs, so their neighbors interpolate as range-bounded, exactly
    like the reference's x_left=0 / two-value path at bounds."""
    h, w, sy, sx = acc.shape
    flat = acc.reshape(h, w, sy * sx)
    best = jnp.argmin(flat, axis=-1).astype(jnp.int32)
    dx = best % sx
    dy = best // sx
    disp = jnp.stack([dx, dy], -1)
    if subpixel == "none":
        return disp.astype(jnp.float32), flat
    padded = jnp.pad(acc, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    # The 3x3 neighborhood of each winner, z[0..8] with dx fastest
    # (z[4] = center). Fused select-chain over the (small) padded volume:
    # per-pixel gathers cost ~3.5 ms per 0.26 Mpx plane on this toolchain
    # (five gathers dominated the whole SGM profile in round 1); the static
    # loop fuses into one elementwise pass.
    if (sy + 2) * (sx + 2) <= 256:
        zeros = jnp.zeros((h, w), acc.dtype)
        z = [zeros] * 9
        for a in range(sy + 2):
            rows = (dy == a, dy + 1 == a, dy + 2 == a)   # ddy = -1, 0, +1
            for b in range(sx + 2):
                plane = padded[:, :, a, b]
                cols = (dx == b, dx + 1 == b, dx + 2 == b)
                for jy in range(3):
                    for jx in range(3):
                        k = jy * 3 + jx
                        z[k] = jnp.where(rows[jy] & cols[jx], plane, z[k])
    else:
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        z = [padded[yy, xx, dy + jy, dx + jx]
             for jy in range(3) for jx in range(3)]
    masked = [v >= _BIG / 2 for v in z]
    left_b = (dx == 0) | masked[3]
    right_b = (dx == sx - 1) | masked[5]
    top_b = (dy == 0) | masked[1]
    bot_b = (dy == sy - 1) | masked[7]
    if subpixel == "parabola":
        # Reference: at bounds the neighbor index collapses onto the center
        # (x_left = 0 etc., SGM.cc:1545-1557) before the 2D fit.
        zz = list(z)
        for k in (0, 3, 6):
            zz[k] = jnp.where(left_b, zz[k + 1], zz[k])
        for k in (2, 5, 8):
            zz[k] = jnp.where(right_b, zz[k - 1], zz[k])
        for k in (0, 1, 2):
            zz[k] = jnp.where(top_b, zz[k + 3], zz[k])
        for k in (6, 7, 8):
            zz[k] = jnp.where(bot_b, zz[k - 3], zz[k])
        off_x, off_y = _parabola_2d(jnp.stack(zz, -1), dx, dy, sx, sy)
    else:
        off_x = _subpixel_1d(z[3], z[4], z[5], subpixel, left_b, right_b)
        off_y = _subpixel_1d(z[1], z[4], z[7], subpixel, top_b, bot_b)
    return disp.astype(jnp.float32) + jnp.stack([off_x, off_y], -1), flat


def _apply_pixel_bounds(cost, base, seed_disp, seed_valid, buffer: int,
                        range_x: int, range_y: int):
    """Per-pixel disparity bounds (ref ``m_disp_bound_image``, SGM.h:180-198,
    seeded by ``populate_disp_bound_image``, SGM.cc:241-470): pixels with a
    trusted previous-level seed restrict their candidates to
    ``seed ± buffer`` — BIG cost outside the window, exactly the effect of
    the reference's compact per-pixel cost buffers (absent candidates are
    +inf to every path update). Untrusted pixels (invalid seed, or a seed on
    the edge of a wide search range, SGM.cc:372-384) keep the full window.

    ``cost`` (H, W, ry, rx) relative volume; ``base`` (H, W, 2) absolute
    offset of each pixel's window. The seed window is CLAMPED into the
    available window like the reference clamps bounds to the global limits
    (SGM.cc:421-426) — it is never empty, so bounds alone never invalidate
    (the reference's ZERO_SEARCH_AREA comes from masks, which the callers
    apply). Returns the masked cost."""
    ry, rx = cost.shape[-2], cost.shape[-1]
    sdx = jnp.round(seed_disp[..., 0]).astype(jnp.int32)
    sdy = jnp.round(seed_disp[..., 1]).astype(jnp.int32)
    on_edge = jnp.zeros_like(seed_valid)
    if range_x >= 10:   # only distrust edges when the range can spare a band
        on_edge = on_edge | (sdx <= 0) | (sdx >= range_x - 1)
    if range_y >= 10:
        on_edge = on_edge | (sdy <= 0) | (sdy >= range_y - 1)
    trusted = seed_valid & ~on_edge
    lo_x = jnp.clip(sdx - buffer, base[..., 0], base[..., 0] + rx - 1)
    hi_x = jnp.clip(sdx + buffer, base[..., 0], base[..., 0] + rx - 1)
    lo_y = jnp.clip(sdy - buffer, base[..., 1], base[..., 1] + ry - 1)
    hi_y = jnp.clip(sdy + buffer, base[..., 1], base[..., 1] + ry - 1)
    ix = jnp.arange(rx, dtype=jnp.int32)
    iy = jnp.arange(ry, dtype=jnp.int32)
    ax = base[..., 0:1] + ix[None, None, :]          # (H, W, rx) absolute dx
    ay = base[..., 1:2] + iy[None, None, :]
    ok_x = (ax >= lo_x[..., None]) & (ax <= hi_x[..., None])
    ok_y = (ay >= lo_y[..., None]) & (ay <= hi_y[..., None])
    allowed = ok_y[..., :, None] & ok_x[..., None, :]
    allowed = allowed | ~trusted[..., None, None]
    return jnp.where(allowed, cost, _BIG)


@functools.partial(jax.jit, static_argnames=("sx", "sy", "window", "ternary",
                                             "thresh", "use_mgm", "subpixel",
                                             "p1", "p2", "search_buffer"))
def _sgm_core(left_u8, right_u8, sx: int, sy: int, window: int, ternary: bool,
              thresh: int, p1: float, p2: float, use_mgm: bool, subpixel: str,
              seed_disp=None, seed_valid=None, search_buffer: int = 2,
              lmask=None):
    h, w = left_u8.shape
    cost = _census_cost_volume(left_u8, right_u8, sx, sy, window, ternary, thresh)
    valid = jnp.ones((h, w), bool)
    if seed_disp is not None:
        base = jnp.zeros((h, w, 2), jnp.int32)
        cost = cost.reshape(h, w, sy, sx)
        cost = _apply_pixel_bounds(cost, base, seed_disp, seed_valid,
                                   search_buffer, sx, sy)
    img = left_u8.astype(jnp.float32)
    if use_mgm:
        acc = _mgm_aggregate(cost, img, p1, p2)
    else:
        acc = _sgm_aggregate(cost, img, p1, p2)
    fdisp, flat = _volume_argmin_subpixel(acc, subpixel)
    if lmask is not None:
        valid = valid & lmask.astype(bool)
    fdisp = jnp.where(valid[..., None], fdisp, 0.0)
    return fdisp, valid, flat


@functools.partial(jax.jit, static_argnames=("tile", "rx", "ry", "window",
                                             "ternary", "thresh", "p1", "p2",
                                             "use_mgm", "subpixel",
                                             "search_buffer", "range_x",
                                             "range_y"))
def sgm_relative_search(lbase, mbase, offsets, tile: int, rx: int, ry: int,
                        window: int, ternary: bool, thresh: int,
                        p1: float, p2: float, use_mgm: bool, subpixel: str,
                        seed_disp=None, seed_valid=None,
                        search_buffer: int = 2, range_x: int = 0,
                        range_y: int = 0, lmask=None):
    """Pyramid-level SGM: per-tile base offsets + a static relative window.

    The reference seeds per-pixel disparity bounds from the previous pyramid
    level (``m_disp_bound_image``, SGM.h:180-198, CorrelationView.cc SGM
    branch). The static-shape equivalent: census costs are gathered at
    ``base(tile) + (0..ry) x (0..rx)`` and the whole level aggregates in one
    pass over the relative volume (disparity axes stay absolutely aligned
    within each tile; tiles track the coarse solution like the zone ranges).

    ``lbase`` ((nty*tile + window - 1), (ntx*tile + window - 1)): level crop
    with census-half margins baked in; ``mbase``: match frame with the same
    origin and the level's full (search-1) extra extent; ``offsets``
    (nty, ntx, 2) int32 absolute (dx, dy) base per tile, pre-clamped to keep
    ``base + rel`` inside ``mbase``. Returns (disp (H, W, 2) float32,
    absolute in the level frame; valid (H, W) bool).

    ``seed_disp``/``seed_valid`` ((H, W, 2) / (H, W)): PER-PIXEL previous-
    level disparity seeds (upsampled). When given, each pixel's candidates
    are restricted to ``seed ± search_buffer`` via BIG-cost masking of the
    volume (ref ``m_disp_bound_image``, SGM.h:180-198; edge-of-range seeds
    untrusted per SGM.cc:372-384 when the level range ``range_x``/``range_y``
    is >= 10; the window clamps into the tile window like the reference
    clamps to global limits, SGM.cc:421-426). Pixels masked by ``lmask``
    come back INVALID — the reference's ZERO_SEARCH_AREA semantics, so SGM
    produces real invalid outputs.
    """
    nty, ntx = offsets.shape[0], offsets.shape[1]
    out_h, out_w = nty * tile, ntx * tile
    cw2 = window // 2
    # One shared monotone quantization: census codes are invariant to it, but
    # L and R must agree, and pdiff (P2 adaptation) uses the same scale.
    lo = jnp.minimum(jnp.min(lbase), jnp.min(mbase))
    hi = jnp.maximum(jnp.max(lbase), jnp.max(mbase))
    scale = 255.0 / jnp.maximum(hi - lo, 1e-9)
    lq = jnp.clip((lbase - lo) * scale, 0, 255).astype(jnp.int32)
    mq = jnp.clip((mbase - lo) * scale, 0, 255).astype(jnp.int32)
    if ternary:
        lc = ternary_census_transform(lq, window, thresh)
        rc = ternary_census_transform(mq, window, thresh)
    else:
        lc = census_transform(lq, window)
        rc = census_transform(mq, window)
    lc = lc[cw2:cw2 + out_h, cw2:cw2 + out_w]
    img = lq[cw2:cw2 + out_h, cw2:cw2 + out_w].astype(jnp.float32)

    base = jnp.repeat(jnp.repeat(offsets, tile, 0), tile, 1)     # (H, W, 2)
    # Per-tile cost volume: the disparity offset is constant within a tile,
    # so every census lookup is ONE dynamic_slice per tile plus rx*ry static
    # slices — no per-pixel gather (rx*ry full-frame code gathers were
    # ~2.7 ms each on a 512^2 level and dominated the SGM profile).
    nw = rc.shape[-1]

    def per_tile(ty, tx, off):
        lt = lax.dynamic_slice(lc, (ty * tile, tx * tile, 0), (tile, tile, nw))
        mt = lax.dynamic_slice(
            rc, (ty * tile + cw2 + off[1], tx * tile + cw2 + off[0], 0),
            (tile + ry - 1, tile + rx - 1, nw))
        rows = []
        for j in range(ry):
            row = []
            for i in range(rx):
                code = lax.slice(mt, (j, i, 0), (j + tile, i + tile, nw))
                row.append(hamming_distance(lt, code).astype(jnp.float32))
            rows.append(jnp.stack(row, -1))
        return jnp.stack(rows, -2)                               # (t, t, ry, rx)

    tys = jnp.repeat(jnp.arange(nty), ntx)
    txs = jnp.tile(jnp.arange(ntx), nty)
    cost_t = jax.vmap(per_tile)(tys, txs, offsets.reshape(-1, 2))
    cost = (cost_t.reshape(nty, ntx, tile, tile, ry, rx)
            .transpose(0, 2, 1, 3, 4, 5).reshape(out_h, out_w, ry, rx))

    valid = jnp.ones((out_h, out_w), bool)
    if seed_disp is not None:
        cost = _apply_pixel_bounds(cost, base, seed_disp, seed_valid,
                                   search_buffer, range_x, range_y)
    if use_mgm:
        acc = _mgm_aggregate(cost, img, p1, p2)
    else:
        acc = _sgm_aggregate(cost, img, p1, p2)
    rel, _ = _volume_argmin_subpixel(acc, subpixel)
    if lmask is not None:
        valid = valid & lmask.astype(bool)
    disp = rel + base.astype(jnp.float32)
    return jnp.where(valid[..., None], disp, 0.0), valid


def calc_disparity_sgm(left, right, search_volume, kernel_size: int = 5,
                       cost_type: str = "census", use_mgm: bool = False,
                       subpixel: str = "parabola",
                       p1: Optional[float] = None, p2: Optional[float] = None,
                       ternary_census_threshold: int = 2,
                       left_mask=None, right_mask=None,
                       memory_limit_mb: int = 6000,
                       band_overlap: int = 32,
                       prev_disparity: Optional[DisparityMap] = None,
                       search_buffer: int = 2) -> DisparityMap:
    """SGM/MGM disparity (ref ``calc_disparity_sgm``, SGM.cc:167-229).

    ``left``: (H, W) f32 in [0, 1]; ``right``: (H+sy-1, W+sx-1). Returns
    float disparities (subpixel) in [0, sx) x [0, sy), left-image frame.

    ``prev_disparity``: optional HALF-resolution disparity seed (the
    reference's ``prev_disparity`` argument): each pixel's search is bounded
    to ``2 * prev ± search_buffer`` (``populate_disp_bound_image``,
    SGM.cc:241-470, SCALE_UP = 2); pixels with an invalid or edge-of-range
    seed search the full window; pixels whose ``left_mask`` is 0 come back
    INVALID (the reference's ZERO_SEARCH_AREA semantics).

    ``memory_limit_mb`` bounds the on-device working set like the
    reference's ``m_memory_limit_mb`` (SGM.h:167): when the aggregation
    volume would exceed it, the frame is processed in horizontal bands with
    ``band_overlap`` rows of context (the vertical aggregation paths truncate
    at band seams — the reference's per-tile rasterization does the same).
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

    seed_disp = seed_valid = None
    if prev_disparity is not None:
        from visionworkbench_tpu.stereo.disparity import disparity_upsample
        up = disparity_upsample(prev_disparity)   # values x2, nearest x2
        sd = jnp.zeros((h, w, 2), jnp.float32)
        sv = jnp.zeros((h, w), bool)
        ch = min(h, up.valid.shape[0])
        cw = min(w, up.valid.shape[1])
        seed_disp = sd.at[:ch, :cw].set(up.disparity[:ch, :cw].astype(jnp.float32))
        seed_valid = sv.at[:ch, :cw].set(up.valid[:ch, :cw])

    # Working-set estimate: the dominant live tensors are the cost volume,
    # its per-scan transposed copy, the scan output, and the accumulator —
    # ~4x the (H, W, sy, sx) volume in f32 (MGM shears to ~2x width).
    vol_mb = h * w * sy * sx * 4 * (8 if use_mgm else 4) / 1e6
    n_bands = max(1, -(-int(vol_mb) // max(int(memory_limit_mb), 1)))
    lmask = None if left_mask is None else jnp.asarray(left_mask).astype(bool)
    if n_bands == 1:
        disp, valid, _ = _sgm_core(lq, rq, sx, sy, int(kernel_size), ternary,
                                   int(ternary_census_threshold), p1v, p2v,
                                   bool(use_mgm), subpixel,
                                   seed_disp, seed_valid,
                                   int(search_buffer), lmask)
    else:
        ov = int(band_overlap)
        bh = -(-h // n_bands)
        # Uniform band shapes (one compile): edge-extend rows so every band
        # reads bh + 2*ov left rows and the matching right extent.
        pad_bot = n_bands * bh - h
        lq_e = jnp.pad(lq, ((ov, pad_bot + ov), (0, 0)), mode="edge")
        rq_e = jnp.pad(rq, ((ov, pad_bot + ov), (0, 0)), mode="edge")
        def band_pad(a, fill):
            return jnp.pad(a, ((ov, pad_bot + ov), (0, 0))
                           + ((0, 0),) * (a.ndim - 2), constant_values=fill)
        sd_e = None if seed_disp is None else band_pad(seed_disp, 0.0)
        sv_e = None if seed_valid is None else band_pad(seed_valid, False)
        lm_e = None if lmask is None else band_pad(lmask, True)
        parts, vparts = [], []
        for b in range(n_bands):
            y0 = b * bh
            lb = lax.dynamic_slice(lq_e, (y0, 0), (bh + 2 * ov, w))
            rb = lax.dynamic_slice(rq_e, (y0, 0),
                                   (bh + 2 * ov + sy - 1, w + sx - 1))
            def bslice(a):
                if a is None:
                    return None
                return lax.dynamic_slice(
                    a, (y0, 0) + (0,) * (a.ndim - 2),
                    (bh + 2 * ov, w) + a.shape[2:])
            d, v, _ = _sgm_core(lb, rb, sx, sy, int(kernel_size), ternary,
                                int(ternary_census_threshold), p1v, p2v,
                                bool(use_mgm), subpixel,
                                bslice(sd_e), bslice(sv_e),
                                int(search_buffer), bslice(lm_e))
            parts.append(d[ov:ov + bh])
            vparts.append(v[ov:ov + bh])
        disp = jnp.concatenate(parts, 0)[:h]
        valid = jnp.concatenate(vparts, 0)[:h]

    disp = jnp.where(valid[..., None], disp, 0.0)
    return DisparityMap(disp, valid)
