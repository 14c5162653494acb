"""Semi-global matching (SGM/MGM)
(ref ``SemiGlobalMatcher``, ``src/vw/Stereo/SGM.h:75-375``, ``SGM.cc``,
``SGMAssist.h:36-553``).

Reference semantics preserved EXACTLY (pinned bit-for-bit against the
executable transliteration in ``tests/oracle/vw_oracle_sgm.py``):

* census / ternary-census hamming costs over the 2D (dx, dy) search volume
  with the reference's per-kernel default penalties (``SGM.cc:104-160``)
* path update ``L(p,d) = C(p,d) + min(prior[d], min_nbhd(prior)+P1,
  min_prior+P2') - min_prior`` with the adaptive jump cost
  ``P2' = max(P2 // |dI|, P1)`` — INTEGER division like the uint16
  ``p2_mod /= path_intensity_gradient`` (``evaluate_path``, SGM.cc:806-850);
  the P1 band is the 3x3 neighborhood in the (dx, dy) disparity grid
* absent candidates (per-pixel disparity bounds / masked pixels) carry the
  reference's BAD accumulation value ``255 + P2`` (``get_bad_accum_val``,
  SGM.h:240) and are re-forced to it after every path step, exactly like the
  reference's ``full_prior_buffer`` refill (SGM.cc:826-849); a path whose
  prior is entirely BAD degrades to the local cost (first pixel of a line)
* SGM: 8 directional line recurrences summed (``accum_sgm_multithread`` /
  ``PixelPassTask``, SGM.cc:2462-2612, SGMAssist.h:691-832)
* MGM: the 8 ``SmoothPathAccumTask`` directions (SGMAssist.h:835-1239),
  each INTEGER-averaging two prior-neighbor evaluations that share one
  pixel_diff whose sign convention follows the reference exactly (task_L
  diffs against the RIGHT neighbor), with the reference's per-task guard
  conditions (e.g. task_B resets the whole col==0 column to local cost)
* WTA with the reference's multiple-minimum smoothing
  (``select_best_disparity``, SGM.cc:1159-1284): up to 6 iterations of
  3-tap box filters (horizontal, then vertical on the 6th) until the
  minimum is unique; the smoothed values replace the accumulation volume
  that subpixel interpolation then reads
* subpixel modes none/parabola/linear/poly4/cosine/lc_blend
  (``SgmSubpixelMode``, SGM.cc:1445-1614) with the reference's
  bound-collapsed neighbor indices and two-value interpolation at bounds

TPU formulation: the reference sweeps scanlines with SSE kernels across a
thread pool. Here the 8 SGM directions run as TWO bidirectional batched
``lax.scan``s (the three dx=+1 paths — horizontal + both diagonals — batch
into one scan: a diagonal is a one-lane shift of the carry), each carrying
the full perpendicular image line x disparity plane with the image line on
the minor (lane) axis — ``(B, sy, sx, L)``. MGM's eight tasks factor into
2 sheared scans (x' = x + y turns the left+up recurrence of L/R — and of
T/B on the transpose — into a pure column scan) plus 2 plain bidirectional
scans (the diagonal-pair tasks TL/BR over rows and TR/BL over columns,
whose two priors both live in the previous line). On TPU the scans run as
Pallas hardware-loop kernels (``ops/sgm_scan.py``) with the carry in VMEM
scratch; the lax.scan path is the CPU/fallback engine and the two are
pinned bit-exact (tests/test_sgm.py).

All arithmetic is integer-valued fp32 (costs, P1/P2, pixel diffs and the
BAD value are integers < 2^24, where fp32 add/sub/compare are exact), so
the float pipeline reproduces the reference's uint8/uint16 arithmetic
bit-for-bit; the reference never overflows uint16 for census costs.
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

_INF = jnp.float32(3e38)

# Scan-body unroll factor for the aggregation scans. Measured (512^2
# pyramid SGM, queue-protocol digest sync, v5e): unroll=1 4.00 ms/frame,
# unroll=8 5.72 — unrolling only bloats the step body here, so 1 is the
# default.
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

N_PATHS = 8  # both SGM and MGM accumulate 8 directional results


def _bad_val(p2: float) -> float:
    """``get_bad_accum_val`` = CostType max + P2 (ref SGM.h:240)."""
    return 255.0 + float(p2)


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


def _grid_min3(p, bad: float):
    """Exact 3x3 neighborhood min over the (sy, sx) disparity grid.
    ``p`` is (..., sy, sx, L); out-of-grid neighbors count as ``bad``
    (>= any real prior, so — like the reference's clamped-repetition
    adjacency table whose repeated center is dominated by the bare center
    term — they never win). Two separable shifted-min passes."""
    sy, sx = p.shape[-3], p.shape[-2]
    q = p
    if sy > 1:
        big = jnp.full_like(p[..., :1, :, :], bad)
        q = jnp.minimum(q, jnp.concatenate([big, p[..., :-1, :, :]], -3))
        q = jnp.minimum(q, jnp.concatenate([p[..., 1:, :, :], big], -3))
    if sx > 1:
        big = jnp.full_like(q[..., :, :1, :], bad)
        r = jnp.minimum(q, jnp.concatenate([big, q[..., :, :-1, :]], -2))
        q = jnp.minimum(r, jnp.concatenate([q[..., :, 1:, :], big], -2))
    return q


def _path_update(prior, cost, pdiff, p1: float, p2: float, bad: float):
    """One SGM step for a batch of whole lines.

    ``prior``/``cost`` (B, sy, sx, L) with the image line on lanes (L);
    ``pdiff`` (B, L). Update: ``C + min(prior, nbhd3x3(prior)+P1,
    min_prior+P2') - min_prior`` with ``P2' = max(P2 // max(|dI|, 1), P1)``
    (INTEGER division — the reference's uint16 ``p2_mod /=``, ref
    ``evaluate_path``, SGM.cc:806-850). An all-``bad`` prior (first pixel of
    a line / fully-masked predecessor) degrades to the local cost exactly:
    ``min(bad, bad+p1, bad+p2') - bad = 0``."""
    min_prior = jnp.min(prior, axis=(-3, -2))                    # (B, L)
    p2m = jnp.maximum(jnp.floor(p2 / jnp.maximum(pdiff, 1.0)), p1)
    nb = _grid_min3(prior, bad) + p1
    best = jnp.minimum(jnp.minimum(prior, nb),
                       (min_prior + p2m)[..., None, None, :])
    return cost + (best - min_prior[..., None, None, :])


def _force_bad(out, cost, bad: float):
    """Re-force absent candidates (cost == bad sentinel) to exactly ``bad``,
    like the reference refills ``full_prior_buffer`` with BAD_VAL after
    every ``evaluate_path`` (SGM.cc:920-931). Real costs are < 255 < bad."""
    return jnp.where(cost >= bad, bad, out)


def _shift_lane(a, d: int, bad: float):
    """Shift along the minor (lane) axis: out[..., i] = a[..., i-d], bad fill."""
    if d == 0:
        return a
    big = jnp.full_like(a[..., :1], bad)
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


def _scan_bidir(cost_t, pdiffs_f, pdiffs_r, shifts, p1: float, p2: float,
                bad: float):
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
        prior = jnp.stack([_shift_lane(carry[:, i], s, bad)
                           for i, s in enumerate(shifts)], 1)
        out = _path_update(prior, cx[:, None], px, p1, p2, bad)
        out = _force_bad(out, cx[:, None], bad)     # (2, B, sy, sx, L)
        return out, jnp.sum(out, 1)

    # Derive init from the (possibly shard_map-varying) input so the scan
    # carry's varying manual axes match the body output's. bad init = the
    # reference's "first pixel takes the local cost".
    init = jnp.broadcast_to(cost_t[0] * 0 + bad, (2, b, sy, sx, nl))
    _, ys = lax.scan(step, init, (xs_c, xs_p), unroll=_SCAN_UNROLL)
    return ys[:, 0] + jnp.flip(ys[:, 1], 0)                 # (N, sy, sx, L)


# Hardware-loop Pallas kernels for the aggregation scans (carry in VMEM
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


def _use_pallas() -> bool:
    return _SGM_PALLAS and _pallas_target_platform() == "tpu"


def _scan_engine(cost_t, pf, pr, shifts, p1, p2, bad):
    if _use_pallas():
        from visionworkbench_tpu.ops.sgm_scan import pallas_scan_bidir
        return pallas_scan_bidir(cost_t, pf, pr, shifts, p1, p2, bad)
    return _scan_bidir(cost_t, pf, pr, shifts, p1, p2, bad)


def _sgm_aggregate(cost, img, p1: float, p2: float, bad: float):
    """8-path SGM aggregation as two bidirectional batched scans
    (ref ``accum_sgm_multithread``, SGM.cc:2462-2612: per-direction line
    recurrences, first pixel of each line = local cost, all eight sums
    added). cost (H, W, sy, sx); img integer-valued (H, W)."""
    h, w, sy, sx = cost.shape
    cost_tx = jnp.transpose(cost, (1, 2, 3, 0))     # (W, sy, sx, H)

    def pdx(dx):
        # (W, 3, H) for dy = 0, +1, -1 at the given dx predecessor offset.
        pd = jnp.stack([jnp.abs(img - _shift_img(img, dy, dx))
                        for dy in (0, 1, -1)], 0)   # (3, H, W)
        return jnp.transpose(pd, (2, 0, 1))

    acc_x = _scan_engine(cost_tx, pdx(1), pdx(-1), (0, 1, -1), p1, p2, bad)
    del cost_tx

    cost_ty = jnp.transpose(cost, (0, 2, 3, 1))     # (H, sy, sx, W)
    pd_d = jnp.abs(img - _shift_img(img, 1, 0))[:, None, :]    # (H, 1, W)
    pd_u = jnp.abs(img - _shift_img(img, -1, 0))[:, None, :]
    acc_y = _scan_engine(cost_ty, pd_d, pd_u, (0,), p1, p2, bad)
    return (jnp.transpose(acc_x, (3, 0, 1, 2)) +
            jnp.transpose(acc_y, (0, 3, 1, 2)))     # (H, W, sy, sx)


# ---------------------------------------------------------------------------
# MGM: the reference's eight SmoothPathAccumTask directions
# (SGMAssist.h:835-1239). Each task averages TWO prior-neighbor
# evaluations with INTEGER /2, both sharing ONE pixel_diff whose direction
# follows the reference (get_path_pixel_diff at the task's dir: b =
# img(col-dir_x, row-dir_y) — note task_L's dir is (-1,0), i.e. it diffs
# against the RIGHT neighbor), under the reference's per-task guards.
# Factorization into scans:
#   L, R       — priors {left, up}/{right, down}: sheared column scan
#                (x' = x + y puts both causal neighbors in column x'-1)
#   T, B       — same machinery on the transposed volume
#   TL, BR     — both priors in the previous ROW (cols -1/+1): row scan
#   TR, BL     — both priors in the previous COLUMN (rows -1/+1): col scan
# ---------------------------------------------------------------------------


def _mgm_step_tensors(img, dir_xy, guard_expr, h, w):
    """Per-task pixel-diff map |img(p) - img(p - dir)| and guard mask."""
    pd = jnp.abs(img - _shift_img(img, dir_xy[1], dir_xy[0]))
    r = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    c = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return pd, guard_expr(r, c, h - 1, w - 1)


def _mgm_plain_scan(cost_t, pd_f, pd_r, g_f, g_r, p1, p2, bad):
    """Bidirectional 'previous-line' MGM scan for the diagonal task pairs:
    forward task priors = prev line at lanes ∓1; reverse task likewise.
    ``cost_t`` (N, sy, sx, L); pd/g (N, L). Returns summed (N, sy, sx, L)."""
    if _use_pallas():
        from visionworkbench_tpu.ops.sgm_scan import pallas_mgm_bidir
        return pallas_mgm_bidir(cost_t, pd_f, pd_r, g_f, g_r, (1, -1),
                                p1, p2, bad)
    n, sy, sx, nl = cost_t.shape
    xs_c = jnp.stack([cost_t, jnp.flip(cost_t, 0)], 1)     # (N, 2, sy, sx, L)
    xs_p = jnp.stack([pd_f, jnp.flip(pd_r, 0)], 1)         # (N, 2, L)
    xs_g = jnp.stack([g_f, jnp.flip(g_r, 0)], 1)           # (N, 2, L)

    def step(carry, inp):
        cx, px, gx = inp
        a = _path_update(_shift_lane(carry, 1, bad), cx, px, p1, p2, bad)
        b = _path_update(_shift_lane(carry, -1, bad), cx, px, p1, p2, bad)
        out = jnp.floor((a + b) * 0.5)                     # uint16 (a+b)/2
        out = jnp.where(gx[:, None, None, :], out, cx)
        out = _force_bad(out, cx, bad)
        return out, out

    init = jnp.broadcast_to(cost_t[0] * 0 + bad, (2, sy, sx, nl))
    _, ys = lax.scan(step, init, (xs_c, xs_p, xs_g), unroll=_SCAN_UNROLL)
    return ys[:, 0] + jnp.flip(ys[:, 1], 0)


def _shear_rows(a, pad_value=0):
    """Skew ``a`` (B, H, W, ...) to (B, H, W+H, ...) with
    ``out[b, y, x'] = a[b, y, x'-y]`` (``pad_value`` outside) — the
    pad+reshape trick: store rows at width S = W+H+1, re-view the flat
    buffer at width S-1; each row's content then shifts right by its row
    index. NO gather (``take_along_axis`` shears cost ~80 ms/frame on the
    512^2 MGM volume on this toolchain; this is a reshape + pad)."""
    b, h, w = a.shape[:3]
    rest = a.shape[3:]
    s = w + h + 1
    pad = ((0, 0), (0, 0), (0, s - w)) + ((0, 0),) * len(rest)
    p = jnp.pad(a, pad, constant_values=pad_value)
    flat = p.reshape((b, h * s) + rest)
    return flat[:, :h * (s - 1)].reshape((b, h, s - 1) + rest)


def _unshear_rows(a, w: int):
    """Inverse skew: ``a`` (B, H, T=W+H, ...) -> (B, H, W, ...) with
    ``out[b, y, x] = a[b, y, x+y]`` (flat re-view at width T+1)."""
    b, h, t = a.shape[:3]
    rest = a.shape[3:]
    flat = a.reshape((b, h * t) + rest)
    flat = jnp.pad(flat, ((0, 0), (0, h)) + ((0, 0),) * len(rest))
    return flat.reshape((b, h, t + 1) + rest)[:, :, :w]


def _mgm_sheared_scan(cb, pdb, gb, p1, p2, bad):
    """Sheared left+up MGM scan for a batch of B pre-flipped orientations.
    ``cb`` (B, H, W, sy, sx); ``pdb``/``gb`` (B, H, W). Each orientation's
    recurrence is out(y, x) <- avg(eval(out(y, x-1)), eval(out(y-1, x)));
    shearing rows (x' = x + y) puts both causal neighbors in sheared column
    x'-1, giving a pure column scan. Returns (B, H, W, sy, sx).

    Out-of-shear cells carry guard=False (the shear pads False), so their
    step output is their (padded-zero) local cost; no outside value ever
    feeds an inside cell — column-0 cells are guard-reset to local and the
    lane-shift prior of an inside cell is always another inside cell."""
    b, h, w, sy, sx = cb.shape
    ww = w + h
    cs = _shear_rows(cb, 0)                                      # (B,H,WW,..)
    pds = _shear_rows(pdb, 0)
    gs = _shear_rows(gb, False)

    cT = jnp.transpose(cs, (2, 0, 3, 4, 1))       # (WW, B, sy, sx, H)
    pT = jnp.transpose(pds, (2, 0, 1))            # (WW, B, H)
    gT = jnp.transpose(gs, (2, 0, 1))             # (WW, B, H)

    if _use_pallas():
        from visionworkbench_tpu.ops.sgm_scan import pallas_mgm_fwd
        ys = pallas_mgm_fwd(cT, pT, gT, (0, 1), p1, p2, bad)
    else:
        def step(carry, inp):
            cx, px, gx = inp
            a = _path_update(carry, cx, px, p1, p2, bad)
            bb = _path_update(_shift_lane(carry, 1, bad), cx, px, p1, p2,
                              bad)
            out = jnp.floor((a + bb) * 0.5)
            out = jnp.where(gx[:, None, None, :], out, cx)
            out = _force_bad(out, cx, bad)
            return out, out

        init = jnp.broadcast_to(cT[0] * 0 + bad, (b, sy, sx, h))
        _, ys = lax.scan(step, init, (cT, pT, gT), unroll=_SCAN_UNROLL)

    out_s = jnp.transpose(ys, (1, 4, 0, 2, 3))    # (B, H, WW, sy, sx)
    return _unshear_rows(out_s, w)


def _mgm_aggregate(cost, img, p1: float, p2: float, bad: float):
    """All eight MGM direction tasks (ref accum_mgm_multithread,
    SGM.cc:2619-2700 + SGMAssist.h:911-1237), summed."""
    h, w, sy, sx = cost.shape
    total = jnp.zeros_like(cost)

    # --- sheared group: the four edge tasks L, T, B, R --------------------
    # Each is the left+up recurrence under one of the four axis-flip
    # combinations (e.g. B's deps (row+1, col) & (row, col-1) are up+left
    # after flipping rows), so all four batch into ONE sheared scan.
    #   orientation: (flip_rows, flip_cols), pd dir, guard
    edge_tasks = [
        ((False, False), (-1, 0),
         lambda r, c, lr, lc: (r > 0) & (c > 0)),          # L
        ((False, True), (0, -1),
         lambda r, c, lr, lc: (r > 0) & (c < lc)),         # T
        ((True, False), (0, 1),
         lambda r, c, lr, lc: (r < lr) & (c > 0)),         # B
        ((True, True), (1, 0),
         lambda r, c, lr, lc: (r < lr) & (c < lc)),        # R
    ]

    def apply_flips(a, fl):
        if fl[0]:
            a = jnp.flip(a, 0)
        if fl[1]:
            a = jnp.flip(a, 1)
        return a

    cbs, pdbs, gbs = [], [], []
    for fl, d, guard in edge_tasks:
        pd, g = _mgm_step_tensors(img, d, guard, h, w)
        cbs.append(apply_flips(cost, fl))
        pdbs.append(apply_flips(pd, fl))
        gbs.append(apply_flips(g, fl))
    out = _mgm_sheared_scan(jnp.stack(cbs, 0), jnp.stack(pdbs, 0),
                            jnp.stack(gbs, 0), p1, p2, bad)
    for o, (fl, _, _) in enumerate(edge_tasks):
        total = total + apply_flips(out[o], fl)

    # --- plain group 1: TL (rows forward) and BR (rows reverse) -----------
    pd_tl, g_tl = _mgm_step_tensors(
        img, (-1, -1), lambda r, c, lr, lc: (r > 0) & (c > 0) & (c < lc),
        h, w)
    pd_br, g_br = _mgm_step_tensors(
        img, (1, 1), lambda r, c, lr, lc: (r < lr) & (c > 0) & (c < lc),
        h, w)
    cost_ty = jnp.transpose(cost, (0, 2, 3, 1))   # (H, sy, sx, W)
    out = _mgm_plain_scan(cost_ty, pd_tl, pd_br, g_tl, g_br, p1, p2, bad)
    total = total + jnp.transpose(out, (0, 3, 1, 2))

    # --- plain group 2: BL (cols forward) and TR (cols reverse) -----------
    pd_bl, g_bl = _mgm_step_tensors(
        img, (-1, 1), lambda r, c, lr, lc: (r > 0) & (r < lr) & (c > 0),
        h, w)
    pd_tr, g_tr = _mgm_step_tensors(
        img, (1, -1), lambda r, c, lr, lc: (r > 0) & (r < lr) & (c < lc),
        h, w)
    cost_tx = jnp.transpose(cost, (1, 2, 3, 0))   # (W, sy, sx, H)
    out = _mgm_plain_scan(cost_tx, pd_bl.T, pd_tr.T, g_bl.T, g_tr.T,
                          p1, p2, bad)
    total = total + jnp.transpose(out, (3, 0, 1, 2))
    return total


# ---------------------------------------------------------------------------
# WTA + subpixel (ref create_disparity_view / _subpixel, SGM.cc:1159-1614)
# ---------------------------------------------------------------------------


def _subpixel_1d(sm1, s0, sp1, mode: str, left_bound, right_bound):
    """1D subpixel offset from three accumulated costs — the reference's
    exact logic and ORDER (``compute_subpixel_offset``, SGM.cc:1445-1479):
    inputs must already be bound-collapsed (prev=center at a left bound,
    like the reference's x_left=0 indices); the all-equal zero case takes
    precedence over the two-value bound interpolation
    (``two_value_subpixel``, SGM.cc:1440-1443). Fits (SGM.cc:1411-1437):
    linear ``x/2``, poly4 ``(x^4+x)/4``, cosine ``1-cos(x*pi/3)``, lc_blend
    factor-blended cosine/linear."""
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
    ratio_off = (value - 0.5) * mult
    two_left = 0.5 * s0 / jnp.where(sp1 == 0, 1.0, sp1)
    two_right = -0.5 * s0 / jnp.where(sm1 == 0, 1.0, sm1)
    off = jnp.where(left_bound, two_left,
                    jnp.where(right_bound, two_right, ratio_off))
    return jnp.where(both_zero, 0.0, off)


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


def _sh3(x, d: int, axis: int):
    z = jnp.zeros_like(jnp.take(x, jnp.array([0]), axis=axis))
    n = x.shape[axis]
    if d > 0:
        body = lax.slice_in_dim(x, 0, n - d, axis=axis)
        return jnp.concatenate([z, body], axis=axis)
    body = lax.slice_in_dim(x, -d, n, axis=axis)
    return jnp.concatenate([body, z], axis=axis)


def _masked_mean3(v, allowed_f, inv_cnt, axis: int):
    """One ``select_best_disparity`` smoothing iteration (SGM.cc:1223-1268):
    3-tap box mean along ``axis`` of the (H, W, sy, sx) volume with
    out-of-rectangle taps dropped (the per-pixel bounds rectangle =
    ``allowed``; at its edges the reference drops the out-of-range tap),
    rounded half-away-from-zero (C ``round``; values are non-negative
    integers < 2^24 so fp32 floor(x + 0.5) is exact). ``inv_cnt``: the
    precomputed reciprocal tap count for this axis (constant across
    iterations; division by 1/2/3 exact-safe at these magnitudes —
    1/n is exact for n in {1,2} and the n=3 quotient's fp32 error is far
    below the 1/6 decision margins)."""
    va = v * allowed_f
    s = va + _sh3(va, 1, axis) + _sh3(va, -1, axis)
    out = jnp.floor(s * inv_cnt + 0.5)
    return jnp.where(allowed_f > 0, out, v)


# A/B knob: 0 skips the reference's multiple-minimum smoothing cascade
# (first-minimum WTA like rounds <= 2). Default 1 = reference semantics.
_EXACT_TIES = os.environ.get("VWTPU_SGM_EXACT_TIES", "1") == "1"


def _wta_stats(v, allowed):
    """(min, multiplicity, first-argmin) over the flattened (sy*sx) axis in
    ONE volume read — a 3-operand variadic ``lax.reduce`` (the separate
    min + eq-count + argmin passes measured a 25% pyramid-SGM hit;
    same-day A/B in CLAUDE.md)."""
    h, w = v.shape[:2]
    vm = jnp.where(allowed, v, _INF).reshape(h, w, -1)
    ids = lax.broadcasted_iota(jnp.int32, vm.shape, 2)

    def comb(a, b):
        mv1, c1, a1 = a
        mv2, c2, a2 = b
        lt = mv1 < mv2
        gt = mv2 < mv1
        mn = jnp.minimum(mv1, mv2)
        cnt = jnp.where(lt, c1, jnp.where(gt, c2, c1 + c2))
        arg = jnp.where(lt, a1, jnp.where(gt, a2, jnp.minimum(a1, a2)))
        return mn, cnt, arg

    return lax.reduce(
        (vm, jnp.ones_like(vm, jnp.int32), ids),
        (_INF, jnp.int32(0), jnp.int32(2 ** 30)), comb, (2,))


def _tie_smooth_select(acc, allowed):
    """``select_best_disparity`` (SGM.cc:1159-1284): when a pixel's minimum
    accumulated cost is not unique, smooth its bounds rectangle with 3-tap
    box filters (5 horizontal iterations, then 1 vertical) until the
    minimum is unique or 6 iterations pass; the smoothed values REPLACE the
    accumulation volume (the subpixel step reads them, SGM.cc:1559).

    ``acc`` (H, W, sy, sx) integer-valued; ``allowed`` same-shape bool.
    Returns (selected volume, argmin flat index (H, W) int32). The whole
    smoothing cascade runs under a ``lax.cond`` on "any pixel tied" — on
    textured imagery it never executes."""
    h, w, sy, sx = acc.shape
    af = allowed.astype(acc.dtype)

    def stats(v):
        return _wta_stats(v, allowed)

    if not _EXACT_TIES:
        vm = jnp.where(allowed, acc, _INF).reshape(h, w, sy * sx)
        return acc, jnp.argmin(vm, -1).astype(jnp.int32)

    _, cnt0, arg0 = stats(acc)

    def no_ties(_):
        return acc, arg0

    def smooth(_):
        inv = {}
        for ax in (2, 3):
            cnt = af + _sh3(af, 1, ax) + _sh3(af, -1, ax)
            inv[ax] = 1.0 / jnp.maximum(cnt, 1.0)

        def iter_body(ax):
            def do(carry):
                v, sel, argsel, done = carry
                v2 = _masked_mean3(v, af, inv[ax], axis=ax)
                _, cnt_k, arg_k = stats(v2)
                upd = ~done
                sel = jnp.where(upd[..., None, None], v2, sel)
                argsel = jnp.where(upd, arg_k, argsel)
                return v2, sel, argsel, done | (cnt_k <= 1)
            return do

        # Per-iteration early-out (A/B knob, round 4): each of the 6
        # reference iterations (5 horizontal + 1 vertical, SGM.cc:1240-1262)
        # can run under its own lax.cond on "any pixel still tied" — the
        # reference's per-pixel while exits as soon as a pixel's min is
        # unique, so once EVERY pixel resolved the remaining volume passes
        # are waste. MEASURED WORSE on the bench scene (75.4 vs 83.4 Mp/s
        # config 6): the scene's ties never fully resolve, so every cond
        # fires AND pays a carry materialization at each cond boundary —
        # same failure class as the refuted while_loop (docs/roofline.md).
        # Default stays the unrolled cascade; VWTPU_SGM_ITER_COND=1 keeps
        # the variant measurable.
        carry = (acc, acc, arg0, cnt0 <= 1)
        if os.environ.get("VWTPU_SGM_ITER_COND", "0") == "1":
            for k in range(1, 7):
                ax = 3 if k <= 5 else 2
                carry = lax.cond(jnp.any(~carry[3]), iter_body(ax),
                                 lambda c: c, carry)
        else:
            for k in range(1, 7):
                ax = 3 if k <= 5 else 2
                carry = iter_body(ax)(carry)
        return carry[1], carry[2]

    return lax.cond(jnp.any(cnt0 > 1), smooth, no_ties, None)


def _winner_z(v, dx, dy):
    """The 3x3 ``(dy+ddy, dx+ddx)`` neighborhood of each pixel's winner,
    edge-clamped: z[0..8] with ddx fastest (z[4] = center). Fused select
    chain over the volume planes (per-pixel gathers are pathological on
    this toolchain); clamped indexing is value-identical to reading the
    edge-padded volume like ``_volume_argmin_subpixel``'s extraction."""
    h, w, sy, sx = v.shape
    zeros = jnp.zeros((h, w), v.dtype)
    z = [zeros] * 9
    for a in range(sy):
        rows = (jnp.clip(dy - 1, 0, sy - 1) == a, dy == a,
                jnp.clip(dy + 1, 0, sy - 1) == a)
        for b in range(sx):
            plane = v[:, :, a, b]
            cols = (jnp.clip(dx - 1, 0, sx - 1) == b, dx == b,
                    jnp.clip(dx + 1, 0, sx - 1) == b)
            for jy in range(3):
                for jx in range(3):
                    k = jy * 3 + jx
                    z[k] = jnp.where(rows[jy] & cols[jx], plane, z[k])
    return z


# Formulation knob: 1 = the stats-form cascade below, which freezes only
# the winner argmin + its 3x3 neighborhood planes per iteration instead of
# the whole volume. MEASURED WORSE (79.5 vs 86.1 Mp/s config 6, same-day
# clean-process A/B, round 5): the nine per-iteration ``_winner_z`` select
# chains are full volume re-reads that do not fuse into the mean pass, so
# they ADD a stream instead of replacing the two frozen-volume streams.
# Third refutation for this cascade (after while_loop and per-iteration
# cond); the unrolled select cascade measures >= 87% of HBM peak under a
# conservative 4-stream count — structural. See docs/roofline.md round 5.
_TIE_STATS = os.environ.get("VWTPU_SGM_TIE_STATS", "0") == "1"


def _tie_smooth_stats(acc, allowed):
    """``_tie_smooth_select`` + winner-neighborhood extraction WITHOUT
    materializing the per-pixel frozen volume (the subpixel step only ever
    reads the winner's 3x3 neighborhood, and every caller discards the
    returned volume): per iteration, freeze the argmin plane and the nine
    neighborhood planes where the pixel just resolved — 10 (H, W) plane
    selects (~0.4 volumes at 5x5) instead of two volume-sized streams.
    Bit-identical outputs by construction (same v_k, same argmin, same
    neighborhood values at each pixel's freeze iteration); pinned by the
    oracle parity + interpret tests run under ``VWTPU_SGM_TIE_STATS=1``.

    Returns (argmin flat index (H, W) int32, z[0..8] winner planes)."""
    h, w, sy, sx = acc.shape
    af = allowed.astype(acc.dtype)
    _, cnt0, arg0 = _wta_stats(acc, allowed)
    z0 = _winner_z(acc, arg0 % sx, arg0 // sx)

    def no_ties(_):
        return (arg0, *z0)

    def smooth(_):
        inv = {}
        for ax in (2, 3):
            cnt = af + _sh3(af, 1, ax) + _sh3(af, -1, ax)
            inv[ax] = 1.0 / jnp.maximum(cnt, 1.0)
        v, arg, z, done = acc, arg0, list(z0), cnt0 <= 1
        for k in range(1, 7):
            ax = 3 if k <= 5 else 2
            v = _masked_mean3(v, af, inv[ax], axis=ax)
            _, cnt_k, arg_k = _wta_stats(v, allowed)
            zk = _winner_z(v, arg_k % sx, arg_k // sx)
            upd = ~done
            arg = jnp.where(upd, arg_k, arg)
            z = [jnp.where(upd, zk[i], z[i]) for i in range(9)]
            done = done | (cnt_k <= 1)
        return (arg, *z)

    out = lax.cond(jnp.any(cnt0 > 1), smooth, no_ties, None)
    return out[0], list(out[1:])


def _volume_argmin_subpixel(acc, subpixel: str, bad: float):
    """WTA argmin over the aggregated volume (H, W, sy, sx) + subpixel
    (ref ``create_disparity_view`` + ``create_disparity_view_subpixel``,
    SGM.cc:1286-1614): tie-smoothed first-minimum WTA, then the 2D 9-point
    parabola fit or the per-axis ratio interpolation with two-value bound
    handling, reading the (possibly smoothed) accumulation volume with
    bound-collapsed neighbor indices.

    Bound flags come from the volume edge OR an absent (== N_PATHS*bad)
    neighbor — absent candidates reproduce the reference's per-pixel
    disparity-range bounds (``m_disp_bound_image``): each of the 8 path
    results forces absent candidates to ``bad``, so their sums are exactly
    ``8*bad`` and their neighbors interpolate as range-bounded, exactly
    like the reference's x_left=0 / two-value path at bounds."""
    h, w, sy, sx = acc.shape
    bad_total = N_PATHS * bad
    allowed = acc < bad_total - 0.5
    if (_TIE_STATS and _EXACT_TIES and subpixel != "none"
            and (sy + 2) * (sx + 2) <= 256):
        # Stats-form cascade: no frozen volume is ever materialized; the
        # returned ``flat`` is the UNSMOOTHED volume (every caller discards
        # it — XLA DCEs the reshape).
        best, z = _tie_smooth_stats(acc, allowed)
        flat = acc.reshape(h, w, sy * sx)
        dx = best % sx
        dy = best // sx
        disp = jnp.stack([dx, dy], -1)
    else:
        acc, best = _tie_smooth_select(acc, allowed)
        flat = acc.reshape(h, w, sy * sx)
        dx = best % sx
        dy = best // sx
        disp = jnp.stack([dx, dy], -1)
        if subpixel == "none":
            return disp.astype(jnp.float32), flat
        padded = jnp.pad(acc, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
        # The 3x3 neighborhood of each winner, z[0..8] with dx fastest
        # (z[4] = center). Fused select-chain over the (small) padded
        # volume: per-pixel gathers cost ~3.5 ms per 0.26 Mpx plane on this
        # toolchain (five gathers dominated the whole SGM profile in round
        # 1); the static loop fuses into one elementwise pass.
        if (sy + 2) * (sx + 2) <= 256:
            zeros = jnp.zeros((h, w), acc.dtype)
            z = [zeros] * 9
            for a in range(sy + 2):
                rows = (dy == a, dy + 1 == a, dy + 2 == a)  # ddy = -1, 0, +1
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
    absent = [v >= bad_total - 0.5 for v in z]
    left_b = (dx == 0) | absent[3]
    right_b = (dx == sx - 1) | absent[5]
    top_b = (dy == 0) | absent[1]
    bot_b = (dy == sy - 1) | absent[7]
    # Reference: at bounds the neighbor index collapses onto the center
    # (x_left = 0 etc., SGM.cc:1545-1557) for BOTH the parabola and the 1D
    # modes before any fit.
    zz = list(z)
    for k in (0, 3, 6):
        zz[k] = jnp.where(left_b, zz[k + 1], zz[k])
    for k in (2, 5, 8):
        zz[k] = jnp.where(right_b, zz[k - 1], zz[k])
    for k in (0, 1, 2):
        zz[k] = jnp.where(top_b, zz[k + 3], zz[k])
    for k in (6, 7, 8):
        zz[k] = jnp.where(bot_b, zz[k - 3], zz[k])
    if subpixel == "parabola":
        off_x, off_y = _parabola_2d(jnp.stack(zz, -1), dx, dy, sx, sy)
    else:
        off_x = _subpixel_1d(zz[3], zz[4], zz[5], subpixel, left_b, right_b)
        off_y = _subpixel_1d(zz[1], zz[4], zz[7], subpixel, top_b, bot_b)
    return disp.astype(jnp.float32) + jnp.stack([off_x, off_y], -1), flat


def _apply_pixel_bounds(cost, base, seed_disp, seed_valid, buffer: int,
                        range_x: int, range_y: int, bad: float):
    """Per-pixel disparity bounds (ref ``m_disp_bound_image``, SGM.h:180-198,
    seeded by ``populate_disp_bound_image``, SGM.cc:241-470): pixels with a
    trusted previous-level seed restrict their candidates to
    ``seed ± buffer`` — candidates outside the window get the reference's
    BAD accumulation sentinel (``255 + P2``), exactly the effect of the
    compact per-pixel cost buffers (absent candidates read as BAD_VAL in
    every path update). Untrusted pixels (invalid seed, or a seed on the
    edge of a wide search range, SGM.cc:372-384) keep the full window.

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
    return jnp.where(allowed, cost, bad)


def _mask_cost_volume(cost, lmask, bad: float):
    """Masked left pixels get ZERO_SEARCH_AREA (every candidate absent)."""
    if lmask is None:
        return cost
    return jnp.where(lmask.astype(bool)[..., None, None], cost, bad)


@functools.partial(jax.jit, static_argnames=("sx", "sy", "window", "ternary",
                                             "thresh", "use_mgm", "subpixel",
                                             "p1", "p2", "search_buffer"))
def _sgm_core(left_u8, right_u8, sx: int, sy: int, window: int, ternary: bool,
              thresh: int, p1: float, p2: float, use_mgm: bool, subpixel: str,
              seed_disp=None, seed_valid=None, search_buffer: int = 2,
              lmask=None):
    h, w = left_u8.shape
    bad = _bad_val(p2)
    cost = _census_cost_volume(left_u8, right_u8, sx, sy, window, ternary,
                               thresh)
    valid = jnp.ones((h, w), bool)
    if seed_disp is not None:
        base = jnp.zeros((h, w, 2), jnp.int32)
        cost = cost.reshape(h, w, sy, sx)
        cost = _apply_pixel_bounds(cost, base, seed_disp, seed_valid,
                                   search_buffer, sx, sy, bad)
    if lmask is not None:
        cost = _mask_cost_volume(cost, lmask, bad)
    img = left_u8.astype(jnp.float32)
    if use_mgm:
        acc = _mgm_aggregate(cost, img, p1, p2, bad)
    else:
        acc = _sgm_aggregate(cost, img, p1, p2, bad)
    fdisp, flat = _volume_argmin_subpixel(acc, subpixel, bad)
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
    are restricted to ``seed ± search_buffer`` via BAD-cost masking of the
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
    bad = _bad_val(p2)
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
                                   search_buffer, range_x, range_y, bad)
    if lmask is not None:
        cost = _mask_cost_volume(cost, lmask, bad)
    if use_mgm:
        acc = _mgm_aggregate(cost, img, p1, p2, bad)
    else:
        acc = _sgm_aggregate(cost, img, p1, p2, bad)
    rel, _ = _volume_argmin_subpixel(acc, subpixel, bad)
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


def sgm_reference_region(left_u8, right_u8, search_volume, kernel_size: int = 5,
                         cost_type: str = "census", use_mgm: bool = False,
                         subpixel: str = "lc_blend",
                         p1: Optional[float] = None,
                         p2: Optional[float] = None,
                         ternary_census_threshold: int = 5,
                         allowed=None):
    """Reference-domain SGM/MGM entry (ref ``semi_global_matching_func``,
    SGM.cc:2387-2448): census over the FULL u8 frames, cost volume +
    aggregation over exactly the kernel+search-supported output region
    ``[hk, H-1-hk] x [hk, ...]`` whose paths start at the region border —
    the domain convention the reference uses, pinned bit-exact against
    ``tests/oracle/vw_oracle_sgm.py``. ``calc_disparity_sgm`` keeps this
    package's full-frame convention instead.

    ``search_volume`` is max-EXCLUSIVE like the rest of this package
    (disparities in [0, sx) x [0, sy)). ``allowed``: optional per-pixel
    candidate mask (rows, cols, sy, sx) — the reference's
    ``m_disp_bound_image``. Returns (DisparityMap over the region,
    (min_row, min_col) region offset into the left frame)."""
    sx, sy = int(search_volume[0]), int(search_volume[1])
    window = int(kernel_size)
    ternary = cost_type == "ternary_census"
    key = (cost_type, window)
    p1v = float(p1 if p1 is not None else _P1_TABLE.get(key, 3))
    p2v = float(p2 if p2 is not None else _P2_TABLE.get(key, 70))
    hk = window // 2
    lq = jnp.asarray(left_u8, jnp.int32)
    rq = jnp.asarray(right_u8, jnp.int32)
    h, w = lq.shape
    min_row = min_col = hk
    max_row = min(h - 1 - hk, rq.shape[0] - 1 - hk - (sy - 1))
    max_col = min(w - 1 - hk, rq.shape[1] - 1 - hk - (sx - 1))
    bad = _bad_val(p2v)
    vol = _census_cost_volume(lq, rq, sx, sy, window, ternary,
                              int(ternary_census_threshold))
    vol = vol[min_row:max_row + 1, min_col:max_col + 1]
    if allowed is not None:
        vol = jnp.where(jnp.asarray(allowed, bool), vol, bad)
    img = lq[min_row:max_row + 1, min_col:max_col + 1].astype(jnp.float32)
    if use_mgm:
        acc = _mgm_aggregate(vol, img, p1v, p2v, bad)
    else:
        acc = _sgm_aggregate(vol, img, p1v, p2v, bad)
    fdisp, _ = _volume_argmin_subpixel(acc, subpixel, bad)
    if allowed is not None:
        valid = jnp.asarray(allowed, bool).reshape(
            fdisp.shape[0], fdisp.shape[1], -1).any(-1)
    else:
        valid = jnp.ones(fdisp.shape[:2], bool)
    fdisp = jnp.where(valid[..., None], fdisp, 0.0)
    return DisparityMap(fdisp, valid), (min_row, min_col)
