"""Subpixel disparity refinement.

Parabola subpixel (ref ``src/vw/Stereo/ParabolaSubpixelView.cc:40-344``):
re-evaluate the SAD cost at the 3x3 disparity neighborhood of each integer
disparity, fit the 2D quadratic ``z = ax^2 + by^2 + cxy + dx + ey + f`` with
the reference's precomputed 6x9 pseudoinverse (``ParabolaSubpixelView.h:77-89``),
and move to the stationary point; reject offsets with norm >= 5
(``MAX_SUBPIXEL_SHIFT``, ``.cc:254``) and keep the integer disparity where all
nine costs are equal.

TPU design: instead of the reference's quadtree zones + per-zone shifted box
sums (data-dependent shapes), the nine cost surfaces are evaluated densely by
gathering right-image samples at ``p + v + d(p)`` for every window offset
``v`` in the (k+2)^2 super-window and accumulating ``|L(p+w) - S_{w+delta}(p)|``
— O(1) w.r.t. the disparity search range, static shapes, all VPU work.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.stereo.correlation import DisparityMap
from visionworkbench_tpu.stereo.prefilter import PREFILTER_NONE, prefilter_image

# Pseudoinverse of A where rows of A are [x^2 y^2 xy x y 1] at the nine
# (x, y) in [-1,1]^2, x fastest (ref ParabolaSubpixelView.h:83-88).
_PINV_A = np.array([
    [1/6, -1/3, 1/6, 1/6, -1/3, 1/6, 1/6, -1/3, 1/6],    # a
    [1/6, 1/6, 1/6, -1/3, -1/3, -1/3, 1/6, 1/6, 1/6],    # b
    [1/4, 0.0, -1/4, 0.0, 0.0, 0.0, -1/4, 0.0, 1/4],     # c
    [-1/6, 0.0, 1/6, -1/6, 0.0, 1/6, -1/6, 0.0, 1/6],    # d
    [-1/6, -1/6, -1/6, 0.0, 0.0, 0.0, 1/6, 1/6, 1/6],    # e
    [-1/9, 2/9, -1/9, 2/9, 5/9, 2/9, -1/9, 2/9, -1/9],   # f
], dtype=np.float32)

MAX_SUBPIXEL_SHIFT = 5.0

# Integer-disparity warp gather formulation ("flat" | "2d"); see
# _parabola_refine_fast for the measurement.
_PARA_GATHER = os.environ.get("VWTPU_PARA_GATHER", "flat")


@functools.partial(jax.jit, static_argnames=("kw", "kh"))
def _parabola_refine_fast(int_disp, valid, left_f, right_f, kw: int, kh: int):
    """Single-gather formulation: warp the right image once by the integer
    disparity field (G(p) = R(p + d_p)), then evaluate the nine neighbor
    costs as shifted box sums of |L - shift(G, delta)|.

    Approximates the exact evaluation by treating the disparity as locally
    constant across each correlation window — exact wherever the disparity
    is flat (post-filtering, almost everywhere), and differing only near
    discontinuities where the quadratic fit is rejected regardless. Turns 81
    full-image gathers into 1 gather + 9 fused shift/box-sum passes.
    """
    from visionworkbench_tpu.ops.box_filter import box_sum_same
    h, w = left_f.shape
    k2w, k2h = kw // 2, kh // 2
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dxp = int_disp[..., 0].astype(jnp.int32)
    dyp = int_disp[..., 1].astype(jnp.int32)
    # Flattened 1D take lowers to a cheaper gather than 2D advanced indexing
    # on this toolchain (end-to-end 17.8 vs 17.0 Mp/s on the 1024^2 bench);
    # indices are clipped identically, so the two are value-identical. Both
    # clip against the RIGHT image's bounds (it may be larger than left).
    rh, rw = right_f.shape
    yy = jnp.clip(ys + dyp, 0, rh - 1)
    xx = jnp.clip(xs + dxp, 0, rw - 1)
    if _PARA_GATHER == "flat":
        g = jnp.take(right_f.reshape(-1), (yy * rw + xx).reshape(-1)).reshape(h, w)
    else:
        g = right_f[yy, xx]
    gpad = jnp.pad(g, ((1, 1), (1, 1)), mode="edge")
    costs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifted = jax.lax.dynamic_slice(gpad, (dy + 1, dx + 1), (h, w))
            costs.append(box_sum_same(jnp.abs(left_f - shifted), kw, kh,
                                      edge="constant"))
    patch = jnp.stack(costs, axis=-1)
    return _fit_parabola(patch, int_disp, valid)


def _fit_parabola(patch, int_disp, valid):
    """9-point 2D parabola fit. ``patch`` is either an (H, W, 9) stack or a
    list/tuple of nine (H, W) planes — the planes form skips the (H, W, 9)
    materialization (the stack + broadcast assembly of the Pallas sweep's
    nine patch outputs measured ~0.22 ms/frame at 1024^2) and the unused
    f-coefficient row, and drops zero taps; value-identical to the einsum
    up to f32 summation order (pins are allclose at 1e-4/2e-4)."""
    if isinstance(patch, (list, tuple)):
        planes = patch
        coeffs = []
        for i in range(5):
            acc = None
            for j in range(9):
                w_ = float(_PINV_A[i, j])
                if w_ == 0.0:
                    continue
                term = w_ * planes[j]
                acc = term if acc is None else acc + term
            coeffs.append(acc)
        a, b, c, d, e = coeffs
        all_equal = planes[1] == planes[0]
        for j in range(2, 9):
            all_equal = all_equal & (planes[j] == planes[0])
    else:
        coeffs = jnp.einsum("ij,hwj->hwi", jnp.asarray(_PINV_A), patch)
        a, b, c, d, e = (coeffs[..., 0], coeffs[..., 1], coeffs[..., 2],
                         coeffs[..., 3], coeffs[..., 4])
        all_equal = jnp.all(patch == patch[..., :1], axis=-1)
    denom = 4 * a * b - c * c
    off_x = (c * e - 2 * b * d) / denom
    off_y = (c * d - 2 * a * e) / denom
    norm = jnp.sqrt(off_x * off_x + off_y * off_y)
    use_offset = (~all_equal) & (norm < MAX_SUBPIXEL_SHIFT)
    fx = int_disp[..., 0].astype(jnp.float32) + jnp.where(use_offset, off_x, 0.0)
    fy = int_disp[..., 1].astype(jnp.float32) + jnp.where(use_offset, off_y, 0.0)
    out = jnp.stack([fx, fy], axis=-1)
    return jnp.where(valid[..., None], out, 0.0)


@functools.partial(jax.jit, static_argnames=("kw", "kh"))
def _parabola_refine(int_disp, valid, left_f, right_f, kw: int, kh: int):
    h, w = left_f.shape
    k2w, k2h = kw // 2, kh // 2
    dxp = int_disp[..., 0].astype(jnp.int32)
    dyp = int_disp[..., 1].astype(jnp.int32)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    rh, rw = right_f.shape

    def gather_right(vy, vx):
        yy = jnp.clip(ys + vy + dyp, 0, rh - 1)
        xx = jnp.clip(xs + vx + dxp, 0, rw - 1)
        return right_f[yy, xx]

    # Replicated-edge padded left for cheap window shifts.
    lpad = jnp.pad(left_f, ((k2h, k2h), (k2w, k2w)), mode="edge")

    def left_shift(wy, wx):
        return jax.lax.dynamic_slice(lpad, (wy + k2h, wx + k2w), (h, w))

    costs = [jnp.zeros((h, w), jnp.float32) for _ in range(9)]
    for vy in range(-k2h - 1, k2h + 2):
        for vx in range(-k2w - 1, k2w + 2):
            s_v = gather_right(vy, vx)
            for dy in (-1, 0, 1):
                wy = vy - dy
                if abs(wy) > k2h:
                    continue
                for dx in (-1, 0, 1):
                    wx = vx - dx
                    if abs(wx) > k2w:
                        continue
                    idx = (dy + 1) * 3 + (dx + 1)
                    costs[idx] = costs[idx] + jnp.abs(left_shift(wy, wx) - s_v)

    patch = jnp.stack(costs, axis=-1)  # (H, W, 9)
    return _fit_parabola(patch, int_disp, valid)


def parabola_subpixel(disparity: DisparityMap, left, right, kernel_size,
                      prefilter_mode: str = PREFILTER_NONE,
                      prefilter_width: float = 1.4,
                      exact: bool = False) -> DisparityMap:
    """Refine an integer disparity map to float (ref ``parabola_subpixel``,
    ParabolaSubpixelView.cc:330-344). ``disparity`` must be pixel-aligned with
    ``left`` (same H, W); dx/dy are absolute right-image offsets.

    ``exact=True`` evaluates every window tap at the window-center disparity
    exactly like the reference (O(k^2) gathers); the default fast path uses
    the locally-constant-disparity formulation (1 gather), identical away
    from disparity discontinuities.
    """
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    if disparity.disparity.shape[:2] != left.shape[:2]:
        raise ArgumentErr("parabola_subpixel: disparity must match left image size")
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    left_f = prefilter_image(left, prefilter_mode, prefilter_width)
    right_f = prefilter_image(right, prefilter_mode, prefilter_width)
    refine = _parabola_refine if exact else _parabola_refine_fast
    out = refine(disparity.disparity, disparity.valid, left_f, right_f, kw, kh)
    return DisparityMap(out, disparity.valid)
