"""Mosaic compositing with multi-band (Laplacian-pyramid) blending
(ref ``ImageComposite``, ``src/vw/Mosaic/ImageComposite.h:53-592``).

Pipeline per the reference: grassfire distance of each source's valid mask
becomes its alpha (``:184, 333-371``); sources are decomposed into Laplacian
pyramids with ``levels = floor(log2(min_dim/2)) - 1`` (``:441``); each level
is merged with weights from the Gaussian pyramid of the normalized alphas
(``blend_patch``, ``:237``); the merged pyramid collapses to the mosaic.
Draft mode skips the pyramids (feathered weighted average).

The reference streams this through cache generators tile-by-tile; here the
canvas blends in one traced call (tile-sharded execution comes from
:mod:`visionworkbench_tpu.parallel` when canvases exceed device memory).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.image.filters import generate_pyramid_smoothing_kernel
from visionworkbench_tpu.image.morphology import grassfire
from visionworkbench_tpu.math.bbox import BBox2i


def _conv_mat(n_out: int, n_in: int, kernel, stride: int = 1):
    """(n_out, n_in) replicate-edge 1D convolution matrix, built from
    in-graph iotas (host-constant bands force einsum relayouts on this
    toolchain — see CLAUDE.md). Row i sums ``kernel[t] * src[stride*i + t -
    half]`` with border taps clamped (VW ConstantEdgeExtension)."""
    lax = jax.lax
    half = len(kernel) // 2
    oi = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    ji = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    mat = jnp.zeros((n_out, n_in), jnp.float32)
    for t, kv in enumerate(kernel):
        col = jnp.clip(stride * oi + (t - half), 0, n_in - 1)
        mat = mat + jnp.float32(kv) * (ji == col)
    return mat


def _smooth(img, stride: int = 1):
    """Separable [1,4,6,4,1]/16 smoothing (+ optional decimation fused in)
    as two banded MXU matmuls — single-channel ``conv_general_dilated`` and
    strided lane slices both lower pathologically on this toolchain (~11 ms
    per 5-tap 1024^2 blur / gathers); the banded matmuls measure ~1 ms at
    1024^2 (same trick as the pyramid ``_blur_downsample``)."""
    k = generate_pyramid_smoothing_kernel()
    h, w = img.shape[0], img.shape[1]
    oh, ow = -(-h // stride), -(-w // stride)
    my = _conv_mat(oh, h, k, stride)
    mx = _conv_mat(ow, w, k, stride)
    rows = jnp.einsum("oh,hw...->ow...", my, img,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ow...,pw->op...", rows, mx,
                      precision=jax.lax.Precision.HIGHEST)


def _downsample(img):
    return _smooth(img, stride=2)


def _upsample_to(img, shape):
    """Bilinear 2x upsample to an exact target shape (separable two-matmul
    formulation; 1-Mpx bilinear gathers cost ~11 ms on this toolchain)."""
    from visionworkbench_tpu.image.transform import sample_separable
    oh, ow = shape[0], shape[1]
    ys = (jnp.arange(oh, dtype=jnp.float32)) / 2.0
    xs = (jnp.arange(ow, dtype=jnp.float32)) / 2.0
    return sample_separable(img, xs, ys, interp="bilinear", edge="constant")


def gaussian_pyramid(img, levels: int) -> List:
    pyr = [jnp.asarray(img, jnp.float32)]
    for _ in range(levels):
        pyr.append(_downsample(pyr[-1]))
    return pyr


def laplacian_pyramid(img, levels: int) -> List:
    """(ref the composite's per-source Laplacian decomposition)"""
    gp = gaussian_pyramid(img, levels)
    lp = []
    for i in range(levels):
        lp.append(gp[i] - _upsample_to(gp[i + 1], gp[i].shape))
    lp.append(gp[-1])
    return lp


def collapse_pyramid(lp: List):
    out = lp[-1]
    for lvl in reversed(lp[:-1]):
        out = lvl + _upsample_to(out, lvl.shape)
    return out


def blend_levels_for(height: int, width: int) -> int:
    """(ref ImageComposite.h:441: levels = floor(log2(mindim/2)) - 1)"""
    mindim = max(min(height, width), 4)
    return max(int(math.floor(math.log2(mindim / 2))) - 1, 1)


def multiband_blend(images, masks, levels: Optional[int] = None,
                    alphas=None):
    """Blend aligned canvas-size sources (list of (H, W) arrays + bool masks).

    Returns (blended (H, W), valid (H, W)). Multi-channel inputs blend per
    channel. ``alphas`` optionally supplies precomputed grassfire weights
    (e.g. host-side ``grassfire_np`` of static plan masks — the reference
    caches per-source alphas the same way, ImageComposite.h:184).
    """
    if len(images) != len(masks) or not images:
        raise ArgumentErr("multiband_blend: need equal non-empty image/mask lists")
    h, w = images[0].shape[:2]
    if levels is None:
        levels = blend_levels_for(h, w)

    if alphas is None:
        alphas = [grassfire(m).astype(jnp.float32) for m in masks]
    else:
        alphas = [jnp.asarray(a, jnp.float32) for a in alphas]
    total = alphas[0]
    for a in alphas[1:]:
        total = total + a
    valid = total > 0
    weights = [a / jnp.maximum(total, 1.0) for a in alphas]

    def blend_channel(chans):
        num_lp = None
        den_gp = None
        for img, m, wgt in zip(chans, masks, weights):
            # Feather-fill masked pixels so pyramid blurs don't bleed zeros.
            img = jnp.where(jnp.asarray(m), jnp.asarray(img, jnp.float32), 0.0)
            wp = gaussian_pyramid(wgt, levels)
            ip = laplacian_pyramid(img, levels)
            if num_lp is None:
                num_lp = [wl * il for wl, il in zip(wp, ip)]
                den_gp = wp
            else:
                num_lp = [a + wl * il for a, wl, il in zip(num_lp, wp, ip)]
                den_gp = [a + wl for a, wl in zip(den_gp, wp)]
        merged = [n / jnp.maximum(d, 1e-8) for n, d in zip(num_lp, den_gp)]
        return collapse_pyramid(merged)

    if images[0].ndim == 2:
        out = blend_channel(images)
    else:
        chans = []
        for c in range(images[0].shape[2]):
            chans.append(blend_channel([img[..., c] for img in images]))
        out = jnp.stack(chans, -1)
    vexp = valid if out.ndim == 2 else valid[..., None]
    return jnp.where(vexp, out, 0.0), valid


def feather_blend(images, masks):
    """Draft-mode blend: grassfire-weighted average, no pyramids
    (ref draft mode, ImageComposite.h)."""
    alphas = [grassfire(m).astype(jnp.float32) for m in masks]
    total = alphas[0]
    for a in alphas[1:]:
        total = total + a
    valid = total > 0
    num = None
    for img, a in zip(images, alphas):
        ai = a if jnp.asarray(img).ndim == 2 else a[..., None]
        term = jnp.asarray(img, jnp.float32) * ai
        num = term if num is None else num + term
    tot = total if jnp.asarray(images[0]).ndim == 2 else total[..., None]
    out = num / jnp.maximum(tot, 1.0)
    vexp = valid if out.ndim == 2 else valid[..., None]
    return jnp.where(vexp, out, 0.0), valid


class ImageComposite:
    """Positioned-source mosaic (ref ``ImageComposite``): ``insert`` sources
    at pixel offsets, then ``generate`` the blended canvas."""

    def __init__(self, blend_mode: str = "multiband"):
        if blend_mode not in ("multiband", "draft", "simple"):
            raise ArgumentErr(f"unknown blend mode {blend_mode!r}")
        self.blend_mode = blend_mode
        self._sources: List[Tuple[np.ndarray, Optional[np.ndarray], int, int]] = []

    def insert(self, image, x: int, y: int, mask=None) -> None:
        img = np.asarray(image, np.float32)
        m = None if mask is None else np.asarray(mask, bool)
        self._sources.append((img, m, int(x), int(y)))

    def bbox(self) -> BBox2i:
        box = BBox2i.from_bounds(*(10 ** 9,) * 2, *(-10 ** 9,) * 2)
        for img, _, x, y in self._sources:
            box.grow(BBox2i(x, y, img.shape[1], img.shape[0]))
        return box

    def generate(self):
        """Composite all sources. Returns (data, valid) numpy arrays sized to
        the union bbox; origin at ``bbox().min``."""
        if not self._sources:
            raise ArgumentErr("ImageComposite: no sources")
        box = self.bbox()
        h, w = int(box.height), int(box.width)
        bands = self._sources[0][0].shape[2:] or ()
        canvases, masks = [], []
        for img, m, x, y in self._sources:
            canvas = np.zeros((h, w) + bands, np.float32)
            cmask = np.zeros((h, w), bool)
            ys, xs = y - box.min_y, x - box.min_x
            canvas[ys:ys + img.shape[0], xs:xs + img.shape[1]] = img
            src_mask = np.ones(img.shape[:2], bool) if m is None else m
            cmask[ys:ys + img.shape[0], xs:xs + img.shape[1]] = src_mask
            canvases.append(jnp.asarray(canvas))
            masks.append(jnp.asarray(cmask))
        if self.blend_mode == "simple":
            out = canvases[0]
            valid = masks[0]
            for c, m in zip(canvases[1:], masks[1:]):
                me = m if out.ndim == 2 else m[..., None]
                out = jnp.where(me, c, out)
                valid = valid | m
            return np.asarray(out), np.asarray(valid)
        if self.blend_mode == "draft":
            out, valid = feather_blend(canvases, masks)
        else:
            out, valid = multiband_blend(canvases, masks)
        return np.asarray(out), np.asarray(valid)
