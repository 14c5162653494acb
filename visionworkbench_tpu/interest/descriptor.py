"""Descriptor generation (ref ``src/vw/InterestPoint/Descriptor.h:40-180``).

* ``patch`` — normalized raw support patch (``PatchDescriptorGenerator:86``)
* ``sgrad`` — gradient-orientation histograms over a 4x4 subgrid of the
  support region, SIFT-like (the role of ``SGradDescriptorGenerator:120``'s
  steerable-gradient histograms, reformulated as dense gathers)

Support regions are scale- and orientation-normalized windows sampled with
bilinear gathers (ref ``get_support``), vmapped over the fixed-capacity point
buffer. Pass ``upright=True`` when every point has orientation 0 and scale 1
(single-scale Harris/LoG detections, before :func:`assign_orientations`):
supports are then extracted with one dynamic slice per point plus a shared
bilinear blend instead of four per-pixel gathers — the gathers cost ~10 ms
per 512x41x41 tap set on this toolchain and dominated the whole
detect+describe+match pipeline.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.image.interpolation import interpolate
from visionworkbench_tpu.interest.types import InterestPoints

SUPPORT_SIZE = 41  # ref Descriptor.h support size


def _upright_patches(img, pts: InterestPoints, size: int):
    """(K, size, size) bilinear support patches for axis-aligned unit-scale
    points: one vmapped ``dynamic_slice`` of a (size+1)^2 window per point,
    then a four-corner blend with the point's (shared) fractional weights —
    value-identical to the rotated-gather path when orientation == 0 and
    scale == 1 for every in-interior point (window origins clamp at image
    borders where the general path clamps per sample)."""
    half = (size - 1) // 2
    pad = half + 2
    p = jnp.pad(img, pad, mode="edge")
    x0f = jnp.floor(pts.x)
    y0f = jnp.floor(pts.y)
    fx = (pts.x - x0f)[:, None, None]
    fy = (pts.y - y0f)[:, None, None]
    ox = jnp.clip(x0f.astype(jnp.int32) - half + pad, 0, p.shape[1] - size - 1)
    oy = jnp.clip(y0f.astype(jnp.int32) - half + pad, 0, p.shape[0] - size - 1)

    def one(oyk, oxk):
        return lax.dynamic_slice(p, (oyk, oxk), (size + 1, size + 1))

    w = jax.vmap(one)(oy, ox)                          # (K, size+1, size+1)
    return ((1 - fy) * (1 - fx) * w[:, :size, :size]
            + (1 - fy) * fx * w[:, :size, 1:]
            + fy * (1 - fx) * w[:, 1:, :size]
            + fy * fx * w[:, 1:, 1:])


def _sample_support(img, pts: InterestPoints, size: int, upright: bool):
    if upright:
        return _upright_patches(img, pts, size)
    x, y = _support_coords(pts, size)
    return jax.vmap(lambda xc, yc: interpolate(img, xc, yc, "bilinear"))(x, y)


def _support_coords(pts: InterestPoints, size: int):
    """Sampling grids: rotated by orientation, scaled by scale (ref
    ``get_support``). Returns (K, size, size) x/y coordinate arrays."""
    half = (size - 1) / 2.0
    us = (jnp.arange(size) - half)
    uu, vv = jnp.meshgrid(us, us)          # (size, size), x and y offsets
    cos = jnp.cos(pts.orientation)[:, None, None]
    sin = jnp.sin(pts.orientation)[:, None, None]
    s = pts.scale[:, None, None]
    dx = (uu[None] * cos - vv[None] * sin) * s
    dy = (uu[None] * sin + vv[None] * cos) * s
    return pts.x[:, None, None] + dx, pts.y[:, None, None] + dy


@functools.partial(jax.jit, static_argnames=("size", "upright"))
def _patch_descriptors(img, pts, size: int, upright: bool):
    patches = _sample_support(img, pts, size, upright)  # (K, size, size)
    flat = patches.reshape(patches.shape[0], -1)
    mean = flat.mean(axis=1, keepdims=True)
    centered = flat - mean
    norm = jnp.sqrt((centered ** 2).sum(axis=1, keepdims=True))
    out = centered / jnp.maximum(norm, 1e-12)
    return jnp.where(pts.valid[:, None], out, 0.0)


def patch_descriptor(img, pts: InterestPoints, size: int = 17,
                     upright: bool = False) -> InterestPoints:
    """Normalized patch descriptor (ref ``PatchDescriptorGenerator``)."""
    img = jnp.asarray(img, jnp.float32)
    desc = _patch_descriptors(img, pts, size, upright)
    return pts._replace(descriptor=desc)


@functools.partial(jax.jit, static_argnames=("grid", "bins", "size", "upright"))
def _sgrad_descriptors(img, pts, grid: int, bins: int, size: int,
                       upright: bool):
    orientation, valid = pts.orientation, pts.valid
    k = pts.x.shape[0]
    patches = _sample_support(img, pts, size, upright)  # (K, size, size)
    gx = (jnp.roll(patches, -1, axis=2) - jnp.roll(patches, 1, axis=2)) * 0.5
    gy = (jnp.roll(patches, -1, axis=1) - jnp.roll(patches, 1, axis=1)) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy)
    # Gradients are computed IN THE PATCH FRAME. When the support was sampled
    # on a rotated grid (upright=False), the patch frame is already rotated
    # by the point's orientation, so the angles need no further
    # normalization; subtracting the orientation again would double-rotate.
    # Only the upright path (axis-aligned sampling) normalizes explicitly.
    ang = jnp.arctan2(gy, gx)
    if upright:
        ang = ang - orientation[:, None, None]
    bin_idx = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * bins).astype(jnp.int32) % bins
    # Gaussian weight over the window
    half = (size - 1) / 2.0
    g = jnp.exp(-0.5 * ((jnp.arange(size) - half) / (0.5 * size)) ** 2)
    weight = g[:, None] * g[None, :]
    mag = mag * weight[None]
    # Histogram accumulation. The obvious scatter-add
    # (hist.at[k, cell*bins + bin].add(mag)) lowers to a serialized TPU
    # scatter costing ~7.5 ms per 512x41x41 support set — it dominated the
    # whole detect+describe+match pipeline. The cell index is STATIC per
    # pixel position (only the gradient bin is data-dependent), so the
    # histogram decomposes into `bins` masked sums reduced over static cell
    # blocks with tiny 0/1 segment matmuls (in-graph iotas; see CLAUDE.md on
    # host-constant band matrices).
    cell = jnp.minimum((jnp.arange(size) * grid) // size, grid - 1)
    seg = (cell[:, None] == jnp.arange(grid)[None, :]).astype(jnp.float32)
    cells_per_bin = []
    for b in range(bins):
        wb = jnp.where(bin_idx == b, mag, 0.0)            # (K, S, S)
        colr = jnp.einsum("kij,jg->kig", wb, seg,
                          precision=lax.Precision.HIGHEST)
        cells = jnp.einsum("kig,ih->khg", colr, seg,
                           precision=lax.Precision.HIGHEST)
        cells_per_bin.append(cells)                       # (K, gy, gx)
    hist = jnp.stack(cells_per_bin, axis=-1).reshape(k, grid * grid * bins)
    norm = jnp.sqrt((hist ** 2).sum(axis=1, keepdims=True))
    hist = hist / jnp.maximum(norm, 1e-12)
    hist = jnp.minimum(hist, 0.2)                     # SIFT-style clamp
    norm = jnp.sqrt((hist ** 2).sum(axis=1, keepdims=True))
    hist = hist / jnp.maximum(norm, 1e-12)
    return jnp.where(valid[:, None], hist, 0.0)


def sgrad_descriptor(img, pts: InterestPoints, grid: int = 4, bins: int = 8,
                     size: int = SUPPORT_SIZE,
                     upright: bool = False) -> InterestPoints:
    """Gradient-histogram descriptor (ref ``SGradDescriptorGenerator``)."""
    img = jnp.asarray(img, jnp.float32)
    desc = _sgrad_descriptors(img, pts, grid, bins, size, upright)
    return pts._replace(descriptor=desc)


class PCABasis:
    """Learned PCA projection for patch descriptors
    (ref ``PCASIFTDescriptorGenerator``, Descriptor.h:96-118: a basis matrix
    and mean vector loaded from disk).  The reference ships precomputed
    files; here :func:`fit_pca_basis` learns them from training patches and
    ``save``/``load`` round-trip through ``.npz``."""

    def __init__(self, basis, avg):
        self.basis = np.asarray(basis, np.float32)   # (size*size, k)
        self.avg = np.asarray(avg, np.float32)       # (size*size,)
        if self.basis.shape[0] != self.avg.shape[0]:
            raise ValueError("PCA basis/avg dimension mismatch")
        self.size = int(round(self.basis.shape[0] ** 0.5))

    def save(self, path: str) -> None:
        np.savez(path, basis=self.basis, avg=self.avg)

    @classmethod
    def load(cls, path: str) -> "PCABasis":
        d = np.load(path)
        return cls(d["basis"], d["avg"])


def fit_pca_basis(patches, n_components: int = 20) -> PCABasis:
    """Learn a :class:`PCABasis` from (N, size, size) training patches:
    each patch is L2-normalized (matching ``compute_descriptor``'s
    norm_const), the mean is removed, and the top right-singular vectors
    become the basis."""
    flat = np.asarray(patches, np.float32).reshape(len(patches), -1)
    flat = flat / np.maximum(
        np.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
    avg = flat.mean(axis=0)
    _, _, vt = np.linalg.svd(flat - avg, full_matrices=False)
    return PCABasis(vt[:n_components].T, avg)


def pca_descriptor(img, pts: InterestPoints, basis: PCABasis,
                   upright: bool = False) -> InterestPoints:
    """Project L2-normalized support patches onto a PCA basis
    (ref ``PCASIFTDescriptorGenerator::compute_descriptor``,
    Descriptor.h:380-410): ``desc = (patch/||patch|| - avg) @ basis`` — a
    single (K, d) x (d, k) matmul over all keypoints."""
    img = jnp.asarray(img, jnp.float32)
    patches = _sample_support(img, pts, basis.size, upright)
    patches = patches.reshape(len(pts.x), -1)
    norm = jnp.sqrt((patches ** 2).sum(axis=1, keepdims=True))
    centered = patches / jnp.maximum(norm, 1e-12) - jnp.asarray(basis.avg)
    desc = centered @ jnp.asarray(basis.basis)
    return pts._replace(descriptor=jnp.where(pts.valid[:, None], desc, 0.0))


def describe(img, pts: InterestPoints, kind: str = "sgrad",
             pca_basis: "PCABasis | None" = None,
             upright: bool = False) -> InterestPoints:
    """``upright=True`` asserts every point has orientation 0 and scale 1
    (true straight out of single-scale :func:`detect_points`, before
    :func:`assign_orientations`) and extracts supports with dynamic slices
    instead of per-pixel gathers — ~5x faster descriptor stage on TPU."""
    if kind == "patch":
        return patch_descriptor(img, pts, upright=upright)
    if kind in ("sgrad", "sgrad2"):
        return sgrad_descriptor(img, pts, upright=upright)
    if kind == "pca":
        if pca_basis is None:
            raise ValueError("describe(kind='pca') needs a pca_basis")
        return pca_descriptor(img, pts, pca_basis, upright=upright)
    raise ValueError(f"unknown descriptor {kind!r}")
