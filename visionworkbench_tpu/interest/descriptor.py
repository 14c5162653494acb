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
import math

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


def _block_patches(base, xo, yo, E: int):
    """(K, E, E) integer-origin windows around (xo, yo) from ``base``
    (replicate-padded; origins clamped at borders) + the float center of
    each point INSIDE its window. One vmapped ``dynamic_slice`` per point —
    the gather-free extraction (CLAUDE.md: per-pixel-index gathers cost
    ~10 ms per 512x41x41 tap set; these slices are ~100x cheaper)."""
    pad = 4
    p = jnp.pad(base, E // 2 + pad, mode="edge")
    ph, pw = p.shape
    off = E // 2 + pad                       # padded-coords offset
    opx = jnp.clip(jnp.floor(xo).astype(jnp.int32) - E // 2 + off,
                   0, pw - E)
    opy = jnp.clip(jnp.floor(yo).astype(jnp.int32) - E // 2 + off,
                   0, ph - E)

    def one(oyk, oxk):
        return lax.dynamic_slice(p, (oyk, oxk), (E, E))

    w = jax.vmap(one)(opy, opx)              # (K, E, E)
    cfx = xo + off - opx.astype(jnp.float32)
    cfy = yo + off - opy.astype(jnp.float32)
    return w, cfx, cfy


def _resample_w(cf, s, G: int, E: int):
    """(K, G, E) bilinear row-weight matrices: output g samples the patch
    at ``cf + (g - (G-1)/2) * s`` — the batched per-point twin of
    ``image.transform.sample_separable`` (axis-factorable maps as two
    matmuls; in-graph iotas)."""
    g = lax.broadcasted_iota(jnp.float32, (1, G, E), 1)
    e = lax.broadcasted_iota(jnp.float32, (1, G, E), 2)
    tgt = cf[:, None, None] + (g - (G - 1) / 2.0) * s[:, None, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(e - tgt))


def _scale_patch_grid(patches, cfx, cfy, s, G: int):
    """(K, G, G) scale-normalized upright grids: two batched banded
    matmuls per point instead of 4 per-sample gathers."""
    E = patches.shape[-1]
    wy = _resample_w(cfy, s, G, E)
    wx = _resample_w(cfx, s, G, E)
    rows = jnp.einsum("kge,kef->kgf", wy, patches)
    return jnp.einsum("kgf,khf->kgh", rows, wx)


@functools.partial(jax.jit, static_argnames=("grid", "bins", "size",
                                             "radius"))
def _octave_orient_describe(base, xo, yo, s_loc, valid,
                            grid: int, bins: int, size: int, radius: int):
    """Gather-free orientation + sgrad descriptor for one octave's point
    block (the SIFT-class hot path; round-4 rewrite of the vmapped
    bilinear-gather sampler that cost ~76 of the config-8 pair's 101 ms
    device frame).

    Everything is batched over the K points of the block: one upright
    (K, E, E) dynamic-slice patch stack from the octave base, scale
    normalization as two banded matmuls per point, orientation from a
    one-hot-einsum 36-bin gradient histogram, and the descriptor from
    gradients sampled on an UPRIGHT covering grid whose samples are
    assigned to ROTATED descriptor cells/bins (elementwise coordinate
    rotation — rotation-covariance without rotated sampling; Gaussian
    window weights are isotropic so the weighting is identical).
    Ref ``SGradDescriptorGenerator`` Descriptor.h:120-180 + orientation
    assignment InterestPointDetector.h:160."""
    go = 2 * radius + 3                      # orientation grid (+grad ring)
    gcov = int(math.ceil(size * math.sqrt(2.0))) + 4  # covering grid + ring
    # Static extent: local sigma is bounded by the octave ladder
    # (sigma0 * 2^((scales+0.5)/scales) ~ 3.6); cover the larger grid.
    SMAX = 3.7
    E = int(math.ceil((max(go, gcov) - 1) * SMAX)) + 6
    patches, cfx, cfy = _block_patches(base, xo, yo, E)

    # ---- orientation (36-bin gradient histogram, upright grid) ----------
    po = _scale_patch_grid(patches, cfx, cfy, s_loc, go)
    gx = (po[:, 1:-1, 2:] - po[:, 1:-1, :-2]) * 0.5
    gy = (po[:, 2:, 1:-1] - po[:, :-2, 1:-1]) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    n = go - 2
    us = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
    uu, vv = jnp.meshgrid(us, us)
    ws = jnp.exp(-0.5 * (uu ** 2 + vv ** 2) / (1.5 * radius / 3.0) ** 2)
    obin = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
    oh = (obin[..., None] == jnp.arange(36)[None, None, None]).astype(jnp.float32)
    hist = jnp.einsum("kij,kijb->kb", mag * ws[None], oh)
    for _ in range(2):   # circular [1,4,6,4,1]/16 smoothing
        hist = (jnp.roll(hist, 2, 1) + 4 * jnp.roll(hist, 1, 1) + 6 * hist
                + 4 * jnp.roll(hist, -1, 1) + jnp.roll(hist, -2, 1)) / 16.0
    k_pk = jnp.argmax(hist, 1)
    c = jnp.take_along_axis(hist, k_pk[:, None], 1)[:, 0]
    lo = jnp.take_along_axis(hist, ((k_pk - 1) % 36)[:, None], 1)[:, 0]
    hi = jnp.take_along_axis(hist, ((k_pk + 1) % 36)[:, None], 1)[:, 0]
    denom = lo - 2 * c + hi
    offp = jnp.where(jnp.abs(denom) > 1e-12,
                     jnp.clip(0.5 * (lo - hi) / denom, -0.5, 0.5), 0.0)
    ori = ((k_pk.astype(jnp.float32) + 0.5 + offp) / 36.0) * 2 * jnp.pi - jnp.pi
    ori = jnp.where(valid, ori, 0.0)

    # ---- descriptor (rotated-cell binning on the upright covering grid) -
    pd = _scale_patch_grid(patches, cfx, cfy, s_loc, gcov)
    gx = (pd[:, 1:-1, 2:] - pd[:, 1:-1, :-2]) * 0.5
    gy = (pd[:, 2:, 1:-1] - pd[:, :-2, 1:-1]) * 0.5
    magd = jnp.sqrt(gx * gx + gy * gy)
    angd = jnp.arctan2(gy, gx) - ori[:, None, None]
    nd = gcov - 2
    ud = jnp.arange(nd, dtype=jnp.float32) - (nd - 1) / 2.0
    uu, vv = jnp.meshgrid(ud, ud)
    cos = jnp.cos(ori)[:, None, None]
    sin = jnp.sin(ori)[:, None, None]
    # descriptor-frame coords: rotate the upright grid by -orientation
    ur = uu[None] * cos + vv[None] * sin
    vr = -uu[None] * sin + vv[None] * cos
    half = size / 2.0
    inside = (jnp.abs(ur) < half) & (jnp.abs(vr) < half)
    # isotropic Gaussian window (same sigma as the rotated-grid path)
    wgt = jnp.exp(-0.5 * ((uu ** 2 + vv ** 2)[None] / (0.5 * size) ** 2))
    cw = size / grid
    cx = jnp.clip(jnp.floor((ur + half) / cw), 0, grid - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor((vr + half) / cw), 0, grid - 1).astype(jnp.int32)
    dbin = jnp.floor((angd + jnp.pi) / (2 * jnp.pi) * bins).astype(jnp.int32) % bins
    m = jnp.where(inside, magd * wgt, 0.0).reshape(magd.shape[0], -1)
    cell = (cy * grid + cx).reshape(m.shape)
    dbin = dbin.reshape(m.shape)
    ohb = (dbin[..., None] == jnp.arange(bins)[None, None]).astype(jnp.float32)
    ohc = (cell[..., None] == jnp.arange(grid * grid)[None, None]).astype(jnp.float32)
    hist = jnp.einsum("knb,knc->kcb", m[..., None] * ohb, ohc)
    hist = hist.reshape(m.shape[0], grid * grid * bins)
    norm = jnp.sqrt((hist ** 2).sum(axis=1, keepdims=True))
    hist = hist / jnp.maximum(norm, 1e-12)
    hist = jnp.minimum(hist, 0.2)                     # SIFT-style clamp
    norm = jnp.sqrt((hist ** 2).sum(axis=1, keepdims=True))
    hist = hist / jnp.maximum(norm, 1e-12)
    desc = jnp.where(valid[:, None], hist, 0.0)
    return ori, desc


def sift_orient_describe(pts: InterestPoints, blocks,
                         grid: int = 4, bins: int = 8, size: int = 24,
                         radius: int = 8) -> InterestPoints:
    """Assign orientations + sgrad descriptors to scale-space detections
    using their octave blocks (from ``detect_points_dog(...,
    return_blocks=True)``) — the gather-free fast path behind
    :func:`visionworkbench_tpu.interest.detector.detect_sift_like`."""
    oris, descs = [], []
    for (base, oct_scale, s0, s1) in blocks:
        inv = 1.0 / oct_scale
        sl = slice(s0, s1)
        ori, desc = _octave_orient_describe(
            base, pts.x[sl] * inv, pts.y[sl] * inv, pts.scale[sl] * inv,
            pts.valid[sl], grid, bins, size, radius)
        oris.append(ori)
        descs.append(desc)
    return pts._replace(orientation=jnp.concatenate(oris),
                        descriptor=jnp.concatenate(descs))


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
