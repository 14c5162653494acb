"""Round-3 VMEM-resident sweep kernel (``ops/sweep.py``) vs the XLA engine.

The interpret-mode kernel must reproduce ``_tiled_search`` /
``_tiled_search_patches`` exactly:

* disp/valid bit-exact for 8-bit-quantized inputs even under the two-term
  bf16 split (integer-scaled costs are exact through both split passes);
* fp32-grade agreement for arbitrary float inputs (the split error is below
  fp32 accumulation rounding, so argmins may only flip on near-ties).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from visionworkbench_tpu.ops.sweep import pallas_sweep
from visionworkbench_tpu.stereo.pyramid_correlation import (
    _tiled_search, _tiled_search_patches,
)


def _mk(rng, nty, ntx, tile, kw, kh, s_x, s_y, ring, quantized):
    lh, lw = nty * tile + kh - 1, ntx * tile + kw - 1
    mh = lh + s_y - 1 + 2 * ring + 6   # slack for offsets
    mw = lw + s_x - 1 + 2 * ring + 6
    base = rng.random((lh, lw)).astype(np.float32)
    match = rng.random((mh, mw)).astype(np.float32)
    # embed shifted copies so there are real winners
    match[2:2 + lh, 3:3 + lw] = base
    if quantized:
        base = np.round(base * 255) / 256.0
        match = np.round(match * 255) / 256.0
    offsets = rng.integers(0, 3, size=(nty, ntx, 2)).astype(np.int32)
    return jnp.asarray(base), jnp.asarray(match), jnp.asarray(offsets)


@pytest.mark.parametrize("cost", ["abs", "sq"])
def test_sweep_patches_bitexact_quantized(rng, cost):
    tile, kw, kh, s_x, s_y = 16, 5, 3, 6, 4
    base, match, offsets = _mk(rng, 2, 2, tile, kw, kh, s_x, s_y, 1, True)
    d0, v0, p0 = _tiled_search_patches(base, match, offsets, tile, s_x, s_y,
                                       kw, kh, cost)
    for precision in ("highest", "split2"):
        d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y,
                                  kw, kh, cost, want_patches=True,
                                  precision=precision, interpret=True)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
        if precision == "split2" and cost == "sq":
            # squared 8-bit costs span 16 bits — beyond one bf16 term, so
            # split2 patches are fp32-grade (~1e-5), not bit-exact
            np.testing.assert_allclose(
                np.asarray(p1)[np.asarray(v0)], np.asarray(p0)[np.asarray(v0)],
                rtol=1e-4, atol=1e-4)
        else:
            np.testing.assert_array_equal(
                np.asarray(p1)[np.asarray(v0)], np.asarray(p0)[np.asarray(v0)])


def test_sweep_plain_matches_tiled_search(rng):
    tile, kw, kh, s_x, s_y = 16, 5, 5, 5, 3
    base, match, offsets = _mk(rng, 2, 3, tile, kw, kh, s_x, s_y, 0, True)
    d0, v0 = _tiled_search(base, match, offsets, tile, s_x, s_y, kw, kh,
                           "abs", 5)
    d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y, kw, kh,
                              "abs", want_patches=False, precision="split2",
                              interpret=True)
    assert p1 is None
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))


def test_sweep_split2_float_agreement(rng):
    """Arbitrary float inputs: split2 argmins agree with the fp32 engine on
    essentially all pixels (ties only), costs to ~1e-5."""
    tile, kw, kh, s_x, s_y = 16, 5, 3, 6, 4
    base, match, offsets = _mk(rng, 2, 2, tile, kw, kh, s_x, s_y, 1, False)
    d0, v0, p0 = _tiled_search_patches(base, match, offsets, tile, s_x, s_y,
                                       kw, kh, "abs")
    d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y,
                              kw, kh, "abs", want_patches=True,
                              precision="split2", interpret=True)
    agree = (np.asarray(d1) == np.asarray(d0)).all(-1)
    assert agree.mean() > 0.999, agree.mean()
    both = np.asarray(v0) & np.asarray(v1) & agree
    np.testing.assert_allclose(np.asarray(p1)[both], np.asarray(p0)[both],
                               rtol=2e-5, atol=2e-5)


def test_sweep_census_bitexact(rng):
    """Census costs in-kernel: integer hamming box sums are EXACT (1+2
    bf16 passes), so disp/valid/patches must match the XLA census engine
    bit-for-bit away from tile borders (the kernel computes codes on the
    full frame; the XLA tiled path's per-tile census sees replicated crop
    edges within the census half-window of tile borders)."""
    tile, kw, kh, s_x, s_y = 16, 7, 5, 5, 3
    base, match, offsets = _mk(rng, 2, 2, tile, kw, kh, s_x, s_y, 1, True)
    d0, v0, p0 = _tiled_search_patches(base, match, offsets, tile, s_x, s_y,
                                       kw, kh, "census", census_window=5)
    d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y,
                              kw, kh, "census", want_patches=True,
                              census_window=5, interpret=True)
    # interior of each tile (2 px census margin off tile borders)
    h, w = np.asarray(v0).shape
    yy, xx = np.mgrid[0:h, 0:w]
    interior = (yy % tile >= 2) & (yy % tile < tile - 2) \
        & (xx % tile >= 2) & (xx % tile < tile - 2)
    np.testing.assert_array_equal(np.asarray(v1)[interior],
                                  np.asarray(v0)[interior])
    np.testing.assert_array_equal(np.asarray(d1)[interior],
                                  np.asarray(d0)[interior])
    both = interior & np.asarray(v0) & np.asarray(v1)
    np.testing.assert_array_equal(np.asarray(p1)[both], np.asarray(p0)[both])


def test_sweep_tiny_search_and_degraded(rng):
    """Degenerate search windows (1x1, corr_timeout-degraded shapes) stay
    correct through the kernel."""
    tile, kw, kh = 16, 5, 5
    for (s_x, s_y) in [(1, 1), (3, 1), (1, 2)]:
        base, match, offsets = _mk(rng, 2, 2, tile, kw, kh, s_x, s_y, 1, True)
        d0, v0, p0 = _tiled_search_patches(base, match, offsets, tile,
                                           s_x, s_y, kw, kh, "abs")
        d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y,
                                  kw, kh, "abs", want_patches=True,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))


def test_sweep_rect_tiles(rng):
    """Rectangular kernel tiles (tile_h != tile_w) stay bit-exact."""
    kw, kh, s_x, s_y = 5, 3, 6, 4
    base, match, offsets = _mk(rng, 2, 2, 16, kw, kh, s_x, s_y, 1, True)
    d0, v0, p0 = _tiled_search_patches(base, match, offsets, 16, s_x, s_y,
                                       kw, kh, "abs")
    # same 32x32 output via a (32, 16) rect grid
    off2 = jnp.repeat(jnp.asarray(offsets), 1, 0)[:1]   # (1, 2, 2): 32-tall
    # offsets must match per rect tile: use zero offsets on both engines
    z4 = jnp.zeros((2, 2, 2), jnp.int32)
    d0, v0, p0 = _tiled_search_patches(base, match, z4, 16, s_x, s_y,
                                       kw, kh, "abs")
    zr = jnp.zeros((1, 2, 2), jnp.int32)
    d1, v1, p1 = pallas_sweep(base, match, zr, 32, s_x, s_y, kw, kh, "abs",
                              want_patches=True, tile_w=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(p1)[np.asarray(v0)],
                                  np.asarray(p0)[np.asarray(v0)])


def test_sweep_ncc_matches_tiled_search(rng):
    """NCC in-kernel (round 4): numerator + right-energy planes share one
    lane-packed matmul; cost_modification sqrt(1/lE * 1/rE) multiplied in
    like the XLA engine (CostFunctions.h:204-236). With precision='highest'
    and quantized inputs every box sum is exact fp32, so disp/valid are
    bit-exact vs the XLA max-metric engine; split2 is fp32-grade (argmax
    flips only on near-ties)."""
    tile, kw, kh, s_x, s_y = 16, 5, 5, 6, 3
    base, match, offsets = _mk(rng, 2, 2, tile, kw, kh, s_x, s_y, 0, True)
    d0, v0 = _tiled_search(base, match, offsets, tile, s_x, s_y, kw, kh,
                           "ncc", 5)
    d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y, kw, kh,
                              "ncc", want_patches=False, precision="highest",
                              interpret=True)
    assert p1 is None
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    d2, v2, _ = pallas_sweep(base, match, offsets, tile, s_x, s_y, kw, kh,
                             "ncc", want_patches=False, precision="split2",
                             interpret=True)
    agree = (np.asarray(d2) == np.asarray(d0)).all(-1)
    assert agree.mean() > 0.995, agree.mean()


def test_sweep_ncc_rejects_patches():
    import pytest as _pytest
    from visionworkbench_tpu.core.exceptions import ArgumentErr
    z = jnp.zeros((32, 32), jnp.float32)
    zo = jnp.zeros((1, 1, 2), jnp.int32)
    with _pytest.raises(ArgumentErr):
        pallas_sweep(z, z, zo, 16, 3, 3, 5, 5, "ncc", want_patches=True,
                     interpret=True)


@pytest.mark.parametrize("cost,window", [("census", 7), ("ternary_census", 5),
                                         ("ternary_census", 7)])
def test_sweep_multiword_census_bitexact(rng, cost, window):
    """Two-word census variants in-kernel (round 4): per-word DMA slabs,
    popcount-XOR summed over words. Bit-exact vs the XLA engine away from
    tile borders (same full-frame-codes deviation as single-word)."""
    tile, kw, kh, s_x, s_y = 16, 7, 5, 5, 3
    base, match, offsets = _mk(rng, 2, 2, tile, kw, kh, s_x, s_y, 1, True)
    d0, v0, p0 = _tiled_search_patches(base, match, offsets, tile, s_x, s_y,
                                       kw, kh, cost, census_window=window)
    d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y,
                              kw, kh, cost, want_patches=True,
                              census_window=window, interpret=True)
    marg = window // 2
    h, w = np.asarray(v0).shape
    yy, xx = np.mgrid[0:h, 0:w]
    interior = (yy % tile >= marg) & (yy % tile < tile - marg) \
        & (xx % tile >= marg) & (xx % tile < tile - marg)
    np.testing.assert_array_equal(np.asarray(v1)[interior],
                                  np.asarray(v0)[interior])
    np.testing.assert_array_equal(np.asarray(d1)[interior],
                                  np.asarray(d0)[interior])
    both = interior & np.asarray(v0) & np.asarray(v1)
    np.testing.assert_array_equal(np.asarray(p1)[both], np.asarray(p0)[both])


def test_sweep_wide_search_nonpow2_stride(rng):
    """s_x >= 15 exercises the ceil8-not-pow2 group stride class (s_x=21 +
    ring -> sx_e=23 -> ex_pad=24, where ceil8 != pow2): vol2 slab indexing
    and argp decode must stay bit-exact (advisor round-3 medium finding —
    the other pinned shapes all land on ex_pad in {8, 16})."""
    tile, kw, kh, s_x, s_y = 16, 5, 3, 21, 2
    base, match, offsets = _mk(rng, 2, 2, tile, kw, kh, s_x, s_y, 1, True)
    d0, v0, p0 = _tiled_search_patches(base, match, offsets, tile, s_x, s_y,
                                       kw, kh, "abs")
    d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y,
                              kw, kh, "abs", want_patches=True,
                              precision="split2", interpret=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(p1)[np.asarray(v0)],
                                  np.asarray(p0)[np.asarray(v0)])


@pytest.mark.parametrize("boxsum", ["roll", "roll_cols", "roll_rows"])
def test_sweep_roll_boxsum_quantized(rng, boxsum):
    """The pure-VPU roll-tree box-sum path (and the two mixed modes) on
    8-bit-quantized inputs: integer-scaled window sums below 2^24 are
    order-independent in fp32, so disp/valid/patches are bit-exact vs the
    XLA engine regardless of the roll tree's summation order (advisor
    round-3 low finding: the path had zero coverage)."""
    tile, kw, kh, s_x, s_y = 16, 5, 3, 6, 4
    base, match, offsets = _mk(rng, 2, 2, tile, kw, kh, s_x, s_y, 1, True)
    d0, v0, p0 = _tiled_search_patches(base, match, offsets, tile, s_x, s_y,
                                       kw, kh, "abs")
    d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y,
                              kw, kh, "abs", want_patches=True,
                              boxsum=boxsum, interpret=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(p1)[np.asarray(v0)],
                                  np.asarray(p0)[np.asarray(v0)])


def test_sweep_flagship_group_width(rng):
    """The flagship refine-window shape (s_x=11 + parabola ring -> 13 real
    planes against the pow2-16 storage stride) pins the unpadded-matmul /
    padded-storage split: disp/valid/patches bit-exact vs the XLA engine."""
    tile, kw, kh, s_x, s_y = 16, 7, 7, 11, 3
    base, match, offsets = _mk(rng, 2, 2, tile, kw, kh, s_x, s_y, 1, True)
    d0, v0, p0 = _tiled_search_patches(base, match, offsets, tile, s_x, s_y,
                                       kw, kh, "abs")
    d1, v1, p1 = pallas_sweep(base, match, offsets, tile, s_x, s_y,
                              kw, kh, "abs", want_patches=True,
                              precision="split2", interpret=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(p1)[np.asarray(v0)],
                                  np.asarray(p0)[np.asarray(v0)])
