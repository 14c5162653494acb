"""Distributed tests on the 8-device virtual CPU mesh — the analogue of the
reference's tiled-equals-whole ``TestBlockRasterize.cxx``: sharded results
must match (or statistically match) single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.image.filters import gaussian_filter
from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.parallel import (
    disparity_sharded_search, make_disp_mesh, make_tile_mesh, map_overlap,
    sharded_pyramid_correlate,
)
from visionworkbench_tpu.stereo.correlation import (
    ABSOLUTE_DIFFERENCE, CROSS_CORRELATION, best_of_search_convolution,
)
from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate


needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")


@needs_devices
def test_map_overlap_gaussian_equals_whole(rng):
    img = jnp.asarray(rng.standard_normal((64, 32)), dtype=jnp.float32)
    mesh = make_tile_mesh(8)
    whole = gaussian_filter(img, 1.0)

    out = map_overlap(lambda block: gaussian_filter(block, 1.0), img, mesh, halo=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(whole), atol=1e-6)


@needs_devices
@pytest.mark.parametrize("cost_type", [ABSOLUTE_DIFFERENCE, CROSS_CORRELATION])
def test_disparity_sharded_equals_single(rng, cost_type):
    h, w, sx, sy = 30, 28, 5, 8
    left = jnp.asarray(rng.random((h, w)), dtype=jnp.float32)
    right = jnp.asarray(rng.random((h + sy - 1, w + sx - 1)), dtype=jnp.float32)
    single = best_of_search_convolution(left, right, (sx, sy), (5, 5), cost_type)
    mesh = make_disp_mesh(4)
    sharded = disparity_sharded_search(left, right, (sx, sy), (5, 5), mesh,
                                       cost_type)
    np.testing.assert_array_equal(np.asarray(single.disparity),
                                  np.asarray(sharded.disparity))
    np.testing.assert_array_equal(np.asarray(single.valid),
                                  np.asarray(sharded.valid))


@needs_devices
def test_disparity_sharded_flat_invalidation():
    left = jnp.zeros((16, 16), jnp.float32)
    right = jnp.zeros((23, 20), jnp.float32)
    mesh = make_disp_mesh(4)
    out = disparity_sharded_search(left, right, (5, 8), (5, 5), mesh)
    assert not np.asarray(out.valid).any()


@needs_devices
def test_sharded_pyramid_correlate_matches_whole(rng):
    # 8 row bands; known constant shift; interior must agree with monolithic.
    h, w = 256, 64
    shift = (3, 1)
    sx, sy = 6, 3
    ys, xs = np.mgrid[0:h + sy, 0:w + sx].astype(np.float32)
    tex = (np.sin(xs * 0.37) * np.cos(ys * 0.29)
           + 0.4 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = np.array(rng.random((h, w)), np.float32)
    right[:] = tex[shift[1]:shift[1] + h, shift[0]:shift[0] + w]
    # right[p] = tex[p + shift] => left[p] = right[p - shift]... we want
    # left(p) == right(p + d): tex[p] == tex[p + shift + d] -> d = -shift.
    left_j, right_j = jnp.asarray(left), jnp.asarray(right)
    sr = BBox2i(-sx, -sy, 2 * sx, 2 * sy)
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=1, tile_size=16,
                  filter_half_kernel=5)
    whole = pyramid_correlate(left_j, right_j, sr, **kwargs)
    mesh = make_tile_mesh(8)
    sharded = sharded_pyramid_correlate(left_j, right_j, sr, mesh, **kwargs)
    wd, wv = np.asarray(whole.disparity), np.asarray(whole.valid)
    sd, sv = np.asarray(sharded.disparity), np.asarray(sharded.valid)
    core = np.s_[8:-8, 8:-8]
    both = wv[core] & sv[core]
    agree = (wd[core] == sd[core]).all(axis=-1)[both]
    assert agree.mean() > 0.99, f"shard/whole agreement {agree.mean()}"
    # and the sharded result recovers the true disparity
    correct = ((sd[core][..., 0] == -shift[0]) & (sd[core][..., 1] == -shift[1]))[sv[core]]
    assert correct.mean() > 0.9


@needs_devices
def test_sharded_pyramid_sgm_recovers_shift(rng):
    # SGM inside the sharded pyramid: per-band SGM truncates aggregation
    # paths at band borders (the reference's per-tile prerasterize does the
    # same), so the oracle is shift recovery + high whole-agreement, not
    # bit-exactness.
    h, w = 256, 64
    shift = (4, 1)
    sx, sy = 8, 3
    ys, xs = np.mgrid[0:h + sy + 8, 0:w + sx + 8].astype(np.float32)
    tex = (np.sin(xs * 0.33) * np.cos(ys * 0.27)
           + 0.4 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = tex[shift[1]:shift[1] + h, shift[0]:shift[0] + w].copy()
    left_j, right_j = jnp.asarray(left), jnp.asarray(right)
    sr = BBox2i(-sx, -sy, 2 * sx, 2 * sy)
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=1, tile_size=16,
                  stereo_algorithm="sgm", subpixel="none")
    whole = pyramid_correlate(left_j, right_j, sr, **kwargs)
    mesh = make_tile_mesh(8)
    sharded = sharded_pyramid_correlate(left_j, right_j, sr, mesh, **kwargs)
    wd, wv = np.asarray(whole.disparity), np.asarray(whole.valid)
    sd, sv = np.asarray(sharded.disparity), np.asarray(sharded.valid)
    core = np.s_[12:-12, 12:-12]
    correct = ((sd[core][..., 0] == -shift[0]) &
               (sd[core][..., 1] == -shift[1]))[sv[core]]
    assert correct.mean() > 0.9, f"fraction correct {correct.mean()}"
    both = wv[core] & sv[core]
    agree = (wd[core] == sd[core]).all(axis=-1)[both]
    assert agree.mean() > 0.97, f"shard/whole agreement {agree.mean()}"


@needs_devices
def test_sharded_pyramid_multilevel_matches_whole(rng):
    # Multi-level path: the collar must cover the full coarse-to-fine
    # receptive field (tile-rounded for refine-grid alignment).
    h, w = 512, 96
    shift = (4, 1)
    sx, sy = 8, 3
    ys, xs = np.mgrid[0:h + sy + 8, 0:w + sx + 8].astype(np.float32)
    tex = (np.sin(xs * 0.33) * np.cos(ys * 0.27)
           + 0.4 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = tex[shift[1]:shift[1] + h, shift[0]:shift[0] + w].copy()
    left_j, right_j = jnp.asarray(left), jnp.asarray(right)
    sr = BBox2i(-sx, -sy, 2 * sx, 2 * sy)
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=3, tile_size=16,
                  filter_half_kernel=3)
    whole = pyramid_correlate(left_j, right_j, sr, **kwargs)
    mesh = make_tile_mesh(4)
    sharded = sharded_pyramid_correlate(left_j, right_j, sr, mesh, **kwargs)
    wd, wv = np.asarray(whole.disparity), np.asarray(whole.valid)
    sd, sv = np.asarray(sharded.disparity), np.asarray(sharded.valid)
    core = np.s_[16:-16, 16:-16]
    both = wv[core] & sv[core]
    agree = (wd[core] == sd[core]).all(axis=-1)[both]
    assert agree.mean() > 0.99, f"shard/whole agreement {agree.mean()}"


@needs_devices
def test_hierarchical_sharded_matches_whole(rng):
    # Per-level halo exchange design: banded pyramid at every level.
    from visionworkbench_tpu.parallel.hierarchical import (
        hierarchical_sharded_correlate,
    )
    h, w = 512, 96
    shift = (4, 1)
    sx, sy = 8, 3
    ys, xs = np.mgrid[0:h + sy + 8, 0:w + sx + 8].astype(np.float32)
    tex = (np.sin(xs * 0.33) * np.cos(ys * 0.27)
           + 0.4 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = tex[shift[1]:shift[1] + h, shift[0]:shift[0] + w].copy()
    left_j, right_j = jnp.asarray(left), jnp.asarray(right)
    sr = BBox2i(-sx, -sy, 2 * sx, 2 * sy)
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=3, tile_size=16,
                  filter_half_kernel=3)
    whole = pyramid_correlate(left_j, right_j, sr, **kwargs)
    mesh = make_tile_mesh(4)
    sharded = hierarchical_sharded_correlate(left_j, right_j, sr, mesh,
                                             **kwargs)
    wd, wv = np.asarray(whole.disparity), np.asarray(whole.valid)
    sd, sv = np.asarray(sharded.disparity), np.asarray(sharded.valid)
    core = np.s_[16:-16, 16:-16]
    both = wv[core] & sv[core]
    agree = (wd[core] == sd[core]).all(axis=-1)[both]
    assert agree.mean() > 0.99, f"hier/whole agreement {agree.mean()}"
    # true disparity recovered
    correct = ((sd[core][..., 0] == -shift[0])
               & (sd[core][..., 1] == -shift[1]))[sv[core]]
    assert correct.mean() > 0.9


@needs_devices
def test_hierarchical_sharded_subpixel_and_offsets(rng):
    # Positive search minimum + parabola subpixel through the banded path.
    from visionworkbench_tpu.parallel.hierarchical import (
        hierarchical_sharded_correlate,
    )
    h, w = 256, 96
    shift = (5, 1)
    ys, xs = np.mgrid[0:h + 4, 0:w + 12].astype(np.float32)
    tex = (np.sin(xs * 0.31) * np.cos(ys * 0.23)
           + 0.4 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, 8:8 + w]                       # left(p) = tex[p + 8]
    right = tex[shift[1]:shift[1] + h, 8 - shift[0]:8 - shift[0] + w].copy()
    # left(x) = right(x + d) with d = (shift_x, -shift_y) = (5, -1)
    left_j, right_j = jnp.asarray(left), jnp.asarray(right)
    sr = BBox2i(2, -3, 8, 6)
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=2, tile_size=16,
                  filter_half_kernel=3, subpixel="parabola")
    whole = pyramid_correlate(left_j, right_j, sr, **kwargs)
    mesh = make_tile_mesh(4)
    sharded = hierarchical_sharded_correlate(left_j, right_j, sr, mesh,
                                             **kwargs)
    wd, wv = np.asarray(whole.disparity), np.asarray(whole.valid)
    sd, sv = np.asarray(sharded.disparity), np.asarray(sharded.valid)
    core = np.s_[16:-16, 16:-16]
    both = wv[core] & sv[core]
    close = (np.abs(wd[core] - sd[core]) < 1e-3).all(axis=-1)[both]
    assert close.mean() > 0.99, f"subpixel agreement {close.mean()}"
    err = np.abs(sd[core][..., 0][sv[core]] - 5.0)
    assert np.median(err) < 0.5


@needs_devices
def test_hierarchical_clamps_levels_to_band(rng):
    # 100-row bands divide by 4 but not 8: depth clamps instead of raising.
    from visionworkbench_tpu.parallel.hierarchical import (
        hierarchical_sharded_correlate,
    )
    h, w = 400, 64
    tex = np.asarray(rng.random((h, w + 6)), np.float32)
    left = jnp.asarray(tex[:, :w])
    right = jnp.asarray(tex[:, 3:3 + w])
    sr = BBox2i(-4, 0, 8, 1)
    dm = hierarchical_sharded_correlate(left, right, sr, make_tile_mesh(4),
                                        kernel_size=(7, 7),
                                        max_pyramid_levels=5, tile_size=16,
                                        filter_half_kernel=2)
    d = np.asarray(dm.disparity)
    v = np.asarray(dm.valid)
    core = np.s_[8:-8, 12:-12]
    assert (d[core][..., 0][v[core]] == -3).mean() > 0.9


@needs_devices
def test_hierarchical_sharded_masks_match_whole(rng):
    # User masks: mean-fill + mask pyramids + disparity_mask, banded.
    from visionworkbench_tpu.parallel.hierarchical import (
        hierarchical_sharded_correlate,
    )
    h, w = 256, 96
    shift = (3, 1)
    sx, sy = 6, 3
    ys, xs = np.mgrid[0:h + sy, 0:w + sx].astype(np.float32)
    tex = (np.sin(xs * 0.37) * np.cos(ys * 0.29)
           + 0.4 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = tex[shift[1]:shift[1] + h, shift[0]:shift[0] + w].copy()
    lmask = np.ones((h, w), bool)
    lmask[100:140, 30:60] = False               # hole crossing a band edge
    rmask = np.ones((h, w), bool)
    rmask[:, :10] = False
    left_j, right_j = jnp.asarray(left), jnp.asarray(right)
    sr = BBox2i(-sx, -sy, 2 * sx, 2 * sy)
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=2, tile_size=16,
                  filter_half_kernel=3)
    whole = pyramid_correlate(left_j, right_j, sr,
                              left_mask=jnp.asarray(lmask),
                              right_mask=jnp.asarray(rmask), **kwargs)
    mesh = make_tile_mesh(4)
    sharded = hierarchical_sharded_correlate(
        left_j, right_j, sr, mesh, left_mask=jnp.asarray(lmask),
        right_mask=jnp.asarray(rmask), **kwargs)
    wd, wv = np.asarray(whole.disparity), np.asarray(whole.valid)
    sd, sv = np.asarray(sharded.disparity), np.asarray(sharded.valid)
    # Masked-out left pixels must be invalid in both.
    assert not sv[110:130, 35:55].any()
    core = np.s_[16:-16, 16:-16]
    both = wv[core] & sv[core]
    agree = (wd[core] == sd[core]).all(axis=-1)[both]
    assert agree.mean() > 0.99, f"masked shard/whole agreement {agree.mean()}"
    # validity maps themselves should mostly agree
    assert (wv[core] == sv[core]).mean() > 0.97


@needs_devices
def test_hierarchical_consistency_matches_whole(rng):
    from visionworkbench_tpu.parallel.hierarchical import (
        hierarchical_sharded_correlate,
    )
    h, w = 256, 96
    shift = (3, 1)
    sx, sy = 6, 3
    ys, xs = np.mgrid[0:h + sy, 0:w + sx].astype(np.float32)
    tex = (np.sin(xs * 0.37) * np.cos(ys * 0.29)
           + 0.4 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = tex[shift[1]:shift[1] + h, shift[0]:shift[0] + w].copy()
    # Break the texture in a block so LR/RL disagree there.
    left[60:90, 40:70] = rng.random((30, 30)).astype(np.float32)
    left_j, right_j = jnp.asarray(left), jnp.asarray(right)
    sr = BBox2i(-sx, -sy, 2 * sx, 2 * sy)
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=2, tile_size=16,
                  filter_half_kernel=3, consistency_threshold=1.0)
    whole = pyramid_correlate(left_j, right_j, sr, **kwargs)
    mesh = make_tile_mesh(4)
    sharded = hierarchical_sharded_correlate(left_j, right_j, sr, mesh,
                                             **kwargs)
    wd, wv = np.asarray(whole.disparity), np.asarray(whole.valid)
    sd, sv = np.asarray(sharded.disparity), np.asarray(sharded.valid)
    core = np.s_[16:-16, 16:-16]
    both = wv[core] & sv[core]
    agree = (wd[core] == sd[core]).all(axis=-1)[both]
    assert agree.mean() > 0.99, f"consistency shard/whole {agree.mean()}"
    assert (wv[core] == sv[core]).mean() > 0.97
    # The check must actually reject some pixels (vs no-consistency run).
    nc = hierarchical_sharded_correlate(
        left_j, right_j, sr, mesh, **{**kwargs,
                                      "consistency_threshold": -1.0})
    assert sv.sum() < np.asarray(nc.valid).sum()


@needs_devices
def test_hierarchical_blob_filter_matches_whole(rng):
    from visionworkbench_tpu.parallel.hierarchical import (
        hierarchical_sharded_correlate,
    )
    h, w = 256, 96
    shift = (3, 0)
    sx = 6
    ys, xs = np.mgrid[0:h, 0:w + sx].astype(np.float32)
    tex = (np.sin(xs * 0.37) * np.cos(ys * 0.29)
           + 0.4 * rng.random(xs.shape)).astype(np.float32)
    left = tex[:, :w].copy()
    right = tex[:, shift[0]:shift[0] + w].copy()
    # Flat (textureless) stripes so cleanup leaves isolated valid islands.
    left[40:80] = 0.5
    left[120:200] = 0.5
    left_j, right_j = jnp.asarray(left), jnp.asarray(right)
    sr = BBox2i(-sx, 0, 2 * sx, 1)
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=1, tile_size=16,
                  filter_half_kernel=3, blob_filter_area=40)
    whole = pyramid_correlate(left_j, right_j, sr, **kwargs)
    mesh = make_tile_mesh(4)
    sharded = hierarchical_sharded_correlate(left_j, right_j, sr, mesh,
                                             **kwargs)
    wv = np.asarray(whole.valid)
    sv = np.asarray(sharded.valid)
    core = np.s_[16:-16, 16:-16]
    assert (wv[core] == sv[core]).mean() > 0.99, \
        f"blob shard/whole valid agreement {(wv[core] == sv[core]).mean()}"
    # the filter must have removed something relative to no-blob run
    nb = hierarchical_sharded_correlate(
        left_j, right_j, sr, mesh, **{**kwargs, "blob_filter_area": 0})
    assert sv.sum() <= np.asarray(nb.valid).sum()


def test_hierarchical_sgm_shard_matches_whole(rng):
    """SGM through the hierarchical banded engine (VERDICT r2 item 5):
    per-band census + 8-path aggregation over the band plus one tile-row of
    exchanged context (the reference's per-tile path-truncation semantics,
    SGM.cc:2462-2531). Claim pinned here: rows further than tile_size rows
    from a band seam agree with the monolithic engine at >= 99.5% (integer
    winners + valid) — truncated-path influence decays but a rare near-tie
    pixel (and its speckle-filter neighborhood) can flip; seam-adjacent
    rows may differ where a truncated vertical path would have changed the
    winner."""
    import jax.numpy as jnp
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.parallel import (
        hierarchical_sharded_correlate, make_tile_mesh,
    )
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate

    h, w = 256, 64
    shift = (3, 0)
    right = rng.random((h + 4, w + 8)).astype(np.float32)
    left = right[:h, shift[0]:shift[0] + w].copy()
    sr = BBox2i(0, -1, 8, 2)
    kwargs = dict(max_pyramid_levels=2, tile_size=16, census_window=5,
                  filter_half_kernel=2, subpixel="none")
    mesh = make_tile_mesh()
    nd = mesh.devices.size
    band = h // nd
    for algo in ("sgm", "mgm"):
        dm = hierarchical_sharded_correlate(
            jnp.asarray(left), jnp.asarray(right[:h, :w]), sr, mesh,
            stereo_algorithm=algo, **kwargs)
        whole = pyramid_correlate(
            jnp.asarray(left), jnp.asarray(right[:h, :w]), sr,
            stereo_algorithm=algo, **kwargs)
        d1, v1 = np.asarray(dm.disparity), np.asarray(dm.valid)
        d0, v0 = np.asarray(whole.disparity), np.asarray(whole.valid)
        seams = np.array([band * i for i in range(nd + 1)])
        rowdist = np.min(np.abs(np.arange(h)[:, None] - seams[None]), 1)
        far = rowdist >= kwargs["tile_size"]
        assert far.sum() > 0
        agree = (v1[far] == v0[far]) & ((d1[far] == d0[far]).all(-1)
                                        | ~(v1[far] & v0[far]))
        assert agree.mean() >= 0.995, agree.mean()
        # the whole frame still recovers the embedded shift
        core = np.s_[8:-8, 8:-8]
        correct = (d1[core][..., 0] == shift[0])[v1[core]]
        assert correct.mean() > 0.9, correct.mean()
