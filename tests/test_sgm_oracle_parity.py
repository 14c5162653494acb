"""SGM/MGM parity vs the executable reference transliteration
(``tests/oracle/vw_oracle_sgm.py`` <-> ``visionworkbench_tpu/stereo/sgm.py``).

Protocol (the same zero-tolerance protocol as the BM oracle): u8-quantized
inputs, INTEGER disparities and valid masks bit-exact; float subpixel
offsets allclose at fp32 tolerance (the reference computes the fits in
double; erf/cos differ in the last ulps).

The repo's ``calc_disparity_sgm`` treats every left pixel as output
(full-frame convention), while the reference only computes the
kernel+search-supported interior region and its paths START at that
region's border. For bit-exactness the comparison runs through
``sgm_reference_region`` below — census over the full frames, aggregation
over the reference's exact output region — which mirrors
``semi_global_matching_func``'s domain math (SGM.cc:2394-2420).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle import vw_oracle_sgm as O
from visionworkbench_tpu.stereo import sgm as S


def _quantize(a):
    return np.clip(np.rint(a * 255.0), 0, 255)


def _region_inputs(rng, h=36, w=40, sx=6, sy=2, shift=3):
    """Textured pair with an embedded known shift (plus noise elsewhere).
    ``right`` carries the full (H+sy-1, W+sx-1) search margin."""
    right = rng.random((h + sy - 1, w + sx - 1)).astype(np.float32)
    left = right[:h, shift:shift + w].copy()
    left += (rng.random((h, w)) < 0.02) * 0.3   # sparse defects
    left = np.clip(left, 0.0, 1.0)
    return left, right


def _run_repo_region(left_u8, right_u8, sx, sy, window, use_mgm, subpixel,
                     p1, p2, ternary=False, thresh=5,
                     allowed=None):
    """Repo SGM on the reference's exact domain: census over the full
    frames, cost volume + aggregation over the reference's output region.
    ``allowed``: optional (rows, cols, sy, sx) bool of per-pixel candidate
    bounds (the reference's ``m_disp_bound_image``)."""
    hk = window // 2
    h, w = left_u8.shape
    min_row = min_col = hk
    max_row = min(h - 1 - hk, right_u8.shape[0] - 1 - hk - (sy - 1))
    max_col = min(w - 1 - hk, right_u8.shape[1] - 1 - hk - (sx - 1))
    rows = max_row - min_row + 1
    cols = max_col - min_col + 1
    lq = jnp.asarray(left_u8, jnp.int32)
    rq = jnp.asarray(right_u8, jnp.int32)
    vol = S._census_cost_volume(lq, rq, sx, sy, window, ternary, thresh)
    vol = vol[min_row:max_row + 1, min_col:max_col + 1]
    bad = S._bad_val(p2)
    if allowed is not None:
        vol = jnp.where(jnp.asarray(allowed), vol, bad)
    img = lq[min_row:max_row + 1, min_col:max_col + 1].astype(jnp.float32)
    if use_mgm:
        acc = S._mgm_aggregate(vol, img, p1, p2, bad)
    else:
        acc = S._sgm_aggregate(vol, img, p1, p2, bad)
    fdisp, _ = S._volume_argmin_subpixel(acc, subpixel, bad)
    some_allowed = (np.ones((rows, cols), bool) if allowed is None
                    else np.asarray(allowed).reshape(rows, cols, -1).any(-1))
    return np.asarray(fdisp), some_allowed, np.asarray(acc)


def _oracle_allowed(o):
    """(rows, cols, sy, sx) allowed mask from the oracle's bound image."""
    rows, cols = o.num_output_rows, o.num_output_cols
    sy = o.max_disp_y - o.min_disp_y + 1
    sx = o.max_disp_x - o.min_disp_x + 1
    out = np.zeros((rows, cols, sy, sx), bool)
    for r in range(rows):
        for c in range(cols):
            b = o.disp_bound[r][c]
            if b[2] < b[0]:
                continue
            out[r, c, b[1]:b[3] + 1, b[0]:b[2] + 1] = True
    return out


@pytest.mark.parametrize("use_mgm", [False, True])
@pytest.mark.parametrize("subpixel",
                         ["none", "parabola", "linear", "poly4", "cosine",
                          "lc_blend"])
def test_sgm_region_parity_unseeded(rng, use_mgm, subpixel):
    left, right = _region_inputs(rng)
    sx, sy, window = 6, 2, 5
    lq, rq = _quantize(left), _quantize(right)
    o = O.SGMOracle("census", use_mgm, 0, 0, sx - 1, sy - 1, window, subpixel)
    d0, v0 = o.semi_global_matching_func(lq, rq)
    sd0, sv0 = o.create_disparity_view_subpixel(d0, v0)
    fd, _, _ = _run_repo_region(lq, rq, sx, sy, window, use_mgm, subpixel,
                                o.p1, o.p2)
    assert v0.all()
    if subpixel == "none":
        np.testing.assert_array_equal(fd.astype(np.int32), d0)
    else:
        # integer winners must match exactly; re-derive them with "none"
        fdi, _, _ = _run_repo_region(lq, rq, sx, sy, window, use_mgm, "none",
                                     o.p1, o.p2)
        np.testing.assert_array_equal(fdi.astype(np.int32), d0)
        np.testing.assert_allclose(fd, sd0, atol=2e-5, rtol=1e-5)


def test_sgm_region_parity_ternary(rng):
    left, right = _region_inputs(rng, h=30, w=32, sx=5)
    sx, sy, window = 5, 2, 7
    lq, rq = _quantize(left), _quantize(right)
    o = O.SGMOracle("ternary_census", False, 0, 0, sx - 1, sy - 1, window,
                    "lc_blend", ternary_census_threshold=2)
    d0, v0 = o.semi_global_matching_func(lq, rq)
    sd0, _ = o.create_disparity_view_subpixel(d0, v0)
    fd, _, _ = _run_repo_region(lq, rq, sx, sy, window, False, "lc_blend",
                                o.p1, o.p2, ternary=True, thresh=2)
    fdi, _, _ = _run_repo_region(lq, rq, sx, sy, window, False, "none",
                                 o.p1, o.p2, ternary=True, thresh=2)
    np.testing.assert_array_equal(fdi.astype(np.int32), d0)
    np.testing.assert_allclose(fd, sd0, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("use_mgm", [False, True])
def test_sgm_region_parity_seeded_and_masked(rng, use_mgm):
    """Per-pixel bounds from masks + a previous-level disparity, fed to both
    sides: the oracle populates its bound image (trust rules, right-mask
    intersection, neighborhood constrain) and the repo volume is masked with
    the SAME bounds — integer winners and valid masks bit-exact. This pins
    the BAD-value candidate semantics (absent candidates at 255+P2 through
    every path update) rather than the bound-population host logic."""
    left, right = _region_inputs(rng, h=32, w=60, sx=12, sy=2)
    sx, sy, window = 12, 2, 5
    lq, rq = _quantize(left), _quantize(right)
    o = O.SGMOracle("census", use_mgm, 0, 0, sx - 1, sy - 1, window, "none")
    # masks sized for the oracle's output region
    hk = window // 2
    rows = lq.shape[0] - 2 * hk
    cols = min(lq.shape[1] - 2 * hk, rq.shape[1] - 2 * hk - (sx - 1))
    lmask = np.ones((rows, cols), np.uint8)
    lmask[5:9, 10:30] = 0
    rmask = np.ones((rows + sy - 1, cols + sx - 1), np.uint8)
    rmask[:, -6:] = 0
    # half-res seed: the true shift, invalid in a block
    pd = np.full((rows // 2 + 1, cols // 2 + 1, 2), 0, np.int32)
    pd[..., 0] = 1   # wrong-but-plausible seed away from edges (scaled x2=2)
    pv = np.ones(pd.shape[:2], bool)
    pv[3:6, :4] = False
    d0, v0 = o.semi_global_matching_func(lq, rq, lmask, rmask, (pd, pv))
    allowed = _oracle_allowed(o)
    fd, some, acc = _run_repo_region(lq, rq, sx, sy, window, use_mgm, "none",
                                     o.p1, o.p2, allowed=allowed)
    np.testing.assert_array_equal(some, v0)
    np.testing.assert_array_equal(fd.astype(np.int32)[v0], d0[v0])
    # subpixel modes on the seeded problem: bound-collapse + two-value paths
    sd0, _ = o.create_disparity_view_subpixel(d0, v0)
    fds, _, _ = _run_repo_region(lq, rq, sx, sy, window, use_mgm, "lc_blend",
                                 o.p1, o.p2, allowed=allowed)
    o2 = O.SGMOracle("census", use_mgm, 0, 0, sx - 1, sy - 1, window,
                     "lc_blend")
    d2, v2 = o2.semi_global_matching_func(lq, rq, lmask, rmask, (pd, pv))
    sd2, _ = o2.create_disparity_view_subpixel(d2, v2)
    np.testing.assert_allclose(fds[v2], sd2[v2], atol=2e-5, rtol=1e-5)


def test_tie_smoothing_matches_oracle(rng):
    """Flat (texture-free) regions exercise select_best_disparity's
    multiple-minimum smoothing cascade."""
    h, w = 26, 30
    sx, sy, window = 5, 2, 5
    left = np.zeros((h, w), np.float32)
    right = np.zeros((h + sy - 1, w + sx - 1), np.float32)
    # a few isolated features in a flat sea
    for (y, x) in [(8, 9), (15, 20), (20, 6)]:
        left[y, x] = 1.0
        right[y, x + 2] = 1.0
    lq, rq = _quantize(left), _quantize(right)
    o = O.SGMOracle("census", False, 0, 0, sx - 1, sy - 1, window, "linear")
    d0, v0 = o.semi_global_matching_func(lq, rq)
    sd0, _ = o.create_disparity_view_subpixel(d0, v0)
    fdi, _, _ = _run_repo_region(lq, rq, sx, sy, window, False, "none",
                                 o.p1, o.p2)
    np.testing.assert_array_equal(fdi.astype(np.int32), d0)
    fd, _, _ = _run_repo_region(lq, rq, sx, sy, window, False, "linear",
                                o.p1, o.p2)
    np.testing.assert_allclose(fd, sd0, atol=2e-5, rtol=1e-5)
