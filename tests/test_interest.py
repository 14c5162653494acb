"""Interest point pipeline tests (model: ``src/vw/InterestPoint/tests/``
TestDetector.cxx, TestMatcher.cxx; config 2 of BASELINE.json: detection +
matching on an image pair)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.interest import (
    describe, detect_points, detect_points_scaled, harris_interest,
    match_filename, match_points, matched_coordinates, read_binary_ip_file,
    read_binary_match_file, write_binary_ip_file, write_binary_match_file,
)
from visionworkbench_tpu.math.ransac import ransac


def _corner_image(h=64, w=64):
    """Bright rectangle on dark background: 4 strong corners."""
    img = np.zeros((h, w), np.float32)
    img[20:44, 16:48] = 1.0
    return img


def test_harris_response_peaks_at_corners():
    img = jnp.asarray(_corner_image())
    resp = np.asarray(harris_interest(img, 1.0))
    # Corner responses dominate edge/flat responses
    corner_val = resp[18:23, 14:19].max()
    edge_val = resp[30:34, 14:19].max()   # on an edge, away from corners
    flat_val = abs(resp[5:10, 5:10]).max()
    assert corner_val > 5 * max(edge_val, 1e-9)
    assert corner_val > 100 * max(flat_val, 1e-12)


def test_detect_points_finds_corners():
    img = jnp.asarray(_corner_image())
    pts = detect_points(img, "harris", max_points=16)
    d = pts.to_numpy()
    assert len(d["x"]) >= 4
    found = set()
    for cx, cy in [(16, 20), (47, 20), (16, 43), (47, 43)]:
        dist = np.sqrt((d["x"] - cx) ** 2 + (d["y"] - cy) ** 2)
        if dist.min() < 3.0:
            found.add((cx, cy))
    assert len(found) == 4, f"found corners: {found}"


def test_detect_scaled_blob():
    # LoG scale-space detector finds blobs of different sizes
    img = np.zeros((96, 96), np.float32)
    ys, xs = np.mgrid[0:96, 0:96].astype(np.float32)
    img += np.exp(-((xs - 30) ** 2 + (ys - 30) ** 2) / (2 * 2.0 ** 2))
    img += np.exp(-((xs - 70) ** 2 + (ys - 60) ** 2) / (2 * 5.0 ** 2))
    pts = detect_points_scaled(jnp.asarray(img), "log", threshold=1e-4,
                               max_points=64)
    d = pts.to_numpy()
    dist1 = np.sqrt((d["x"] - 30) ** 2 + (d["y"] - 30) ** 2)
    dist2 = np.sqrt((d["x"] - 70) ** 2 + (d["y"] - 60) ** 2)
    assert dist1.min() < 3.0 and dist2.min() < 3.0


def test_full_match_pipeline_with_translation(rng):
    # Textured image; second view translated by (7, 3). Detect, describe,
    # match, RANSAC -> recover the translation.
    h, w = 96, 96
    base = rng.random((h + 20, w + 20)).astype(np.float32)
    from scipy.ndimage import gaussian_filter as ndi_gauss
    base = ndi_gauss(base, 1.5).astype(np.float32)
    img1 = jnp.asarray(base[:h, :w])
    img2 = jnp.asarray(base[3:3 + h, 7:7 + w])  # img2(p) = img1(p + (7,3))
    p1 = detect_points(img1, "harris", max_points=128, threshold=1e-8)
    p2 = detect_points(img2, "harris", max_points=128, threshold=1e-8)
    p1 = describe(img1, p1, "sgrad")
    p2 = describe(img2, p2, "sgrad")
    m = match_points(p1, p2, ratio=0.8)
    c1, c2 = matched_coordinates(p1, p2, m)
    assert len(c1) >= 10, f"too few matches: {len(c1)}"
    t, inliers = ransac(c1, c2, "translation", inlier_threshold=2.0,
                        num_iterations=50)
    assert len(inliers) >= 8
    # img2 coords = img1 coords - (7, 3)
    np.testing.assert_allclose(t.matrix[:2, 2], [-7, -3], atol=0.75)


def test_ip_file_roundtrip(tmp_path):
    d = {"x": np.array([1.5, 2.5], np.float32),
         "y": np.array([3.5, 4.5], np.float32),
         "scale": np.array([1.0, 2.0], np.float32),
         "orientation": np.array([0.1, -0.2], np.float32),
         "interest": np.array([9.0, 8.0], np.float32),
         "descriptor": np.array([[0.1, 0.2], [0.3, 0.4]], np.float32)}
    path = str(tmp_path / "test.vwip")
    write_binary_ip_file(path, d)
    back = read_binary_ip_file(path)
    for k in d:
        np.testing.assert_allclose(back[k], d[k], atol=1e-6)

    mpath = str(tmp_path / "a__b.match")
    write_binary_match_file(mpath, d, d)
    b1, b2 = read_binary_match_file(mpath)
    np.testing.assert_allclose(b1["x"], d["x"])
    np.testing.assert_allclose(b2["y"], d["y"])


def test_match_filename():
    assert match_filename("out/", "/a/left.tif", "/b/right.tif") == \
        "out/left__right.match"


def test_ransac_homography(rng):
    # Known homography, with outliers.
    h_true = np.array([[1.02, 0.01, 5.0], [-0.02, 0.98, -3.0], [1e-5, -2e-5, 1.0]])
    n = 60
    p1 = rng.random((n, 2)) * 100
    homo = np.hstack([p1, np.ones((n, 1))])
    proj = (h_true @ homo.T).T
    p2 = proj[:, :2] / proj[:, 2:]
    p2[:10] += rng.random((10, 2)) * 50 + 20  # 10 gross outliers
    t, inliers = ransac(p1, p2, "homography", inlier_threshold=1.0,
                        num_iterations=200, seed=3)
    assert len(inliers) >= 45
    assert all(i >= 10 for i in inliers[:5]) or len(set(range(10)) & set(inliers)) == 0
    np.testing.assert_allclose(t.matrix / t.matrix[2, 2], h_true, atol=0.05)


def test_pca_descriptor_matches_translated_view(rng, tmp_path):
    """PCA-SIFT path (ref PCASIFTDescriptorGenerator): learn a basis from
    random patches, describe two translated views, and check the same
    world point gets near-identical descriptors while the projection has
    the requested dimensionality."""
    from visionworkbench_tpu.interest import (
        PCABasis, describe, fit_pca_basis, pca_descriptor,
    )
    from scipy.ndimage import gaussian_filter as ndi_gauss

    h, w = 96, 96
    base = ndi_gauss(rng.random((h + 20, w + 20)).astype(np.float32),
                     1.5).astype(np.float32)
    img1 = jnp.asarray(base[:h, :w])
    img2 = jnp.asarray(base[3:3 + h, 7:7 + w])

    train = rng.random((64, 17, 17)).astype(np.float32)
    basis = fit_pca_basis(train, n_components=12)
    assert basis.basis.shape == (17 * 17, 12)

    path = str(tmp_path / "basis.npz")
    basis.save(path)
    basis = PCABasis.load(path)

    p1 = detect_points(img1, "harris", max_points=64, threshold=1e-8)
    p1 = describe(img1, p1, "pca", pca_basis=basis)
    assert p1.descriptor.shape[1] == 12

    # Same physical point in both views -> same descriptor.
    k = int(np.argmax(np.asarray(p1.valid)
                      & (np.asarray(p1.x) > 20) & (np.asarray(p1.x) < 70)
                      & (np.asarray(p1.y) > 20) & (np.asarray(p1.y) < 70)))
    x1, y1 = float(p1.x[k]), float(p1.y[k])
    shifted = p1._replace(x=p1.x - 7.0, y=p1.y - 3.0)
    p2 = pca_descriptor(img2, shifted, basis)
    d1 = np.asarray(p1.descriptor[k])
    d2 = np.asarray(p2.descriptor[k])
    cos = float(np.dot(d1, d2) /
                (np.linalg.norm(d1) * np.linalg.norm(d2) + 1e-12))
    assert cos > 0.99, f"descriptor mismatch at ({x1},{y1}): cos={cos}"


def test_pca_describe_requires_basis():
    from visionworkbench_tpu.interest import describe
    img = jnp.zeros((32, 32))
    pts = detect_points(img, "harris", max_points=8, threshold=1e-8)
    with pytest.raises(ValueError):
        describe(img, pts, "pca")


@pytest.mark.parametrize("kind", ["patch", "sgrad"])
def test_upright_descriptors_match_general_path(rng, kind):
    """upright=True (dynamic-slice supports) must equal the rotated-gather
    sampling exactly for orientation-0 / scale-1 points away from borders."""
    import jax.numpy as jnp
    from visionworkbench_tpu.interest import describe
    from visionworkbench_tpu.interest.types import InterestPoints
    img = jnp.asarray(rng.random((120, 130)).astype(np.float32))
    k = 24
    xs = jnp.asarray(rng.uniform(30, 100, k).astype(np.float32))
    ys = jnp.asarray(rng.uniform(30, 90, k).astype(np.float32))
    pts = InterestPoints(xs, ys, jnp.ones((k,), jnp.float32),
                         jnp.zeros((k,), jnp.float32),
                         jnp.ones((k,), jnp.float32), jnp.ones((k,), bool))
    a = describe(img, pts, kind=kind, upright=False)
    b = describe(img, pts, kind=kind, upright=True)
    np.testing.assert_allclose(np.asarray(a.descriptor),
                               np.asarray(b.descriptor), rtol=1e-5, atol=1e-5)


def test_sift_like_rotation_scale_invariance(rng):
    # VERDICT r1 item 5: SIFT-class pipeline must survive a 30-degree
    # rotation + 1.5x scale synthetic warp (the capability the reference
    # gets from its OpenCV SIFT bridge, ipfind.cc:61-229).
    import math
    import jax.numpy as jnp
    from visionworkbench_tpu.image.interpolation import interpolate
    from visionworkbench_tpu.interest import detect_sift_like, match_points

    h = w = 256
    base = rng.random((h, w)).astype(np.float32)
    # cheap separable smoothing for structured texture
    from visionworkbench_tpu.image.filters import gaussian_filter
    img = np.asarray(gaussian_filter(jnp.asarray(base), 2.0))
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)

    th = math.radians(30.0)
    sc = 1.5
    c, s = math.cos(th), math.sin(th)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tx = (xx - cx) / sc
    ty = (yy - cy) / sc
    sx = c * tx + s * ty + cx
    sy = -s * tx + c * ty + cy
    img2 = np.asarray(interpolate(jnp.asarray(img), jnp.asarray(sx),
                                  jnp.asarray(sy), "bilinear"))

    p1 = detect_sift_like(jnp.asarray(img), max_points=400)
    p2 = detect_sift_like(jnp.asarray(img2), max_points=400)
    m = match_points(p1, p2, ratio=0.8)
    ok = np.asarray(m.valid)
    i1 = np.asarray(m.index1)[ok]
    i2 = np.asarray(m.index2)[ok]
    x1 = np.asarray(p1.x)[i1]
    y1 = np.asarray(p1.y)[i1]
    gx = (c * (x1 - cx) - s * (y1 - cy)) * sc + cx
    gy = (s * (x1 - cx) + c * (y1 - cy)) * sc + cy
    err = np.hypot(gx - np.asarray(p2.x)[i2], gy - np.asarray(p2.y)[i2])
    good = err < 3.0
    assert ok.sum() >= 25, f"only {ok.sum()} matches"
    assert good.mean() >= 0.85, f"precision {good.mean():.3f}"

    # scale assignment really tracks the warp: matched points' scale ratio
    # concentrates near 1.5
    s1 = np.asarray(p1.scale)[i1][good]
    s2 = np.asarray(p2.scale)[i2][good]
    med_ratio = np.median(s2 / s1)
    assert 1.2 < med_ratio < 1.9, f"scale ratio {med_ratio:.3f}"


def test_dog_detects_blob_scale(rng):
    # A Gaussian blob of known sigma is detected near its center with a
    # comparable characteristic scale.
    import jax.numpy as jnp
    from visionworkbench_tpu.interest import detect_points_dog
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for sig in (3.0, 6.0):
        img = np.exp(-((xx - w / 2) ** 2 + (yy - h / 2) ** 2) / (2 * sig * sig))
        img = img.astype(np.float32) + 0.01 * rng.random((h, w)).astype(np.float32)
        pts = detect_points_dog(jnp.asarray(img), threshold=0.005,
                                max_points=50)
        v = np.asarray(pts.valid)
        assert v.any()
        x = np.asarray(pts.x)[v]
        y = np.asarray(pts.y)[v]
        sc = np.asarray(pts.scale)[v]
        d = np.hypot(x - w / 2, y - h / 2)
        k = np.argmin(d)
        assert d[k] < 2.0, f"blob center missed by {d[k]:.2f}"
        # DoG responds strongest around sigma_blob (characteristic scale)
        assert 0.4 * sig < sc[k] < 2.5 * sig, f"scale {sc[k]} for blob {sig}"


def test_hamming_metric_matches_binary_descriptors(rng):
    """Hamming metric (ref HammingMetric, Matcher.cc:47-103): byte-valued
    descriptors match by popcount-XOR distance; the bit-unpacked matmul
    formulation must equal a direct numpy popcount computation."""
    import jax.numpy as jnp
    from visionworkbench_tpu.interest.matcher import (
        _pairwise_hamming, match_points,
    )
    from visionworkbench_tpu.interest.types import InterestPoints

    n, d = 24, 16
    b1 = rng.integers(0, 256, (n, d)).astype(np.float32)
    b2 = rng.integers(0, 256, (n, d)).astype(np.float32)
    got = np.asarray(_pairwise_hamming(jnp.asarray(b1), jnp.asarray(b2)))
    a = b1.astype(np.uint8)[:, None, :]
    b = b2.astype(np.uint8)[None, :, :]
    want = np.unpackbits(a ^ b, axis=2).sum(axis=2)
    np.testing.assert_array_equal(got, want.astype(np.float32))

    def mk(desc):
        k = desc.shape[0]
        return InterestPoints(
            x=jnp.arange(k, dtype=jnp.float32), y=jnp.zeros(k),
            scale=jnp.ones(k), orientation=jnp.zeros(k),
            interest=jnp.ones(k), valid=jnp.ones(k, bool),
            descriptor=jnp.asarray(desc))

    # identical descriptors (dist 0) against random: every point matches
    # itself with a clean ratio margin
    m = match_points(mk(b1), mk(np.concatenate([b1[:1] * 0 + 7, b1[1:]])),
                     ratio=0.8, metric="hamming")
    ok = np.asarray(m.valid)
    nn = np.asarray(m.index2)
    assert (nn[ok] == np.arange(n)[ok]).all()
    assert ok[1:].all()


def test_match_constraints(rng):
    """Scale-orientation and position constraints (ref Matcher.h:113-149,
    check_constraint :262-277): applied to the nearest neighbor, rejecting
    matches outside the windows."""
    import jax.numpy as jnp
    from visionworkbench_tpu.interest.matcher import (
        PositionConstraint, ScaleOrientationConstraint, match_points,
    )
    from visionworkbench_tpu.interest.types import InterestPoints

    n, d = 16, 8
    desc = rng.random((n, d)).astype(np.float32)

    def mk(x, scale, ori):
        return InterestPoints(
            x=jnp.asarray(x, jnp.float32), y=jnp.zeros(n),
            scale=jnp.asarray(scale, jnp.float32),
            orientation=jnp.asarray(ori, jnp.float32),
            interest=jnp.ones(n), valid=jnp.ones(n, bool),
            descriptor=jnp.asarray(desc))

    x = np.arange(n, dtype=np.float32)
    p1 = mk(x, np.ones(n), np.zeros(n))
    # p2: same descriptors; half the points displaced by 50 px, half by 2;
    # scales 1.0 except two wild ones; orientations small except one.
    x2 = x + np.where(x < 8, 2.0, 50.0)
    scale2 = np.ones(n); scale2[3] = 2.0
    ori2 = np.zeros(n); ori2[5] = 1.0
    p2 = mk(x2, scale2, ori2)

    base = match_points(p1, p2, ratio=0.9)
    assert np.asarray(base.valid).all()

    mpos = match_points(p1, p2, ratio=0.9,
                        constraint=PositionConstraint(-10, 10, -10, 10))
    vpos = np.asarray(mpos.valid)
    assert vpos[:8].all() and not vpos[8:].any()

    mso = match_points(p1, p2, ratio=0.9,
                       constraint=ScaleOrientationConstraint())
    vso = np.asarray(mso.valid)
    # sr = p1.scale/p2.scale: point 3 ratio 0.5 (reject); point 5 ori
    # delta -1.0 (reject); everything else passes
    expect = np.ones(n, bool); expect[3] = False; expect[5] = False
    np.testing.assert_array_equal(vso, expect)


def test_remove_duplicates():
    """remove_duplicates parity (Matcher.cc): either-side coordinate
    repeats pruned, LAST occurrence kept, order preserved."""
    from visionworkbench_tpu.interest.matcher import remove_duplicates
    p1 = np.float32([[0, 0], [1, 0], [0, 0], [2, 0], [3, 0]])
    p2 = np.float32([[5, 5], [6, 6], [7, 7], [6, 6], [8, 8]])
    f1, f2 = remove_duplicates(p1, p2)
    # (0,0) repeats in p1 (rows 0, 2): keep row 2; (6,6) repeats in p2
    # (rows 1, 3): keep row 3.
    np.testing.assert_array_equal(f1, np.float32([[0, 0], [2, 0], [3, 0]]))
    np.testing.assert_array_equal(f2, np.float32([[7, 7], [6, 6], [8, 8]]))
