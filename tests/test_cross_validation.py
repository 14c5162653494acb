"""Cross-validation against OpenCV (independent implementation oracle —
the reference itself cannot be built in this image, so a third-party block
matcher serves as the external check on disparity semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from visionworkbench_tpu.math.bbox import BBox2i
from visionworkbench_tpu.stereo import pyramid_correlate
from visionworkbench_tpu.stereo.correlation import best_of_search_convolution


def _stereo_scene(rng, h=128, w=160, max_d=14):
    """Textured scene with a 2-plane depth profile (x-only disparity)."""
    ys, xs = np.mgrid[0:h, 0:w + max_d].astype(np.float32)
    tex = (0.5 + 0.2 * np.sin(xs * 0.9) * np.cos(ys * 0.7)
           + 0.3 * rng.random(xs.shape)).astype(np.float32)
    disp_true = np.full((h, w), 4, np.int32)
    disp_true[:, w // 2:] = 10
    right = tex[:, :w]
    # Standard rectified geometry: left(x) = right(x - d), d > 0.
    left = np.zeros((h, w), np.float32)
    for y in range(h):
        for x in range(w):
            left[y, x] = right[y, max(x - disp_true[y, x], 0)]
    return left, right, disp_true


def test_block_matcher_agrees_with_opencv(rng):
    left, right, disp_true = _stereo_scene(rng)
    h, w = left.shape
    # OpenCV StereoBM: disparity d such that left(x) = right(x - d).
    bm = cv2.StereoBM_create(numDisparities=16, blockSize=15)
    bm.setTextureThreshold(5)
    bm.setUniquenessRatio(5)
    l8 = (left * 255).astype(np.uint8)
    r8 = (right * 255).astype(np.uint8)
    cv_disp = bm.compute(l8, r8).astype(np.float32) / 16.0

    # Ours: left(p) = right(p + d) with d in [-15, 0] -> use negative search.
    dm = pyramid_correlate(jnp.asarray(left), jnp.asarray(right),
                           BBox2i(-15, 0, 16, 1), kernel_size=(15, 15),
                           max_pyramid_levels=0, tile_size=16,
                           filter_half_kernel=0)
    ours = -np.asarray(dm.disparity)[..., 0]  # convert to positive-left convention
    valid_ours = np.asarray(dm.valid)

    core = np.s_[20:-20, 24:-24]
    both = (cv_disp[core] > 0) & valid_ours[core]
    assert both.mean() > 0.5
    agree = np.abs(ours[core] - cv_disp[core])[both] <= 1.0
    assert agree.mean() > 0.9, f"agreement with OpenCV: {agree.mean():.3f}"
    # and both agree with ground truth
    correct_ours = np.abs(ours[core] - disp_true[core])[both] <= 1.0
    assert correct_ours.mean() > 0.9


def test_sgm_agrees_with_opencv_sgbm(rng):
    """calc_disparity_sgm vs cv2.StereoSGBM on the two-plane scene: both
    regularized matchers should recover the planes and agree."""
    from visionworkbench_tpu.stereo import calc_disparity_sgm

    left, right, disp_true = _stereo_scene(rng)
    h, w = left.shape

    sgbm = cv2.StereoSGBM_create(minDisparity=0, numDisparities=16,
                                 blockSize=5, P1=8 * 25, P2=32 * 25,
                                 mode=cv2.STEREO_SGBM_MODE_SGBM)
    l8 = (left * 255).astype(np.uint8)
    r8 = (right * 255).astype(np.uint8)
    cv_disp = sgbm.compute(l8, r8).astype(np.float32) / 16.0

    # Ours searches d' in [0, 16) with left(p) = right_ext(p + d');
    # right_ext shifts right 15 columns so d = d' - 15 covers [-15, 0].
    right_ext = np.pad(right, ((0, 0), (15, 0)), mode="edge")
    dm = calc_disparity_sgm(jnp.asarray(left), jnp.asarray(right_ext),
                            search_volume=(16, 1), kernel_size=5,
                            cost_type="census", subpixel="none")
    ours = -(np.asarray(dm.disparity)[..., 0] - 15.0)
    valid_ours = np.asarray(dm.valid)

    core = np.s_[16:-16, 24:-24]
    both = (cv_disp[core] > 0) & valid_ours[core]
    assert both.mean() > 0.5
    agree = np.abs(ours[core] - cv_disp[core])[both] <= 1.0
    assert agree.mean() > 0.85, f"agreement with SGBM: {agree.mean():.3f}"
    correct = np.abs(ours[core] - disp_true[core])[both] <= 1.0
    assert correct.mean() > 0.9, f"vs truth: {correct.mean():.3f}"


def test_dog_detector_agrees_with_opencv_sift(rng):
    """SIFT-class cross-validation (VERDICT r2 item 6): the DoG detector's
    keypoints must land where OpenCV SIFT's do on a structured scene —
    mutual repeatability within 3 px for the majority of strong points."""
    import cv2
    import jax.numpy as jnp
    from visionworkbench_tpu.interest.detector import detect_points_dog

    h, w = 256, 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w), np.float32)
    # multi-scale blobs + corners + ridges: structure at several sigmas
    for (cy, cx, s, a) in [(40, 50, 3, 1.0), (60, 180, 6, -0.8),
                           (140, 70, 10, 0.9), (180, 200, 4, -1.0),
                           (200, 120, 8, 0.7), (90, 120, 5, -0.6),
                           (150, 160, 3, 0.8), (220, 40, 6, -0.9)]:
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)
                          ).astype(np.float32)
    img += 0.15 * np.sin(0.35 * xx).astype(np.float32) * \
        np.cos(0.3 * yy).astype(np.float32)
    img = (img - img.min()) / (img.max() - img.min())

    u8 = (img * 255).astype(np.uint8)
    sift = cv2.SIFT_create(contrastThreshold=0.02)
    kps = sift.detect(u8, None)
    assert len(kps) >= 8, len(kps)
    cvp = np.array([k.pt for k in kps], np.float32)          # (N, 2) x, y
    cvr = np.array([k.response for k in kps], np.float32)
    order = np.argsort(-cvr)
    cvp_strong = cvp[order[:min(30, len(order))]]

    pts = detect_points_dog(jnp.asarray(img), threshold=0.005,
                            max_points=400)
    v = np.asarray(pts.valid)
    ox = np.asarray(pts.x)[v]
    oy = np.asarray(pts.y)[v]
    oi = np.asarray(pts.interest)[v]
    assert v.sum() >= 10
    oord = np.argsort(-oi)
    ours_strong = np.stack([ox[oord[:30]], oy[oord[:30]]], -1)

    def recall(a, b, r=3.0):
        d = np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1)).min(1)
        return (d <= r).mean()

    ours_all = np.stack([ox, oy], -1)
    rec_cv = recall(cvp_strong, ours_all)     # cv2's strong pts found by us
    rec_us = recall(ours_strong, cvp)         # our strong pts found by cv2
    assert rec_cv >= 0.6, f"cv2-strong recall {rec_cv:.2f}"
    assert rec_us >= 0.6, f"ours-strong recall {rec_us:.2f}"
