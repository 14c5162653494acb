"""RANSAC robust estimation (ref ``src/vw/Math/RANSAC.h:109-332``).

The reference loops sequentially: sample a minimal set, fit, count inliers
within ``inlier_threshold``, keep the best model, then refit on its inliers.
TPU-natively all hypotheses are drawn and fitted *at once* (batched linear
algebra on device), errors evaluated as one (B, N) matrix, and only the final
refit runs on the host. Error metric is the reference's
``InterestPointErrorMetric``: ||T(p1) - p2||.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr, MathErr
from visionworkbench_tpu.math.geometry_fit import BATCHED_FITTERS, HOST_FITTERS
from visionworkbench_tpu.math.transform2d import Transform2D


def _apply_batched(h, pts):
    """(B, 3, 3) x (N, 2) -> (B, N, 2)"""
    homo = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), pts.dtype)], axis=-1)
    out = jnp.einsum("bij,nj->bni", h, homo)
    return out[..., :2] / out[..., 2:3]


def ransac(p1, p2, model: str = "homography", inlier_threshold: float = 10.0,
           num_iterations: int = 100, min_num_output_inliers: Optional[int] = None,
           seed: int = 0, reduce_min_num_output: bool = True
           ) -> Tuple[Transform2D, np.ndarray]:
    """Fit a 2D transform robustly; returns (transform, inlier_indices)
    (ref ``RandomSampleConsensus::operator()``, RANSAC.h:187-332; defaults
    mirror ``ipmatch``: 100 iterations, 10 px threshold).

    ``min_num_output_inliers`` defaults to half the correspondences as in the
    reference; with ``reduce_min_num_output`` the requirement relaxes (halves)
    rather than erroring when unmet, like the reference's retry loop.
    """
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    if p1.shape != p2.shape or p1.ndim != 2 or p1.shape[1] != 2:
        raise ArgumentErr("ransac: p1/p2 must be matching (N, 2) arrays")
    n = len(p1)
    if model not in BATCHED_FITTERS:
        raise ArgumentErr(f"ransac: unknown model {model!r}")
    batched_fit, k = BATCHED_FITTERS[model]
    if n < k:
        raise MathErr(f"ransac: need at least {k} correspondences, got {n}")
    if min_num_output_inliers is None:
        min_num_output_inliers = n // 2

    rng = np.random.default_rng(seed)
    idx = np.stack([rng.choice(n, size=k, replace=False)
                    for _ in range(num_iterations)])      # (B, k)

    d1 = jnp.asarray(p1, jnp.float32)
    d2 = jnp.asarray(p2, jnp.float32)
    s1 = d1[jnp.asarray(idx)]
    s2 = d2[jnp.asarray(idx)]
    h = batched_fit(s1, s2)                              # (B, 3, 3)
    proj = _apply_batched(h, d1)                         # (B, N, 2)
    err = jnp.sqrt(((proj - d2[None]) ** 2).sum(-1))     # (B, N)
    inlier_mask = err < inlier_threshold
    counts = inlier_mask.sum(axis=1)
    best = int(jnp.argmax(counts))
    best_mask = np.asarray(inlier_mask[best])
    best_count = int(counts[best])

    min_required = int(min_num_output_inliers)
    while best_count < min_required:
        if not reduce_min_num_output or min_required <= k:
            raise MathErr(
                f"ransac: best model has {best_count} inliers; "
                f"needed {min_required}")
        min_required //= 2

    inliers = np.nonzero(best_mask)[0]
    # Final host refit on all inliers (ref RANSAC.h refinement step).
    host_fit, _ = HOST_FITTERS[model if model in HOST_FITTERS else "affine"]
    try:
        refined = host_fit(p1[inliers], p2[inliers])
    except Exception:
        refined = np.asarray(h[best], np.float64)
    t = Transform2D(refined)
    # Re-evaluate inliers under the refined model.
    proj1 = np.asarray(_apply_batched(jnp.asarray(refined, jnp.float32)[None], d1)[0])
    err1 = np.sqrt(((proj1 - p2) ** 2).sum(-1))
    inliers = np.nonzero(err1 < inlier_threshold)[0]
    return t, inliers
