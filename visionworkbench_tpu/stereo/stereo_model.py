"""Ray triangulation + point-cloud generation
(ref ``src/vw/Stereo/StereoModel.h:39-110`` / ``StereoModel.cc:35-254``,
``StereoView.h``).

All math is batched: whole disparity maps triangulate in one traced call
instead of the reference's per-pixel loops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from visionworkbench_tpu.camera.model import CameraModel
from visionworkbench_tpu.stereo.correlation import DisparityMap

DEFAULT_ANGLE_TOL = 1e-4  # ref StereoModel.cc:81 (~0.81 deg convergence)


def triangulate_pair(dir0, ctr0, dir1, ctr1):
    """Midpoint of the two rays' closest approach + error vector
    (ref ``triangulate_pair``, StereoModel.cc:35-48). Batched (..., 3)."""
    dir0 = jnp.asarray(dir0, jnp.float32)
    dir1 = jnp.asarray(dir1, jnp.float32)
    ctr0 = jnp.asarray(ctr0, jnp.float32)
    ctr1 = jnp.asarray(ctr1, jnp.float32)
    v12 = jnp.cross(dir0, dir1)
    v1 = jnp.cross(v12, dir0)
    v2 = jnp.cross(v12, dir1)
    t0 = jnp.sum(v2 * (ctr1 - ctr0), -1) / jnp.sum(v2 * dir0, -1)
    t1 = jnp.sum(v1 * (ctr0 - ctr1), -1) / jnp.sum(v1 * dir1, -1)
    p1 = ctr0 + t0[..., None] * dir0
    p2 = ctr1 + t1[..., None] * dir1
    return 0.5 * (p1 + p2), p1 - p2


def are_nearly_parallel(dir0, dir1, angle_tol: float = DEFAULT_ANGLE_TOL):
    """(ref ``are_nearly_parallel``, StereoModel.cc:68-91)"""
    return 1.0 - jnp.sum(jnp.asarray(dir0) * jnp.asarray(dir1), -1) < angle_tol


class StereoModel:
    """Two-camera triangulator (ref ``StereoModel``, StereoModel.h:39-110)."""

    def __init__(self, camera1: CameraModel, camera2: CameraModel,
                 angle_tol: float = DEFAULT_ANGLE_TOL):
        self.camera1 = camera1
        self.camera2 = camera2
        self.angle_tol = angle_tol

    def triangulate(self, pix1, pix2):
        """(..., 2) pixel pairs -> ((..., 3) points, (...,) error norm,
        (...,) valid). Nearly-parallel rays are invalid
        (ref ``StereoModel::operator()``, StereoModel.cc:97-165)."""
        dir1 = self.camera1.pixel_to_vector(pix1)
        dir2 = self.camera2.pixel_to_vector(pix2)
        ctr1 = jnp.broadcast_to(self.camera1.camera_center(pix1), dir1.shape)
        ctr2 = jnp.broadcast_to(self.camera2.camera_center(pix2), dir2.shape)
        point, err_vec = triangulate_pair(dir1, ctr1, dir2, ctr2)
        err = jnp.linalg.norm(err_vec, axis=-1)
        parallel = are_nearly_parallel(dir1, dir2, self.angle_tol)
        valid = ~parallel & jnp.all(jnp.isfinite(point), -1)
        point = jnp.where(valid[..., None], point, 0.0)
        return point, jnp.where(valid, err, 0.0), valid

    def point_cloud(self, disparity: DisparityMap):
        """Dense triangulation of a disparity map -> ((H, W, 3) points,
        (H, W) error, (H, W) valid) (ref ``StereoView``, StereoView.h)."""
        h, w = disparity.valid.shape
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        pix1 = jnp.stack([xs, ys], -1)
        d = disparity.disparity.astype(jnp.float32)
        pix2 = jnp.stack([xs + d[..., 0], ys + d[..., 1]], -1)
        point, err, valid = self.triangulate(pix1, pix2)
        valid = valid & disparity.valid
        return (jnp.where(valid[..., None], point, 0.0),
                jnp.where(valid, err, 0.0), valid)


def triangulate_point_multiview(dirs, ctrs):
    """N-ray least-squares intersection (ref ``triangulate_point``,
    StereoModel.cc:187-254; Slabaugh et al. optimal ray intersection).

    ``dirs``/``ctrs``: (N, ..., 3). Returns (point (..., 3), err (...,))
    where err = 2 x mean point-to-ray distance.
    """
    dirs = jnp.asarray(dirs, jnp.float32)
    ctrs = jnp.asarray(ctrs, jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32)
    outer = dirs[..., :, None] * dirs[..., None, :]       # (N, ..., 3, 3)
    m = jnp.sum(eye - outer, axis=0)                      # (..., 3, 3)
    r = jnp.sum(jnp.einsum("n...ij,n...j->n...i", eye - outer, ctrs), axis=0)
    point = jnp.linalg.solve(m, r[..., None])[..., 0]
    v = jnp.sum(dirs * (point[None] - ctrs), -1)
    d2 = jnp.sum((point[None] - ctrs) ** 2, -1) - v * v
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    err = 2.0 * jnp.mean(dist, axis=0)
    return point, err
