"""Camera model base + adjusted wrapper
(ref ``src/vw/Camera/CameraModel.h:60-186``).

TPU-first deviation: every method is batched — points are (..., 3) arrays and
pixels (..., 2) arrays ((x, y) = (col, row)), traced with jnp so whole image
grids project in one fused call (the reference projects one point at a time).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import NoImplErr
from visionworkbench_tpu.math.quaternion import quat_to_matrix


class CameraModel:
    """ABC (ref ``CameraModel``, CameraModel.h:60)."""

    def point_to_pixel(self, point):
        """(..., 3) world point -> (..., 2) pixel."""
        raise NoImplErr("point_to_pixel not implemented")

    def pixel_to_vector(self, pixel):
        """(..., 2) pixel -> (..., 3) unit ray direction."""
        raise NoImplErr("pixel_to_vector not implemented")

    def camera_center(self, pixel=None):
        """(..., 3) ray origin (per-pixel for scanning cameras)."""
        raise NoImplErr("camera_center not implemented")

    def camera_pose(self, pixel=None):
        """Camera-to-world rotation as a quaternion (w, x, y, z)."""
        raise NoImplErr("camera_pose not implemented")

    def type(self) -> str:
        return type(self).__name__


class AdjustedCameraModel(CameraModel):
    """Pose/position delta on top of any camera
    (ref ``AdjustedCameraModel``, CameraModel.h:120-186): world->camera pixel
    via the unadjusted model of the *rotated/translated* geometry.

    Convention follows the reference: ``rotation`` (quaternion) and
    ``translation`` adjust the camera in world frame about ``rotation_center``.
    """

    def __init__(self, camera: CameraModel, translation=(0.0, 0.0, 0.0),
                 rotation=(1.0, 0.0, 0.0, 0.0),
                 rotation_center=(0.0, 0.0, 0.0)):
        self.unadjusted = camera
        self.translation = jnp.asarray(translation, jnp.float32)
        self.rotation = jnp.asarray(rotation, jnp.float32)
        self.rotation_center = jnp.asarray(rotation_center, jnp.float32)
        self._rot_m = quat_to_matrix(self.rotation)
        self._rot_m_inv = self._rot_m.T

    def _world_to_unadjusted(self, point):
        # Invert the adjustment: p' = R^-1 (p - t - c) + c
        p = jnp.asarray(point, jnp.float32)
        return (p - self.translation - self.rotation_center) @ self._rot_m_inv.T \
            + self.rotation_center

    def point_to_pixel(self, point):
        return self.unadjusted.point_to_pixel(self._world_to_unadjusted(point))

    def pixel_to_vector(self, pixel):
        v = self.unadjusted.pixel_to_vector(pixel)
        return v @ self._rot_m.T

    def camera_center(self, pixel=None):
        c = self.unadjusted.camera_center(pixel)
        return (c - self.rotation_center) @ self._rot_m.T + self.rotation_center \
            + self.translation

    def camera_pose(self, pixel=None):
        from visionworkbench_tpu.math.quaternion import matrix_to_quat
        base = self.unadjusted.camera_pose(pixel)
        base_m = quat_to_matrix(jnp.asarray(base, jnp.float32))
        return jnp.asarray(matrix_to_quat(np.asarray(self._rot_m @ base_m)))
