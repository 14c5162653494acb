"""Generic iterative camera solve (ref ``CameraSolve.h``,
``src/vw/Camera/CameraSolve.h``): invert ``pixel_to_vector`` for camera
models without a closed-form projection — Gauss-Newton on the ray/target
direction residual with JAX forward-mode Jacobians, vmapped over points."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visionworkbench_tpu.camera.model import CameraModel


def solve_point_to_pixel(camera: CameraModel, points, initial_pixel=None,
                         iterations: int = 25, step_clip: float = 200.0):
    """(..., 3) world points -> (..., 2) pixels by iteratively matching the
    camera ray direction to the point direction."""
    points = jnp.asarray(points, jnp.float32)
    if initial_pixel is None:
        initial_pixel = jnp.zeros(2, jnp.float32)
    init = jnp.asarray(initial_pixel, jnp.float32)

    def residual(pix, pt):
        c = camera.camera_center(pix[None])
        c = jnp.reshape(c, (-1, 3))[0]
        v = camera.pixel_to_vector(pix[None])[0]
        d = pt - c
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
        return v - d

    def solve_one(pt):
        def body(_, pix):
            r = residual(pix, pt)
            j = jax.jacfwd(lambda p: residual(p, pt))(pix)   # (3, 2)
            jtj = j.T @ j + 1e-12 * jnp.eye(2)
            delta = jnp.linalg.solve(jtj, j.T @ r)
            return pix - jnp.clip(delta, -step_clip, step_clip)
        return jax.lax.fori_loop(0, iterations, body, init)

    flat = points.reshape(-1, 3)
    out = jax.vmap(solve_one)(flat)
    return out.reshape(points.shape[:-1] + (2,))
