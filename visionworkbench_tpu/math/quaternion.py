"""Quaternions and rotations (ref ``src/vw/Math/Quaternion.h`` /
``Quaternion.cc``, ``EulerAngles.h``, SLERP ``QuatInterp.cc``).

Convention matches the reference: quaternion (w, x, y, z), w scalar first.
Functions accept NumPy or JAX arrays and are jit-traceable.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr


def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_norm(q):
    return jnp.sqrt(jnp.sum(q * q, axis=-1))


def quat_normalize(q):
    return q / quat_norm(q)[..., None]


def quat_rotate(q, v):
    """Rotate 3-vector(s) v by unit quaternion q."""
    qv = jnp.concatenate([jnp.zeros(v.shape[:-1] + (1,), v.dtype), v], axis=-1)
    out = quat_mul(quat_mul(q, qv), quat_conj(q))
    return out[..., 1:]


def axis_angle_to_quat(axis, angle):
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.maximum(jnp.sqrt((axis * axis).sum(-1, keepdims=True)), 1e-30)
    half = jnp.asarray(angle, jnp.float32) / 2
    return jnp.concatenate([jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis],
                           axis=-1)


def quat_to_axis_angle(q):
    q = quat_normalize(jnp.asarray(q, jnp.float32))
    angle = 2 * jnp.arccos(jnp.clip(q[..., 0], -1.0, 1.0))
    s = jnp.sqrt(jnp.maximum(1 - q[..., 0] ** 2, 1e-30))
    axis = q[..., 1:] / s[..., None]
    return axis, angle


def quat_to_matrix(q):
    """Unit quaternion -> 3x3 rotation matrix (ref ``Quaternion.h``
    rotation_matrix)."""
    q = quat_normalize(jnp.asarray(q))
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def matrix_to_quat(m):
    """3x3 rotation matrix -> unit quaternion (w >= 0)."""
    m = np.asarray(m, np.float64)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                      (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 0.0)) * 2
        q = np.zeros(4)
        q[0] = (m[k, j] - m[j, k]) / s
        q[i + 1] = 0.25 * s
        q[j + 1] = (m[j, i] + m[i, j]) / s
        q[k + 1] = (m[k, i] + m[i, k]) / s
    if q[0] < 0:
        q = -q
    return q / np.linalg.norm(q)


def slerp(alpha, q0, q1):
    """Spherical linear interpolation (ref ``QuatInterp.cc``)."""
    q0 = quat_normalize(jnp.asarray(q0, jnp.float32))
    q1 = quat_normalize(jnp.asarray(q1, jnp.float32))
    dot = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(dot[..., None] < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    w0 = jnp.where(sin_theta > 1e-6, jnp.sin((1 - alpha) * theta) / sin_theta,
                   1 - alpha)
    w1 = jnp.where(sin_theta > 1e-6, jnp.sin(alpha * theta) / sin_theta, alpha)
    return quat_normalize(w0[..., None] * q0 + w1[..., None] * q1)


def euler_to_quat(x, y, z, sequence: str = "xyz"):
    """Euler angles -> quaternion (ref ``EulerAngles.h`` euler_to_quaternion)."""
    angles = {"x": x, "y": y, "z": z}
    axes = {"x": (1.0, 0.0, 0.0), "y": (0.0, 1.0, 0.0), "z": (0.0, 0.0, 1.0)}
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    for ax in sequence:
        if ax not in axes:
            raise ArgumentErr(f"bad euler sequence {sequence!r}")
        q = quat_mul(q, axis_angle_to_quat(jnp.asarray(axes[ax]), angles[ax]))
    return quat_normalize(q)


def euler_to_rotation_matrix(x, y, z, sequence: str = "xyz"):
    return quat_to_matrix(euler_to_quat(x, y, z, sequence))
