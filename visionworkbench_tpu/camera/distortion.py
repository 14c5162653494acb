"""Lens distortion models (ref ``src/vw/Camera/LensDistortion.h:41-362`` /
``LensDistortion.cc``).

All models operate on *normalized* focal-plane coordinates, vectorized over
(..., 2) arrays. ``distort`` applies the model; ``undistort`` inverts with a
fixed-iteration Newton solve (the reference uses NewtonRaphson with an
analytical Jacobian, ``LensDistortion.cc:371-400``; a fixed 20-iteration
damped fixed-point/Newton hybrid matches to fp32 and stays jittable).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr


class NullLensDistortion:
    """(ref ``NullLensDistortion``)"""
    name = "NULL"
    params: tuple = ()

    def distort(self, xy):
        return jnp.asarray(xy, jnp.float32)

    def undistort(self, xy):
        return jnp.asarray(xy, jnp.float32)


def _newton_undistort(distort_fn, xy, iters: int = 20):
    """Invert y = f(x) by damped Newton on each component pair using the
    numerical Jacobian of the 2D map (vectorized)."""
    xy = jnp.asarray(xy, jnp.float32)

    def body(_, x):
        # residual
        r = distort_fn(x) - xy
        eps = 1e-4
        ex = jnp.stack([jnp.full(x.shape[:-1], eps), jnp.zeros(x.shape[:-1])], -1)
        ey = jnp.stack([jnp.zeros(x.shape[:-1]), jnp.full(x.shape[:-1], eps)], -1)
        jx = (distort_fn(x + ex) - distort_fn(x - ex)) / (2 * eps)  # d f / d x0
        jy = (distort_fn(x + ey) - distort_fn(x - ey)) / (2 * eps)
        a, c = jx[..., 0], jx[..., 1]
        b, d = jy[..., 0], jy[..., 1]
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        dx = (d * r[..., 0] - b * r[..., 1]) / det
        dy = (-c * r[..., 0] + a * r[..., 1]) / det
        return x - jnp.stack([dx, dy], -1)

    return jax.lax.fori_loop(0, iters, body, xy)


class TsaiLensDistortion:
    """Radial k1,k2,k3 + tangential p1,p2 (ref ``TsaiDistortionNorm``,
    LensDistortion.cc:260-276)."""
    name = "TSAI"

    def __init__(self, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0):
        self.params = (float(k1), float(k2), float(p1), float(p2), float(k3))

    def distort(self, xy):
        xy = jnp.asarray(xy, jnp.float32)
        k1, k2, p1, p2, k3 = self.params
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        rdist = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        x_out = x * rdist + (2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x))
        y_out = y * rdist + (p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y)
        return jnp.stack([x_out, y_out], -1)

    def undistort(self, xy):
        return _newton_undistort(self.distort, xy)


class BrownConradyDistortion:
    """Brown-Conrady: principal-point offset, radial k1..k3, tangential with
    angle (ref ``BrownConradyDistortion``, LensDistortion.h)."""
    name = "BrownConrady"

    def __init__(self, xp=0.0, yp=0.0, k1=0.0, k2=0.0, k3=0.0,
                 p1=0.0, p2=0.0, phi=0.0):
        self.params = tuple(float(v) for v in (xp, yp, k1, k2, k3, p1, p2, phi))

    def distort(self, xy):
        xp, yp, k1, k2, k3, p1, p2, phi = self.params
        xy = jnp.asarray(xy, jnp.float32)
        x = xy[..., 0] - xp
        y = xy[..., 1] - yp
        r2 = x * x + y * y
        radial = k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        tangential = (p1 * r2 + p2 * r2 ** 2)
        dx = x * radial - tangential * jnp.sin(phi)
        dy = y * radial + tangential * jnp.cos(phi)
        return jnp.stack([xy[..., 0] + dx, xy[..., 1] + dy], -1)

    def undistort(self, xy):
        return _newton_undistort(self.distort, xy)


class FovDistortion:
    """Field-of-view model: r_d = atan(2 r tan(w/2)) / w
    (ref ``FovDistortion``, LensDistortion.cc fisheye/FOV section)."""
    name = "FOV"

    def __init__(self, omega=0.75):
        self.params = (float(omega),)

    def distort(self, xy):
        (w,) = self.params
        xy = jnp.asarray(xy, jnp.float32)
        r = jnp.sqrt(jnp.sum(xy * xy, -1))
        rd = jnp.arctan(2.0 * r * np.tan(w / 2.0)) / w
        scale = jnp.where(r > 1e-8, rd / jnp.maximum(r, 1e-8), 1.0)
        return xy * scale[..., None]

    def undistort(self, xy):
        (w,) = self.params
        xy = jnp.asarray(xy, jnp.float32)
        rd = jnp.sqrt(jnp.sum(xy * xy, -1))
        r = jnp.tan(rd * w) / (2.0 * np.tan(w / 2.0))
        scale = jnp.where(rd > 1e-8, r / jnp.maximum(rd, 1e-8), 1.0)
        return xy * scale[..., None]


class FisheyeDistortion:
    """Equidistant fisheye with k1..k4 theta polynomial (ref
    ``FisheyeLensDistortion``, OpenCV convention)."""
    name = "FISHEYE"

    def __init__(self, k1=0.0, k2=0.0, k3=0.0, k4=0.0):
        self.params = tuple(float(v) for v in (k1, k2, k3, k4))

    def distort(self, xy):
        k1, k2, k3, k4 = self.params
        xy = jnp.asarray(xy, jnp.float32)
        r = jnp.sqrt(jnp.sum(xy * xy, -1))
        theta = jnp.arctan(r)
        t2 = theta * theta
        theta_d = theta * (1 + k1 * t2 + k2 * t2 ** 2 + k3 * t2 ** 3 + k4 * t2 ** 4)
        scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-8), 1.0)
        return xy * scale[..., None]

    def undistort(self, xy):
        return _newton_undistort(self.distort, xy)


class PhotometrixDistortion:
    """Photometrix calibration-report convention (ref
    ``PhotometrixLensDistortion``): like Brown-Conrady in mm units."""
    name = "Photometrix"

    def __init__(self, xp=0.0, yp=0.0, k1=0.0, k2=0.0, k3=0.0, p1=0.0, p2=0.0):
        self.params = tuple(float(v) for v in (xp, yp, k1, k2, k3, p1, p2))

    def distort(self, xy):
        xp, yp, k1, k2, k3, p1, p2 = self.params
        xy = jnp.asarray(xy, jnp.float32)
        x = xy[..., 0] - xp
        y = xy[..., 1] - yp
        r2 = x * x + y * y
        dr = k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        dx = x * dr + p1 * (r2 + 2 * x * x) + 2 * p2 * x * y
        dy = y * dr + p2 * (r2 + 2 * y * y) + 2 * p1 * x * y
        return jnp.stack([xy[..., 0] + dx, xy[..., 1] + dy], -1)

    def undistort(self, xy):
        return _newton_undistort(self.distort, xy)


DISTORTION_TYPES = {
    "NULL": NullLensDistortion,
    "TSAI": TsaiLensDistortion,
    "BrownConrady": BrownConradyDistortion,
    "FOV": FovDistortion,
    "FISHEYE": FisheyeDistortion,
    "Photometrix": PhotometrixDistortion,
}


class RPCLensDistortion:
    """Rational-polynomial distortion on normalized coordinates
    (ref ``RPCLensDistortion``, LensDistortion.h): each output coordinate is
    a ratio of polynomials in (x, y) up to the given degree. Coefficient
    layout per coordinate: numerator then denominator (constant term of the
    denominator fixed at 1)."""
    name = "RPC"

    def __init__(self, num_x, den_x, num_y, den_y):
        self.num_x = tuple(float(v) for v in num_x)
        self.den_x = tuple(float(v) for v in den_x)
        self.num_y = tuple(float(v) for v in num_y)
        self.den_y = tuple(float(v) for v in den_y)
        self.params = self.num_x + self.den_x + self.num_y + self.den_y

    @staticmethod
    def _poly(coeffs, x, y):
        """Coefficients over monomials 1, x, y, x^2, xy, y^2, ... by degree."""
        terms = []
        deg = 0
        idx = 0
        while idx < len(coeffs):
            for i in range(deg + 1):
                if idx >= len(coeffs):
                    break
                terms.append(coeffs[idx] * (x ** (deg - i)) * (y ** i))
                idx += 1
            deg += 1
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    def distort(self, xy):
        xy = jnp.asarray(xy, jnp.float32)
        x, y = xy[..., 0], xy[..., 1]
        nx = self._poly(self.num_x, x, y)
        dx = 1.0 + self._poly((0.0,) + tuple(self.den_x), x, y)
        ny = self._poly(self.num_y, x, y)
        dy = 1.0 + self._poly((0.0,) + tuple(self.den_y), x, y)
        return jnp.stack([nx / dx, ny / dy], -1)

    def undistort(self, xy):
        return _newton_undistort(self.distort, xy)


DISTORTION_TYPES["RPC"] = RPCLensDistortion
