"""Bathymetric stereo with water refraction
(ref ``BathyStereoModel`` / ``SnellLaw.cc``,
``src/vw/Cartography/BathyStereoModel.h:40-77``): rays refract at a water
surface plane per Snell's law before triangulation."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from visionworkbench_tpu.camera.model import CameraModel
from visionworkbench_tpu.stereo.stereo_model import triangulate_pair

WATER_REFRACTION_INDEX = 1.34  # ref default


def snell_refraction(incident, normal, n1: float, n2: float):
    """Refract unit direction(s) through an interface with unit normal
    (pointing into medium 1) per Snell's law (ref ``SnellLaw.cc``).
    Returns (refracted unit vectors, total_internal_reflection mask)."""
    d = jnp.asarray(incident, jnp.float32)
    n = jnp.asarray(normal, jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    cos_i = -jnp.sum(d * n, -1)
    # Flip the normal to oppose the ray if needed.
    n = jnp.where((cos_i < 0)[..., None], -n, n)
    cos_i = jnp.abs(cos_i)
    eta = n1 / n2
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0
    k = jnp.maximum(k, 0.0)
    t = eta * d + (eta * cos_i - jnp.sqrt(k))[..., None] * n
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return t, tir


def _intersect_plane(ctr, dir, plane):
    """Ray/plane intersection: plane = (a, b, c, d), ax+by+cz = d."""
    n = jnp.asarray(plane[:3], jnp.float32)
    d0 = jnp.float32(plane[3])
    denom = jnp.sum(dir * n, -1)
    t = (d0 - jnp.sum(ctr * n, -1)) / jnp.where(jnp.abs(denom) < 1e-12,
                                                1e-12, denom)
    return ctr + t[..., None] * dir, t


class BathyStereoModel:
    """Two-ray triangulation with refraction at a water plane
    (ref ``BathyStereoModel::operator()``)."""

    def __init__(self, camera1: CameraModel, camera2: CameraModel,
                 water_plane, refraction_index: float = WATER_REFRACTION_INDEX):
        self.camera1 = camera1
        self.camera2 = camera2
        self.plane = jnp.asarray(water_plane, jnp.float32)
        self.index = float(refraction_index)

    def _bend(self, ctr, dir):
        surf, t = _intersect_plane(ctr, dir, self.plane)
        bent, tir = snell_refraction(dir, self.plane[:3], 1.0, self.index)
        underwater = t > 0
        new_ctr = jnp.where(underwater[..., None], surf, ctr)
        new_dir = jnp.where((underwater & ~tir)[..., None], bent, dir)
        return new_ctr, new_dir

    def triangulate(self, pix1, pix2):
        d1 = self.camera1.pixel_to_vector(pix1)
        d2 = self.camera2.pixel_to_vector(pix2)
        c1 = jnp.broadcast_to(self.camera1.camera_center(pix1), d1.shape)
        c2 = jnp.broadcast_to(self.camera2.camera_center(pix2), d2.shape)
        c1b, d1b = self._bend(c1, d1)
        c2b, d2b = self._bend(c2, d2)
        point, err_vec = triangulate_pair(d1b, c1b, d2b, c2b)
        err = jnp.linalg.norm(err_vec, axis=-1)
        return point, err
