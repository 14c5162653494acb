"""Linescan utility tests (model: ``src/vw/Camera/LinescanErr.cc``,
``TimeInterp.cc``, ``OrbitalCorrections.cc``, ``CameraParamsPack.cc``)."""

import math

import numpy as np
import pytest

from visionworkbench_tpu.camera import (
    LinearTimeInterpolation, TLCTimeInterpolation,
    apply_atmospheric_refraction_correction,
    apply_velocity_aberration_correction, linescan_point_to_pixel,
    saastamoinen_atmosphere_correction, transform_to_vector,
    vector_to_transform,
)
from visionworkbench_tpu.camera.linescan import find_perp_vecs
from visionworkbench_tpu.math.quaternion import euler_to_rotation_matrix


class ToyLinescan:
    """Pushbroom: center slides along +y with the row; each row views a
    rigid fan of rays in the x-z plane."""

    C0 = np.array([0.0, 0.0, 0.0])
    VEL = np.array([0.0, 2.0, 0.0])
    F, CX = 500.0, 320.0

    def camera_center(self, pix):
        return self.C0 + self.VEL * float(np.asarray(pix).reshape(-1)[-1])

    def pixel_to_vector(self, pix):
        x = float(np.asarray(pix).reshape(-1)[0])
        d = np.array([(x - self.CX) / self.F, 0.0, 1.0])
        return d / np.linalg.norm(d)


def test_linear_time_interpolation():
    t = LinearTimeInterpolation(10.0, 0.5)
    assert t(0) == 10.0
    assert t(4) == 12.0


def test_tlc_time_interpolation():
    t = TLCTimeInterpolation([(0.0, 0.0), (10.0, 1.0), (30.0, 5.0)],
                             time_offset=2.0)
    assert t(0) == pytest.approx(2.0)
    assert t(10) == pytest.approx(3.0)
    assert t(20) == pytest.approx(5.0)
    assert t(30) == pytest.approx(7.0)
    assert t(40) == pytest.approx(9.0)   # extrapolates the last segment


def test_find_perp_vecs_orthonormal():
    v = np.array([0.3, -0.5, 0.81240384])
    p1, p2 = find_perp_vecs(v)
    for a, b in [(v, p1), (v, p2), (p1, p2)]:
        assert abs(np.dot(a, b)) < 1e-12
    assert np.linalg.norm(p1) == pytest.approx(1.0)
    assert np.linalg.norm(p2) == pytest.approx(1.0)


def test_linescan_point_to_pixel_recovers_row_and_col():
    cam = ToyLinescan()
    true_pix = np.array([350.0, 17.0])
    ctr = cam.camera_center(true_pix)
    point = ctr + cam.pixel_to_vector(true_pix) * 80.0
    pix = linescan_point_to_pixel(cam, point, guess=(cam.CX, 0.0))
    np.testing.assert_allclose(pix, true_pix, atol=1e-6)


def test_velocity_aberration_magnitude():
    """LEO nadir view: correction angle ~ v_transverse / c ~ 2.5e-5 rad
    (ref OrbitalCorrections.cc:50-83)."""
    R = 6371e3
    ctr = np.array([R + 600e3, 0.0, 0.0])
    vel = np.array([0.0, 7500.0, 0.0])
    ray = np.array([-1.0, 0.0, 0.0])
    corrected, _ = apply_velocity_aberration_correction(ctr, vel, R, ray)
    angle = math.acos(np.clip(np.dot(corrected, ray), -1, 1))
    assert 1e-5 < angle < 5e-5
    assert np.linalg.norm(corrected) == pytest.approx(1.0)


def test_atmospheric_refraction_bends_toward_nadir():
    R = 6371e3
    ctr = np.array([0.0, 0.0, R + 700e3])
    nadir = np.array([0.0, 0.0, -1.0])
    alpha = math.radians(25.0)
    ray = np.array([math.sin(alpha), 0.0, -math.cos(alpha)])
    corrected, _ = apply_atmospheric_refraction_correction(ctr, R, 0.0, ray)
    new_alpha = math.acos(np.clip(np.dot(corrected, nadir), -1, 1))
    delta = saastamoinen_atmosphere_correction(700e3, 0.0, alpha)
    assert delta > 0
    assert new_alpha == pytest.approx(alpha - delta, abs=1e-9)


def test_transform_vector_roundtrip():
    rot = np.asarray(euler_to_rotation_matrix(0.2, -0.1, 0.4))
    trans = np.array([1.0, -2.0, 3.0])
    vec = transform_to_vector(rot, trans, scale=1.7)
    r2, t2, s2 = vector_to_transform(vec)
    np.testing.assert_allclose(r2, rot, atol=1e-12)
    np.testing.assert_allclose(t2, trans)
    assert s2 == pytest.approx(1.7)
