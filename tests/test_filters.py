"""Filter and convolution tests (model: ``src/vw/Image/tests/TestConvolution.cxx``,
``TestFilter.cxx`` — hand-computed kernel values)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from visionworkbench_tpu.image import (
    compute_kernel_size, convolution_filter, correlate_2d, derivative_filter,
    gaussian_filter, generate_derivative_kernel, generate_gaussian_kernel,
    generate_laplacian_of_gaussian_kernel, generate_pyramid_smoothing_kernel,
    laplacian_filter, separable_convolution_filter, sobel_filter,
)


def test_compute_kernel_size():
    # ref Filter.cc:32-38
    assert compute_kernel_size(0.1) == 3
    assert compute_kernel_size(1.0) == 7
    assert compute_kernel_size(2.0) == 13  # int(14) even -> 13
    assert compute_kernel_size(1.5) == 9   # int(10.5)=10 even -> 9


def test_gaussian_kernel_properties():
    k = generate_gaussian_kernel(1.0)
    assert k.shape == (7,)
    assert k.sum() == pytest.approx(1.0)
    np.testing.assert_allclose(k, k[::-1])  # symmetric
    assert k[3] == max(k)
    # erf-integration formula check for the center tap
    z = 1 / (math.sqrt(2))
    center_unnorm = math.erf(0.5 * z) - math.erf(-0.5 * z)
    assert k[3] == pytest.approx(center_unnorm / (k.sum() / k[3] * k[3]) * k[3] / k[3], rel=1)
    # even-size variant normalizes too
    k4 = generate_gaussian_kernel(1.0, 4)
    assert k4.sum() == pytest.approx(1.0)
    np.testing.assert_allclose(k4, k4[::-1])


def test_derivative_kernels():
    np.testing.assert_allclose(generate_derivative_kernel(1), [0.5, 0, -0.5])
    np.testing.assert_allclose(generate_derivative_kernel(2), [1, -2, 1])
    # Higher-order via Taylor matrix: 1st derivative, 5 taps
    k = generate_derivative_kernel(1, 5)
    np.testing.assert_allclose(k, [-1 / 12, 8 / 12, 0, -8 / 12, 1 / 12], atol=1e-12)
    assert k.sum() == pytest.approx(0.0, abs=1e-12)


def test_pyramid_kernel():
    np.testing.assert_allclose(generate_pyramid_smoothing_kernel(),
                               np.array([1, 4, 6, 4, 1]) / 16)


def test_log_kernel_zero_mean():
    k = generate_laplacian_of_gaussian_kernel(1.0, 7)
    assert k.sum() == pytest.approx(0.0, abs=1e-12)
    assert k[3, 3] < 0  # center of LoG is negative


def test_convolution_identity_and_shift():
    img = jnp.arange(25, dtype=jnp.float32).reshape(5, 5)
    ident = np.zeros((3, 3)); ident[1, 1] = 1
    out = convolution_filter(img, ident, 1, 1, edge="zero")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    # True convolution with an off-center delta shifts the image:
    # kernel(0,0)=1, origin (1,1): out(y,x) = src(y+1, x+1)... verify by formula
    delta = np.zeros((3, 3)); delta[0, 0] = 1
    out = convolution_filter(img, delta, 1, 1, edge="zero")
    expected = np.zeros((5, 5), np.float32)
    expected[:4, :4] = np.asarray(img)[1:, 1:]
    np.testing.assert_allclose(np.asarray(out), expected)


def test_separable_equals_full_2d():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((16, 16)), dtype=jnp.float32)
    xk = generate_gaussian_kernel(1.0)
    yk = generate_gaussian_kernel(1.5)
    sep = separable_convolution_filter(img, xk, yk, edge="zero")
    full = convolution_filter(img, np.outer(yk, xk), edge="zero")
    np.testing.assert_allclose(np.asarray(sep), np.asarray(full), atol=1e-5)


def test_derivative_filter_direction():
    # x-ramp: d/dx = 1 everywhere (interior); VW derivative kernel [0.5,0,-0.5]
    # convolved = central difference toward +x.
    ramp = jnp.arange(8, dtype=jnp.float32)[None, :].repeat(8, axis=0)
    out = derivative_filter(ramp, 1, 0)
    np.testing.assert_allclose(np.asarray(out)[:, 1:-1], 1.0, atol=1e-6)
    # y-ramp
    rampy = jnp.arange(8, dtype=jnp.float32)[:, None].repeat(8, axis=1)
    out = derivative_filter(rampy, 0, 1)
    np.testing.assert_allclose(np.asarray(out)[1:-1, :], 1.0, atol=1e-6)


def test_laplacian_filter_on_quadratic():
    # f = x^2 + y^2 -> discrete laplacian = 4 (interior)
    ys, xs = np.mgrid[0:8, 0:8].astype(np.float32)
    img = jnp.asarray(xs ** 2 + ys ** 2)
    out = laplacian_filter(img, edge="zero")
    np.testing.assert_allclose(np.asarray(out)[1:-1, 1:-1], 4.0, atol=1e-4)


def test_sobel_filter():
    ramp = jnp.arange(8, dtype=jnp.float32)[None, :].repeat(8, axis=0)
    out = sobel_filter(ramp, do_x_deriv=True)
    # The reference's sobel is a *true convolution* of the [-1 0 1; ...] kernel
    # (ConvolutionView rotates it 180 deg), so an increasing x-ramp yields -8.
    np.testing.assert_allclose(np.asarray(out)[1:-1, 1:-1], -8.0, atol=1e-5)


def test_gaussian_filter_constant_preserved():
    img = jnp.full((10, 10), 3.25, jnp.float32)
    out = gaussian_filter(img, 1.2)
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)


def test_gaussian_filter_channels():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((12, 12, 3)), dtype=jnp.float32)
    out = gaussian_filter(img, 1.0)
    assert out.shape == (12, 12, 3)
    per_channel = [np.asarray(gaussian_filter(img[..., c], 1.0)) for c in range(3)]
    np.testing.assert_allclose(np.asarray(out), np.stack(per_channel, -1), atol=1e-5)


def test_correlate_2d_symmetric_kernel_matches_convolution():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((9, 9)), dtype=jnp.float32)
    k = np.outer(generate_gaussian_kernel(1.0, 3), generate_gaussian_kernel(1.0, 3))
    np.testing.assert_allclose(np.asarray(correlate_2d(img, k, edge="zero")),
                               np.asarray(convolution_filter(img, k, edge="zero")),
                               atol=1e-5)
