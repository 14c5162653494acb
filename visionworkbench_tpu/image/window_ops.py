"""Sliding-window algorithms and utility views
(ref ``src/vw/Image/WindowAlgorithms.h:37-124``, ``UtilityViews.h``,
``AntiAliasing.h``, ``Fourier.h:35-56``)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.image.filters import gaussian_filter
from visionworkbench_tpu.ops.box_filter import box_filter_same


def gaussian_blur_approx(img, sigma: float, passes: int = 3):
    """Iterated-box approximation of a Gaussian blur
    (ref ``gaussian_blur_approx``, WindowAlgorithms.h): box width chosen so
    ``passes`` box filters approximate sigma."""
    w = int(np.sqrt(12.0 * sigma * sigma / passes + 1))
    if w % 2 == 0:
        w += 1
    out = jnp.asarray(img, jnp.float32)
    for _ in range(passes):
        out = box_filter_same(out, w, w)
    return out


def median_filter(img, size: int = 3):
    """Windowed median via sort over unrolled window taps (the role of the
    reference's median window algorithm; static unroll keeps it TPU-friendly
    for the small sizes used)."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape
    pad = size // 2
    p = jnp.pad(img, pad, mode="edge")
    taps = []
    for dy in range(size):
        for dx in range(size):
            taps.append(lax.dynamic_slice(p, (dy, dx), (h, w)))
    stack = jnp.stack(taps)
    return jnp.median(stack, axis=0)


def constant_view(value, rows: int, cols: int, dtype=jnp.float32):
    """(ref ``constant_view``, UtilityViews.h)"""
    return jnp.full((rows, cols), value, dtype)


def uniform_noise_view(seed: int, rows: int, cols: int):
    """Deterministic uniform noise (ref ``uniform_noise_view`` — the
    correlator tests' synthetic source)."""
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, (rows, cols), jnp.float32)


def antialiased_downsample(img, factor: int):
    """Gaussian prefilter + subsample (ref ``AntiAliasing.h``)."""
    sigma = factor / 2.0
    return gaussian_filter(img, sigma)[::factor, ::factor]


# --------------------------------------------------------------------------
# Fourier helpers (ref Fourier.h — OpenCV DFT wrappers in the reference;
# jnp.fft natively here)
# --------------------------------------------------------------------------

def fft2(img):
    return jnp.fft.fft2(jnp.asarray(img, jnp.float32))


def ifft2(spec):
    return jnp.fft.ifft2(spec)


def fftshift(x):
    """(ref ``fftshift``, Fourier.h)"""
    return jnp.fft.fftshift(x)


def raised_cosine_window(rows: int, cols: int, beta: float = 0.35):
    """Separable raised-cosine window (ref the phase-correlation filter in
    Fourier.h)."""
    def rc(n):
        t = jnp.abs(jnp.linspace(-0.5, 0.5, n))
        a = (1 - beta) / 2
        edge = 0.5 * (1 + jnp.cos(jnp.pi * (t - a) / (0.5 - a)))
        return jnp.where(t <= a, 1.0, edge)
    return rc(rows)[:, None] * rc(cols)[None, :]
