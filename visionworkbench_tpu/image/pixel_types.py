"""Pixel/color-space conversions (ref ``src/vw/Image/PixelTypes.h:101-``:
PixelGray[A]/RGB[A]/HSV/XYZ/Luv/Lab casts).

Channels-last arrays; all conversions vectorized jnp, RGB in [0, 1].
"""

from __future__ import annotations

import jax.numpy as jnp

from visionworkbench_tpu.core.exceptions import ArgumentErr


def rgb_to_gray(rgb):
    """Mean of channels (the reference's PixelGray cast averages channels)."""
    return jnp.mean(jnp.asarray(rgb, jnp.float32), axis=-1)


def gray_to_rgb(gray):
    g = jnp.asarray(gray, jnp.float32)
    return jnp.stack([g, g, g], -1)


def rgb_to_hsv(rgb):
    rgb = jnp.asarray(rgb, jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, -1)
    minc = jnp.min(rgb, -1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    h = jnp.where(maxc == r, (g - b) / safe % 6.0,
                  jnp.where(maxc == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0))
    h = jnp.where(delta > 0, h / 6.0, 0.0)
    return jnp.stack([h, s, v], -1)


def hsv_to_rgb(hsv):
    hsv = jnp.asarray(hsv, jnp.float32)
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], -1)


# sRGB <-> CIE XYZ (D65), the matrices the reference's PixelXYZ uses.
_RGB2XYZ = jnp.asarray([[0.4124564, 0.3575761, 0.1804375],
                        [0.2126729, 0.7151522, 0.0721750],
                        [0.0193339, 0.1191920, 0.9503041]], jnp.float32)
_XYZ2RGB = jnp.asarray([[3.2404542, -1.5371385, -0.4985314],
                        [-0.9692660, 1.8760108, 0.0415560],
                        [0.0556434, -0.2040259, 1.0572252]], jnp.float32)
_D65 = jnp.asarray([0.95047, 1.0, 1.08883], jnp.float32)


def rgb_to_xyz(rgb):
    return jnp.einsum("ij,...j->...i", _RGB2XYZ, jnp.asarray(rgb, jnp.float32))


def xyz_to_rgb(xyz):
    return jnp.einsum("ij,...j->...i", _XYZ2RGB, jnp.asarray(xyz, jnp.float32))


def _lab_f(t):
    d = 6.0 / 29.0
    return jnp.where(t > d ** 3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _lab_finv(t):
    d = 6.0 / 29.0
    return jnp.where(t > d, t ** 3, 3 * d * d * (t - 4.0 / 29.0))


def xyz_to_lab(xyz):
    xyz = jnp.asarray(xyz, jnp.float32) / _D65
    fx, fy, fz = _lab_f(xyz[..., 0]), _lab_f(xyz[..., 1]), _lab_f(xyz[..., 2])
    return jnp.stack([116.0 * fy - 16.0, 500.0 * (fx - fy),
                      200.0 * (fy - fz)], -1)


def lab_to_xyz(lab):
    lab = jnp.asarray(lab, jnp.float32)
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = fy + lab[..., 1] / 500.0
    fz = fy - lab[..., 2] / 200.0
    return jnp.stack([_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], -1) * _D65


def rgb_to_lab(rgb):
    return xyz_to_lab(rgb_to_xyz(rgb))


def lab_to_rgb(lab):
    return xyz_to_rgb(lab_to_xyz(lab))


def xyz_to_luv(xyz):
    xyz = jnp.asarray(xyz, jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    denom = jnp.maximum(x + 15 * y + 3 * z, 1e-12)
    up = 4 * x / denom
    vp = 9 * y / denom
    xn, yn, zn = [float(v) for v in _D65]
    dn = xn + 15 * yn + 3 * zn
    un, vn = 4 * xn / dn, 9 * yn / dn
    yr = y / yn
    l = jnp.where(yr > (6 / 29) ** 3, 116.0 * jnp.cbrt(yr) - 16.0,
                  (29 / 3) ** 3 * yr)
    u = 13 * l * (up - un)
    v = 13 * l * (vp - vn)
    return jnp.stack([l, u, v], -1)


def rgb_to_luv(rgb):
    return xyz_to_luv(rgb_to_xyz(rgb))


def weighted_rgb_to_gray(rgb, rw=0.30, gw=0.59, bw=0.11):
    """Luma-weighted gray (ref ``weighted_rgb_to_gray``)."""
    rgb = jnp.asarray(rgb, jnp.float32)
    return rw * rgb[..., 0] + gw * rgb[..., 1] + bw * rgb[..., 2]
