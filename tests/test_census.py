"""Census transform tests against a direct NumPy re-derivation of the
reference's bit patterns (``src/vw/Image/CensusTransform.h:64-300``)."""

import numpy as np
import jax.numpy as jnp

from visionworkbench_tpu.image.census import (
    census_transform, hamming_distance, ternary_census_transform,
)


def _np_census3(img, c, r):
    # ref get_census_value_3x3: bits 128..1 in fixed neighbor order
    center = img[r, c]
    bits = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]
    out = 0
    addend = 128
    for dc, dr in bits:
        if img[r + dr, c + dc] > center:
            out += addend
        addend //= 2
    return out


def _np_census_dense(img, c, r, radius):
    # ref get_census_value_5x5/7x7: r,c descending from +radius, skip center
    center = img[r, c]
    out = 0
    addend = 1
    for dr in range(radius, -radius - 1, -1):
        for dc in range(radius, -radius - 1, -1):
            if dr == 0 and dc == 0:
                continue
            if img[r + dr, c + dc] > center:
                out += addend
            addend *= 2
    return out


def _unpack(codes, y, x):
    words = np.asarray(codes)[y, x]
    val = 0
    for i, w in enumerate(words):
        val |= int(w) << (32 * i)
    return val


def test_census3x3_matches_reference_bits(rng):
    img = (rng.random((9, 9)) * 255).astype(np.int32)
    codes = census_transform(jnp.asarray(img), 3)
    for (y, x) in [(2, 2), (4, 5), (6, 3)]:
        assert _unpack(codes, y, x) == _np_census3(img, x, y)


def test_census5x5_and_7x7_match_reference_bits(rng):
    img = (rng.random((15, 15)) * 255).astype(np.int32)
    c5 = census_transform(jnp.asarray(img), 5)
    c7 = census_transform(jnp.asarray(img), 7)
    for (y, x) in [(4, 4), (7, 8), (9, 5)]:
        assert _unpack(c5, y, x) == _np_census_dense(img, x, y, 2)
        assert _unpack(c7, y, x) == _np_census_dense(img, x, y, 3)


def test_ternary_census_3x3_bits(rng):
    img = (rng.random((9, 9)) * 255).astype(np.int32)
    t = 2
    codes = ternary_census_transform(jnp.asarray(img), 3, t)
    y, x = 4, 4
    center = img[y, x]
    out = 0
    addend = 1
    for dr in range(1, -2, -1):
        for dc in range(1, -2, -1):
            if dr == 0 and dc == 0:
                continue
            val = img[y + dr, x + dc]
            if val >= center - t:
                out += addend
                if val > center + t:
                    out += addend * 2
            addend *= 4
    assert _unpack(codes, y, x) == out


def test_hamming_distance():
    a = jnp.asarray(np.array([[[0b1010]]], np.uint32).reshape(1, 1, 1))
    b = jnp.asarray(np.array([[[0b0110]]], np.uint32).reshape(1, 1, 1))
    assert int(hamming_distance(a, b)[0, 0]) == 2
    # identical codes -> 0
    img = jnp.asarray((np.arange(81).reshape(9, 9) * 7 % 255).astype(np.int32))
    c = census_transform(img, 5)
    assert int(hamming_distance(c, c).sum()) == 0


def test_census_shift_invariance(rng):
    # census codes of a shifted image equal shifted census codes (interior)
    img = (rng.random((20, 20)) * 255).astype(np.int32)
    c_full = np.asarray(census_transform(jnp.asarray(img), 5))
    c_crop = np.asarray(census_transform(jnp.asarray(img[3:, 2:]), 5))
    np.testing.assert_array_equal(c_full[5:18, 4:18], c_crop[2:15, 2:16])
