"""Census transforms (ref ``src/vw/Image/CensusTransform.h:44-300``).

Binary census at 3x3/5x5/7x7/9x9 and ternary census at the same sizes, with
the reference's exact sampling patterns and bit orders. Codes are packed into
one or two ``uint32`` words per pixel (the reference uses uint8/32/64 scalars;
TPU lanes are 32-bit, so multi-word packing is the native layout — hamming
costs sum ``lax.population_count`` over words).

Inputs are uint8-valued arrays (any integer/float array is truncated to int32
for comparisons, matching the reference's uint8 quantization done by callers —
see SGM's uint8 conversion). Output shape is (H, W, n_words) uint32; border
pixels within ``radius`` of the edge are computed against replicated edges and
should be masked by callers (the reference only evaluates interior pixels).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.image.edge import edge_extend

# The 32-position sparse 9x9 pattern (ref CensusTransform.h:130-155, from
# Hu et al., "Texture-aware dense image matching using ternary census
# transform"); offsets relative to center.
_PATTERN_9 = [
    (0, 0), (4, 0), (8, 0),
    (1, 1), (3, 1), (5, 1), (7, 1),
    (2, 2), (4, 2), (6, 2),
    (1, 3), (4, 3), (7, 3),
    (0, 4), (2, 4), (3, 4), (5, 4), (6, 4), (8, 4),
    (1, 5), (4, 5), (7, 5),
    (2, 6), (4, 6), (6, 6),
    (1, 7), (3, 7), (5, 7), (7, 7),
    (0, 8), (4, 8), (8, 8),
]

# The 32-position 7x7 ternary pattern (ref CensusTransform.h:232-250).
_PATTERN_7T = [
    (0, 0), (2, 0), (3, 0), (4, 0), (6, 0),
    (1, 1), (3, 1), (5, 1),
    (0, 2), (2, 2), (3, 2), (4, 2), (6, 2),
    (0, 3), (1, 3), (2, 3), (4, 3), (5, 3), (6, 3),
    (0, 4), (2, 4), (3, 4), (4, 4), (6, 4),
    (1, 5), (3, 5), (5, 5),
    (0, 6), (2, 6), (3, 6), (4, 6), (6, 6),
]


def _dense_positions(radius: int) -> List[Tuple[int, int]]:
    """Offsets in the reference's scan order for dense windows: r from +radius
    down to -radius, c from +radius down to -radius, skipping the center, with
    the bit addend doubling per visited position (CensusTransform.h:95-128)."""
    pos = []
    for r in range(radius, -radius - 1, -1):
        for c in range(radius, -radius - 1, -1):
            if r == 0 and c == 0:
                continue
            pos.append((c, r))
    return pos


def _census3x3_positions() -> List[Tuple[int, int]]:
    """3x3 order is distinct: bits 7..0 for (-1,-1),(0,-1),(1,-1),(-1,0),(1,0),
    (-1,1),(0,1),(1,1) (CensusTransform.h:64-77). Returned in ascending-bit
    order (i.e. reversed)."""
    descending = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]
    return list(reversed(descending))


def _shifted(padded, radius: int, dc: int, dr: int, h: int, w: int):
    return lax.dynamic_slice(padded, (radius + dr, radius + dc), (h, w))


def _pack_binary(img, positions, radius: int) -> jnp.ndarray:
    h, w = img.shape
    arr = jnp.asarray(img).astype(jnp.int32)
    padded = edge_extend(arr, x_pad=radius, y_pad=radius, mode="constant")
    center = arr
    n_words = (len(positions) + 31) // 32
    words = [jnp.zeros((h, w), jnp.uint32) for _ in range(n_words)]
    for bit, (dc, dr) in enumerate(positions):
        val = _shifted(padded, radius, dc, dr, h, w)
        word, off = bit // 32, bit % 32
        words[word] = words[word] | ((val > center).astype(jnp.uint32) << off)
    return jnp.stack(words, axis=-1)


def _pack_ternary(img, positions, radius: int, diff_threshold: int) -> jnp.ndarray:
    h, w = img.shape
    arr = jnp.asarray(img).astype(jnp.int32)
    padded = edge_extend(arr, x_pad=radius, y_pad=radius, mode="constant")
    center = arr
    low = center - diff_threshold
    high = center + diff_threshold
    n_bits = 2 * len(positions)
    n_words = (n_bits + 31) // 32
    words = [jnp.zeros((h, w), jnp.uint32) for _ in range(n_words)]
    for i, (dc, dr) in enumerate(positions):
        val = _shifted(padded, radius, dc, dr, h, w)
        lo_bit, hi_bit = 2 * i, 2 * i + 1
        lo = (val >= low).astype(jnp.uint32)      # += addend
        hi = (val > high).astype(jnp.uint32)      # += addend*2
        w_lo, o_lo = lo_bit // 32, lo_bit % 32
        w_hi, o_hi = hi_bit // 32, hi_bit % 32
        words[w_lo] = words[w_lo] | (lo << o_lo)
        words[w_hi] = words[w_hi] | (hi << o_hi)
    return jnp.stack(words, axis=-1)


def census_transform(img, window: int = 5) -> jnp.ndarray:
    """Binary census codes, packed uint32 words (ref ``get_census_value_*``).

    window 3 -> 8 bits (1 word), 5 -> 24 bits (1), 7 -> 48 bits (2),
    9 -> sparse 32-position pattern (1).
    """
    if window == 3:
        return _pack_binary(img, _census3x3_positions(), 1)
    if window == 5:
        return _pack_binary(img, _dense_positions(2), 2)
    if window == 7:
        return _pack_binary(img, _dense_positions(3), 3)
    if window == 9:
        pos = [(c - 4, r - 4) for (c, r) in _PATTERN_9]
        return _pack_binary(img, pos, 4)
    raise ArgumentErr(f"census window must be 3/5/7/9, got {window}")


def ternary_census_transform(img, window: int = 5, diff_threshold: int = 2) -> jnp.ndarray:
    """Ternary census codes: 2 bits per sample position
    (ref ``get_census_value_ternary_*``, CensusTransform.h:168-300)."""
    if window == 3:
        return _pack_ternary(img, _dense_positions(1), 1, diff_threshold)
    if window == 5:
        return _pack_ternary(img, _dense_positions(2), 2, diff_threshold)
    if window == 7:
        pos = [(c - 3, r - 3) for (c, r) in _PATTERN_7T]
        return _pack_ternary(img, pos, 3, diff_threshold)
    if window == 9:
        pos = [(c - 4, r - 4) for (c, r) in _PATTERN_9]
        return _pack_ternary(img, pos, 4, diff_threshold)
    raise ArgumentErr(f"ternary census window must be 3/5/7/9, got {window}")


def hamming_distance(codes_a, codes_b) -> jnp.ndarray:
    """Per-pixel hamming distance between packed census codes
    (ref ``hamming_distance``, CensusTransform.h — XOR + popcount)."""
    x = jnp.bitwise_xor(codes_a, codes_b)
    counts = lax.population_count(x)
    return jnp.sum(counts.astype(jnp.int32), axis=-1)


def census_radius(window: int) -> int:
    return window // 2
