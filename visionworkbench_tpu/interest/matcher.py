"""Descriptor matching (ref ``src/vw/InterestPoint/Matcher.h:56-260``).

The reference uses a FLANN kd-tree 2-NN + Lowe ratio test. On TPU, brute
force wins: all pairwise distances are one MXU matmul
(|a|^2 + |b|^2 - 2 a.b), top-2 via ``lax.top_k`` — exact (FLANN is
approximate), and batched. Constraints and bidirectional ("bimatch") modes
follow the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.interest.types import InterestPoints

DEFAULT_RATIO = 0.6  # ref InterestPointMatcher threshold


class Matches(NamedTuple):
    index1: jax.Array   # (K,) int32 into set 1
    index2: jax.Array   # (K,) int32 into set 2
    distance: jax.Array
    valid: jax.Array    # (K,) bool


@jax.jit
def _pairwise_sq_dists(d1, d2):
    n1 = (d1 * d1).sum(axis=1)[:, None]
    n2 = (d2 * d2).sum(axis=1)[None, :]
    cross = d1 @ d2.T
    return jnp.maximum(n1 + n2 - 2 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("bidirectional",))
def _match(d1, d2, v1, v2, ratio, bidirectional: bool):
    big = jnp.float32(1e30)
    dist = _pairwise_sq_dists(d1, d2)
    dist = jnp.where(v1[:, None] & v2[None, :], dist, big)
    neg_top2, idx_top2 = lax.top_k(-dist, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    nn = idx_top2[:, 0]
    # Lowe ratio on squared L2: ||a|| < r * ||b||  <=>  a2 < r^2 * b2.
    ok = (best < (ratio * ratio) * second) & v1 & (best < big)
    if bidirectional:
        rev_nn = jnp.argmin(dist, axis=0)
        ok = ok & (rev_nn[nn] == jnp.arange(d1.shape[0]))
    return nn, jnp.sqrt(best), ok


def match_points(p1: InterestPoints, p2: InterestPoints,
                 ratio: float = DEFAULT_RATIO,
                 bidirectional: bool = False) -> Matches:
    """2-NN ratio-test matching (ref ``InterestPointMatcher::operator()``,
    Matcher.h:157-260; 'bimatch' = bidirectional consistency)."""
    if p1.descriptor is None or p2.descriptor is None:
        raise ValueError("match_points: both point sets need descriptors")
    nn, d, ok = _match(p1.descriptor, p2.descriptor, p1.valid, p2.valid,
                       jnp.float32(ratio), bidirectional)
    idx1 = jnp.arange(p1.capacity, dtype=jnp.int32)
    return Matches(idx1, nn.astype(jnp.int32), d, ok)


def matched_coordinates(p1: InterestPoints, p2: InterestPoints,
                        m: Matches) -> Tuple[np.ndarray, np.ndarray]:
    """Host (N, 2) matched coordinate arrays (for RANSAC / transforms)."""
    ok = np.asarray(m.valid)
    i1 = np.asarray(m.index1)[ok]
    i2 = np.asarray(m.index2)[ok]
    pts1 = np.stack([np.asarray(p1.x)[i1], np.asarray(p1.y)[i1]], axis=-1)
    pts2 = np.stack([np.asarray(p2.x)[i2], np.asarray(p2.y)[i2]], axis=-1)
    return pts1, pts2
