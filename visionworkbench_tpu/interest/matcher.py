"""Descriptor matching (ref ``src/vw/InterestPoint/Matcher.h:56-260``).

The reference uses a FLANN kd-tree 2-NN + Lowe ratio test. On TPU, brute
force wins: all pairwise distances are one MXU matmul
(|a|^2 + |b|^2 - 2 a.b), top-2 via ``lax.top_k`` — exact (FLANN is
approximate), and batched. The Hamming metric for binary descriptors
(``HammingMetric``, Matcher.h:63-68 + ``FLANNTree.h:32-111``) bit-unpacks
byte descriptors so hamming(a, b) = |a|_1 + |b|_1 - 2 a.b is ALSO one 0/1
matmul. The reference's match constraints (scale/orientation ratio windows
and position windows, ``Matcher.h:113-149``) are applied to each point's
nearest neighbor exactly like ``check_constraint`` (Matcher.h:262-277):
post-hoc on the top match, both directions when bidirectional.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple, Union

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


@dataclass(frozen=True)
class ScaleOrientationConstraint:
    """Allowed scale ratio / orientation delta between a point and its
    match (ref ``ScaleOrientationConstraint``, Matcher.h:113-130; defaults
    Matcher.cc:119-133 — orientation delta wrapped into [-pi, pi])."""
    scale_ratio_min: float = 0.9
    scale_ratio_max: float = 1.1
    ori_diff_min: float = -0.1
    ori_diff_max: float = 0.1

    def mask(self, base: InterestPoints, bi, test: InterestPoints, ti):
        """(test vs baseline) acceptance, vectorized over index arrays —
        baseline is the matched point, test the query, like the reference's
        ``check_constraint(nearest, ip)`` call order."""
        sr = test.scale[ti] / base.scale[bi]
        od = test.orientation[ti] - base.orientation[bi]
        od = jnp.where(od < -jnp.pi, od + 2 * jnp.pi, od)
        od = jnp.where(od > jnp.pi, od - 2 * jnp.pi, od)
        return ((sr >= self.scale_ratio_min) & (sr <= self.scale_ratio_max)
                & (od >= self.ori_diff_min) & (od <= self.ori_diff_max))


@dataclass(frozen=True)
class PositionConstraint:
    """Allowed (test - baseline) position window (ref
    ``PositionConstraint``, Matcher.h:132-149; Matcher.cc:136-147)."""
    min_x: float = -10.0
    max_x: float = 10.0
    min_y: float = -10.0
    max_y: float = 10.0

    def mask(self, base: InterestPoints, bi, test: InterestPoints, ti):
        dx = test.x[ti] - base.x[bi]
        dy = test.y[ti] - base.y[bi]
        return ((dx >= self.min_x) & (dx <= self.max_x)
                & (dy >= self.min_y) & (dy <= self.max_y))


Constraint = Union[ScaleOrientationConstraint, PositionConstraint]


@jax.jit
def _pairwise_sq_dists(d1, d2):
    n1 = (d1 * d1).sum(axis=1)[:, None]
    n2 = (d2 * d2).sum(axis=1)[None, :]
    cross = d1 @ d2.T
    return jnp.maximum(n1 + n2 - 2 * cross, 0.0)


@jax.jit
def _pairwise_hamming(d1, d2):
    """Pairwise hamming distances between byte-valued descriptors
    (each element an integer in [0, 256)): bit-unpack to (N, 8*D) 0/1
    planes, then hamming = |a|_1 + |b|_1 - 2 a.b — one MXU matmul, exact
    in fp32 (counts are small integers). Ref ``HammingMetric``,
    Matcher.cc:47-103 (XOR + popcount over packed bytes)."""
    def bits(d):
        b = d.astype(jnp.int32)
        shifts = jnp.arange(8, dtype=jnp.int32)
        planes = (b[..., None] >> shifts) & 1          # (N, D, 8)
        return planes.reshape(d.shape[0], -1).astype(jnp.float32)
    b1, b2 = bits(d1), bits(d2)
    n1 = b1.sum(axis=1)[:, None]
    n2 = b2.sum(axis=1)[None, :]
    cross = lax.dot_general(b1, b2, (((1,), (1,)), ((), ())),
                            precision=lax.Precision.HIGHEST)
    return n1 + n2 - 2.0 * cross


@functools.partial(jax.jit, static_argnames=("bidirectional", "metric"))
def _match(d1, d2, v1, v2, ratio, bidirectional: bool, metric: str = "l2"):
    big = jnp.float32(1e30)
    if metric == "hamming":
        dist = _pairwise_hamming(d1, d2)
    else:
        dist = _pairwise_sq_dists(d1, d2)
    dist = jnp.where(v1[:, None] & v2[None, :], dist, big)
    neg_top2, idx_top2 = lax.top_k(-dist, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    nn = idx_top2[:, 0]
    # Lowe ratio on squared L2: ||a|| < r * ||b||  <=>  a2 < r^2 * b2.
    # (Hamming is linear, so the ratio applies to the distance directly —
    # the reference compares whatever the metric returns, Matcher.h:374.)
    r2 = ratio if metric == "hamming" else ratio * ratio
    ok = (best < r2 * second) & v1 & (best < big)
    if bidirectional:
        rev_nn = jnp.argmin(dist, axis=0)
        ok = ok & (rev_nn[nn] == jnp.arange(d1.shape[0]))
    return nn, jnp.sqrt(best) if metric == "l2" else best, ok


def match_points(p1: InterestPoints, p2: InterestPoints,
                 ratio: float = DEFAULT_RATIO,
                 bidirectional: bool = False,
                 metric: str = "l2",
                 constraint: Optional[Constraint] = None) -> Matches:
    """2-NN ratio-test matching (ref ``InterestPointMatcher::operator()``,
    Matcher.h:157-260; 'bimatch' = bidirectional consistency).

    ``metric``: 'l2' (default) or 'hamming' (binary/byte descriptors).
    ``constraint``: optional :class:`ScaleOrientationConstraint` /
    :class:`PositionConstraint`, applied to each query's nearest neighbor
    exactly like the reference's ``check_constraint`` (baseline = the
    matched p2 point, test = the p1 query; both directions when
    ``bidirectional``)."""
    if p1.descriptor is None or p2.descriptor is None:
        raise ValueError("match_points: both point sets need descriptors")
    if metric not in ("l2", "hamming"):
        raise ValueError(f"match_points: unknown metric {metric!r}")
    nn, d, ok = _match(p1.descriptor, p2.descriptor, p1.valid, p2.valid,
                       jnp.float32(ratio), bidirectional, metric)
    idx1 = jnp.arange(p1.capacity, dtype=jnp.int32)
    if constraint is not None:
        cm = constraint.mask(p2, nn, p1, idx1)
        if bidirectional:
            cm = cm & constraint.mask(p1, idx1, p2, nn)
        ok = ok & cm
    return Matches(idx1, nn.astype(jnp.int32), d, ok)


def remove_duplicates(pts1: np.ndarray, pts2: np.ndarray):
    """Prune matches so no coordinate appears twice on EITHER side,
    keeping the LAST occurrence of each repeated coordinate (ref
    ``remove_duplicates``, Matcher.cc — reverse scan with (x, y) sets,
    order restored). Host-side on (N, 2) matched coordinate arrays (the
    form :func:`matched_coordinates` returns); returns filtered copies."""
    pts1 = np.asarray(pts1)
    pts2 = np.asarray(pts2)
    if pts1.shape != pts2.shape:
        raise ValueError("remove_duplicates: input arrays differ in shape")
    seen1, seen2 = set(), set()
    keep = []
    for j in range(len(pts1) - 1, -1, -1):
        k1 = (float(pts1[j, 0]), float(pts1[j, 1]))
        k2 = (float(pts2[j, 0]), float(pts2[j, 1]))
        if k1 in seen1 or k2 in seen2:
            continue
        seen1.add(k1)
        seen2.add(k2)
        keep.append(j)
    keep.reverse()
    return pts1[keep], pts2[keep]


def matched_coordinates(p1: InterestPoints, p2: InterestPoints,
                        m: Matches) -> Tuple[np.ndarray, np.ndarray]:
    """Host (N, 2) matched coordinate arrays (for RANSAC / transforms)."""
    ok = np.asarray(m.valid)
    i1 = np.asarray(m.index1)[ok]
    i2 = np.asarray(m.index2)[ok]
    pts1 = np.stack([np.asarray(p1.x)[i1], np.asarray(p1.y)[i1]], axis=-1)
    pts2 = np.stack([np.asarray(p2.x)[i2], np.asarray(p2.y)[i2]], axis=-1)
    return pts1, pts2
