"""Nearest-neighbor search (ref ``FLANNTree``, ``src/vw/Math/FLANNTree.h:32-111``).

The reference wraps FLANN's approximate kd-tree. On TPU the right primitive
is exact brute force on the MXU: all pairwise distances are one matmul and
``top_k`` gives the k nearest — faster than tree traversal for the problem
sizes the reference feeds it (descriptor sets of 10^3..10^5), and exact.
L2 and Hamming metrics match the reference's options.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from visionworkbench_tpu.core.exceptions import ArgumentErr


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_l2(data, queries, k: int):
    d2 = (jnp.sum(queries * queries, -1)[:, None]
          + jnp.sum(data * data, -1)[None, :]
          - 2.0 * queries @ data.T)
    neg, idx = lax.top_k(-d2, k)
    return idx, jnp.sqrt(jnp.maximum(-neg, 0.0))


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_hamming(data, queries, k: int):
    x = jnp.bitwise_xor(queries[:, None, :], data[None, :, :])
    dist = jnp.sum(lax.population_count(x).astype(jnp.int32), axis=-1)
    neg, idx = lax.top_k(-dist, k)
    return idx, -neg


class NearestNeighbors:
    """knn_search over a fixed dataset (ref ``FLANNTree::knn_search``)."""

    def __init__(self, data, metric: str = "l2"):
        if metric not in ("l2", "hamming"):
            raise ArgumentErr(f"unknown metric {metric!r}")
        self.metric = metric
        dtype = jnp.uint32 if metric == "hamming" else jnp.float32
        self.data = jnp.asarray(data, dtype)
        if self.data.ndim != 2:
            raise ArgumentErr("NearestNeighbors expects (N, D) data")

    def knn_search(self, queries, k: int = 1) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (indices (Q, k), distances (Q, k))."""
        dtype = jnp.uint32 if self.metric == "hamming" else jnp.float32
        q = jnp.asarray(queries, dtype)
        if q.ndim == 1:
            q = q[None]
        k = min(k, self.data.shape[0])
        if self.metric == "l2":
            idx, dist = _knn_l2(self.data, q, k)
        else:
            idx, dist = _knn_hamming(self.data, q, k)
        return np.asarray(idx), np.asarray(dist)

    @property
    def size(self) -> int:
        return int(self.data.shape[0])
