"""Correlation runtime cost model + search budgeting
(ref ``calc_seconds_per_op``, ``src/vw/Stereo/Correlation.cc:377-429`` and the
per-tile timeout ``CorrelationView.cc:621-637``).

The reference times a fake correlation to estimate seconds per
(pixel x disparity) op and aborts tile searches that would exceed
``corr_timeout``. Static shapes make mid-flight aborts untraceable on TPU, so
the budget is applied *up front*: measure s/op once, then clamp the search
volume (or tile size) so each dispatch fits the budget — the same
degrade-not-fail contract.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np


_seconds_per_op: Optional[float] = None


def calc_seconds_per_op(min_sample_seconds: float = 1.0) -> float:
    """Measure seconds per (pixel x disparity) op on the current device by
    running fake correlations of growing size until the sample takes at least
    ``min_sample_seconds`` (the reference's self-calibration loop)."""
    global _seconds_per_op
    import jax.numpy as jnp
    from visionworkbench_tpu.stereo.correlation import _best_of_search

    rng = np.random.default_rng(0)
    size = 128
    search = 4
    while True:
        left = jnp.asarray(rng.random((size, size)), dtype=jnp.float32)
        right = jnp.asarray(rng.random((size + search - 1, size + search - 1)),
                            dtype=jnp.float32)
        out = _best_of_search(left, right, search, search, 7, 7, "abs")
        _ = np.asarray(out[0])  # compile + warm with a real barrier
        t0 = time.perf_counter()
        out = _best_of_search(left, right, search, search, 7, 7, "abs")
        _ = np.asarray(out[0])
        dt = time.perf_counter() - t0
        ops = size * size * search * search
        if dt >= min_sample_seconds or size >= 2048:
            _seconds_per_op = dt / ops
            return _seconds_per_op
        size *= 2


def seconds_per_op() -> float:
    if _seconds_per_op is None:
        return calc_seconds_per_op(0.1)
    return _seconds_per_op


def estimate_search_time(pixels: int, search_volume: Tuple[int, int],
                         sec_per_op: Optional[float] = None) -> float:
    """Predicted seconds for a search (ref ``SearchParam::search_volume`` x
    s/op, CorrelationView.cc:621-624)."""
    spo = seconds_per_op() if sec_per_op is None else float(sec_per_op)
    return pixels * int(search_volume[0]) * int(search_volume[1]) * spo


def budget_search_volume(pixels: int, search_volume: Tuple[int, int],
                         corr_timeout: float,
                         sec_per_op: Optional[float] = None) -> Tuple[int, int]:
    """Shrink a (sx, sy) search so the predicted time fits ``corr_timeout``
    (<= 0 disables, like the reference). Shrinks the larger axis first,
    never below (1, 1) — degrading resolution of the search rather than
    failing, matching the reference's timeout contract
    (``CorrelationView.cc:621-637``: the reference skips whole zones when
    the estimate exceeds the budget; static shapes make a mid-flight skip
    untraceable, so the degrade is applied to the search volume up front)."""
    sx, sy = int(search_volume[0]), int(search_volume[1])
    if corr_timeout <= 0:
        return sx, sy
    while (estimate_search_time(pixels, (sx, sy), sec_per_op) > corr_timeout
           and (sx > 1 or sy > 1)):
        if sx >= sy and sx > 1:
            sx = max(sx // 2, 1)
        elif sy > 1:
            sy = max(sy // 2, 1)
    return sx, sy
