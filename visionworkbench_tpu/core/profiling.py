"""Tracing / profiling (SURVEY.md section 5; ref ``Stopwatch``/``Timer`` and
per-tile timing under ``VW_DEBUG_LEVEL``, ``CorrelationView.cc:836-845``).

TPU-native: ``trace()`` wraps ``jax.profiler`` (XProf traces viewable in
TensorBoard/Perfetto); :class:`RateCounter` tracks megapixels/s per pipeline
stage; ``timed_stage`` combines a stopwatch with a readback barrier so device
work is actually measured (on remote-relay platforms ``block_until_ready``
alone does not synchronize).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np

from visionworkbench_tpu.core.stopwatch import stopwatch_set


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace into ``logdir``."""
    import jax
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def materialize(tree):
    """Force execution + host transfer of every array in a pytree; returns
    the NumPy pytree. The only reliable device barrier across platforms."""
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class RateCounter:
    """Megapixels/s per named stage (the analogue of the reference's
    per-stage stopwatches + the Mp/s figures BASELINE.json asks for)."""

    def __init__(self):
        self._pixels: Dict[str, float] = {}
        self._seconds: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, pixels: int):
        sw = stopwatch_set().get(name)
        sw.start()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            sw.stop()
            self._pixels[name] = self._pixels.get(name, 0.0) + pixels
            self._seconds[name] = self._seconds.get(name, 0.0) + dt

    def rate(self, name: str) -> float:
        """Mp/s for a stage."""
        s = self._seconds.get(name, 0.0)
        return (self._pixels.get(name, 0.0) / 1e6 / s) if s > 0 else 0.0

    def report(self) -> str:
        lines = []
        for name in sorted(self._pixels):
            lines.append(f"{name}: {self.rate(name):.2f} Mp/s "
                         f"({self._pixels[name] / 1e6:.2f} Mp in "
                         f"{self._seconds[name]:.3f} s)")
        return "\n".join(lines)


@contextlib.contextmanager
def timed_stage(counter: RateCounter, name: str, pixels: int, result_holder: list):
    """Time a stage that produces device arrays: append the traced output to
    ``result_holder`` inside the block; it is materialized before the clock
    stops."""
    with counter.stage(name, pixels):
        yield
        if result_holder:
            result_holder[-1] = materialize(result_holder[-1])
