"""Benchmark: stereo-correlation throughput (megapixels/s per chip).

Runs the flagship pyramid correlator (BASELINE.json config 4 shape: pyramid
block matching + parabola subpixel on a rectified pair) on the default JAX
device (the real TPU chip under the driver). The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` is measured in-run: the ratio of
TPU throughput to this machine's CPU throughput on the identical pipeline —
the CPU run standing in for the reference's multithreaded CPU execution model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


# Bench configuration (shared by the TPU and CPU runs).
H = W = 1024
SEARCH = (0, -4, 64, 8)      # x_min, y_min, width, height
KERNEL = (15, 15)
LEVELS = 4
CPU_H = CPU_W = 256          # CPU baseline uses a smaller frame, same params


def _make_pair(h, w):
    rng = np.random.default_rng(7)
    ys, xs = np.mgrid[0:h, 0:w + 80].astype(np.float32)
    tex = (np.sin(xs * 0.21) * np.cos(ys * 0.17)
           + 0.5 * np.sin(xs * 0.047 + ys * 0.031)
           + 0.3 * rng.random(xs.shape)).astype(np.float32)
    # left(p) == right(p + d) with d = +16 — inside the search range
    # (convention: positive disparity = matching content shifted right in
    # the right image, as in the reference and tests/test_pyramid_correlation).
    left = tex[:, 16:16 + w]
    right = tex[:, :w]
    return left, right


def _measure(h, w, iters):
    import jax
    import jax.numpy as jnp
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate

    left_np, right_np = _make_pair(h, w)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)
    search = BBox2i(*SEARCH)

    def forward(l, r):
        dm = pyramid_correlate(l, r, search, kernel_size=KERNEL,
                               max_pyramid_levels=LEVELS, tile_size=64,
                               subpixel="parabola")
        return dm.disparity, dm.valid

    fn = jax.jit(forward)
    # Honest timing on remote-relay platforms (axon): block_until_ready does
    # NOT synchronize there, so execution must be forced by a host readback.
    # The chip runs queued programs serially, so timing `iters` executions on
    # DISTINCT inputs (defeats any identical-call caching) with one final
    # readback amortizes the relay transfer while still bounding all
    # executions.
    lefts = [jnp.asarray(left_np + np.float32(i) * 1e-6) for i in range(iters + 1)]
    out = fn(lefts[0], right)
    _ = np.asarray(out[0])         # compile + warm with a real barrier
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = fn(lefts[i], right)
    _ = np.asarray(out[0])         # forces the whole queue
    dt = (time.perf_counter() - t0) / iters
    return (h * w) / dt / 1e6  # Mp/s


def main():
    if os.environ.get("VWTPU_BENCH_CPU"):
        print(json.dumps({"cpu_mps": _measure(CPU_H, CPU_W, 2)}))
        return

    mps = _measure(H, W, 8)

    # CPU reference-model baseline in a subprocess (forces the cpu platform).
    cpu_mps = None
    try:
        env = dict(os.environ, VWTPU_BENCH_CPU="1", JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=1200, cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                cpu_mps = json.loads(line).get("cpu_mps")
    except Exception:
        cpu_mps = None

    vs = (mps / cpu_mps) if cpu_mps else 0.0
    print(json.dumps({
        "metric": "pyramid_correlate_throughput",
        "value": round(mps, 3),
        "unit": "Mp/s per chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
