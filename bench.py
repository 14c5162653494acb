"""Benchmark: stereo-correlation throughput (megapixels/s per chip).

Runs the flagship pyramid correlator (BASELINE.json config 4 shape: pyramid
block matching + parabola subpixel on a rectified pair) on the default JAX
device (the real TPU chip under the driver). The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` is measured in-run: the ratio of
TPU throughput to this machine's CPU throughput on the identical pipeline —
the CPU run standing in for the reference's multithreaded CPU execution model.

Timing protocol: per-frame dispatch over distinct inputs, synchronized by a
host readback of a digest that depends on every output pixel (the only real
barrier on the axon relay), plus an untimed full-output correctness check.
Digest (not full-map) readback keeps the test harness's ~310 MB/s relay
tunnel — not the chip's d2h path — out of the measurement; set
``VWTPU_BENCH_SHIP=1`` to include the full 9 MB/frame output transfer.

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
CPU_H = CPU_W = 1024         # CPU baseline: SAME frame + params (apples-to-
                             # apples pyramid depth / cache behavior; it runs
                             # after the TPU measurement, never concurrent)


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

    # Timed variant returns a digest that depends on every output pixel: the
    # scalar readback forces ALL queued executions to complete (honest
    # synchronization — on the axon relay `block_until_ready` does NOT
    # synchronize, so a host readback is the only real barrier) while keeping
    # the 9 MB/frame result out of the tunnel. The relay ships every call's
    # outputs through a ~310 MB/s test tunnel (~29 ms/frame measured) that is
    # not the chip's d2h path — a production host drains results at PCIe
    # rates overlapped with compute. Set VWTPU_BENCH_SHIP=1 to time with the
    # full per-frame output transfer included.
    ship = os.environ.get("VWTPU_BENCH_SHIP") == "1"

    def forward_digest(l, r):
        d, v = forward(l, r)
        return jnp.sum(d), jnp.sum(v)

    fn = jax.jit(forward if ship else forward_digest)
    fn_full = jax.jit(forward)
    # Time `iters` executions on DISTINCT inputs (defeats any identical-call
    # caching) with one final readback bounding the whole queue.
    lefts = [jnp.asarray(left_np + np.float32(i) * 1e-6) for i in range(iters + 1)]
    out = fn(lefts[0], right)
    _ = np.asarray(out[0])         # compile + warm with a real barrier
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = fn(lefts[i], right)
    _ = np.asarray(out[0])         # forces the whole queue
    dt = (time.perf_counter() - t0) / iters
    # Sanity (untimed): the full pipeline must produce a dense, correct
    # disparity field — guards against benchmarking a degenerate program.
    # Skipped in the CPU-baseline subprocess (a second multi-minute CPU
    # compile of the same program proves nothing).
    if os.environ.get("VWTPU_BENCH_CPU"):
        return (h * w) / dt / 1e6
    dfull, vfull = fn_full(lefts[0], right)
    dx = np.asarray(dfull)[..., 0]
    vv = np.asarray(vfull)
    core = np.s_[32:-32, 32:-32]
    frac = (np.abs(dx[core] - 16.0) < 0.5)[vv[core]].mean() if vv[core].any() else 0.0
    if vv[core].mean() < 0.5 or frac < 0.9:
        raise SystemExit(f"bench sanity failed: valid={vv[core].mean():.3f} "
                         f"correct={frac:.3f}")
    return (h * w) / dt / 1e6  # Mp/s


def main():
    if os.environ.get("VWTPU_BENCH_CPU"):
        print(json.dumps({"cpu_mps": _measure(CPU_H, CPU_W, 2)}))
        return

    # 24 frames: the relay's fixed ~26.5 ms readback floor amortizes to
    # ~1.1 ms/frame (at 8 it was ~3.3 — a pure harness artifact).
    mps = _measure(H, W, 24)

    # CPU reference-model baseline in a subprocess (forces the cpu platform).
    cpu_mps = None
    try:
        env = dict(os.environ, VWTPU_BENCH_CPU="1", JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=2400, cwd=os.path.dirname(os.path.abspath(__file__)))
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
