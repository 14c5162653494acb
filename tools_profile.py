"""Device-side profile of the flagship pyramid-correlate pipeline.

Captures a ``jax.profiler`` trace of the bench workload (BASELINE.json
config-4 shape) and prints the top device ops by total time — the
profile-then-fix loop that drove the 3.6 -> 17 Mp/s bench progression
(see CLAUDE.md "perf lessons"). Works on the axon relay: the trace's
device lanes are real even though ``block_until_ready`` is not.

Usage: python tools_profile.py [--iters 2] [--top 30] [--size 1024]
"""

import argparse
import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict

import numpy as np


def _run_traced(size: int, iters: int, logdir: str, cost: str = "abs",
                census_window: int = 5):
    import jax
    import jax.numpy as jnp
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate
    import bench

    left_np, right_np = bench._make_pair(size, size)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)
    search = BBox2i(*bench.SEARCH)

    def forward(l, r):
        dm = pyramid_correlate(l, r, search, kernel_size=bench.KERNEL,
                               cost_type=cost, census_window=census_window,
                               max_pyramid_levels=bench.LEVELS, tile_size=64,
                               subpixel="parabola")
        return dm.disparity, dm.valid

    fn = jax.jit(forward)
    out = fn(left, right)
    _ = np.asarray(out[0])  # compile + warm outside the trace
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    for i in range(iters):
        out = fn(jnp.asarray(left_np + np.float32(i + 1) * 1e-6), right)
    _ = np.asarray(out[0])
    jax.profiler.stop_trace()


def _top_device_ops(logdir: str, top: int, iters: int):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    device_pids = set()
    for e in ev:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))):
            device_pids.add(e["pid"])
    total = defaultdict(float)
    count = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            total[e["name"]] += e.get("dur", 0.0)
            count[e["name"]] += 1
    rows = sorted(total.items(), key=lambda kv: -kv[1])[:top]
    tot_all = sum(total.values())
    print(f"{'ms/iter':>9}  {'%':>5}  {'calls':>6}  op")
    for name, us in rows:
        print(f"{us / 1e3 / iters:9.3f}  {100 * us / tot_all:5.1f}  "
              f"{count[name]:6d}  {name[:110]}")
    print(f"total device time: {tot_all / 1e3 / iters:.1f} ms/iter "
          f"over {iters} iters")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--cost", default="abs",
                    help="cost_type for pyramid_correlate (abs/ncc/census/...)")
    ap.add_argument("--census-window", type=int, default=5)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()
    logdir = args.logdir or tempfile.mkdtemp(prefix="vwtpu_trace_")
    _run_traced(args.size, args.iters, logdir, cost=args.cost,
                census_window=args.census_window)
    _top_device_ops(logdir, args.top, args.iters)


if __name__ == "__main__":
    main()
