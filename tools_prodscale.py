"""Production-scale (4096^2) single-chip validation — VERDICT r4 item 2.

Runs the flagship pyramid correlator (abs + parabola), the census config,
and the hierarchical engine (single device) on a 4096^2 frame on the real
TPU chip: publishes Mp/s (queue digest-sync protocol), compile wall time,
and peak HBM if the runtime exposes memory stats. Numbers go into
docs/roofline.md "production scale".

Usage: python tools_prodscale.py [--size 4096] [--iters 6]
       [--configs flagship census hier]
"""

import argparse
import json
import time

import numpy as np


def _mem_stats():
    import jax
    try:
        s = jax.local_devices()[0].memory_stats()
        if s:
            return {k: v for k, v in s.items()
                    if "bytes" in k and "peak" in k or k == "bytes_in_use"}
    except Exception:
        pass
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--configs", nargs="+",
                    default=["flagship", "census", "hier"])
    args = ap.parse_args()
    n = args.size

    import jax
    import jax.numpy as jnp
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate

    rng = np.random.default_rng(7)
    ys, xs = np.mgrid[0:n, 0:n + 80].astype(np.float32)
    tex = (np.sin(xs * 0.21) * np.cos(ys * 0.17)
           + 0.5 * np.sin(xs * 0.047 + ys * 0.031)
           + 0.3 * rng.random(xs.shape)).astype(np.float32)
    left_np = tex[:, 16:16 + n]
    right = jnp.asarray(tex[:, :n])
    search = BBox2i(0, -4, 64, 8)

    def run(name, forward):
        def digest(l, r):
            d, v = forward(l, r)
            # correctness digest: valid fraction + fraction of valid core
            # pixels within 0.5 px of the embedded +16 shift (read with the
            # same single scalar barrier; no full-map relay shipping)
            core = (slice(32, -32), slice(32, -32))
            vc = v[core]
            ok = (jnp.abs(d[core + (0,)] - 16.0) < 0.5) & vc
            return (jnp.sum(d), jnp.mean(vc.astype(jnp.float32)),
                    jnp.sum(ok) / jnp.maximum(jnp.sum(vc), 1))
        fn = jax.jit(digest)
        lefts = [jnp.asarray(left_np + np.float32(i) * 1e-6)
                 for i in range(args.iters + 1)]
        t0 = time.perf_counter()
        out = fn(lefts[0], right)
        _ = np.asarray(out[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(1, args.iters + 1):
            out = fn(lefts[i], right)
        _ = np.asarray(out[0])
        dt = (time.perf_counter() - t0) / args.iters
        rec = {"config": name, "size": n,
               "mps": round(n * n / dt / 1e6, 2),
               "ms_per_frame": round(dt * 1e3, 1),
               "compile_s": round(compile_s, 1),
               "valid_frac": round(float(np.asarray(out[1])), 4),
               "correct_frac": round(float(np.asarray(out[2])), 4)}
        mem = _mem_stats()
        if mem:
            rec["memory"] = mem
        print(json.dumps(rec), flush=True)

    if "flagship" in args.configs:
        def fwd(l, r):
            dm = pyramid_correlate(l, r, search, kernel_size=(15, 15),
                                   max_pyramid_levels=4, tile_size=64,
                                   subpixel="parabola")
            return dm.disparity, dm.valid
        run("flagship-abs-parabola", fwd)

    if "census" in args.configs:
        def fwd_c(l, r):
            dm = pyramid_correlate(l, r, search, kernel_size=(15, 15),
                                   cost_type="census", census_window=5,
                                   max_pyramid_levels=4, tile_size=64,
                                   subpixel="parabola")
            return dm.disparity, dm.valid
        run("census-parabola", fwd_c)

    if "hier" in args.configs:
        from visionworkbench_tpu.parallel import (
            hierarchical_sharded_correlate, make_tile_mesh,
        )
        mesh = make_tile_mesh(1)

        def fwd_h(l, r):
            dm = hierarchical_sharded_correlate(
                l, r, search, mesh, kernel_size=(15, 15),
                max_pyramid_levels=4, tile_size=64, subpixel="parabola")
            return dm.disparity, dm.valid
        run("hierarchical-1dev", fwd_h)


if __name__ == "__main__":
    main()
