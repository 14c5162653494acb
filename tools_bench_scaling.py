"""Multi-chip scaling harness (BASELINE.json: Mp/s at 1 chip / 1 host /
N hosts with >= 85% linear scaling).

Only one physical chip is attached in this environment, so by default this
runs WEAK scaling on an N-device virtual CPU mesh (fresh process with
``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count``): each
device holds a fixed-size row band, and efficiency is
``throughput(N) / (N * throughput(1))``. On a real pod slice the same script
measures true multi-chip scaling (run under ``jax.distributed`` for
multi-host). Prints one JSON line per mesh size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--band-rows", type=int, default=256,
                   help="rows per device (weak scaling)")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (default: current)")
    p.add_argument("--engine", choices=["hier", "collar"], default="hier",
                   help="hier = banded pyramid w/ per-level halo exchange; "
                        "collar = per-band receptive-field recompute")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.parallel import (
        hierarchical_sharded_correlate, make_tile_mesh,
        sharded_pyramid_correlate,
    )

    n_avail = len(jax.devices())
    rng = np.random.default_rng(3)
    search = BBox2i(0, 0, 8, 2)
    kwargs = dict(kernel_size=(9, 9), max_pyramid_levels=1, tile_size=32,
                  refine_window=6, filter_half_kernel=2)
    results = {}
    for n in args.devices:
        if n > n_avail:
            continue
        h = args.band_rows * n
        w = args.width
        left = jnp.asarray(rng.random((h, w)), jnp.float32)
        right = jnp.asarray(rng.random((h, w)), jnp.float32)
        mesh = make_tile_mesh(n)
        corr = (hierarchical_sharded_correlate if args.engine == "hier"
                else sharded_pyramid_correlate)
        fn = jax.jit(lambda l, r: corr(l, r, search, mesh, **kwargs))
        iters = 3
        lefts = [jnp.asarray(rng.random((h, w)), jnp.float32)
                 for _ in range(iters)]
        dm = fn(lefts[0], right)
        _ = np.asarray(dm.disparity)  # compile + warm with a real barrier
        t0 = time.perf_counter()
        outs = [fn(lefts[i], right) for i in range(iters)]
        _ = np.asarray(outs[-1].disparity)
        dt = (time.perf_counter() - t0) / iters
        mps = h * w / dt / 1e6
        results[n] = mps
        eff = mps / (n * results[min(results)]) if min(results) != n else 1.0
        print(json.dumps({"devices": n, "rows": h, "mps": round(mps, 2),
                          "scaling_efficiency": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
