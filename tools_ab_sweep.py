"""Same-day A/B harness for the VMEM-resident sweep kernel vs the XLA
chunked-volume engine, one engine per PROCESS (same-process A/Bs skew the
second engine's numbers — measured on SGM, CLAUDE.md).

Digest-sync protocol (bench.py): queue iters executions, read ONE scalar
digest (the axon relay's ~26.5 ms readback floor would otherwise dominate).

Usage:
  python tools_ab_sweep.py --what stage        --engine pallas|xla
  python tools_ab_sweep.py --what stage-nopatch --engine pallas|xla
  python tools_ab_sweep.py --what ncc          --engine pallas|xla
  python tools_ab_sweep.py --what census7      --engine pallas|xla
Prints one JSON line {"what", "engine", "ms", "mps"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="stage",
                   choices=["stage", "stage-nopatch", "ncc", "census7"])
    p.add_argument("--engine", default="pallas", choices=["pallas", "xla"])
    p.add_argument("--iters", type=int, default=24)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--boxsum", default=None,
                   help="pallas boxsum mode (matmul/roll/roll_cols/roll_rows)")
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--tile-w", type=int, default=None)
    args = p.parse_args(argv)

    import os
    os.environ["VWTPU_SWEEP_PALLAS"] = "1" if args.engine == "pallas" else "0"

    import jax
    import jax.numpy as jnp

    n = args.size
    rng = np.random.default_rng(11)
    ys, xs = np.mgrid[0:n, 0:n + 80].astype(np.float32)
    tex = (np.sin(xs * 0.21) * np.cos(ys * 0.17)
           + 0.5 * np.sin(xs * 0.047 + ys * 0.031)
           + 0.3 * rng.random(xs.shape)).astype(np.float32)
    left_np, right_np = tex[:, :n], tex[:, 16:16 + n]

    if args.what in ("stage", "stage-nopatch"):
        # The flagship level-0 patches stage in isolation: 64-px tiles,
        # 15x15 kernel, 11x8 refine window (+ parabola ring with patches).
        tile, kw, kh, s_x, s_y = args.tile, 15, 15, 11, 8
        want_patches = args.what == "stage"
        ring = 1 if want_patches else 0
        tw = args.tile_w or tile
        nty, ntx = n // tile, n // tw
        lh = nty * tile + kh - 1
        lw = ntx * tw + kw - 1
        base = jnp.asarray(np.pad(left_np, ((0, lh - n), (0, lw - n)),
                                  mode="edge"))
        mh = lh + s_y - 1 + 2 * ring
        mw = lw + s_x - 1 + 2 * ring
        match = jnp.asarray(np.pad(right_np, ((0, mh - n), (0, mw - n)),
                                   mode="edge"))
        offsets = jnp.zeros((nty, ntx, 2), jnp.int32)
        if args.engine == "pallas":
            from visionworkbench_tpu.ops.sweep import pallas_sweep

            def run(b):
                return pallas_sweep(b, match, offsets, tile, s_x, s_y,
                                    kw, kh, "abs", want_patches=want_patches,
                                    boxsum=args.boxsum, tile_w=args.tile_w)
        else:
            from visionworkbench_tpu.stereo.pyramid_correlation import (
                _tiled_search, _tiled_search_patches,
            )

            if want_patches:
                def run(b):
                    return _tiled_search_patches(b, match, offsets, tile,
                                                 s_x, s_y, kw, kh, "abs")
            else:
                def run(b):
                    return _tiled_search(b, match, offsets, tile,
                                         s_x, s_y, kw, kh, "abs", 5)

        def digest(b):
            out = run(b)
            return sum(jnp.sum(jnp.asarray(o, jnp.float32))
                       for o in out if o is not None)
    else:
        # Single-level BM through calc_disparity (config-3 class): NCC or
        # census-7, 32x1 search, 15x15 kernel.
        from visionworkbench_tpu.math.bbox import BBox2i
        from visionworkbench_tpu.stereo.correlation import calc_disparity

        cost = "ncc" if args.what == "ncc" else "census"
        cw = 7 if args.what == "census7" else 5
        rr = jnp.asarray(np.pad(right_np, ((0, 0), (0, 31)), mode="edge"))
        region = BBox2i(0, 0, n, n)

        def digest(b):
            dm = calc_disparity(cost, b, rr, region, (32, 1), (15, 15),
                                census_window=cw)
            return (jnp.sum(dm.disparity.astype(jnp.float32))
                    + jnp.sum(dm.valid))

    fn = jax.jit(digest)
    lefts = [jnp.asarray(left_np + i * 1e-6) for i in range(args.iters)]
    out = fn(lefts[0])
    np.asarray(out)          # compile + warm
    t0 = time.time()
    for b in lefts:
        out = fn(b)
    np.asarray(out)          # one readback bounds the whole queue
    dt = (time.time() - t0) / args.iters
    print(json.dumps({"what": args.what, "engine": args.engine,
                      "ms": round(dt * 1e3, 3),
                      "mps": round(n * n / dt / 1e6, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
