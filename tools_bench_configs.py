"""Per-config benchmarks for the five BASELINE.json workloads.

Prints one JSON line per config: {"config", "metric", "value", "unit"}.
Timing protocol matches ``bench.py``: jit once, warm once, then run
``iters`` executions on distinct inputs, synchronized by a host readback of
a scalar digest of the outputs (``jax.block_until_ready`` does not
synchronize on the axon relay, and full-output readbacks measure the
sandbox's ~310 MB/s tunnel rather than the chip — pass ``--ship`` to time
with output transfer included).

Run small shapes everywhere with ``--quick`` (CI / CPU smoke).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _timed(fn, inputs, readback, ship=False):
    """Digest-sync protocol (matches bench.py): jit a scalar digest of the
    outputs so the readback barrier forces every queued execution without
    measuring the sandbox's ~310 MB/s relay tunnel (not the chip's d2h
    path). ``ship=True`` restores full-output readback timing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if ship:
        timed_fn, force = fn, readback
    else:
        def digest(*args):
            out = fn(*args)
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(out))
        timed_fn, force = jax.jit(digest), lambda o: np.asarray(o)
    out = timed_fn(*inputs[0])
    force(out)
    t0 = time.time()
    for args in inputs:
        out = timed_fn(*args)
    force(out)
    return (time.time() - t0) / len(inputs)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="tiny shapes (smoke)")
    p.add_argument("--iters", type=int, default=24)  # amortize the relay~26.5 ms readback floor
    p.add_argument("--ship", action="store_true",
                   help="time full-output readback instead of the digest")
    p.add_argument("--configs", type=int, nargs="+",
                   default=[1, 2, 3, 4, 5, 6, 7, 8])
    p.add_argument("--cpu", action="store_true",
                   help="run on the host CPU (the same-frame reference-class "
                        "baseline; use few --iters). Output lines carry "
                        "platform=cpu. NEVER overlap with a TPU measurement.")
    p.add_argument("--inproc", action="store_true",
                   help="run the listed configs in THIS process (the child "
                        "mode; same-process A/Bs skewed round-2 numbers "
                        "99.8 -> 62 Mp/s, so the default launches one fresh "
                        "serial subprocess per config)")
    args = p.parse_args(argv)

    if not args.inproc and len(args.configs) > 1:
        # One fresh process per config — the documented measurement rule
        # (CLAUDE.md: engines/configs must be measured in separate
        # processes on an otherwise-idle host), applied uniformly so the
        # headline table is a single protocol.
        import subprocess
        rc = 0
        for c in args.configs:
            cmd = [sys.executable, __file__, "--configs", str(c), "--inproc",
                   "--iters", str(args.iters)]
            for flag, on in (("--quick", args.quick), ("--ship", args.ship),
                             ("--cpu", args.cpu)):
                if on:
                    cmd.append(flag)
            out = subprocess.run(cmd, capture_output=True, text=True)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
            if out.returncode != 0:
                print(out.stderr[-2000:], file=sys.stderr)
                rc = out.returncode
        return rc

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    n = 256 if args.quick else 1024
    rng = np.random.default_rng(11)
    ys, xs = np.mgrid[0:n, 0:n + 80].astype(np.float32)
    tex = (np.sin(xs * 0.21) * np.cos(ys * 0.17)
           + 0.5 * np.sin(xs * 0.047 + ys * 0.031)
           + 0.3 * rng.random(xs.shape)).astype(np.float32)
    left_np, right_np = tex[:, :n], tex[:, 16:16 + n]
    lefts = [jnp.asarray(left_np + i * 1e-6) for i in range(args.iters)]
    right = jnp.asarray(right_np)

    def report(config, value, unit):
        rec = {"config": config, "metric": "throughput",
               "value": round(value, 3), "unit": unit}
        if args.cpu:
            rec["platform"] = "cpu"
        print(json.dumps(rec), flush=True)

    if 1 in args.configs:
        # Config 1: separable Gaussian blur + 5-level pyramid.
        from visionworkbench_tpu.image.filters import gaussian_filter
        from visionworkbench_tpu.stereo.pyramid_correlation import _blur_downsample

        def pyr(img):
            out = [gaussian_filter(img, 1.5)]
            for _ in range(4):
                out.append(_blur_downsample(out[-1]))
            return tuple(out)

        fn = jax.jit(pyr)
        dt = _timed(fn, [(l,) for l in lefts], lambda o: np.asarray(o[-1]), ship=args.ship)
        report("gaussian+pyramid", n * n / dt / 1e6, "Mp/s")

    if 2 in args.configs:
        # Config 2: interest points + matching on a pair.
        from visionworkbench_tpu.interest import (
            describe, detect_points, match_points,
        )

        def ipmatch(a, b):
            # upright: single-scale harris points carry orientation 0 /
            # scale 1, so supports extract with dynamic slices (exact).
            pa = describe(a, detect_points(a, "harris", max_points=512,
                                           threshold=1e-8), upright=True)
            pb = describe(b, detect_points(b, "harris", max_points=512,
                                           threshold=1e-8), upright=True)
            m = match_points(pa, pb, ratio=0.8)
            return m

        fn = jax.jit(ipmatch)
        dt = _timed(fn, [(l, right) for l in lefts],
                    lambda o: np.asarray(jax.tree.leaves(o)[0]),
                    ship=args.ship)
        report("interest+match", 2 * n * n / dt / 1e6, "Mp/s")

    if 3 in args.configs:
        # Config 3: single-level SAD block matching, integer disparity.
        from visionworkbench_tpu.math.bbox import BBox2i
        from visionworkbench_tpu.stereo.correlation import calc_disparity

        rr = jnp.asarray(np.pad(right_np, ((0, 0), (0, 31)), mode="edge"))
        region = BBox2i(0, 0, n, n)

        def bm(l, r):
            dm = calc_disparity("abs", l, r, region, (32, 1), (15, 15))
            return dm.disparity, dm.valid

        fn = jax.jit(bm)
        dt = _timed(fn, [(l, rr) for l in lefts], lambda o: np.asarray(o[0]), ship=args.ship)
        report("single-level-bm", n * n / dt / 1e6, "Mp/s")

    if 4 in args.configs:
        # Config 4: full pyramid correlator, census + parabola.
        from visionworkbench_tpu.math.bbox import BBox2i
        from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate

        sr = BBox2i(0, -4, 64, 8)

        def corr(l, r):
            dm = pyramid_correlate(l, r, sr, kernel_size=(15, 15),
                                   cost_type="census", census_window=5,
                                   max_pyramid_levels=4, tile_size=64,
                                   subpixel="parabola")
            return dm.disparity, dm.valid

        fn = jax.jit(corr)
        dt = _timed(fn, [(l, right) for l in lefts], lambda o: np.asarray(o[0]), ship=args.ship)
        report("pyramid-census-parabola", n * n / dt / 1e6, "Mp/s")

    if 5 in args.configs:
        # Config 5 (BASELINE): multi-image (N=4) warp + mosaic compositing
        # with cartographic reprojection across sharded tiles —
        # GeoTransform reverse maps through the ApproximateTransform grid
        # (banded gather-free warps) + grassfire multiband Laplacian blend,
        # row-sharded over the device mesh (1 chip on the TPU bench; the
        # 8-device shard==whole test is tests/test_geomosaic.py).
        from visionworkbench_tpu.cartography.georeference import GeoReference
        from visionworkbench_tpu.mosaic.geomosaic import (
            plan_reproject_grids, reproject_mosaic,
        )
        from visionworkbench_tpu.parallel.mesh import make_tile_mesh

        def georef(scale, x0, y0):
            t = np.array([[scale, 0.0, x0], [0.0, -scale, y0],
                          [0.0, 0.0, 1.0]])
            return GeoReference(transform=t)

        n_img = 4
        dst_g = georef(0.01, 0.0, n * 0.01)
        specs = [(0.0102, -0.05 * n * 0.01, n * 0.0105),
                 (0.0098, 0.45 * n * 0.01, n * 0.0104),
                 (0.0101, -0.04 * n * 0.01, n * 0.0056),
                 (0.0099, 0.46 * n * 0.01, n * 0.0055)]
        georefs = [georef(*s) for s in specs]
        # Each source covers ~one quadrant (plus overlap) of the mosaic.
        sh = int(n * 0.6)
        srcs = [jnp.asarray(tex[:sh, i * 7:i * 7 + sh] + i * 1e-4)
                for i in range(n_img)]
        plans = plan_reproject_grids(georefs, dst_g, (n, n))
        mesh = make_tile_mesh()

        def mosaic(*imgs):
            return reproject_mosaic(list(imgs), georefs, dst_g, (n, n),
                                    levels=4, mesh=mesh, plans=plans)

        fn = jax.jit(mosaic)
        ins = [tuple(s + jnp.float32(i * 1e-6) for s in srcs)
               for i in range(args.iters)]
        dt = _timed(fn, ins, lambda o: np.asarray(jax.tree.leaves(o)[0]),
                    ship=args.ship)
        # Pixel-count definition: this config divides by OUTPUT CANVAS pixels
        # (n*n), like every other config. Rounds <= 2 divided by source
        # pixels (n_img*sh*sh ~ 1.47 Mp at n=1024, a 1.41x larger count) —
        # cross-round comparisons must rescale (110.7 source-Mp/s == 78.7
        # canvas-Mp/s).
        report("reproject+multiband-mosaic", n * n / dt / 1e6, "Mp/s")

    if 6 in args.configs:
        # Config 6: pyramid SGM (census 5x5, parabola subpixel, 64x2 search)
        # — the reference's marquee algorithm (SGM.cc). 512^2 frames: the
        # aggregation working set is ~4x the (H, W, sy, sx) volume.
        from visionworkbench_tpu.math.bbox import BBox2i
        from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate

        ns = max(n // 2, 128)
        sgm_left = [jnp.asarray(l[:ns, :ns]) for l in lefts]
        sgm_right = jnp.asarray(right_np[:ns, :ns])
        sr6 = BBox2i(0, -1, 64, 2)

        def sgm(l, r):
            dm = pyramid_correlate(l, r, sr6, kernel_size=(5, 5),
                                   max_pyramid_levels=4,
                                   stereo_algorithm="sgm",
                                   subpixel="parabola")
            return dm.disparity, dm.valid

        fn = jax.jit(sgm)
        dt = _timed(fn, [(l, sgm_right) for l in sgm_left],
                    lambda o: np.asarray(o[0]), ship=args.ship)
        report("pyramid-sgm", ns * ns / dt / 1e6, "Mp/s")

    if 7 in args.configs:
        # Config 7: full pyramid correlator + Bayes-EM affine subpixel
        # (the reference's quality mode, SubpixelView.h:128-146) at full
        # resolution — dense gather-free EM kernel, 7x7 window.
        from visionworkbench_tpu.math.bbox import BBox2i
        from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate

        sr7 = BBox2i(0, -4, 64, 8)

        def corr_em(l, r):
            dm = pyramid_correlate(l, r, sr7, kernel_size=(7, 7),
                                   cost_type="census", census_window=5,
                                   max_pyramid_levels=4, tile_size=64,
                                   subpixel="em")
            return dm.disparity, dm.valid

        fn = jax.jit(corr_em)
        dt = _timed(fn, [(l, right) for l in lefts],
                    lambda o: np.asarray(o[0]), ship=args.ship)
        report("pyramid-census-bayes-em", n * n / dt / 1e6, "Mp/s")

    if 8 in args.configs:
        # Config 8: SIFT-class pipeline — DoG scale-space detection +
        # oriented scale-normalized descriptors + matching (the reference
        # ipfind's default capability, ipfind.cc:61-229). Unlike config 2
        # (upright single-scale Harris), this is the rotation/scale-robust
        # path.
        from visionworkbench_tpu.interest import match_points
        from visionworkbench_tpu.interest.detector import detect_sift_like

        def sift_match(a, b):
            pa = detect_sift_like(a, max_points=512)
            pb = detect_sift_like(b, max_points=512)
            return match_points(pa, pb, ratio=0.8)

        fn = jax.jit(sift_match)
        dt = _timed(fn, [(l, right) for l in lefts],
                    lambda o: np.asarray(jax.tree.leaves(o)[0]),
                    ship=args.ship)
        report("sift+match", 2 * n * n / dt / 1e6, "Mp/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
