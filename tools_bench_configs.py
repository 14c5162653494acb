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
    p.add_argument("--configs", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    args = p.parse_args(argv)

    import jax
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
        print(json.dumps({"config": config, "metric": "throughput",
                          "value": round(value, 3), "unit": unit}), flush=True)

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
        # Config 5: homography warp of two images + feathered mosaic.
        from visionworkbench_tpu.image.transform import transform
        from visionworkbench_tpu.math.transform2d import HomographyTransform
        from visionworkbench_tpu.mosaic.composite import feather_blend

        hmat = HomographyTransform(np.array([[1.0, 0.01, 4.0],
                                             [-0.008, 1.0, 2.0],
                                             [1e-6, 0.0, 1.0]]))

        def mosaic(a, b):
            wa = transform(a, hmat, (n, n), "bilinear")
            return feather_blend([wa, b],
                                 [jnp.ones((n, n), bool), jnp.ones((n, n), bool)])

        fn = jax.jit(mosaic)
        dt = _timed(fn, [(l, right) for l in lefts],
                    lambda o: np.asarray(jax.tree.leaves(o)[0]),
                    ship=args.ship)
        report("warp+mosaic", 2 * n * n / dt / 1e6, "Mp/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
