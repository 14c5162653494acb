"""Device-side profiles for the tracked configs that lack one
(round-4 directives: config 5 mosaic, config 7 Bayes-EM, config 8 SIFT).

Same trace protocol as tools_profile.py (the parsing helper is imported
from there); workload construction mirrors tools_bench_configs.py exactly.

Usage: python tools_profile_config.py --config 7 [--iters 2] [--size 1024]
"""

from __future__ import annotations

import argparse
import tempfile

import numpy as np

from tools_profile import _top_device_ops


def _inputs(n):
    rng = np.random.default_rng(11)
    ys, xs = np.mgrid[0:n, 0:n + 80].astype(np.float32)
    tex = (np.sin(xs * 0.21) * np.cos(ys * 0.17)
           + 0.5 * np.sin(xs * 0.047 + ys * 0.031)
           + 0.3 * rng.random(xs.shape)).astype(np.float32)
    return tex, tex[:, :n], tex[:, 16:16 + n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, required=True, choices=[5, 6, 7, 8])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()
    logdir = args.logdir or tempfile.mkdtemp(prefix="vwtpu_trace_")

    import jax
    import jax.numpy as jnp

    n = args.size
    tex, left_np, right_np = _inputs(n)
    right = jnp.asarray(right_np)

    if args.config == 6:
        # Pyramid SGM, exactly the tools_bench_configs.py config-6 workload
        # (census 5x5, parabola subpixel, 64x2 search, frames at size/2).
        from visionworkbench_tpu.math.bbox import BBox2i
        from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate
        ns = max(n // 2, 128)
        sgm_right = jnp.asarray(right_np[:ns, :ns])
        sr6 = BBox2i(0, -1, 64, 2)

        def fwd(l, r):
            dm = pyramid_correlate(l, r, sr6, kernel_size=(5, 5),
                                   max_pyramid_levels=4,
                                   stereo_algorithm="sgm",
                                   subpixel="parabola")
            return dm.disparity, dm.valid
        ins = lambda i: (jnp.asarray(left_np[:ns, :ns]  # noqa: E731
                                     + np.float32(i + 1) * 1e-6), sgm_right)
    elif args.config == 7:
        from visionworkbench_tpu.math.bbox import BBox2i
        from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate
        sr7 = BBox2i(0, -4, 64, 8)

        def fwd(l, r):
            dm = pyramid_correlate(l, r, sr7, kernel_size=(7, 7),
                                   cost_type="census", census_window=5,
                                   max_pyramid_levels=4, tile_size=64,
                                   subpixel="em")
            return dm.disparity, dm.valid
        ins = lambda i: (jnp.asarray(left_np + np.float32(i + 1) * 1e-6), right)  # noqa: E731
    elif args.config == 8:
        from visionworkbench_tpu.interest import match_points
        from visionworkbench_tpu.interest.detector import detect_sift_like

        def fwd(a, b):
            pa = detect_sift_like(a, max_points=512)
            pb = detect_sift_like(b, max_points=512)
            return match_points(pa, pb, ratio=0.8)
        ins = lambda i: (jnp.asarray(left_np + np.float32(i + 1) * 1e-6), right)  # noqa: E731
    else:
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
        sh = int(n * 0.6)
        srcs = [jnp.asarray(tex[:sh, i * 7:i * 7 + sh] + i * 1e-4)
                for i in range(n_img)]
        plans = plan_reproject_grids(georefs, dst_g, (n, n))
        mesh = make_tile_mesh()

        def fwd(*imgs):
            return reproject_mosaic(list(imgs), georefs, dst_g, (n, n),
                                    levels=4, mesh=mesh, plans=plans)
        ins = lambda i: tuple(s + jnp.float32(i * 1e-6) for s in srcs)  # noqa: E731

    fn = jax.jit(fwd)
    out = fn(*ins(0))
    np.asarray(jax.tree.leaves(out)[0])     # compile + warm
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    for i in range(args.iters):
        out = fn(*ins(i + 1))
    np.asarray(jax.tree.leaves(out)[0])
    jax.profiler.stop_trace()
    _top_device_ops(logdir, args.top, args.iters)


if __name__ == "__main__":
    main()
