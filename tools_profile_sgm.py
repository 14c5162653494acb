"""Device-side profile + digest-sync timing of the SGM pipeline (the same
protocol as ``tools_profile.py`` / ``bench.py``: per-frame dispatch over
distinct inputs, synchronized by a host readback of a digest).

Usage: python tools_profile_sgm.py [--iters 4] [--top 25] [--size 512]
       [--algo sgm|mgm] [--profile]
"""

import argparse
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--algo", default="sgm", choices=["sgm", "mgm"])
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate
    import bench

    h = w = args.size
    left_np, right_np = bench._make_pair(h, w)
    search = BBox2i(0, -1, 64, 2)

    def forward(l, r):
        dm = pyramid_correlate(l, r, search, kernel_size=(5, 5),
                               max_pyramid_levels=4,
                               stereo_algorithm=args.algo,
                               subpixel="parabola")
        d = dm.disparity
        v = dm.valid
        return (jnp.sum(jnp.where(v, d[..., 0], 0.0))
                + jnp.sum(jnp.where(v, d[..., 1], 0.0)) + jnp.sum(v))

    fn = jax.jit(forward)
    lefts = [jnp.asarray(left_np + np.float32(i) * 1e-6)
             for i in range(args.iters + 1)]
    right = jnp.asarray(right_np)
    _ = float(fn(lefts[0], right))        # compile + warm

    # bench.py protocol: queue all frames, ONE final readback bounds the
    # queue (the relay's fixed ~26 ms roundtrip floor amortizes over iters;
    # executions serialize in order, so the last digest implies all ran).
    t0 = time.perf_counter()
    out = None
    for i in range(args.iters):
        out = fn(lefts[i + 1], right)
    digest = float(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"digest-sync: {h * w / dt / 1e6:.2f} Mp/s  ({dt * 1e3:.2f} ms/frame)"
          f"  [digest {digest:.1f}]")

    if args.profile:
        logdir = tempfile.mkdtemp(prefix="vwtpu_sgm_trace_")
        jax.profiler.start_trace(logdir, create_perfetto_link=False)
        out = fn(lefts[0], right)
        _ = float(out)
        jax.profiler.stop_trace()
        from tools_profile import _top_device_ops
        _top_device_ops(logdir, args.top, 1)


if __name__ == "__main__":
    main()
