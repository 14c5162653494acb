"""Measure the warp-once (VWTPU_EM_REWARP=0, production default) vs
faithful re-warp (VWTPU_EM_REWARP=1) disparity delta for the Bayes-EM
subpixel refiner on two realistic scenes — the evidence behind the default
(docs/parity.md "EM warp policy").

Scenes:
  * sinusoid — smoothly varying disparity field d(x,y) = (8 + 2 sin, sin)
    over a band-limited texture (the accuracy-suite scene at full frame).
  * dem      — disparity proportional to a smooth random heightfield
    (a rendered-DEM stand-in: low-frequency structure + local relief).

Protocol: integer seeds = round(true d) (what the integer correlator hands
the refiner), both modes run in SEPARATE subprocesses (the env var is baked
in at trace time), deltas on the commonly-valid interior. Prints one JSON
line per scene with |d_rw - d_wo| percentiles and each mode's |error| vs
ground truth.
"""

import json
import os
import subprocess
import sys

import numpy as np


def _scene(name: str, h: int, w: int):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(11)

    def tex(yy, xx):
        t = (np.sin(xx * 0.51) * np.cos(yy * 0.47)
             + 0.5 * np.sin(xx * 0.13 + 0.7) * np.cos(yy * 0.17)
             + 0.25 * np.sin(xx * 0.031 + yy * 0.045)
             + 0.1 * np.cos(xx * 0.9) * np.sin(yy * 0.83))
        return ((t + 1.85) / 3.7).astype(np.float32)

    if name == "sinusoid":
        dx = 8.0 + 2.0 * np.sin(xs * 0.011) * np.cos(ys * 0.013)
        dy = 0.8 * np.sin(xs * 0.017 + 0.3)
    else:   # dem: smooth random heightfield -> horizontal parallax
        f = rng.normal(size=(h // 16 + 1, w // 16 + 1)).astype(np.float32)
        from numpy.fft import irfft2, rfft2
        # upsample by zero-padded spectrum (cheap smooth interpolation)
        big = np.zeros((h, w), np.float32)
        import numpy as _np
        zoom_y = h / f.shape[0]
        yi = (np.arange(h) / zoom_y).astype(int).clip(0, f.shape[0] - 2)
        xi = (np.arange(w) / (w / f.shape[1])).astype(int).clip(0, f.shape[1] - 2)
        fy = (np.arange(h) / zoom_y) - yi
        fx = (np.arange(w) / (w / f.shape[1])) - xi
        a = f[yi][:, xi]
        b = f[yi][:, xi + 1]
        c = f[yi + 1][:, xi]
        d_ = f[yi + 1][:, xi + 1]
        big = (a * (1 - fx)[None] * (1 - fy)[:, None]
               + b * fx[None] * (1 - fy)[:, None]
               + c * (1 - fx)[None] * fy[:, None]
               + d_ * fx[None] * fy[:, None])
        dem = (big - big.min()) / (big.max() - big.min())
        dx = 6.0 + 6.0 * dem
        dy = np.zeros_like(dx)
    left = tex(ys, xs)
    # left(p) = right(p + d): sample the texture at the shifted coordinate
    right = tex(ys - dy, xs - dx)
    return left, right, np.stack([dx, dy], -1).astype(np.float32)


def run_mode(scene: str, rewarp: int, h: int, w: int):
    """Child process: one EM refinement with the given warp policy."""
    import jax.numpy as jnp
    from visionworkbench_tpu.stereo.correlation import DisparityMap
    from visionworkbench_tpu.stereo.subpixel_refine import bayes_em_subpixel

    base_scene = scene.replace("-noisy", "").replace("-block", "")
    left, right, truth = _scene(base_scene, h, w)
    seed = np.round(truth).astype(np.float32)
    if scene.endswith("-block"):
        # A contiguous 16x16 region mis-seeded by -2 px — the only
        # construction found that makes the two warp policies diverge
        # (isolated blunders stall identically in both modes before any
        # fold/clip can differ). Not producible by the integer correlator,
        # whose per-tile search bounds every seed to the search window.
        seed[h // 2:h // 2 + 16, w // 2:w // 2 + 16, 0] -= 2.0
    if scene.endswith("-noisy"):
        # Integer-correlator blunders: 15% of seeds off by +-1, 3% by +-2 —
        # the regime where the refined offset must travel past +-0.5 px and
        # warp-once clips at the stencil while faithful re-warp re-gathers.
        srng = np.random.default_rng(5)
        r = srng.random((h, w))
        off = np.zeros((h, w), np.float32)
        off[r < 0.15] = 1.0
        off[r < 0.075] = -1.0
        off[r < 0.03] = 2.0
        off[r < 0.015] = -2.0
        seed[..., 0] += off
    dm = DisparityMap(jnp.asarray(seed), jnp.ones((h, w), bool))
    out = bayes_em_subpixel(dm, jnp.asarray(left), jnp.asarray(right),
                            (15, 15), em_iters=2, outer_iters=10,
                            max_pyramid_levels=0)
    np.savez(f"/tmp/em_rewarp_{scene}_{rewarp}.npz",
             disp=np.asarray(out.disparity), valid=np.asarray(out.valid))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        run_mode(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
                 int(sys.argv[5]))
        return
    h = w = int(os.environ.get("VWTPU_EM_DELTA_SIZE", "512"))
    scenes = sys.argv[1:] or ["sinusoid", "dem", "sinusoid-noisy",
                              "dem-noisy", "sinusoid-block"]
    for scene in scenes:
        for rewarp in (0, 1):
            env = dict(os.environ, VWTPU_EM_REWARP=str(rewarp))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 scene, str(rewarp), str(h), str(w)],
                env=env, capture_output=True, text=True, timeout=3600)
            if r.returncode != 0:
                print(r.stdout[-2000:], r.stderr[-2000:])
                raise SystemExit(f"child failed: {scene} rewarp={rewarp}")
        a = np.load(f"/tmp/em_rewarp_{scene}_0.npz")
        b = np.load(f"/tmp/em_rewarp_{scene}_1.npz")
        _, _, truth = _scene(scene.replace("-noisy", "")
                             .replace("-block", ""), h, w)
        m = 16
        core = np.s_[m:h - m, m:w - m]
        va, vb = a["valid"][core], b["valid"][core]
        both = va & vb
        delta = np.abs(a["disp"][core] - b["disp"][core]).max(-1)[both]
        ea = np.abs(a["disp"][core] - truth[core]).max(-1)[va]
        eb = np.abs(b["disp"][core] - truth[core]).max(-1)[vb]
        print(json.dumps({
            "scene": scene, "n": int(both.sum()),
            "valid_frac_warponce": float(va.mean()),
            "valid_frac_rewarp": float(vb.mean()),
            "delta_med": float(np.median(delta)),
            "delta_p90": float(np.percentile(delta, 90)),
            "delta_p99": float(np.percentile(delta, 99)),
            "delta_max": float(delta.max()),
            "err_warponce_med": float(np.median(ea)),
            "err_warponce_p90": float(np.percentile(ea, 90)),
            "err_rewarp_med": float(np.median(eb)),
            "err_rewarp_p90": float(np.percentile(eb, 90)),
        }))


if __name__ == "__main__":
    main()
