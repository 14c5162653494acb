"""Two-process ``jax.distributed`` worker for the multi-host smoke test
(SURVEY.md section 2.14's multi-host mandate, exercised on CPU: 2 processes x
4 virtual devices = a real (host, chip) = (2, 4) global mesh with cross-
process collectives, the same code path a TPU pod slice runs over DCN+ICI).

Run by tests/test_multihost.py as:
    python tests/multihost_worker.py <process_id> <coordinator> <out_dir>

Checks, all under SPMD multi-controller rules (global arrays built with
``jax.make_array_from_callback``):
1. (host, chip) 2D mesh psum over both axes matches the local sum.
2. ``hierarchical_sharded_correlate`` over all 8 global devices (host-major
   1D tile mesh — the flattened (host, chip) product) agrees with the
   single-process monolithic ``pyramid_correlate`` on the same scene:
   integer winners + valid on >= 99% of interior pixels (the banded engine
   is exact away from band seams; seam-adjacent tiles may compute different
   per-tile search offsets — see docs/distributed.md "Parity semantics"),
   and >= 90% of valid pixels recover the embedded true shift.
3. Per-host tile writing: each process writes ONLY its addressable row-band
   shards; process 0 verifies the union covers the full frame.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid = int(sys.argv[1])
    coord = sys.argv[2]
    out_dir = sys.argv[3]
    jax.distributed.initialize(coord, num_processes=2, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4
    devices = np.array(jax.devices())          # process-major (host-major)

    # ---- 1. (host, chip) 2D mesh collective --------------------------------
    mesh2d = Mesh(devices.reshape(2, 4), ("host", "chip"))

    def both_axes_sum(x):
        return jax.lax.psum(jax.lax.psum(x, "chip"), "host")

    xs = np.arange(16.0, dtype=np.float32)
    sh2 = NamedSharding(mesh2d, P(("host", "chip")))
    gx = jax.make_array_from_callback((16,), sh2, lambda idx: xs[idx])
    tot = shard_map(lambda a: both_axes_sum(jnp.sum(a))[None],
                    mesh=mesh2d, in_specs=P(("host", "chip")),
                    out_specs=P(None), check_vma=False)(gx)
    np.testing.assert_allclose(np.asarray(tot)[0], xs.sum())

    # ---- 2. distributed == monolithic correlate ----------------------------
    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.parallel.mesh import TILE_AXIS
    from visionworkbench_tpu.parallel.hierarchical import (
        hierarchical_sharded_correlate,
    )
    from visionworkbench_tpu.stereo.pyramid_correlation import pyramid_correlate

    rng = np.random.default_rng(11)            # same seed on both processes
    h, w = 256, 96
    shift = (3, 1)
    sx, sy = 6, 3
    ys_g, xs_g = np.mgrid[0:h + sy + 8, 0:w + sx + 8].astype(np.float32)
    tex = (np.sin(xs_g * 0.33) * np.cos(ys_g * 0.27)
           + 0.4 * rng.random(xs_g.shape)).astype(np.float32)
    left = tex[:h, :w]
    right = tex[shift[1]:shift[1] + h, shift[0]:shift[0] + w].copy()
    sr = BBox2i(-sx, -sy, 2 * sx, 2 * sy)
    kwargs = dict(kernel_size=(7, 7), max_pyramid_levels=2, tile_size=16,
                  filter_half_kernel=5, subpixel="none")

    mesh1d = Mesh(devices, (TILE_AXIS,))       # host-major (host, chip) flat
    row_sh = NamedSharding(mesh1d, P(TILE_AXIS))

    def globalize(arr):
        return jax.make_array_from_callback(
            arr.shape, row_sh, lambda idx: arr[idx])

    gl = globalize(left)
    gr = globalize(right)
    glm = globalize(np.ones((h, w), bool))
    grm = globalize(np.ones((h, w), bool))
    dm = hierarchical_sharded_correlate(gl, gr, sr, mesh1d,
                                        left_mask=glm, right_mask=grm,
                                        **kwargs)

    from jax.experimental import multihost_utils
    disp = np.asarray(multihost_utils.process_allgather(dm.disparity,
                                                        tiled=True))
    valid = np.asarray(multihost_utils.process_allgather(dm.valid,
                                                         tiled=True))

    whole = pyramid_correlate(jnp.asarray(left), jnp.asarray(right), sr,
                              **kwargs)
    wd = np.asarray(whole.disparity)
    wv = np.asarray(whole.valid)
    core = np.s_[16:-16, 16:-16]
    both = valid[core] & wv[core]
    agree = (disp[core] == wd[core]).all(axis=-1)[both]
    assert agree.mean() > 0.99, f"agreement {agree.mean():.4f}"
    correct = ((disp[core][..., 0] == -shift[0])
               & (disp[core][..., 1] == -shift[1]))[valid[core]]
    assert correct.mean() > 0.9, f"correct {correct.mean():.4f}"

    # ---- 3. per-host shard writer ------------------------------------------
    # Each process writes only the row bands it actually holds.
    for shard in dm.disparity.addressable_shards:
        r0 = shard.index[0].start or 0
        np.save(os.path.join(out_dir, f"band_{r0:05d}.npy"),
                np.asarray(shard.data))
    multihost_utils.sync_global_devices("bands_written")
    if pid == 0:
        rows = 0
        for f in sorted(os.listdir(out_dir)):
            if f.startswith("band_"):
                rows += np.load(os.path.join(out_dir, f)).shape[0]
        assert rows == h, f"per-host tiles cover {rows}/{h} rows"
        print("MULTIHOST_PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
