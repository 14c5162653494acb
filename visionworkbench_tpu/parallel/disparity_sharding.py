"""Disparity-axis sharding of the correlation cost volume.

When the (dx, dy) search volume is too large for one chip's HBM/latency
budget, the disparity range is split across the ``disp`` mesh axis: each
device scans its contiguous slab of disparities with the running
(best, worst, argbest) carry from
:func:`visionworkbench_tpu.stereo.correlation._best_of_search`, then the slabs
are combined with an all-gather + in-order merge (SURVEY.md section 2.14;
the reference's sequential loop is ``Correlation.cc:62-119``).

Correctness of the parallel combine: the reference's sequential update rule
(strict-improve best / elif-update worst) reduces to
``best = min(costs)``, ``worst = max(costs)``, ``arg = first index achieving
best`` — all associative with an ordered merge — so sharding the scan is
exact, including first-best-wins tie-breaking (lowest-d slab wins ties) and
best==worst flat invalidation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from visionworkbench_tpu.core.exceptions import ArgumentErr
from visionworkbench_tpu.parallel.mesh import DISP_AXIS
from visionworkbench_tpu.stereo.correlation import (
    ABSOLUTE_DIFFERENCE, CROSS_CORRELATION, DisparityMap, _best_of_search,
)


def disparity_sharded_search(left, right, search_volume, kernel_size, mesh: Mesh,
                             cost_type: str = ABSOLUTE_DIFFERENCE,
                             census_window: int = 5) -> DisparityMap:
    """Disparity-sharded ``best_of_search_convolution``.

    Shapes follow the single-device contract: ``left`` (H, W), ``right``
    (H+sy-1, W+sx-1). The y-range ``sy`` is split evenly across the mesh's
    ``disp`` axis (row-of-search sharding keeps each slab's right-image slice
    contiguous); sy must divide by the axis size.
    """
    sx, sy = int(search_volume[0]), int(search_volume[1])
    kw, kh = int(kernel_size[0]), int(kernel_size[1])
    n = mesh.devices.size
    if sy % n != 0:
        raise ArgumentErr(f"disparity_sharded_search: sy={sy} must divide over "
                          f"{n} devices")
    sy_local = sy // n
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    h, w = left.shape
    if right.shape != (h + sy - 1, w + sx - 1):
        raise ArgumentErr("right must be (H+sy-1, W+sx-1)")
    is_max = cost_type == CROSS_CORRELATION

    def shard_fn(left_rep, right_rep):
        k = lax.axis_index(DISP_AXIS)
        dy0 = k * sy_local
        # Local slab of the right image: rows [dy0, dy0 + H + sy_local - 1)
        r_local = lax.dynamic_slice(right_rep, (dy0, 0),
                                    (h + sy_local - 1, w + sx - 1))
        disp, valid, best = _best_of_search(left_rep, r_local, sx, sy_local,
                                            kw, kh, cost_type, census_window)
        # Recover worst from the flat-region flag is lossy; recompute worst by
        # running max over the slab? _best_of_search returns best only, so
        # derive worst via a second pass is wasteful — instead use valid flag:
        # best==worst locally iff all slab costs equal. For the global merge
        # we need actual worst; get it from the returned cost stats.
        return disp, valid, best

    # _best_of_search returns best cost; we also need worst for the global
    # flat test. Gather (best, arg, local_worst) per slab. To obtain worst we
    # extend the scan: reuse the valid flag (valid == (best != worst)) is not
    # enough; so compute worst as the max cost via the same scan but inverted.
    # Simpler: run the merge on (best, disp, valid):
    #   global best/arg: ordered min-merge (ties -> lowest slab).
    #   global flat: all slabs flat AND all slab bests equal.
    def merged(left_rep, right_rep):
        disp, valid, best = shard_fn(left_rep, right_rep)
        k = lax.axis_index(DISP_AXIS)
        all_best = lax.all_gather(best, DISP_AXIS)            # (n, h', w')
        all_disp = lax.all_gather(disp, DISP_AXIS)            # (n, h', w', 2)
        all_valid = lax.all_gather(valid, DISP_AXIS)          # (n, h', w')
        if is_max:
            gbest = jnp.max(all_best, axis=0)
            win = all_best == gbest[None]
        else:
            gbest = jnp.min(all_best, axis=0)
            win = all_best == gbest[None]
        # first slab (lowest dy) achieving the global best wins ties
        slab_idx = jnp.argmax(win, axis=0)                    # (h', w')
        sel = jnp.take_along_axis(
            all_disp, slab_idx[None, ..., None].astype(jnp.int32), axis=0)[0]
        sel = sel + jnp.stack([jnp.zeros_like(slab_idx),
                               slab_idx * sy_local], axis=-1).astype(sel.dtype)
        # Global flat-region invalidation: every slab flat and all slab bests
        # identical -> all costs in the whole volume identical.
        all_flat = jnp.all(~all_valid, axis=0)
        same_best = jnp.all(all_best == all_best[0:1], axis=0)
        gvalid = ~(all_flat & same_best)
        sel = jnp.where(gvalid[..., None], sel, 0)
        return sel, gvalid

    spec_rep = P()  # replicate inputs across the disp axis
    # check_vma=False: every device computes the identical merged result (the
    # all_gather + in-order merge is deterministic), which the static
    # replication checker cannot infer from axis_index-dependent slicing.
    disp, valid = shard_map(merged, mesh=mesh,
                            in_specs=(spec_rep, spec_rep),
                            out_specs=(spec_rep, spec_rep),
                            check_vma=False)(left, right)
    return DisparityMap(disp, valid)
