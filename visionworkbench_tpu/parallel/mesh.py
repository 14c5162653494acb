"""Device meshes for tile and disparity sharding.

The reference's only parallelism is a thread pool pulling image tiles off a
shared cursor (``src/vw/Image/BlockProcessor.h:52-176``). The TPU-native
replacement is a ``jax.sharding.Mesh``: the ``"tile"`` axis distributes image
row-bands (data parallelism over the scene), and the ``"disp"`` axis
distributes the disparity search range of a cost volume too large for one
chip's HBM (SURVEY.md section 2.14). Multi-host: call
``jax.distributed.initialize`` first and these helpers pick up all devices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tile"
DISP_AXIS = "disp"


def make_tile_mesh(n_devices: Optional[int] = None,
                   devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the ``tile`` axis (image row-bands)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def make_disp_mesh(n_devices: Optional[int] = None,
                   devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the ``disp`` axis (disparity-range shards)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DISP_AXIS,))


def make_tile_disp_mesh(tile: int, disp: int,
                        devices: Optional[Sequence] = None) -> Mesh:
    """2D mesh: row-bands x disparity shards."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:tile * disp]).reshape(tile, disp)
    return Mesh(devices, (TILE_AXIS, DISP_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard an (H, W[, C]) array by rows over the tile axis."""
    return NamedSharding(mesh, P(TILE_AXIS))
