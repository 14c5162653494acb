"""Distributed execution: device meshes, tile sharding with halo exchange,
disparity-axis cost-volume sharding — the TPU-native replacement for the
reference's thread-pool tile engine (``src/vw/Image/BlockProcessor.h``,
SURVEY.md section 2.14)."""

from visionworkbench_tpu.parallel.mesh import (
    DISP_AXIS, TILE_AXIS, make_disp_mesh, make_tile_disp_mesh, make_tile_mesh,
    row_sharding,
)
from visionworkbench_tpu.parallel.tile_sharding import (
    halo_exchange_rows, map_overlap, sharded_pyramid_correlate,
)
from visionworkbench_tpu.parallel.disparity_sharding import disparity_sharded_search
from visionworkbench_tpu.parallel.hierarchical import hierarchical_sharded_correlate
