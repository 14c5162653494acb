"""Geometry — TPU-native replacement for ``src/vw/Geometry/``."""

from visionworkbench_tpu.geometry.polygon import (
    Polygon, read_poly_file, write_poly_file,
)
from visionworkbench_tpu.geometry.spatial_tree import SpatialTree
from visionworkbench_tpu.geometry.frame_tree import ATrans, FrameStore, FrameTreeNode
