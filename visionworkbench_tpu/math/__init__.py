"""Numerics — TPU-native replacement for ``src/vw/Math/``."""

from visionworkbench_tpu.math.bbox import (
    BBox2, BBox2i, bounding_box, grow_bbox_to_int, subdivide_bbox,
)
