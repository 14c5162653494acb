"""Mosaicking — TPU-native replacement for ``src/vw/Mosaic/``."""

from visionworkbench_tpu.mosaic.composite import (
    ImageComposite, blend_levels_for, collapse_pyramid, feather_blend,
    gaussian_pyramid, laplacian_pyramid, multiband_blend,
)
from visionworkbench_tpu.mosaic.quadtree import (
    QuadTreeGenerator, default_image_path, write_kml_superoverlay,
)
from visionworkbench_tpu.mosaic.pyramid import DiskImagePyramid
from visionworkbench_tpu.mosaic.geomosaic import (
    plan_reproject_grids, reproject_mosaic,
)
