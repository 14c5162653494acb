"""The array substrate — TPU-native replacement for ``src/vw/Image/``.

The reference's lazy CRTP view algebra becomes plain traced functions over
``jnp`` arrays; XLA fusion replaces view fusion, and the tiled execution
engine (BlockProcessor / BlockRasterizeView) is superseded by
:mod:`visionworkbench_tpu.parallel`'s sharded tile grids.
"""

from visionworkbench_tpu.image.types import MaskedImage, all_valid, as_float32, create_mask
from visionworkbench_tpu.image.edge import EDGE_MODES, crop_to_interior, edge_extend
from visionworkbench_tpu.image.interpolation import (
    interpolate, interpolate_image, pixel_buffer,
)
from visionworkbench_tpu.image.convolution import (
    convolution_filter, correlate_2d, separable_convolution_filter,
)
from visionworkbench_tpu.image.filters import (
    compute_kernel_size, derivative_filter, gaussian_derivative_filter,
    gaussian_filter, generate_derivative_kernel, generate_gaussian_kernel,
    generate_gaussian_derivative_kernel, generate_laplacian_of_gaussian_kernel,
    generate_pyramid_smoothing_kernel, laplacian_filter,
    laplacian_of_gaussian_filter, sobel_filter,
)
from visionworkbench_tpu.image.manipulation import (
    channels_to_planes, crop, flip_horizontal, flip_vertical, planes_to_channels,
    rotate_90_ccw, rotate_90_cw, rotate_180, select_channel, select_plane,
    subsample, transpose, upsample,
)
from visionworkbench_tpu.image.algorithms import (
    clamp, fill, is_opaque, is_transparent, nonzero_data_bounding_box,
    normalize, threshold,
)
from visionworkbench_tpu.image.statistics import (
    cdf_quantile, histogram, masked_max, masked_mean, masked_min, masked_stddev,
    max_pixel_value, mean_pixel_value, min_max_pixel_values, min_pixel_value,
    stddev_pixel_value, sum_of_pixel_values,
)
from visionworkbench_tpu.image.masks import (
    apply_mask, copy_mask, edge_mask, intersect_masks, invert_mask,
    masked_binary, masked_unary, union_masks,
)
