"""Stereo correlation — TPU-native replacement for ``src/vw/Stereo/``."""

from visionworkbench_tpu.stereo.prefilter import (
    PREFILTER_LOG, PREFILTER_MEANSUB, PREFILTER_MODES, PREFILTER_NONE,
    prefilter_image,
)
from visionworkbench_tpu.stereo.correlation import (
    ABSOLUTE_DIFFERENCE, CENSUS_TRANSFORM, COST_TYPES, CROSS_CORRELATION,
    DisparityMap, SQUARED_DIFFERENCE, TERNARY_CENSUS_TRANSFORM,
    best_of_search_convolution, calc_disparity,
)
from visionworkbench_tpu.stereo.subpixel import parabola_subpixel
from visionworkbench_tpu.stereo.disparity import (
    cross_corr_consistency_check, disparity_cleanup_using_thresh, disparity_mask,
    disparity_subsample, disparity_upsample, get_disparity_range,
    rm_outliers_using_thresh, std_dev_image, transform_disparities,
)
from visionworkbench_tpu.stereo.pyramid_correlation import (
    max_pyramid_levels_for, pyramid_correlate,
)
from visionworkbench_tpu.stereo.stereo_model import (
    StereoModel, triangulate_pair, triangulate_point_multiview,
)
from visionworkbench_tpu.stereo.sgm import calc_disparity_sgm
from visionworkbench_tpu.stereo.subpixel_refine import (
    affine_subpixel, lk_subpixel, phase_subpixel,
)
from visionworkbench_tpu.stereo.correval import corr_eval
