"""Numerics — TPU-native replacement for ``src/vw/Math/``."""

from visionworkbench_tpu.math.bbox import (
    BBox2, BBox2i, bounding_box, grow_bbox_to_int, subdivide_bbox,
)
from visionworkbench_tpu.math.transform2d import (
    AffineTransform, HomographyTransform, LinearTransform, ResampleTransform,
    RotateTransform, SimilarityTransform, Transform2D, TranslateTransform,
    compose, identity_transform,
)
from visionworkbench_tpu.math.geometry_fit import (
    fit_affine, fit_homography, fit_similarity, fit_translation,
    fit_translation_rotation,
)
from visionworkbench_tpu.math.ransac import ransac
from visionworkbench_tpu.math.optimization import (
    LMResult, conjugate_gradient, levenberg_marquardt, nelder_mead, newton_raphson,
)
from visionworkbench_tpu.math.quaternion import (
    axis_angle_to_quat, euler_to_quat, euler_to_rotation_matrix, matrix_to_quat,
    quat_conj, quat_mul, quat_normalize, quat_rotate, quat_to_axis_angle,
    quat_to_matrix, slerp,
)
