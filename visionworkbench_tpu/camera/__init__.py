"""Camera models — TPU-native replacement for ``src/vw/Camera/``."""

from visionworkbench_tpu.camera.model import AdjustedCameraModel, CameraModel
from visionworkbench_tpu.camera.distortion import (
    BrownConradyDistortion, DISTORTION_TYPES, FisheyeDistortion, FovDistortion,
    NullLensDistortion, PhotometrixDistortion, TsaiLensDistortion,
)
from visionworkbench_tpu.camera.pinhole import (
    PinholeModel, read_pinhole_model, write_pinhole_model,
)
from visionworkbench_tpu.camera.cahv import (
    CAHVModel, CAHVOREModel, CAHVORModel, linearize_camera, pinhole_to_cahv,
    read_cahv_model, write_cahv_model,
)
from visionworkbench_tpu.camera.transform import (
    camera_transform, camera_transform_map, undistort_image, undistorted_camera,
)
from visionworkbench_tpu.camera.epipolar import epipolar_rectify
from visionworkbench_tpu.camera.exif import ExifView
from visionworkbench_tpu.camera.bayer import bayer_demosaic
from visionworkbench_tpu.camera.geometry import (
    camera_from_points, decompose_camera_matrix, fit_camera_matrix,
)
from visionworkbench_tpu.camera.optical_bar import OpticalBarModel
from visionworkbench_tpu.camera.linescan import (
    LinearTimeInterpolation, LinescanErr, TLCTimeInterpolation,
    apply_atmospheric_refraction_correction,
    apply_velocity_aberration_correction, linescan_point_to_pixel,
    saastamoinen_atmosphere_correction, transform_to_vector,
    vector_to_transform,
)
