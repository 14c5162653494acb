"""Camera-to-camera pixel mapping and undistortion warps
(ref ``src/vw/Camera/CameraTransform.h`` and ``tools/undistort_image.cc``).

``camera_transform_map`` maps destination pixels through dst.pixel_to_vector
-> src.point_to_pixel assuming a shared camera center (valid for
undistortion and epipolar rectification, the reference's uses); the result
feeds :func:`visionworkbench_tpu.image.transform.sample` as one fused warp.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from visionworkbench_tpu.camera.model import CameraModel
from visionworkbench_tpu.camera.pinhole import PinholeModel
from visionworkbench_tpu.camera.distortion import NullLensDistortion
from visionworkbench_tpu.image.transform import sample


def camera_transform_map(dst_cam: CameraModel, src_cam: CameraModel,
                         out_shape: Tuple[int, int]):
    """(sx, sy) source-pixel coordinate grids for each destination pixel."""
    oh, ow = int(out_shape[0]), int(out_shape[1])
    ys = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    pix = jnp.stack([xs, ys], -1)
    rays = dst_cam.pixel_to_vector(pix)
    center = dst_cam.camera_center()
    # Project a point far along each ray (pure-rotation assumption).
    pts = center + rays * 1.0e4
    src_pix = src_cam.point_to_pixel(pts)
    return src_pix[..., 0], src_pix[..., 1]


def camera_transform(image, src_cam: CameraModel, dst_cam: CameraModel,
                     out_shape: Optional[Tuple[int, int]] = None,
                     interp: str = "bilinear", edge: str = "zero"):
    """Warp ``image`` (taken by src_cam) into dst_cam's pixel space
    (ref ``camera_transform``, CameraTransform.h)."""
    image = jnp.asarray(image)
    if out_shape is None:
        out_shape = image.shape[:2]
    sx, sy = camera_transform_map(dst_cam, src_cam, out_shape)
    return sample(image, sx, sy, interp=interp, edge=edge)


def undistorted_camera(cam: PinholeModel) -> PinholeModel:
    """The same pinhole with distortion removed (ref ``undistort_image.cc``
    strip_distortion path)."""
    return PinholeModel(cam.C, cam.R, (cam.fu, cam.fv), (cam.cu, cam.cv),
                        NullLensDistortion(), cam.pixel_pitch)


def undistort_image(image, cam: PinholeModel, interp: str = "bilinear",
                    edge: str = "zero"):
    """Resample away lens distortion (ref ``tools/undistort_image.cc``)."""
    return camera_transform(image, cam, undistorted_camera(cam),
                            image.shape[:2] if hasattr(image, "shape") else None,
                            interp, edge)
