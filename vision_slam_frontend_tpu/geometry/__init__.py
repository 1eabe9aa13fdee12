"""Geometry: quaternion / SE(3) ops and the stereo camera model.

TPU-native replacement for the reference's Eigen usage
(reference: src/slam_types.h, src/slam_frontend.cc geometry math).
All functions are pure jnp, shape-polymorphic over leading batch dims where
documented, and safe under jit/vmap/grad.
"""

from vision_slam_frontend_tpu.geometry.rotation import (
    quat_identity,
    quat_normalize,
    quat_multiply,
    quat_conjugate,
    quat_inverse,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    quat_to_axis_angle,
    axis_angle_to_quat,
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    quat_angular_distance,
)
from vision_slam_frontend_tpu.geometry.se3 import (
    Pose3,
    pose_identity,
    pose_compose,
    pose_inverse,
    pose_relative,
    pose_transform_points,
)
from vision_slam_frontend_tpu.geometry.camera import (
    camera_matrix,
    project_points,
    distort_points,
    undistort_points,
    triangulate_points,
    fundamental_from_stereo,
    epipolar_residual,
)

__all__ = [
    "quat_identity",
    "quat_normalize",
    "quat_multiply",
    "quat_conjugate",
    "quat_inverse",
    "quat_rotate",
    "quat_to_matrix",
    "matrix_to_quat",
    "quat_to_axis_angle",
    "axis_angle_to_quat",
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "quat_angular_distance",
    "Pose3",
    "pose_identity",
    "pose_compose",
    "pose_inverse",
    "pose_relative",
    "pose_transform_points",
    "camera_matrix",
    "project_points",
    "distort_points",
    "undistort_points",
    "triangulate_points",
    "fundamental_from_stereo",
    "epipolar_residual",
]
