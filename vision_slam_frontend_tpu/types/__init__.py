"""SLAM data model (the IR): host-side problem containers + device pytrees."""

from vision_slam_frontend_tpu.types.slam_types import (
    CameraExtrinsics,
    VisionFeature,
    FeatureMatch,
    VisionFactor,
    RobotPose,
    OdometryFactor,
    SLAMNode,
    SLAMProblem,
    SLAMNodeSolution,
    BAProblem,
)

__all__ = [
    "CameraExtrinsics",
    "VisionFeature",
    "FeatureMatch",
    "VisionFactor",
    "RobotPose",
    "OdometryFactor",
    "SLAMNode",
    "SLAMProblem",
    "SLAMNodeSolution",
    "BAProblem",
]
