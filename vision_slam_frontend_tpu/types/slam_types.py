"""SLAM problem IR: host-side accumulation containers + device pytrees.

Host side (plain dataclasses over numpy): the pose-graph problem exactly as
the reference defines it — nodes with per-feature pixel + 3D point, vision
factors as cross-frame match lists, odometry factors as relative poses
(reference: src/slam_types.h:39-218). The host containers grow unboundedly as
the trajectory streams in; nothing here is traced.

Device side (flax.struct pytrees over fixed-capacity masked arrays): the
bundle-adjustment problem (`BAProblem`) with static shapes so it jits and
shards. The conversion host->device pads to capacity and carries validity
masks — the TPU-native answer to the reference's dynamic std::vectors.

Conventions:
  - quaternions are [w, x, y, z] (see geometry/rotation.py)
  - a RobotPose maps robot-frame points into the world frame
    (reference: src/slam_types.h:121-128)
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import numpy as np

from flax import struct

# ---------------------------------------------------------------------------
# Host-side containers (accumulation + serialization surface)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CameraExtrinsics:
    """Camera-to-robot transform; rotation in scaled axis-angle form
    (reference: src/slam_types.h:50-58)."""

    translation: np.ndarray  # (3,)
    rotation: np.ndarray  # (3,) scaled axis-angle


@dataclasses.dataclass
class VisionFeature:
    """One observed feature in a node (reference: src/slam_types.h:60-75).

    `pixel_right` is a framework extension the reference lacks: the matched
    right-camera pixel of the stereo pair, giving the BA backend a true
    stereo depth constraint (left-only observations are monocular and leave
    depth weakly constrained over short windows). None when unavailable.
    """

    feature_idx: int
    pixel: np.ndarray  # (2,)
    point3d: np.ndarray  # (3,) estimated 3D point in the camera frame
    pixel_right: Any = None  # (2,) or None


@dataclasses.dataclass
class FeatureMatch:
    """Feature index pair between an initial and current pose
    (reference: src/slam_types.h:77-89)."""

    feature_idx_initial: int
    feature_idx_current: int


@dataclasses.dataclass
class VisionFactor:
    """Cross-frame feature correspondence set (reference: src/slam_types.h:91-108)."""

    pose_idx_initial: int
    pose_idx_current: int
    feature_matches: List[FeatureMatch]


@dataclasses.dataclass
class RobotPose:
    """World-frame robot pose: loc (3,) + quaternion [w,x,y,z]
    (reference: src/slam_types.h:110-129)."""

    loc: np.ndarray  # (3,)
    angle: np.ndarray  # (4,) [w, x, y, z]


@dataclasses.dataclass
class OdometryFactor:
    """Relative pose from pose_i to pose_j, expressed in pose_i's frame
    (reference: src/slam_types.h:131-150)."""

    pose_i: int
    pose_j: int
    translation: np.ndarray  # (3,)
    rotation: np.ndarray  # (4,) [w, x, y, z]


@dataclasses.dataclass
class SLAMNode:
    """One pose-graph node (reference: src/slam_types.h:152-169)."""

    node_idx: int
    timestamp: float
    pose: RobotPose
    features: List[VisionFeature]


@dataclasses.dataclass
class SLAMProblem:
    """The frontend's output contract (reference: src/slam_types.h:171-187)."""

    nodes: List[SLAMNode] = dataclasses.field(default_factory=list)
    vision_factors: List[VisionFactor] = dataclasses.field(default_factory=list)
    odometry_factors: List[OdometryFactor] = dataclasses.field(default_factory=list)

    def summary(self) -> str:
        """The reference's end-of-run summary line
        (reference: src/slam_frontend_main.cc:375-381)."""
        n = len(self.nodes)
        return (
            "Saved SLAM problem with %d nodes, %d odometry factors, "
            "%d vision factors (%.2f/pose avg)"
            % (
                n,
                len(self.odometry_factors),
                len(self.vision_factors),
                (len(self.vision_factors) / (n - 1)) if n > 1 else 0.0,
            )
        )


@dataclasses.dataclass
class SLAMNodeSolution:
    """Solution container a backend fills in (reference: src/slam_types.h:190-218).

    pose = [tx, ty, tz, ax, ay, az] with rotation in scaled axis-angle.
    (The reference deliberately perturbs pose[5] by +0.02 as a solver seed; we
    keep the field layout but not the perturbation — callers can add their own
    initialization noise.)
    """

    node_idx: int
    timestamp: float
    pose: np.ndarray  # (6,)
    inverse_depths: np.ndarray  # (num_features,)
    point_in_map: np.ndarray  # (num_features,) bool

    @classmethod
    def from_node(cls, node: SLAMNode) -> "SLAMNodeSolution":
        from vision_slam_frontend_tpu.geometry.rotation import quat_to_axis_angle

        aa = np.asarray(quat_to_axis_angle(np.asarray(node.pose.angle, np.float32)))
        nf = len(node.features)
        return cls(
            node_idx=node.node_idx,
            timestamp=node.timestamp,
            pose=np.concatenate([np.asarray(node.pose.loc, np.float64), aa.astype(np.float64)]),
            inverse_depths=np.ones(nf, np.float64),
            point_in_map=np.zeros(nf, bool),
        )


# ---------------------------------------------------------------------------
# Device-side pytrees (fixed capacity + masks; jit/shard-safe)
# ---------------------------------------------------------------------------


@struct.dataclass
class BAProblem:
    """Bundle-adjustment problem as flat observation arrays.

    Built from a SLAMProblem by chaining vision-factor matches into landmark
    tracks (see backend/tracks.py). All arrays are padded to static capacity;
    `obs_mask` marks real observations. Shapes:

      poses_t:  (P, 3)   world translation per pose
      poses_q:  (P, 4)   world quaternion per pose
      pose_mask: (P,)
      landmarks: (L, 3)  world-frame 3D points
      landmark_mask: (L,)
      obs_pose:     (N,) int32 pose index per observation
      obs_landmark: (N,) int32 landmark index per observation
      obs_pixel:    (N, 2) undistorted left pixel observation
      obs_mask:     (N,)
      obs_pixel_right: (N, 2) undistorted right pixel (stereo constraint)
      obs_right_mask:  (N,) bool — right pixel available
      odom_i / odom_j: (Q,) int32
      odom_t: (Q, 3), odom_q: (Q, 4), odom_mask: (Q,)

    Optional gather-plan tables (built host-side; see backend/tracks.py):
    TPU scatter-adds serialize, so the solver's segment reductions run as
    dense gather+sum over these padded index tables instead —
      pose_obs: (P, max_obs_per_pose) int32 observation indices, row p lists
        the observations of pose p (pad entries point at a masked slot);
      pose_obs_mask: (P, max_obs_per_pose) bool;
      lm_obs / lm_obs_mask: same per landmark.
    When None, the solver falls back to scatter-based segment sums.
    """

    poses_t: Any
    poses_q: Any
    pose_mask: Any
    landmarks: Any
    landmark_mask: Any
    obs_pose: Any
    obs_landmark: Any
    obs_pixel: Any
    obs_mask: Any
    obs_pixel_right: Any = None
    obs_right_mask: Any = None
    odom_i: Any = None
    odom_j: Any = None
    odom_t: Any = None
    odom_q: Any = None
    odom_mask: Any = None
    pose_obs: Any = None
    pose_obs_mask: Any = None
    lm_obs: Any = None
    lm_obs_mask: Any = None
    # Optional (P,) bool: poses whose updates the solver zeroes (frozen).
    # Used by windowed local BA (older poses fixed) and map merging
    # (anchor session fixed). None = only the fix_first_pose gauge applies.
    pose_fixed: Any = None

    @property
    def num_poses(self) -> int:
        return self.poses_t.shape[0]

    @property
    def num_landmarks(self) -> int:
        return self.landmarks.shape[0]

    @property
    def num_observations(self) -> int:
        return self.obs_pixel.shape[0]
