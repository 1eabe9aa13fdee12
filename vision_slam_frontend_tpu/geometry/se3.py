"""SE(3) rigid transforms as (translation, quaternion) pytrees.

TPU-native analogue of the reference's Eigen::Affine3f usage for robot poses
and camera extrinsics (reference: src/slam_types.h:110-129, src/slam_frontend.cc:444-446,
:311-321). A Pose3 maps points from its local frame to the parent frame:
``x_parent = R(q) @ x_local + t``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from vision_slam_frontend_tpu.geometry.rotation import (
    quat_identity,
    quat_inverse,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
)


@struct.dataclass
class Pose3:
    """Rigid transform: translation (..., 3) + unit quaternion (..., 4) [w,x,y,z]."""

    t: Any  # (..., 3)
    q: Any  # (..., 4)

    def as_matrix(self) -> jnp.ndarray:
        """(..., 4, 4) homogeneous matrix."""
        r = quat_to_matrix(self.q)
        top = jnp.concatenate([r, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)


def pose_identity(dtype=jnp.float32) -> Pose3:
    return Pose3(t=jnp.zeros(3, dtype=dtype), q=quat_identity(dtype))


def pose_compose(a: Pose3, b: Pose3) -> Pose3:
    """a ∘ b: apply b first, then a."""
    return Pose3(t=a.t + quat_rotate(a.q, b.t), q=quat_normalize(quat_multiply(a.q, b.q)))


def pose_inverse(p: Pose3) -> Pose3:
    qi = quat_inverse(p.q)
    return Pose3(t=-quat_rotate(qi, p.t), q=qi)


def pose_relative(a: Pose3, b: Pose3) -> Pose3:
    """Relative transform taking frame a to frame b: a^{-1} ∘ b.

    This is the reference's odometry-factor math
    (reference: src/slam_frontend.cc:311-321): translation
    ``R_a^{-1} (t_b - t_a)`` and rotation ``q_a^{-1} q_b`` expressed in a's frame.
    """
    qi = quat_inverse(a.q)
    return Pose3(
        t=quat_rotate(qi, b.t - a.t),
        q=quat_normalize(quat_multiply(qi, b.q)),
    )


def pose_transform_points(p: Pose3, x: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points (..., 3): local -> parent frame."""
    return quat_rotate(p.q, x) + p.t
