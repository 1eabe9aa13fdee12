"""Quaternion and rotation ops (pure jnp, batch-friendly).

Quaternions are stored as ``[w, x, y, z]`` arrays (scalar-first, Hamilton
convention); a quaternion ``q`` rotates a point from the local frame into the
parent frame, matching the semantics of the reference's ``Eigen::Quaternionf``
usage (reference: src/slam_types.h:110-129 RobotPose, src/slam_frontend.cc:250-263
odometry integration).

All ops broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    """Identity quaternion [1, 0, 0, 0]."""
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to a unit quaternion; guards the zero quaternion."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b: rotation b followed by rotation a."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """[w, -x, -y, -z]."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a (unit) quaternion == conjugate after normalization."""
    return quat_conjugate(quat_normalize(q))


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector(s) v by quaternion(s) q.

    Uses the expanded Rodrigues form (no intermediate quaternion product),
    which is cheaper on the VPU: v' = v + 2*w*(u x v) + 2*(u x (u x v)).
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix (batched: (..., 3, 3))."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion [w,x,y,z], branch-free.

    Computes all four of Shepperd's candidate solutions and selects the one
    seeded by the largest of (trace, m00, m11, m22) — numerically stable and
    jit/vmap-safe (no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate 0: seeded by trace.
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # Candidate 1: seeded by m00.
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # Candidate 2: seeded by m11.
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # Candidate 3: seeded by m22.
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    keys = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(keys, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


def axis_angle_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """Scaled axis-angle (Lie algebra so(3)) -> unit quaternion.

    Small-angle-safe via the sinc expansion.
    """
    angle2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle2, _EPS))
    half = 0.5 * angle
    small = angle2 < 1e-8
    # sin(half)/angle, with Taylor fallback 0.5 - angle^2/48 for tiny angles.
    k = jnp.where(small, 0.5 - angle2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([w, aa * k], axis=-1))


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> scaled axis-angle; small-angle-safe."""
    q = quat_normalize(q)
    # Force w >= 0 so angle is in [0, pi].
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < 1e-8
    # angle/vnorm ~ 2/w for small angles.
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / jnp.maximum(vnorm, _EPS))
    return v * k


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    return quat_to_matrix(axis_angle_to_quat(aa))


def matrix_to_axis_angle(m: jnp.ndarray) -> jnp.ndarray:
    return quat_to_axis_angle(matrix_to_quat(m))


def quat_angular_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians) of the relative rotation between two unit quaternions.

    Equivalent of Eigen's angularDistance used by the reference's keyframe
    gate (reference: src/slam_frontend.cc:181-183).
    """
    d = jnp.abs(jnp.sum(quat_normalize(a) * quat_normalize(b), axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, 0.0, 1.0))
