"""BA residuals + per-factor Jacobians (batched autodiff, fixed shapes).

Reprojection: world landmark -> robot frame (pose^{-1}) -> camera frame
(extrinsic^{-1}) -> pinhole projection with the left camera's K; residual
against the node's undistorted pixel observation (the frontend stores
undistorted pixels, so projection is distortion-free).

Odometry: 6-vector residual of the measured relative pose vs the current
estimates, [translation error in frame i; so(3) log of rotation error],
per-component weighted.

Local parameterization (minimal, singularity-free): pose delta
d = [dt (world); dtheta (right-multiplied so(3))], landmark delta is
Euclidean. Jacobians are evaluated at d = 0 with jacfwd under vmap — one
batched XLA program, no per-factor Python.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from vision_slam_frontend_tpu.geometry.rotation import (
    axis_angle_to_quat,
    quat_inverse,
    quat_multiply,
    quat_rotate,
    quat_to_axis_angle,
)


@struct.dataclass
class CameraParams:
    """Stereo projection used by the solver: left camera + right camera via
    the rig's right-extrinsic block (x_right = R_rl x_left + t_rl)."""

    fx: Any
    fy: Any
    cx: Any
    cy: Any
    # camera -> robot extrinsic
    R_cr: Any  # (3, 3)
    t_cr: Any  # (3,)
    # right camera (stereo constraint); defaults mirror the left camera with
    # an identity extrinsic (observations then need obs_right_mask=False).
    fx_r: Any = None
    fy_r: Any = None
    cx_r: Any = None
    cy_r: Any = None
    R_rl: Any = None  # (3, 3)
    t_rl: Any = None  # (3,)

    def __post_init__(self):
        if self.fx_r is None:
            object.__setattr__(self, "fx_r", self.fx)
            object.__setattr__(self, "fy_r", self.fy)
            object.__setattr__(self, "cx_r", self.cx)
            object.__setattr__(self, "cy_r", self.cy)
        if self.R_rl is None:
            object.__setattr__(self, "R_rl", jnp.eye(3))
            object.__setattr__(self, "t_rl", jnp.zeros(3))

    @classmethod
    def from_config(cls, config) -> "CameraParams":
        intr = config.intrinsics_left
        intr_r = config.intrinsics_right
        ext = jnp.asarray(config.left_cam_to_robot)
        A_r = jnp.asarray(config.calib["right_extrinsic"], jnp.float32)
        return cls(
            fx=jnp.float32(intr.fx), fy=jnp.float32(intr.fy),
            cx=jnp.float32(intr.cx), cy=jnp.float32(intr.cy),
            R_cr=ext[:3, :3], t_cr=ext[:3, 3],
            fx_r=jnp.float32(intr_r.fx), fy_r=jnp.float32(intr_r.fy),
            cx_r=jnp.float32(intr_r.cx), cy_r=jnp.float32(intr_r.cy),
            R_rl=A_r[:, :3], t_rl=A_r[:, 3],
        )


def _apply_pose_delta(t, q, d):
    """Retraction: t += dt, q <- q * exp(dtheta)."""
    return t + d[:3], quat_multiply(q, axis_angle_to_quat(d[3:]))


def reproject_residual(cam: CameraParams, t, q, landmark, pixel):
    """Single-observation residual (2,), given pose (t, q) and world landmark."""
    p_robot = quat_rotate(quat_inverse(q), landmark - t)
    p_cam = cam.R_cr.T @ (p_robot - cam.t_cr)
    z = p_cam[2]
    zsafe = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    u = cam.fx * p_cam[0] / zsafe + cam.cx
    v = cam.fy * p_cam[1] / zsafe + cam.cy
    # Points behind the camera get a large (but finite, differentiable)
    # residual so the solver pushes them back rather than NaN-ing.
    pred = jnp.stack([u, v])
    r = pred - pixel
    return jnp.where(z > 1e-6, r, jnp.clip(r, -1e4, 1e4))


def reproject_residual_stereo(cam: CameraParams, t, q, landmark, pixel_l, pixel_r, has_right):
    """Stereo residual (4,): [left u,v ; right u,v]; right rows zeroed when
    the observation has no stereo match (has_right = 0)."""
    p_robot = quat_rotate(quat_inverse(q), landmark - t)
    p_l = cam.R_cr.T @ (p_robot - cam.t_cr)

    def pinhole(p, fx, fy, cx, cy, px):
        z = p[2]
        zsafe = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
        pred = jnp.stack([fx * p[0] / zsafe + cx, fy * p[1] / zsafe + cy])
        r = pred - px
        return jnp.where(z > 1e-6, r, jnp.clip(r, -1e4, 1e4))

    r_l = pinhole(p_l, cam.fx, cam.fy, cam.cx, cam.cy, pixel_l)
    p_r = cam.R_rl @ p_l + cam.t_rl
    r_r = pinhole(p_r, cam.fx_r, cam.fy_r, cam.cx_r, cam.cy_r, pixel_r) * has_right
    return jnp.concatenate([r_l, r_r])


def _reproj_with_deltas(cam, t, q, landmark, pixel, d_pose, d_lm):
    t2, q2 = _apply_pose_delta(t, q, d_pose)
    return reproject_residual(cam, t2, q2, landmark + d_lm, pixel)


def _stereo_with_deltas(cam, t, q, landmark, px_l, px_r, has_r, d_pose, d_lm):
    t2, q2 = _apply_pose_delta(t, q, d_pose)
    return reproject_residual_stereo(cam, t2, q2, landmark + d_lm, px_l, px_r, has_r)


@jax.jit
def linearize_reprojection(
    cam: CameraParams, poses_t, poses_q, landmarks, obs_pose, obs_landmark,
    obs_pixel, obs_mask, obs_pixel_right=None, obs_right_mask=None,
):
    """Batched residuals + Jacobians for all observations.

    Returns r (N, D), J_pose (N, D, 6), J_lm (N, D, 3) with D=4 when stereo
    pixels are provided (rows 2:4 zeroed for mono observations), D=2
    otherwise; everything masked to zero for invalid observations.
    """
    t = poses_t[obs_pose]
    q = poses_q[obs_pose]
    lm = landmarks[obs_landmark]

    if obs_pixel_right is None:
        def per_obs(t_i, q_i, lm_i, px_i):
            d0 = jnp.zeros(6)
            dl0 = jnp.zeros(3)
            r = _reproj_with_deltas(cam, t_i, q_i, lm_i, px_i, d0, dl0)
            Jp = jax.jacfwd(lambda d: _reproj_with_deltas(cam, t_i, q_i, lm_i, px_i, d, dl0))(d0)
            Jl = jax.jacfwd(lambda dl: _reproj_with_deltas(cam, t_i, q_i, lm_i, px_i, d0, dl))(dl0)
            return r, Jp, Jl

        r, Jp, Jl = jax.vmap(per_obs)(t, q, lm, obs_pixel)
    else:
        has_r = obs_right_mask.astype(jnp.float32)

        def per_obs(t_i, q_i, lm_i, px_i, pxr_i, hr_i):
            d0 = jnp.zeros(6)
            dl0 = jnp.zeros(3)
            r = _stereo_with_deltas(cam, t_i, q_i, lm_i, px_i, pxr_i, hr_i, d0, dl0)
            Jp = jax.jacfwd(
                lambda d: _stereo_with_deltas(cam, t_i, q_i, lm_i, px_i, pxr_i, hr_i, d, dl0)
            )(d0)
            Jl = jax.jacfwd(
                lambda dl: _stereo_with_deltas(cam, t_i, q_i, lm_i, px_i, pxr_i, hr_i, d0, dl)
            )(dl0)
            return r, Jp, Jl

        r, Jp, Jl = jax.vmap(per_obs)(t, q, lm, obs_pixel, obs_pixel_right, has_r)
    m = obs_mask[:, None].astype(r.dtype)
    return r * m, Jp * m[..., None], Jl * m[..., None]


@jax.jit
def linearize_reprojection_pm(
    cam: CameraParams, poses_t, poses_q, landmarks, pm_landmark,
    pm_pixel, pm_mask, pm_pixel_right=None, pm_right_mask=None,
):
    """Pose-major linearization: residuals + Jacobians emitted directly in
    (P, Mp, ...) layout — no per-iteration relayout gathers.

    Row p of every pm_* input holds pose p's observations (the plan built by
    backend/tracks.build_gather_tables), so the pose parameters broadcast per
    row (zero gathers) and only the 12-byte landmark positions are gathered
    (vs. re-gathering the ~160-byte Jacobian rows every LM iteration, the
    316 ms/iter relayout phase this replaces — BASELINE.md round-3 profile).

    Returns r (P, Mp, D), J_pose (P, Mp, D, 6), J_lm (P, Mp, D, 3), all
    zeroed on masked slots. D = 4 with stereo pixels, else 2.
    """
    P, Mp = pm_landmark.shape
    t = jnp.broadcast_to(poses_t[:, None], (P, Mp, 3)).reshape(-1, 3)
    q = jnp.broadcast_to(poses_q[:, None], (P, Mp, 4)).reshape(-1, 4)
    lm = landmarks[pm_landmark.reshape(-1)]
    px = pm_pixel.reshape(-1, 2)

    if pm_pixel_right is None:
        def per_obs(t_i, q_i, lm_i, px_i):
            d0 = jnp.zeros(6)
            dl0 = jnp.zeros(3)
            r = _reproj_with_deltas(cam, t_i, q_i, lm_i, px_i, d0, dl0)
            Jp = jax.jacfwd(lambda d: _reproj_with_deltas(cam, t_i, q_i, lm_i, px_i, d, dl0))(d0)
            Jl = jax.jacfwd(lambda dl: _reproj_with_deltas(cam, t_i, q_i, lm_i, px_i, d0, dl))(dl0)
            return r, Jp, Jl

        r, Jp, Jl = jax.vmap(per_obs)(t, q, lm, px)
    else:
        has_r = pm_right_mask.reshape(-1).astype(jnp.float32)
        pxr = pm_pixel_right.reshape(-1, 2)

        def per_obs(t_i, q_i, lm_i, px_i, pxr_i, hr_i):
            d0 = jnp.zeros(6)
            dl0 = jnp.zeros(3)
            r = _stereo_with_deltas(cam, t_i, q_i, lm_i, px_i, pxr_i, hr_i, d0, dl0)
            Jp = jax.jacfwd(
                lambda d: _stereo_with_deltas(cam, t_i, q_i, lm_i, px_i, pxr_i, hr_i, d, dl0)
            )(d0)
            Jl = jax.jacfwd(
                lambda dl: _stereo_with_deltas(cam, t_i, q_i, lm_i, px_i, pxr_i, hr_i, d0, dl)
            )(dl0)
            return r, Jp, Jl

        r, Jp, Jl = jax.vmap(per_obs)(t, q, lm, px, pxr, has_r)
    D = r.shape[-1]
    m = pm_mask.reshape(-1, 1).astype(r.dtype)
    r = (r * m).reshape(P, Mp, D)
    Jp = (Jp * m[..., None]).reshape(P, Mp, D, 6)
    Jl = (Jl * m[..., None]).reshape(P, Mp, D, 3)
    return r, Jp, Jl


def odometry_residual(t_i, q_i, t_j, q_j, t_meas, q_meas, w_t, w_r):
    """6-vector weighted relative-pose residual."""
    qi_inv = quat_inverse(q_i)
    t_rel = quat_rotate(qi_inv, t_j - t_i)
    q_rel = quat_multiply(qi_inv, q_j)
    r_t = (t_rel - t_meas) * w_t
    r_r = quat_to_axis_angle(quat_multiply(quat_inverse(q_meas), q_rel)) * w_r
    return jnp.concatenate([r_t, r_r])


def _odom_with_deltas(t_i, q_i, t_j, q_j, t_meas, q_meas, w_t, w_r, d_i, d_j):
    t_i2, q_i2 = _apply_pose_delta(t_i, q_i, d_i)
    t_j2, q_j2 = _apply_pose_delta(t_j, q_j, d_j)
    return odometry_residual(t_i2, q_i2, t_j2, q_j2, t_meas, q_meas, w_t, w_r)


@jax.jit
def linearize_odometry(poses_t, poses_q, odom_i, odom_j, odom_t, odom_q, odom_mask, w_t, w_r):
    """Batched odometry residuals + Jacobians: r (Q, 6), J_i/J_j (Q, 6, 6)."""
    t_i = poses_t[odom_i]
    q_i = poses_q[odom_i]
    t_j = poses_t[odom_j]
    q_j = poses_q[odom_j]

    def per_factor(ti, qi, tj, qj, tm, qm):
        d0 = jnp.zeros(6)
        r = _odom_with_deltas(ti, qi, tj, qj, tm, qm, w_t, w_r, d0, d0)
        Ji = jax.jacfwd(lambda d: _odom_with_deltas(ti, qi, tj, qj, tm, qm, w_t, w_r, d, d0))(d0)
        Jj = jax.jacfwd(lambda d: _odom_with_deltas(ti, qi, tj, qj, tm, qm, w_t, w_r, d0, d))(d0)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(per_factor)(t_i, q_i, t_j, q_j, odom_t, odom_q)
    m = odom_mask[:, None].astype(r.dtype)
    return r * m, Ji * m[..., None], Jj * m[..., None]


def huber_weights(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Per-residual-row sqrt IRLS weights for the Huber loss; delta <= 0
    disables robustification. r is (..., D); weight is per row."""
    if delta is None:
        return jnp.ones(r.shape[:-1], r.dtype)
    norm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(norm <= delta, 1.0, jnp.sqrt(delta / jnp.maximum(norm, 1e-12)))
    return w
