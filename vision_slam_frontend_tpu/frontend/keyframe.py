"""The jitted per-keyframe device step: the core of the frontend.

TPU-native re-design of the reference's Frontend::ObserveImage pipeline
(reference: src/slam_frontend.cc:400-472):

  detect+describe (L, R) -> stereo ratio match -> adaptive epipolar filter
  -> compact survivors -> temporal window match (one batched matmul over all
  W past frames) -> triangulate -> undistort -> emit node features + factors.

The whole step is ONE traced XLA program over fixed-capacity masked arrays;
the host loop only gates on odometry and accumulates outputs. Differences
from the reference, by design (see SURVEY.md "Reference quirks"):

  - after the stereo filter both frames are compacted so row i of left/right
    are the same stereo pair; triangulation uses those rows directly instead
    of the reference's redundant re-match (fixing its index-misalignment bug,
    src/slam_frontend.cc:436-442);
  - triangulation runs on undistorted pixel pairs (the reference feeds raw
    distorted pixels to cv::triangulatePoints);
  - per-feature persistent track ids (oldest-match-wins) replace the
    write-only is_initial_/initial_ids_ bookkeeping, giving the BA backend
    real landmark tracks.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from vision_slam_frontend_tpu.geometry.camera import (
    epipolar_residual,
    triangulate_points,
    undistort_points,
)
from vision_slam_frontend_tpu.ops.hamming import match_window, ratio_test_match

_LARGE = 1e9


@struct.dataclass
class StepParams:
    """Traced parameters of the keyframe step (calibration + thresholds)."""

    fundamental: Any  # (3, 3)
    P_left: Any  # (3, 4)
    P_right: Any  # (3, 4)
    intr_left: Any  # Intrinsics pytree
    intr_right: Any  # Intrinsics pytree
    nn_match_ratio: Any  # scalar
    best_percent: Any  # scalar
    stereo_padding: Any  # scalar
    fast_threshold: Any  # scalar
    cam_R: Any  # (3, 3) left-camera -> robot rotation
    cam_t: Any  # (3,) left-camera -> robot translation
    guided_radius: Any  # scalar px; <= 0 disables the guided match gate

    @classmethod
    def from_config(cls, config) -> "StepParams":
        ext = jnp.asarray(config.left_cam_to_robot, jnp.float32)
        return cls(
            fundamental=jnp.asarray(config.fundamental),
            P_left=jnp.asarray(config.P_left),
            P_right=jnp.asarray(config.P_right),
            intr_left=config.intrinsics_left,
            intr_right=config.intrinsics_right,
            nn_match_ratio=jnp.float32(config.nn_match_ratio),
            best_percent=jnp.float32(config.best_percent),
            stereo_padding=jnp.float32(config.stereo_threshold_padding),
            fast_threshold=jnp.float32(config.fast_threshold),
            cam_R=ext[:3, :3],
            cam_t=ext[:3, 3],
            guided_radius=jnp.float32(
                getattr(config, "guided_match_radius", 0.0)
            ),
        )


@struct.dataclass
class WindowState:
    """Device-resident sliding window of the last W keyframes.

    Slot 0 is the oldest (matching the reference's frame_list_ ordering,
    src/slam_frontend.cc:467-470). `stereo_threshold` is the adaptive
    epipolar gate carried across keyframes (src/slam_frontend.cc:353,392-394).
    """

    kps: Any  # (W, K, 2) f32 raw pixel coords
    desc: Any  # (W, K, words) u32 packed descriptors (8 for ORB, 16 for BRISK)
    valid: Any  # (W, K) bool
    track_id: Any  # (W, K) i32
    frame_id: Any  # (W,) i32, -1 for empty slots
    count: Any  # scalar i32: filled slots
    stereo_threshold: Any  # scalar f32
    points3d: Any  # (W, K, 3) stereo-triangulated left-camera-frame points
    pose_t: Any  # (W, 3) odometry world pose at each keyframe
    pose_q: Any  # (W, 4) [w,x,y,z]

    @classmethod
    def create(
        cls,
        window: int,
        capacity: int,
        stereo_threshold_init: float,
        words: int = 8,
        desc_dtype=jnp.uint32,
    ) -> "WindowState":
        """`words` is the descriptor width: packed uint32 words for Hamming
        families, float dims for L2 families (desc_dtype=jnp.float32)."""
        pose_q = jnp.zeros((window, 4), jnp.float32).at[:, 0].set(1.0)
        return cls(
            kps=jnp.zeros((window, capacity, 2), jnp.float32),
            desc=jnp.zeros((window, capacity, words), desc_dtype),
            valid=jnp.zeros((window, capacity), bool),
            track_id=jnp.zeros((window, capacity), jnp.int32),
            frame_id=jnp.full((window,), -1, jnp.int32),
            count=jnp.int32(0),
            stereo_threshold=jnp.float32(stereo_threshold_init),
            points3d=jnp.zeros((window, capacity, 3), jnp.float32),
            pose_t=jnp.zeros((window, 3), jnp.float32),
            pose_q=pose_q,
        )


@struct.dataclass
class KeyframeResult:
    """Per-keyframe outputs handed back to the host accumulator."""

    pixels_undist: Any  # (K, 2) undistorted left pixels
    pixels_raw: Any  # (K, 2)
    right_pixels_raw: Any  # (K, 2) matched right-camera pixel per stereo pair
    right_pixels_undist: Any  # (K, 2) undistorted matched right pixel
    points3d: Any  # (K, 3) left-camera-frame 3D points
    feat_valid: Any  # (K,) bool — survivors are compacted to the front
    track_id: Any  # (K,) i32 persistent landmark track ids
    window_curr_idx: Any  # (W, K) i32: current-feature index matched by past feature q
    window_match_dist: Any  # (W, K) f32
    window_matched: Any  # (W, K) bool
    window_frame_id: Any  # (W,) i32: pose id of each window slot (pre-update)
    num_features: Any  # scalar i32
    num_stereo_candidates: Any  # scalar i32 (ratio-test stereo matches)
    stereo_threshold: Any  # scalar f32 (post-update, for observability)


def _stable_partition(keep: jnp.ndarray) -> jnp.ndarray:
    """Permutation putting kept indices first, original order preserved."""
    return jnp.argsort(jnp.where(keep, 0, 1), stable=True)


@partial(
    jax.jit,
    static_argnames=(
        "capacity", "window", "border", "blur_sigma", "num_levels",
        "scale_factor", "descriptor_family", "mutual_check",
    ),
    donate_argnums=(1,),
)
def keyframe_step(
    params: StepParams,
    state: WindowState,
    left_image: jnp.ndarray,
    right_image: jnp.ndarray,
    frame_id: jnp.ndarray,
    capacity: int = 512,
    window: int = 10,
    border: int = 19,
    blur_sigma: float = 2.0,
    num_levels: int = 1,
    scale_factor: float = 1.4,
    descriptor_family: str = "orb",
    mutual_check: bool = True,
    curr_pose_t=None,
    curr_pose_q=None,
):
    """Process one stereo keyframe. Returns (new_state, KeyframeResult).

    `curr_pose_t`/`curr_pose_q` is the current odometry-estimated world pose
    (the same values the host uses for the node pose); when given, the
    odometry-guided match gate (5b) runs and the window carries per-feature
    3D points + per-keyframe poses. None disables the gate."""
    K = capacity
    W = window

    # --- 1. Feature extraction, both cameras (reference: ExtractFeatures x2;
    # the extractor is resolved through the descriptor-family registry — the
    # reference's six-way switch seam, src/slam_frontend.cc:188-248).
    from vision_slam_frontend_tpu.ops.descriptors import get_family

    extract = get_family(descriptor_family).extractor
    l_kps, _, l_desc, l_valid = extract(
        left_image, threshold=params.fast_threshold, max_keypoints=K,
        border=border, blur_sigma=blur_sigma,
        num_levels=num_levels, scale_factor=scale_factor,
    )
    r_kps, _, r_desc, r_valid = extract(
        right_image, threshold=params.fast_threshold, max_keypoints=K,
        border=border, blur_sigma=blur_sigma,
        num_levels=num_levels, scale_factor=scale_factor,
    )

    # --- 2. Stereo ratio-test match, left queries vs right trains
    # (reference: GetMatches(curr, right, nn_match_ratio), src/slam_frontend.cc:414-416).
    r_idx, s_dist, s_matched = ratio_test_match(
        l_desc, l_valid, r_desc, r_valid, params.nn_match_ratio
    )

    # --- 3. Adaptive epipolar gate (reference: RemoveAmbigStereo).
    matched_r_kps = r_kps[r_idx]
    res = epipolar_residual(params.fundamental, l_kps, matched_r_kps)
    keep = s_matched & (res <= state.stereo_threshold)
    n_cand = jnp.sum(s_matched.astype(jnp.int32))
    avg = jnp.sum(jnp.where(s_matched, res, 0.0)) / jnp.maximum(n_cand, 1).astype(jnp.float32)
    new_threshold = jnp.where(
        n_cand > 0, avg + params.stereo_padding, state.stereo_threshold
    )

    # --- 4. Compact stereo survivors to the front (the reference rebuilds
    # both Frames with survivors; masks + a stable partition do it with
    # static shapes). Row i of (left, matched-right) is stereo pair i.
    perm = _stable_partition(keep)
    f_kps = l_kps[perm]
    f_desc = l_desc[perm]
    f_valid = keep[perm]
    f_right_kps = matched_r_kps[perm]
    num_features = jnp.sum(f_valid.astype(jnp.int32))

    # --- 5. Temporal window matching: all W past frames vs current in one
    # batched MXU contraction (reference: the GetFeatureMatches loop,
    # src/slam_frontend.cc:424-434).
    w_idx, w_dist, w_matched = match_window(
        state.desc, state.valid, f_desc, f_valid,
        params.nn_match_ratio, params.best_percent, mutual=mutual_check,
    )

    # Undistorted current pixels (also consumed by triangulation below).
    lu = undistort_points(params.intr_left, f_kps)

    # --- 5b. Odometry-guided geometric gate (production guided matching;
    # the reference has none): each window feature's stereo 3D point,
    # carried through relative odometry into the current camera, must
    # reproject within guided_radius px of its matched pixel. Kills
    # descriptor-plausible but geometrically impossible matches — the false
    # tracks on self-similar texture that ratio/mutual tests cannot see and
    # that poison BA. Features without a usable depth pass through.
    if curr_pose_t is not None:
        from vision_slam_frontend_tpu.geometry.rotation import quat_to_matrix

        Rw = jax.vmap(quat_to_matrix)(state.pose_q)  # (W, 3, 3)
        p_robot = (
            jnp.einsum("ij,wkj->wki", params.cam_R, state.points3d)
            + params.cam_t
        )
        X = jnp.einsum("wij,wkj->wki", Rw, p_robot) + state.pose_t[:, None]
        Rc = quat_to_matrix(curr_pose_q)
        xr = jnp.einsum("ji,wkj->wki", Rc, X - curr_pose_t)  # Rc^T (X - t)
        pc = jnp.einsum("ji,wkj->wki", params.cam_R, xr - params.cam_t)
        z = pc[..., 2]
        zsafe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        proj_u = params.intr_left.fx * pc[..., 0] / zsafe + params.intr_left.cx
        proj_v = params.intr_left.fy * pc[..., 1] / zsafe + params.intr_left.cy
        target = lu[w_idx]  # (W, K, 2) matched current pixels, undistorted
        err2 = (proj_u - target[..., 0]) ** 2 + (proj_v - target[..., 1]) ** 2
        stored_valid = state.points3d[..., 2] > 0.1
        has_depth = stored_valid & (z > 0.1)
        # A window point with valid stored depth that predicts BEHIND the
        # current camera (z <= 0) is geometrically impossible — reject it
        # outright instead of passing it through as "no usable depth".
        behind = stored_valid & (z <= 0.0)
        ok = ((err2 <= params.guided_radius**2) | ~has_depth) & ~behind
        w_matched = w_matched & jnp.where(params.guided_radius > 0, ok, True)

    # --- 6. Track propagation (oldest-match-wins, then smallest distance).
    # Sort-free: one scatter-min of a combined priority (slot * 1000 + dist;
    # dist <= 256 so slots dominate), then a masked write of the winners'
    # track ids. Two scatters total instead of W sorts + W scatters.
    tid = frame_id * K + jnp.arange(K, dtype=jnp.int32)
    w_rows = jax.lax.broadcasted_iota(jnp.float32, (W, K), 0)
    prio = w_rows * 1000.0 + jnp.minimum(w_dist, 999.0)  # (W, K)
    tgt = jnp.where(w_matched, w_idx, K)  # K -> parked in the pad slot
    minp = jnp.full((K + 1,), jnp.inf).at[tgt.reshape(-1)].min(prio.reshape(-1))
    winner = w_matched & (prio == minp[tgt])
    wtgt = jnp.where(winner, w_idx, K)
    tid = tid.at[wtgt.reshape(-1)].set(state.track_id.reshape(-1), mode="drop")

    # --- 7. Triangulation on undistorted stereo pairs
    # (reference: Calculate3DPoints via cv::triangulatePoints).
    ru = undistort_points(params.intr_right, f_right_kps)
    points3d = triangulate_points(params.P_left, params.P_right, lu, ru)
    points3d = jnp.where(f_valid[:, None], points3d, 0.0)

    # --- 8. Node features: undistorted left pixels
    # (reference: UndistortFeaturePoints on the node's features).
    pixels_undist = jnp.where(f_valid[:, None], lu, 0.0)

    # --- 9. Window update: evict oldest iff full, append current.
    full = state.count >= W
    write_idx = jnp.minimum(state.count, W - 1)

    def updated(buf, new_row):
        rolled = jnp.where(full, jnp.roll(buf, -1, axis=0), buf)
        return rolled.at[write_idx].set(new_row)

    new_state = WindowState(
        kps=updated(state.kps, f_kps),
        desc=updated(state.desc, f_desc),
        valid=updated(state.valid, f_valid),
        track_id=updated(state.track_id, tid),
        frame_id=updated(state.frame_id, frame_id),
        count=jnp.minimum(state.count + 1, W),
        stereo_threshold=new_threshold,
        points3d=updated(state.points3d, points3d),
        pose_t=updated(
            state.pose_t,
            jnp.zeros(3, jnp.float32) if curr_pose_t is None
            else jnp.asarray(curr_pose_t, jnp.float32),
        ),
        pose_q=updated(
            state.pose_q,
            jnp.asarray([1.0, 0, 0, 0], jnp.float32) if curr_pose_q is None
            else jnp.asarray(curr_pose_q, jnp.float32),
        ),
    )

    result = KeyframeResult(
        pixels_undist=pixels_undist,
        pixels_raw=jnp.where(f_valid[:, None], f_kps, 0.0),
        right_pixels_raw=jnp.where(f_valid[:, None], f_right_kps, 0.0),
        right_pixels_undist=jnp.where(f_valid[:, None], ru, 0.0),
        points3d=points3d,
        feat_valid=f_valid,
        track_id=tid,
        window_curr_idx=w_idx,
        window_match_dist=w_dist,
        window_matched=w_matched,
        window_frame_id=state.frame_id,
        num_features=num_features,
        num_stereo_candidates=n_cand,
        stereo_threshold=new_threshold,
    )
    return new_state, result
