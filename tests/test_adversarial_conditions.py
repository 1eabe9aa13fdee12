"""Adversarial operating-point breadth: conditions beyond the golden fixtures.

The round-3 verdict asked for robustness evidence at OTHER operating points
than the two golden fixtures — heavier blur, exposure steps,
rotation-dominant motion, low contrast — with multiple descriptor families
through each. These are SURVIVAL tests, not accuracy pins: the pipeline must
keep producing keyframes/features and BA must stay finite and not blow up
the trajectory (the golden fixtures carry the tight accuracy pins).

Each condition runs 30 in-memory frames (the JPEG/bag/decode IO path is
exercised by tests/test_golden_bag.py; these vary the IMAGERY and MOTION).
"""

import numpy as np
import pytest

from vision_slam_frontend_tpu.backend import BASolverConfig, ate_rmse, optimize
from vision_slam_frontend_tpu.backend.residuals import CameraParams
from vision_slam_frontend_tpu.backend.tracks import build_ba_problem
from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
from vision_slam_frontend_tpu.io.degrade import Degrader
from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence

NUM_FRAMES = 30

CONDITIONS = {
    # Heavier motion blur + read noise than the golden bag (max 3.5 px there).
    "heavy_blur": dict(
        degrader=dict(seed=3, max_blur_px=6.0, noise_read=4.0),
        seq=dict(step=0.25, yaw_rate=2 * np.pi / 210),
    ),
    # Auto-exposure hunting: strong gain swings + offset steps.
    "exposure_steps": dict(
        degrader=dict(seed=4, flicker=0.35, offset_drift=24.0, max_blur_px=1.5),
        seq=dict(step=0.25, yaw_rate=2 * np.pi / 210),
    ),
    # Rotation-dominant: the keyframe gate fires on the 10-degree rotation
    # rule, not translation (reference gate src/slam_frontend.cc:557-558);
    # 12 deg/frame so the gate triggers every frame with drift noise on top.
    "rotation_dominant": dict(
        degrader=dict(seed=5, max_blur_px=2.0),
        seq=dict(step=0.08, yaw_rate=2 * np.pi / 30),
    ),
    # Low contrast: intensities compressed toward the mean (fog/backlight).
    "low_contrast": dict(
        degrader=dict(seed=6, max_blur_px=2.0, noise_read=1.5),
        contrast=0.35,
        seq=dict(step=0.25, yaw_rate=2 * np.pi / 210),
    ),
    # Camera roll: 12 deg/frame in-plane rotation (a full revolution over
    # the run) + a slow downward pitch — stresses descriptor orientation
    # steering and the rotation half of the keyframe gate directly
    # (reference gate src/slam_frontend.cc:557-558); the planar-motion
    # conditions above never exercise roll at all (round-4 verdict item 8).
    "camera_roll": dict(
        degrader=dict(seed=7, max_blur_px=2.0),
        seq=dict(step=0.1, yaw_rate=0.0,
                 roll_rate=np.deg2rad(12.0), pitch_rate=np.deg2rad(-0.8)),
    ),
    # Forward approach: 0.7 m/frame straight at the scene — fast texture
    # scale change between consecutive keyframes, stressing the
    # single-level descriptor assumption (scale mismatch across the match
    # window) the translation+yaw conditions never produce.
    "forward_approach": dict(
        degrader=dict(seed=8, max_blur_px=2.0),
        seq=dict(step=0.7, yaw_rate=0.0),
    ),
}

# All Hamming families + the float/L2 family: the full registered set
# (round-4 verdict: sift was the one family with golden but no adversarial
# coverage; freak is new in round 5).
FAMILIES = ["orb", "brisk", "akaze", "sift", "freak"]


_FRAME_CACHE: dict = {}


def _condition_frames(condition: str):
    """Render + degrade a condition's imagery ONCE — all five families see
    identical frames (rendering dominated the 6x5 matrix's runtime)."""
    if condition not in _FRAME_CACHE:
        spec = CONDITIONS[condition]
        deg = Degrader(**spec["degrader"])
        contrast = spec.get("contrast", 1.0)
        rig = SyntheticRig(
            width=512, height=384, cx=256.0, cy=192.0, fx=420.0, fy=420.0
        )
        frames = []
        for i, f in enumerate(
            generate_sequence(num_frames=NUM_FRAMES, rig=rig, odom_drift=0.015,
                              seed=11, **spec["seq"])
        ):
            left = deg(f.left, i, cam=0)
            right = deg(f.right, i, cam=1)
            if contrast != 1.0:
                left = 120.0 + contrast * (left - 120.0)
                right = 120.0 + contrast * (right - 120.0)
            frames.append(
                (left, right, f.odom_translation, f.odom_rotation,
                 f.timestamp, f.cam_pos.copy())
            )
        _FRAME_CACHE[condition] = (rig, frames)
    return _FRAME_CACHE[condition]


def _run(condition: str, family: str):
    rig, frames = _condition_frames(condition)
    config = FrontendConfig(
        calib=rig.calib(), max_features=256, frame_life=8, fast_threshold=8.0,
        descriptor_family=family,
    )
    fe = Frontend(config)
    gt = []
    for left, right, odom_t, odom_r, t, cam_pos in frames:
        fe.observe_odometry(odom_t, odom_r, t)
        if fe.observe_image(left, right, t):
            gt.append(cam_pos)
    return fe, np.stack(gt), config


@pytest.mark.parametrize("family", FAMILIES)
@pytest.mark.parametrize("condition", sorted(CONDITIONS))
def test_condition_survival(condition, family):
    fe, gt, config = _run(condition, family)
    # The pipeline must keep producing keyframes and features.
    assert fe.get_num_poses() >= NUM_FRAMES - 6, fe.get_num_poses()
    s = fe.stats_summary()
    assert s["features_mean"] > 25, (condition, family, s["features_mean"])

    problem = fe.get_slam_problem()
    ba = build_ba_problem(
        problem, left_cam_to_robot=np.asarray(config.left_cam_to_robot),
        min_track_length=2,
    )
    if int(np.asarray(ba.landmark_mask).sum()) < 20:
        pytest.fail(f"{condition}/{family}: almost no landmarks survived")
    cam = CameraParams.from_config(config)
    opt, info = optimize(
        ba, cam=cam, solver=BASolverConfig(max_iterations=10, trim_threshold=8.0)
    )
    ate_odom = ate_rmse(np.asarray(ba.poses_t), gt, align=False)
    ate_ba = ate_rmse(np.asarray(opt.poses_t), gt, align=False)
    # Robustness floor: BA stays finite and does not blow the trajectory up
    # (the guided gate + trimming must contain adversarial false matches).
    assert np.isfinite(info["cost"])
    assert ate_ba < max(2.0 * ate_odom, 0.25), (condition, family, ate_odom, ate_ba)
