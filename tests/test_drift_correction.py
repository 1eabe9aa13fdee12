"""The SLAM value proposition: BA corrects drifting odometry using vision.

The frontend's node poses come straight from odometry (as in the reference,
whose README warns they drift); this test drives the full stack — drifting
odometry in, frontend, track building, stereo BA — and requires the optimized
trajectory to be substantially closer to ground truth than odometry.
"""

import numpy as np
import pytest

from vision_slam_frontend_tpu.backend import (
    BASolverConfig,
    ate_rmse,
    build_ba_problem,
    optimize,
)
from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence


def test_ba_corrects_odometry_drift():
    rig = SyntheticRig()
    config = FrontendConfig(
        calib=rig.calib(), max_features=256, frame_life=5, fast_threshold=12.0
    )
    frontend = Frontend(config)
    frames = list(
        generate_sequence(num_frames=14, step=0.25, rig=rig, odom_drift=0.02)
    )
    for f in frames:
        frontend.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
        frontend.observe_image(f.left, f.right, f.timestamp)
    problem = frontend.get_slam_problem()
    gt = np.stack([f.cam_pos for f in frames[1:]])

    odo_traj = np.stack([n.pose.loc for n in problem.nodes])
    ate_odom = ate_rmse(odo_traj, gt, align=False)
    assert ate_odom > 0.04, f"drift fixture too easy: {ate_odom:.4f}"

    ba = build_ba_problem(problem, left_cam_to_robot=config.left_cam_to_robot)
    # Odometry is NOT trustworthy here: weight it weakly so vision dominates.
    opt, info = optimize(
        ba, config=config,
        solver=BASolverConfig(
            max_iterations=15, huber_delta=4.0, trim_threshold=8.0,
            odom_t_weight=3.0, odom_r_weight=30.0,
        ),
    )
    ate_ba = ate_rmse(np.asarray(opt.poses_t), gt, align=False)
    assert ate_ba < 0.6 * ate_odom, (
        f"BA failed to correct drift: odometry ATE {ate_odom:.4f} -> BA ATE {ate_ba:.4f}"
    )
