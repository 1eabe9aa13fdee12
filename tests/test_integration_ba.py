"""End-to-end: synthetic world -> frontend -> track building -> BA -> metrics."""

import numpy as np
import pytest

from vision_slam_frontend_tpu.backend import (
    BASolverConfig,
    ate_rmse,
    build_ba_problem,
    optimize,
)
from vision_slam_frontend_tpu.backend.residuals import CameraParams
from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence


@pytest.fixture(scope="module")
def frontend_run():
    rig = SyntheticRig()
    config = FrontendConfig(
        calib=rig.calib(), max_features=256, frame_life=5, fast_threshold=12.0
    )
    frontend = Frontend(config)
    frames = list(generate_sequence(num_frames=10, step=0.25, rig=rig))
    for f in frames:
        frontend.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
        frontend.observe_image(f.left, f.right, f.timestamp)
    gt = np.stack([f.cam_pos for f in frames[1:]])  # frame 0 isn't a keyframe
    return frontend, config, gt


def test_frontend_to_ba(frontend_run):
    frontend, config, gt = frontend_run
    problem = frontend.get_slam_problem()
    ba = build_ba_problem(problem, left_cam_to_robot=config.left_cam_to_robot)
    n_lm = int(np.sum(np.asarray(ba.landmark_mask)))
    n_obs = int(np.sum(np.asarray(ba.obs_mask)))
    assert n_lm > 30, f"too few landmarks: {n_lm}"
    assert n_obs > 2 * n_lm

    cam = CameraParams.from_config(config)
    opt, info = optimize(
        ba, cam=cam,
        solver=BASolverConfig(huber_delta=3.0, trim_threshold=8.0, max_iterations=10),
    )
    # Odometry in the synthetic world is exact, so the frontend trajectory is
    # already ground truth; BA must not degrade it.
    ate_before = ate_rmse(np.asarray(ba.poses_t), gt, align=False)
    ate_after = ate_rmse(np.asarray(opt.poses_t), gt, align=False)
    assert ate_after < max(2.0 * ate_before, 0.05), (
        f"BA degraded trajectory: {ate_before:.4f} -> {ate_after:.4f}"
    )
    # And the reprojection cost must drop substantially.
    assert info["cost"] < info["history"][0] * 0.5


def test_ba_corrects_corrupted_odometry(frontend_run):
    """Corrupt the initial trajectory; vision factors must pull it back."""
    frontend, config, gt = frontend_run
    problem = frontend.get_slam_problem()
    ba = build_ba_problem(problem, left_cam_to_robot=config.left_cam_to_robot)
    rng = np.random.default_rng(7)
    noisy_t = np.asarray(ba.poses_t).copy()
    noisy_t[1:] += rng.normal(0, 0.05, noisy_t[1:].shape)
    ba_noisy = ba.replace(poses_t=noisy_t)

    cam = CameraParams.from_config(config)
    # Down-weight odometry so vision dominates (the corruption is in poses,
    # not the odometry measurements — mimic a drifting-odometry scenario by
    # weakening its pull).
    opt, info = optimize(
        ba_noisy, cam=cam,
        solver=BASolverConfig(
            huber_delta=3.0, trim_threshold=8.0, max_iterations=12,
            odom_t_weight=5.0, odom_r_weight=10.0,
        ),
    )
    ate_before = ate_rmse(noisy_t, gt, align=False)
    ate_after = ate_rmse(np.asarray(opt.poses_t), gt, align=False)
    assert ate_after < ate_before, f"{ate_before:.4f} -> {ate_after:.4f}"


def test_backend_cli(tmp_path, capsys):
    from vision_slam_frontend_tpu.cli.slam_backend import main as backend_main
    from vision_slam_frontend_tpu.cli.slam_frontend import main as frontend_main

    problem_path = str(tmp_path / "problem.npz")
    rc = frontend_main(
        ["--input", "synthetic:8", "--output", problem_path,
         "--max_features", "192", "--frame_life", "4"]
    )
    assert rc == 0
    solved_path = str(tmp_path / "solved.npz")
    ply_path = str(tmp_path / "solved.ply")
    rc = backend_main(
        ["--input", problem_path, "--output", solved_path, "--ply", ply_path]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "BA problem:" in out and "BA converged:" in out
    with np.load(solved_path) as data:
        assert "ba_landmarks" in data
        assert len(data["nodes_id"]) == 7
    import os

    assert os.path.getsize(ply_path) > 100


def test_backend_cli_distributed_dense(tmp_path, capsys):
    """--devices shards the solve over the virtual mesh; --schur_solver picks
    the inner solver; both converge to the summary line."""
    from vision_slam_frontend_tpu.cli.slam_backend import main as backend_main
    from vision_slam_frontend_tpu.cli.slam_frontend import main as frontend_main

    problem_path = str(tmp_path / "problem.npz")
    rc = frontend_main(
        ["--input", "synthetic:8", "--output", problem_path,
         "--max_features", "192", "--frame_life", "4"]
    )
    assert rc == 0
    rc = backend_main(
        ["--input", problem_path, "--output", str(tmp_path / "s1.npz"),
         "--schur_solver", "dense", "--max_iterations", "4"]
    )
    assert rc == 0
    rc = backend_main(
        ["--input", problem_path, "--output", str(tmp_path / "s2.npz"),
         "--devices", "8", "--max_iterations", "4"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Sharded" in out and out.count("BA converged:") == 2
    with np.load(str(tmp_path / "s1.npz")) as d1, np.load(str(tmp_path / "s2.npz")) as d2:
        np.testing.assert_allclose(d1["nodes_loc"], d2["nodes_loc"], atol=2e-2)


def test_backend_cli_missing_input(capsys):
    from vision_slam_frontend_tpu.cli.slam_backend import main

    rc = main(["--input", "/does/not/exist.npz", "--output", "/tmp/x.npz"])
    assert rc == 1
    assert "Unable to read" in capsys.readouterr().out
