"""Checkpoint/resume: a resumed run must reproduce the uninterrupted run."""

import numpy as np

from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence


def _make(rig):
    return Frontend(
        FrontendConfig(calib=rig.calib(), max_features=192, frame_life=4, fast_threshold=12.0)
    )


def _problems_equal(a, b):
    assert len(a.nodes) == len(b.nodes)
    for na, nb in zip(a.nodes, b.nodes):
        assert na.node_idx == nb.node_idx
        np.testing.assert_allclose(na.pose.loc, nb.pose.loc, atol=1e-6)
        assert len(na.features) == len(nb.features)
        for fa, fb in zip(na.features, nb.features):
            np.testing.assert_allclose(fa.pixel, fb.pixel, atol=1e-4)
            np.testing.assert_allclose(fa.point3d, fb.point3d, atol=1e-3)
    assert len(a.vision_factors) == len(b.vision_factors)
    for va, vb in zip(a.vision_factors, b.vision_factors):
        assert va.pose_idx_initial == vb.pose_idx_initial
        assert va.pose_idx_current == vb.pose_idx_current
        assert [
            (m.feature_idx_initial, m.feature_idx_current) for m in va.feature_matches
        ] == [(m.feature_idx_initial, m.feature_idx_current) for m in vb.feature_matches]
    assert len(a.odometry_factors) == len(b.odometry_factors)


def test_resume_reproduces_full_run(tmp_path):
    rig = SyntheticRig()
    frames = list(generate_sequence(num_frames=9, step=0.25, rig=rig))

    # Uninterrupted run.
    full = _make(rig)
    for f in frames:
        full.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
        full.observe_image(f.left, f.right, f.timestamp)

    # Interrupted run: checkpoint after frame 4, new process-equivalent
    # frontend resumes and consumes the rest.
    first = _make(rig)
    for f in frames[:5]:
        first.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
        first.observe_image(f.left, f.right, f.timestamp)
    ckpt = str(tmp_path / "state.ckpt.npz")
    first.save_checkpoint(ckpt)

    second = _make(rig)
    resume_t = second.load_checkpoint(ckpt)
    assert second.get_num_poses() == first.get_num_poses()
    for f in frames:
        if f.timestamp <= resume_t:
            continue
        second.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
        second.observe_image(f.left, f.right, f.timestamp)

    _problems_equal(full.get_slam_problem(), second.get_slam_problem())
    # Track ids must survive the checkpoint boundary too.
    assert len(second.node_track_ids) == len(full.node_track_ids)
    for ta, tb in zip(full.node_track_ids, second.node_track_ids):
        np.testing.assert_array_equal(ta, tb)


def test_cli_checkpoint_and_resume(tmp_path, capsys):
    from vision_slam_frontend_tpu.cli.slam_frontend import main

    out = str(tmp_path / "p.npz")
    rc = main(
        ["--input", "synthetic:8", "--output", out, "--checkpoint_every", "2",
         "--max_features", "192", "--frame_life", "4", "-v", "1"]
    )
    assert rc == 0
    import os

    ckpt = out + ".ckpt.npz"
    assert os.path.exists(ckpt)
    # Resume from the checkpoint and finish (no new frames -> same problem).
    out2 = str(tmp_path / "p2.npz")
    rc = main(
        ["--input", "synthetic:8", "--output", out2, "--resume", ckpt,
         "--max_features", "192", "--frame_life", "4"]
    )
    assert rc == 0
    text = capsys.readouterr().out
    assert "Resumed from" in text


def test_cli_sigint_graceful(tmp_path, capsys):
    """SIGINT mid-run (reference: src/slam_frontend_main.cc:417-420,436) must
    lose nothing: partial problem npz + a resumable checkpoint, exit code 130.
    Exercised deterministically via the --interrupt_after fault injection,
    which raises a real SIGINT through the installed handler."""
    from vision_slam_frontend_tpu.cli.slam_frontend import main

    out = str(tmp_path / "p.npz")
    rc = main(
        ["--input", "synthetic:12", "--output", out, "--interrupt_after", "6",
         "--max_features", "192", "--frame_life", "4"]
    )
    assert rc == 130
    import os

    assert os.path.exists(out)
    assert os.path.exists(out + ".ckpt.npz")
    from vision_slam_frontend_tpu.io.serialize import load_problem

    problem = load_problem(out)
    # 6 frames observed before the interrupt; all gate-accepted in synthetic.
    assert 4 <= len(problem.nodes) <= 7
    text = capsys.readouterr().out
    assert "SIGINT" in text and "checkpoint" in text
    # And the run is resumable from the interrupt point.
    out2 = str(tmp_path / "p2.npz")
    rc = main(
        ["--input", "synthetic:12", "--output", out2,
         "--resume", out + ".ckpt.npz",
         "--max_features", "192", "--frame_life", "4"]
    )
    assert rc == 0
    full = load_problem(out2)
    # 12 frames, the first only seeds the odometry gate -> 11 keyframes.
    assert len(full.nodes) == 11


def test_stats_collected():
    rig = SyntheticRig()
    fe = _make(rig)
    for f in generate_sequence(num_frames=4, step=0.25, rig=rig):
        fe.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
        fe.observe_image(f.left, f.right, f.timestamp)
    assert len(fe.stats) == fe.get_num_poses()
    s = fe.stats_summary()
    assert s["keyframes"] == fe.get_num_poses()
    assert s["features_mean"] > 40
    assert 0 < s["stereo_survival_mean"] <= 1.0


class TestBASolverCheckpoint:
    """Mid-run BA solver snapshots + resume (backend/ba.py
    save_solver_checkpoint / load_solver_checkpoint / optimize(resume=True))."""

    def _problem(self):
        from test_backend import synthetic_ba

        cam, problem, _, _ = synthetic_ba(
            P=6, L=80, pose_noise=0.05, lm_noise=0.3, px_noise=0.3, seed=3
        )
        return cam, problem

    def test_resume_matches_uninterrupted(self, tmp_path):
        from vision_slam_frontend_tpu.backend import BASolverConfig, optimize

        cam, problem = self._problem()
        solver = BASolverConfig(max_iterations=8)

        full, full_info = optimize(problem, cam=cam, solver=solver)

        # "Interrupted" run: stop after 3 LM iterations, snapshotting each one.
        ckpt = str(tmp_path / "ba.ckpt.npz")
        short = BASolverConfig(max_iterations=3)
        optimize(problem, cam=cam, solver=short,
                 checkpoint_path=ckpt, checkpoint_every=1)
        import os

        assert os.path.exists(ckpt)

        # Resume in a fresh call: picks up at iteration 3, finishes the rest.
        resumed, res_info = optimize(
            problem, cam=cam, solver=solver,
            checkpoint_path=ckpt, checkpoint_every=1, resume=True,
        )
        assert np.isclose(res_info["cost"], full_info["cost"], rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(resumed.poses_t), np.asarray(full.poses_t), atol=1e-4
        )

    def test_checkpoint_roundtrip(self, tmp_path):
        from vision_slam_frontend_tpu.backend import (
            load_solver_checkpoint,
            save_solver_checkpoint,
        )

        _, problem = self._problem()
        path = str(tmp_path / "rt.npz")
        state = {"round": 1, "iter": 4, "lambda": 2.5e-4,
                 "history": [10.0, 5.0, 3.0], "accepted": 2, "trimmed": 7}
        save_solver_checkpoint(path, problem, state)
        prob2, state2 = load_solver_checkpoint(path)
        assert state2 == {**state, "lambda": 2.5e-4}
        np.testing.assert_array_equal(
            np.asarray(problem.obs_pixel), np.asarray(prob2.obs_pixel)
        )
        np.testing.assert_array_equal(
            np.asarray(problem.odom_q), np.asarray(prob2.odom_q)
        )

    def test_resume_without_checkpoint_is_fresh(self, tmp_path):
        from vision_slam_frontend_tpu.backend import BASolverConfig, optimize

        cam, problem = self._problem()
        solver = BASolverConfig(max_iterations=2)
        opt, info = optimize(
            problem, cam=cam, solver=solver,
            checkpoint_path=str(tmp_path / "none.npz"), resume=True,
        )
        assert info["iterations"] >= 1
