"""Multi-session map merge + windowed local BA tests."""

import numpy as np
import pytest

from vision_slam_frontend_tpu.backend import BASolverConfig, ate_rmse, optimize
from vision_slam_frontend_tpu.backend.local_ba import slice_problem, windowed_local_ba
from vision_slam_frontend_tpu.backend.merge import (
    merge_sessions,
    merge_slam_problems,
    transform_problem,
)
from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence


@pytest.fixture(scope="module")
def two_sessions():
    """Two overlapping sessions of the same synthetic world."""
    rig = SyntheticRig()
    config = FrontendConfig(
        calib=rig.calib(), max_features=192, frame_life=4, fast_threshold=12.0
    )
    frames = list(generate_sequence(num_frames=14, step=0.25, rig=rig))

    def run(sub):
        fe = Frontend(config)
        for f in sub:
            fe.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
            fe.observe_image(f.left, f.right, f.timestamp)
        return fe

    fe_a = run(frames[:9])
    fe_b = run(frames[6:])
    return config, frames, fe_a.get_slam_problem(), fe_b.get_slam_problem()


class TestMerge:
    def test_transform_problem(self, two_sessions):
        config, frames, pa, pb = two_sessions
        t = np.array([1.0, -2.0, 3.0])
        q = np.array([np.cos(0.3), 0.0, np.sin(0.3), 0.0])
        moved = transform_problem(pa, t, q)
        # Original untouched; locations transformed.
        assert not np.allclose(moved.nodes[0].pose.loc, pa.nodes[0].pose.loc)
        from vision_slam_frontend_tpu.utils import np_geom

        expect = np_geom.quat_rotate(q, np.asarray(pa.nodes[2].pose.loc, np.float64)) + t
        np.testing.assert_allclose(moved.nodes[2].pose.loc, expect, atol=1e-5)

    def test_merge_reindexes(self, two_sessions):
        config, frames, pa, pb = two_sessions
        merged, session_of_pose = merge_slam_problems([pa, pb])
        assert len(merged.nodes) == len(pa.nodes) + len(pb.nodes)
        ids = [n.node_idx for n in merged.nodes]
        assert ids == list(range(len(merged.nodes)))
        assert (session_of_pose[: len(pa.nodes)] == 0).all()
        assert (session_of_pose[len(pa.nodes) :] == 1).all()
        # Factors reference valid pose ids.
        for vf in merged.vision_factors:
            assert 0 <= vf.pose_idx_initial < len(merged.nodes)
            assert 0 <= vf.pose_idx_current < len(merged.nodes)

    def test_merge_sessions_associates_and_optimizes(self, two_sessions):
        config, frames, pa, pb = two_sessions
        # Session B's world frame equals session A's (same odometry origin...
        # actually B's odometry re-anchors at frame 6, so provide the true
        # transform: B's origin is frame 6's camera pose in A's frame.
        fb = frames[6]
        t_b = fb.cam_pos
        R = fb.cam_to_world_R
        from vision_slam_frontend_tpu.io.kitti import _rotmat_to_quat

        q_b = _rotmat_to_quat(R)
        ba, info = merge_sessions(
            [pa, pb],
            transforms=[(np.zeros(3), np.array([1.0, 0, 0, 0])), (t_b, q_b)],
            left_cam_to_robot=config.left_cam_to_robot,
            assoc_radius=0.25,
        )
        assert info["num_sessions"] == 2
        assert info["merged_landmark_pairs"] > 20, info
        # Joint BA converges with the anchor frozen.
        opt, oinfo = optimize(
            ba, config=config,
            solver=BASolverConfig(max_iterations=6, huber_delta=3.0, trim_threshold=8.0),
        )
        assert oinfo["cost"] < oinfo["history"][0]
        # Anchor session poses unchanged (frozen).
        np.testing.assert_allclose(
            np.asarray(opt.poses_t)[: len(pa.nodes)],
            np.asarray(ba.poses_t)[: len(pa.nodes)],
            atol=1e-6,
        )
        # Session-B trajectory should remain close to ground truth after BA.
        gt_b = np.stack([f.cam_pos for f in frames[7:]])
        est_b = np.asarray(opt.poses_t)[len(pa.nodes) :][: len(gt_b)]
        assert ate_rmse(est_b, gt_b, align=False) < 0.1


class TestLocalBA:
    def test_slice_problem(self, two_sessions):
        config, frames, pa, pb = two_sessions
        sub = slice_problem(pa, 3)
        assert len(sub.nodes) == len(pa.nodes) - 3
        assert sub.nodes[0].node_idx == 0
        for vf in sub.vision_factors:
            assert 0 <= vf.pose_idx_initial < len(sub.nodes)

    def test_windowed_local_ba_improves_corrupted_tail(self, two_sessions):
        config, frames, pa, pb = two_sessions
        import copy

        problem = copy.deepcopy(pa)
        # Corrupt the last two poses (simulated odometry glitch).
        rng = np.random.default_rng(0)
        gt = {n.node_idx: n.pose.loc.copy() for n in problem.nodes}
        for node in problem.nodes[-2:]:
            node.pose.loc = node.pose.loc + rng.normal(0, 0.08, 3).astype(np.float32)
        err_before = np.mean(
            [np.linalg.norm(n.pose.loc - gt[n.node_idx]) for n in problem.nodes[-2:]]
        )
        updated, info = windowed_local_ba(problem, config, window=6, fixed_overlap=2)
        assert updated > 0 and info is not None
        err_after = np.mean(
            [np.linalg.norm(n.pose.loc - gt[n.node_idx]) for n in problem.nodes[-2:]]
        )
        assert err_after < err_before, f"{err_before:.4f} -> {err_after:.4f}"


class TestPipelinedLocalBA:
    """The CLI's pipelined local-BA schedule (dispatch at keyframe k, apply
    at k+1) must produce the same refined trajectory the synchronous
    schedule does — same math, just overlapped with inter-keyframe work."""

    def test_pipeline_matches_synchronous_schedule(self, two_sessions):
        import copy

        from vision_slam_frontend_tpu.backend.local_ba import flush_local_ba

        config, frames, pa, pb = two_sessions
        rng = np.random.default_rng(1)
        base = copy.deepcopy(pa)
        for node in base.nodes[-3:]:
            node.pose.loc = node.pose.loc + rng.normal(0, 0.06, 3).astype(np.float32)

        # Synchronous: one call per simulated "keyframe arrival" over
        # growing prefixes of the problem.
        def run(schedule_pipelined: bool):
            prob = copy.deepcopy(base)
            all_nodes = prob.nodes
            for upto in range(4, len(all_nodes) + 1):
                prob.nodes = all_nodes[:upto]
                windowed_local_ba(prob, config, window=5, fixed_overlap=2,
                                  pipeline=schedule_pipelined)
            if schedule_pipelined:
                flush_local_ba()
            prob.nodes = all_nodes
            return np.stack([n.pose.loc for n in prob.nodes])

        sync = run(False)
        piped = run(True)
        np.testing.assert_allclose(piped, sync, atol=1e-5)

    def test_cli_pipelined_local_ba_end_to_end(self, tmp_path):
        """Full CLI loop with --local_ba + --checkpoint_every: the drain
        sites (periodic checkpoint + epilogue) must leave a consistent,
        finite saved problem."""
        from vision_slam_frontend_tpu.cli.slam_frontend import main

        out = tmp_path / "p.npz"
        rc = main([
            "--input", "synthetic:14", "--output", str(out),
            "--local_ba", "6", "--checkpoint_every", "5",
        ])
        assert rc == 0
        d = np.load(out, allow_pickle=True)
        assert len(d["nodes_id"]) >= 10
        assert np.isfinite(d["nodes_loc"]).all()
        assert np.isfinite(d["nodes_quat"]).all()
