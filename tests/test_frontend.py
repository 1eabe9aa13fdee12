"""Integration tests: the full frontend pipeline over a synthetic stereo world."""

import numpy as np
import pytest

from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
from vision_slam_frontend_tpu.io.synthetic import (
    PlaneScene,
    SyntheticRig,
    generate_sequence,
    make_texture,
)


@pytest.fixture(scope="module")
def pipeline_run():
    """Run the frontend over a 12-frame synthetic sequence once per module."""
    rig = SyntheticRig()
    config = FrontendConfig(
        calib=rig.calib(),
        max_features=256,
        frame_life=5,
        fast_threshold=12.0,
    )
    frontend = Frontend(config)
    frames = list(generate_sequence(num_frames=12, step=0.25, rig=rig))
    added = []
    for f in frames:
        frontend.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
        added.append(frontend.observe_image(f.left, f.right, f.timestamp))
    return frontend, frames, added, rig


class TestFrontendPipeline:
    def test_keyframe_gating(self, pipeline_run):
        frontend, frames, added, rig = pipeline_run
        # Frame 0: odometry just initialized, no motion yet -> gate closed.
        assert added[0] is False
        # Every subsequent frame moves 0.25 m > 0.2 m -> keyframe.
        assert all(added[1:]), f"keyframes missed: {added}"
        assert frontend.get_num_poses() == len(frames) - 1

    def test_features_and_stereo(self, pipeline_run):
        frontend, frames, added, rig = pipeline_run
        problem = frontend.get_slam_problem()
        for node in problem.nodes:
            assert len(node.features) > 40, (
                f"node {node.node_idx}: only {len(node.features)} stereo features"
            )
            # Features indices are dense 0..n-1.
            assert [f.feature_idx for f in node.features] == list(
                range(len(node.features))
            )

    def test_triangulated_depth_vs_ground_truth(self, pipeline_run):
        frontend, frames, added, rig = pipeline_run
        problem = frontend.get_slam_problem()
        scene = PlaneScene.ground(make_texture(0))
        K = rig.K()
        kf_frames = [f for f, a in zip(frames, added) if a]
        rel_errs = []
        for node, frame in zip(problem.nodes, kf_frames):
            px = np.array([f.pixel for f in node.features])
            z_hat = np.array([f.point3d[2] for f in node.features])
            z_gt = scene.depth(K, frame.cam_to_world_R, frame.cam_pos, px)
            ok = z_gt > 0.5
            rel_errs.append(np.abs(z_hat[ok] - z_gt[ok]) / z_gt[ok])
        rel = np.concatenate(rel_errs)
        assert np.median(rel) < 0.05, f"median depth error {np.median(rel):.3f}"
        assert np.mean(rel < 0.15) > 0.8

    def test_vision_factors(self, pipeline_run):
        frontend, frames, added, rig = pipeline_run
        problem = frontend.get_slam_problem()
        n = len(problem.nodes)
        # One factor per (window slot, keyframe) pair: node k has min(k, W)
        # past frames.
        W = frontend.config.frame_life
        expected = sum(min(k, W) for k in range(n))
        assert len(problem.vision_factors) == expected
        # Consecutive-frame factors should carry plenty of matches.
        consec = [
            f
            for f in problem.vision_factors
            if f.pose_idx_current == f.pose_idx_initial + 1
        ]
        assert consec and all(len(f.feature_matches) > 10 for f in consec)
        # Match indices must be in range of the node feature lists.
        for f in problem.vision_factors:
            n_init = len(problem.nodes[f.pose_idx_initial].features)
            n_curr = len(problem.nodes[f.pose_idx_current].features)
            for m in f.feature_matches:
                assert 0 <= m.feature_idx_initial < n_init
                assert 0 <= m.feature_idx_current < n_curr

    def test_odometry_factors(self, pipeline_run):
        frontend, frames, added, rig = pipeline_run
        problem = frontend.get_slam_problem()
        n = len(problem.nodes)
        assert len(problem.odometry_factors) == n - 1
        for f in problem.odometry_factors:
            assert f.pose_j == f.pose_i + 1
            # Forward motion of ~0.25 m along +z (camera convention).
            np.testing.assert_allclose(
                np.linalg.norm(f.translation), 0.25, atol=0.02
            )
            assert f.translation[2] > 0.2

    def test_node_poses_match_odometry(self, pipeline_run):
        frontend, frames, added, rig = pipeline_run
        problem = frontend.get_slam_problem()
        kf_frames = [f for f, a in zip(frames, added) if a]
        for node, frame in zip(problem.nodes, kf_frames):
            # World frame == odometry-init frame == frame-0 camera frame.
            np.testing.assert_allclose(
                node.pose.loc, frame.cam_pos, atol=1e-4
            )

    def test_track_ids_chain(self, pipeline_run):
        frontend, frames, added, rig = pipeline_run
        tids = frontend.node_track_ids
        assert len(tids) == frontend.get_num_poses()
        # Tracks must persist: some of node k's features carry a track id
        # born in an earlier keyframe. The ceiling is set by the best-percent
        # cut (0.3 of ratio-test matches survive per pair), so expect ~15-20%.
        K = frontend.config.max_features
        for k in range(2, len(tids)):
            born_earlier = np.mean(tids[k] // K < k)
            assert born_earlier > 0.08, f"node {k}: only {born_earlier:.2f} inherited tracks"
        # And at least one track must span >= 3 keyframes (depth-2 inheritance).
        last = len(tids) - 1
        assert np.any(tids[last] // K <= last - 2)

    def test_summary_line(self, pipeline_run):
        frontend, frames, added, rig = pipeline_run
        s = frontend.get_slam_problem().summary()
        assert "nodes" in s and "vision factors" in s


def test_blank_images_no_features():
    """Degenerate input must not crash: zero features, empty factors."""
    rig = SyntheticRig()
    config = FrontendConfig(calib=rig.calib(), max_features=64, frame_life=3)
    frontend = Frontend(config)
    blank = np.zeros((rig.height, rig.width), np.float32)
    frontend.observe_odometry(np.zeros(3), np.array([1.0, 0, 0, 0]), 0.0)
    assert frontend.observe_image(blank, blank, 0.0) is False  # gate closed
    frontend.observe_odometry(np.array([0.3, 0, 0]), np.array([1.0, 0, 0, 0]), 1.0)
    assert frontend.observe_image(blank, blank, 1.0) is True
    problem = frontend.get_slam_problem()
    assert len(problem.nodes) == 1
    assert len(problem.nodes[0].features) == 0


def test_config_yaml_roundtrip(tmp_path):
    config = FrontendConfig(max_features=128, nn_match_ratio=0.7)
    p = str(tmp_path / "config.yaml")
    config.save(p)
    loaded = FrontendConfig.load(p)
    assert loaded.max_features == 128
    assert loaded.nn_match_ratio == 0.7
    np.testing.assert_allclose(loaded.fundamental, config.fundamental)


def test_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("nonexistent_knob: 3\n")
    with pytest.raises(ValueError):
        FrontendConfig.load(str(p))


class TestUpdatePoses:
    """Frontend.update_poses: the supported BA write-back seam (replaces the
    old CLI pattern of mutating frontend._nodes through aliased problem
    copies)."""

    def _fresh_frontend(self):
        rig = SyntheticRig()
        config = FrontendConfig(
            calib=rig.calib(), max_features=256, frame_life=5, fast_threshold=12.0
        )
        frontend = Frontend(config)
        for f in generate_sequence(num_frames=6, step=0.25, rig=rig):
            frontend.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
            frontend.observe_image(f.left, f.right, f.timestamp)
        return frontend, config

    def test_array_update_lands_in_saved_problem(self):
        frontend, _ = self._fresh_frontend()
        n = frontend.get_num_poses()
        new_t = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
        new_q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
        assert frontend.update_poses(new_t, new_q) == n
        problem = frontend.get_slam_problem()
        for k, node in enumerate(problem.nodes):
            np.testing.assert_allclose(node.pose.loc, new_t[k])

    def test_length_mismatch_rejected(self):
        frontend, _ = self._fresh_frontend()
        with pytest.raises(ValueError, match="do not match"):
            frontend.update_poses(np.zeros((2, 3)), np.zeros((2, 4)))

    def test_local_ba_refinement_lands_in_saved_problem(self):
        from vision_slam_frontend_tpu.backend.local_ba import windowed_local_ba

        frontend, config = self._fresh_frontend()
        live = frontend.get_slam_problem()
        before = [n.pose.loc.copy() for n in live.nodes]
        updated, info = windowed_local_ba(live, config, window=6)
        assert updated > 0 and info is not None
        count = frontend.update_poses(live.nodes)
        assert count == frontend.get_num_poses()
        saved = frontend.get_slam_problem()
        moved = [
            not np.allclose(n.pose.loc, b)
            for n, b in zip(saved.nodes, before)
        ]
        # The local BA must have actually refined (moved) some tail poses,
        # and those refinements must be visible in a fresh problem copy.
        assert any(moved)
        for n_live, n_saved in zip(live.nodes, saved.nodes):
            np.testing.assert_allclose(n_saved.pose.loc, n_live.pose.loc)


class TestResultPipelining:
    """The one-deep result pipeline (fetch keyframe k-1 while k computes)
    must be invisible: identical problems vs the synchronous (validate=True)
    path, and every accessor sees flushed state."""

    def _run(self, validate):
        rig = SyntheticRig()
        config = FrontendConfig(
            calib=rig.calib(), max_features=128, frame_life=4,
            fast_threshold=12.0, validate=validate,
        )
        frontend = Frontend(config)
        for f in generate_sequence(num_frames=7, step=0.25, rig=rig):
            frontend.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
            frontend.observe_image(f.left, f.right, f.timestamp)
        return frontend

    def test_pipelined_matches_synchronous(self):
        fe_sync = self._run(validate=True)
        fe_pipe = self._run(validate=False)
        p_sync = fe_sync.get_slam_problem()
        p_pipe = fe_pipe.get_slam_problem()
        assert len(p_pipe.nodes) == len(p_sync.nodes)
        assert len(p_pipe.vision_factors) == len(p_sync.vision_factors)
        assert len(p_pipe.odometry_factors) == len(p_sync.odometry_factors)
        for a, b in zip(p_pipe.nodes, p_sync.nodes):
            np.testing.assert_allclose(a.pose.loc, b.pose.loc)
            np.testing.assert_allclose(a.pose.angle, b.pose.angle)
            assert len(a.features) == len(b.features)
            for fa, fb in zip(a.features, b.features):
                np.testing.assert_allclose(fa.pixel, fb.pixel)
                np.testing.assert_allclose(fa.point3d, fb.point3d)
        for fa, fb in zip(p_pipe.odometry_factors, p_sync.odometry_factors):
            np.testing.assert_allclose(fa.translation, fb.translation)
            np.testing.assert_allclose(fa.rotation, fb.rotation)

    def test_accessors_flush_mid_stream(self):
        rig = SyntheticRig()
        config = FrontendConfig(
            calib=rig.calib(), max_features=128, frame_life=4, fast_threshold=12.0
        )
        frontend = Frontend(config)
        n_added = 0
        for f in generate_sequence(num_frames=6, step=0.25, rig=rig):
            frontend.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
            if frontend.observe_image(f.left, f.right, f.timestamp):
                n_added += 1
                # Immediately-visible state: the pending result must be
                # flushed by every accessor, mid-stream.
                assert frontend.get_num_poses() == n_added
                assert len(frontend.stats) == n_added
                assert len(frontend.node_track_ids) == n_added
                assert frontend.get_slam_problem().nodes[-1].node_idx == n_added - 1
