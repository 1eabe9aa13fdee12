"""Viz tests: PLY structure, debug images, HTML viewer content."""

import json
import re

import numpy as np

from tests.test_io import make_problem
from vision_slam_frontend_tpu.viz.debug_images import (
    create_match_debug_image,
    create_stereo_debug_image,
)
from vision_slam_frontend_tpu.viz.html import export_html
from vision_slam_frontend_tpu.viz.ply import export_ply


def test_ply_structure(tmp_path):
    problem = make_problem()
    path = str(tmp_path / "map.ply")
    stats = export_ply(path, problem)
    assert stats["nodes"] == 3
    raw = open(path, "rb").read()
    header, _, body = raw.partition(b"end_header\n")
    assert b"element vertex" in header
    n_vertex = int(re.search(rb"element vertex (\d+)", header).group(1))
    n_edge = int(re.search(rb"element edge (\d+)", header).group(1))
    assert n_vertex == stats["nodes"] + stats["landmarks"]
    assert n_edge == stats["edges"] == 4  # 2 odom + 2 vision factors
    assert len(body) == n_vertex * (12 + 3) + n_edge * 8


def test_html_viewer(tmp_path):
    problem = make_problem()
    path = str(tmp_path / "map.html")
    stats = export_html(path, problem, title="test")
    html = open(path).read()
    assert html.startswith("<!DOCTYPE html>")
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html, re.S).group(1))
    assert len(data["nodes"]) == stats["nodes"] == 3
    assert len(data["odom_edges"]) == 2
    assert data["extent"] > 0
    # No unfilled template placeholders.
    assert "{data}" not in html and "{stats}" not in html


def test_debug_images_draw():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (60, 80)).astype(np.float32)
    lp = np.array([[20.0, 30.0], [40.0, 10.0]])
    rp = np.array([[18.0, 30.0], [37.0, 11.0]])
    stereo = create_stereo_debug_image(img, img, lp, rp)
    assert stereo.shape == (60, 160, 3)
    assert (stereo[:, :, 0] != stereo[:, :, 1]).any()  # something red drawn
    match = create_match_debug_image(img, lp, rp)
    assert match.shape == (60, 80, 3)
    # Green flow lines present.
    green = (match[:, :, 1] > 200) & (match[:, :, 0] < 60)
    assert green.any()


class TestLiveViz:
    """Live per-keyframe visualization (viz/live.py): the headless equivalent
    of the reference's per-keyframe RViz publishing + debug-image topics
    (reference: src/slam_frontend_main.cc:194-225, 295-309)."""

    def test_live_viewer_rewrites_with_refresh(self, tmp_path):
        from vision_slam_frontend_tpu.viz.live import LiveViewer

        problem = make_problem()
        path = str(tmp_path / "run_live.html")
        viewer = LiveViewer(path, every=2, refresh_seconds=1.5)
        assert viewer.update(problem) is not None  # update 1: writes
        assert viewer.update(problem) is None      # update 2: skipped (every=2)
        assert viewer.update(problem) is not None  # update 3: writes
        html = open(path).read()
        assert '<meta http-equiv="refresh" content="1.5">' in html
        assert "localStorage" in html  # camera persists across reloads
        # force=True writes regardless of cadence.
        assert viewer.update(problem, force=True) is not None
        assert viewer.last_stats["nodes"] == 3

    def test_final_export_has_no_refresh(self, tmp_path):
        path = str(tmp_path / "final.html")
        export_html(path, make_problem())
        assert "http-equiv" not in open(path).read()

    def test_incremental_viewer_appends_deltas(self, tmp_path):
        """IncrementalLiveViewer (the O(delta) live page): header once, one
        <script>A({...})</script> chunk per update, no pipeline flush, debug
        image embedded."""
        import os

        from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
        from vision_slam_frontend_tpu.io.synthetic import (
            SyntheticRig,
            generate_sequence,
        )
        from vision_slam_frontend_tpu.viz.live import (
            DebugImageStreamer,
            IncrementalLiveViewer,
        )

        rig = SyntheticRig()
        config = FrontendConfig(
            calib=rig.calib(), max_features=128, frame_life=4,
            fast_threshold=12.0, debug_images=True,
        )
        frontend = Frontend(config)
        frontend.debug_sink = DebugImageStreamer(str(tmp_path / "dbg"))
        path = str(tmp_path / "live.html")
        viewer = IncrementalLiveViewer(path, refresh_seconds=1.5)
        header_size = os.path.getsize(path)
        assert '<meta http-equiv="refresh" content="1.5">' in open(path).read()

        sizes = [header_size]
        for f in generate_sequence(num_frames=6, step=0.25, rig=rig):
            frontend.observe_odometry(
                f.odom_translation, f.odom_rotation, f.timestamp
            )
            if frontend.observe_image(f.left, f.right, f.timestamp):
                viewer.update(frontend)
                # The viewer must NOT flush the one-deep result pipeline.
                assert frontend._pending is not None
                sizes.append(os.path.getsize(path))
        problem = frontend.get_slam_problem()
        viewer.update(frontend, force=True)
        html = open(path).read()
        # One A(...) chunk per non-empty update; every node accounted for.
        chunks = re.findall(r"<script>A\((\{.*?\})\)</script>", html)
        assert chunks, "no delta chunks appended"
        total_nodes = sum(len(json.loads(c)["nodes"]) for c in chunks)
        assert total_nodes == len(problem.nodes)
        total_oe = sum(len(json.loads(c)["oe"]) for c in chunks)
        assert total_oe == len(problem.odometry_factors)
        # O(delta) writes: later appends must not grow with problem size —
        # each per-keyframe append stays within ~2.5x of the typical one.
        # (The FIRST update appends nothing: the accumulator trails the
        # device by one keyframe.)
        deltas = np.diff(sizes)
        nonzero = deltas[deltas > 0]
        if len(nonzero) >= 3:
            assert deltas[-1] < 2.5 * np.median(nonzero)
        # The newest debug image rides along for the live page.
        assert any("dbg" in json.loads(c) for c in chunks)

    def test_debug_streamer_keeps_memory_flat(self, tmp_path):
        """With a debug sink installed, the frontend streams images to disk
        per keyframe and buffers NOTHING (the round-1 behavior kept every raw
        stereo pair in RAM for the whole run)."""
        from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
        from vision_slam_frontend_tpu.io.synthetic import (
            SyntheticRig,
            generate_sequence,
        )
        from vision_slam_frontend_tpu.viz.live import DebugImageStreamer

        rig = SyntheticRig()
        config = FrontendConfig(
            calib=rig.calib(), max_features=128, frame_life=4,
            fast_threshold=12.0, debug_images=True,
        )
        frontend = Frontend(config)
        out = str(tmp_path / "dbg")
        frontend.debug_sink = DebugImageStreamer(out)
        n_kf = 0
        for f in generate_sequence(num_frames=5, step=0.25, rig=rig):
            frontend.observe_odometry(
                f.odom_translation, f.odom_rotation, f.timestamp
            )
            n_kf += bool(frontend.observe_image(f.left, f.right, f.timestamp))
        assert n_kf >= 3
        assert frontend.get_debug_data() == []  # nothing buffered
        import os

        files = sorted(os.listdir(out))
        stereo = [f for f in files if f.startswith("stereo_")]
        match = [f for f in files if f.startswith("match_")]
        assert len(stereo) == n_kf == frontend.debug_sink.num_stereo
        # Temporal matches exist from the second keyframe on.
        assert len(match) >= n_kf - 1
