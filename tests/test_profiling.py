"""Per-stage profiling utility tests (utils/profiling.py, cli/profile_stages)."""

from vision_slam_frontend_tpu.frontend.config import FrontendConfig
from vision_slam_frontend_tpu.io.synthetic import SyntheticRig
from vision_slam_frontend_tpu.utils.profiling import (
    format_stage_table,
    profile_keyframe_stages,
)

EXPECTED_STAGES = {
    "detect_describe_x2",
    "stereo_ratio_match",
    "epipolar_filter",
    "window_match",
    "undistort_x2",
    "triangulate",
}


def test_profile_stages_smoke():
    rig = SyntheticRig(width=320, height=240)
    config = FrontendConfig(
        calib=rig.calib(), max_features=128, frame_life=3, fast_threshold=12.0
    )
    t = profile_keyframe_stages(config, image_shape=(240, 320), iters=2, windows=1)
    assert EXPECTED_STAGES <= set(t)
    assert all(v > 0 for v in t.values())
    assert "_fused_step_ms" in t and "_stage_sum_ms" in t

    table = format_stage_table(t)
    assert "fused keyframe step" in table
    for s in EXPECTED_STAGES:
        assert s in table


def test_profile_cli(capsys):
    from vision_slam_frontend_tpu.cli.profile_stages import main

    rc = main(["--cpu", "--max_features", "128", "--frame_life", "3",
               "--width", "320", "--height", "240", "--iters", "1",
               "--windows", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "detect_describe_x2" in out
