"""slam_merge CLI end-to-end test over two synthetic sessions."""

import numpy as np

from vision_slam_frontend_tpu.io.serialize import save_problem
from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence


def test_merge_cli_end_to_end(tmp_path, capsys):
    from vision_slam_frontend_tpu.cli.slam_merge import main
    from vision_slam_frontend_tpu.io.kitti import _rotmat_to_quat

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
    a_path = str(tmp_path / "a.npz")
    b_path = str(tmp_path / "b.npz")
    save_problem(a_path, fe_a.get_slam_problem(), config=config)
    save_problem(b_path, fe_b.get_slam_problem(), config=config)

    fb = frames[6]
    q_b = _rotmat_to_quat(fb.cam_to_world_R)
    t_b = fb.cam_pos
    tf = "0,0,0,1,0,0,0;" + ",".join(
        str(v) for v in [t_b[0], t_b[1], t_b[2], q_b[0], q_b[1], q_b[2], q_b[3]]
    )
    out = str(tmp_path / "merged.npz")
    rc = main(
        ["--inputs", a_path, b_path, "--output", out, "--transforms", tf,
         "--assoc_radius", "0.25", "--max_iterations", "5"]
    )
    assert rc == 0
    text = capsys.readouterr().out
    assert "Merged 2 sessions" in text and "Joint BA" in text
    with np.load(out) as data:
        n_a = fe_a.get_num_poses()
        n_b = fe_b.get_num_poses()
        assert len(data["nodes_id"]) == n_a + n_b
        assert data["session_of_pose"].tolist() == [0] * n_a + [1] * n_b


def test_merge_cli_rejects_single_input(tmp_path, capsys):
    from vision_slam_frontend_tpu.cli.slam_merge import main

    rc = main(["--inputs", "only.npz", "--output", str(tmp_path / "o.npz")])
    assert rc == 1
