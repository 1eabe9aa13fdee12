"""evaluate CLI test."""

import json

import numpy as np


def test_evaluate_npz_vs_kitti(tmp_path, capsys):
    from vision_slam_frontend_tpu.cli.evaluate import main
    from vision_slam_frontend_tpu.io.serialize import save_problem
    from tests.test_io import make_problem

    problem = make_problem()
    est = str(tmp_path / "est.npz")
    save_problem(est, problem)
    # GT = same trajectory rigidly shifted: raw ATE > 0, aligned ~ 0.
    gt_traj = np.array([n.pose.loc for n in problem.nodes], np.float64) + [1.0, 0, 0]
    rows = []
    for t in gt_traj:
        M = np.hstack([np.eye(3), t[:, None]])
        rows.append(M.ravel())
    gt = str(tmp_path / "gt.txt")
    np.savetxt(gt, np.array(rows))
    rc = main(["--est", est, "--gt", gt])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_poses"] == 3
    assert abs(out["ate_rmse_raw"] - 1.0) < 1e-5
    assert out["ate_rmse_aligned"] < 1e-5


def test_evaluate_missing_file(capsys):
    from vision_slam_frontend_tpu.cli.evaluate import main

    rc = main(["--est", "/nope.npz", "--gt", "/nope.txt"])
    assert rc == 1
