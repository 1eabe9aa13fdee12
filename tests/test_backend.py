"""BA backend tests: synthetic convergence, robustness, track building, metrics."""

import numpy as np
import jax.numpy as jnp
import pytest

from vision_slam_frontend_tpu.backend import (
    BASolverConfig,
    ate_rmse,
    build_ba_problem,
    optimize,
    rpe_rmse,
)
from vision_slam_frontend_tpu.backend.residuals import CameraParams, reproject_residual
from vision_slam_frontend_tpu.types.slam_types import BAProblem
from vision_slam_frontend_tpu.utils import np_geom


def make_cam():
    return CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )


def synthetic_ba(
    P=8, L=120, obs_per_lm=4, pose_noise=0.0, lm_noise=0.0, px_noise=0.0,
    outlier_frac=0.0, seed=0,
):
    """Ground-truth world + noisy initialization, returns (problem, gt_t, gt_lm)."""
    rng = np.random.default_rng(seed)
    cam = make_cam()
    # GT trajectory: forward motion with slight yaw.
    gt_t = np.stack([np.array([0.02 * k, 0.0, 0.3 * k]) for k in range(P)])
    gt_q = np.stack(
        [np.array([np.cos(0.01 * k), 0, np.sin(0.01 * k), 0]) for k in range(P)]
    )
    # GT landmarks in front of the trajectory.
    gt_lm = np.stack(
        [
            rng.uniform(-3, 3, L),
            rng.uniform(-2, 2, L),
            rng.uniform(2, 14, L) + 0.15 * np.arange(L) % 5,
        ],
        axis=-1,
    )

    obs_pose, obs_lm, obs_px = [], [], []
    for j in range(L):
        sees = rng.choice(P, size=min(obs_per_lm, P), replace=False)
        for i in sees:
            # Project GT landmark into GT pose i.
            q_inv = np_geom.quat_inverse(gt_q[i])
            p_cam = np_geom.quat_rotate(q_inv, gt_lm[j] - gt_t[i])
            if p_cam[2] < 0.5:
                continue
            u = 500.0 * p_cam[0] / p_cam[2] + 320.0
            v = 500.0 * p_cam[1] / p_cam[2] + 240.0
            if not (0 <= u < 640 and 0 <= v < 480):
                continue
            px = np.array([u, v]) + rng.normal(0, px_noise, 2)
            if outlier_frac > 0 and rng.random() < outlier_frac:
                px = rng.uniform([0, 0], [640, 480])
            obs_pose.append(i)
            obs_lm.append(j)
            obs_px.append(px)

    N = len(obs_pose)
    # Noisy initialization.
    init_t = gt_t + rng.normal(0, pose_noise, gt_t.shape)
    init_t[0] = gt_t[0]  # gauge
    init_q = []
    for k in range(P):
        dq = np_geom.quat_normalize(
            np.concatenate([[1.0], rng.normal(0, pose_noise * 0.5, 3)])
        )
        init_q.append(np_geom.quat_multiply(gt_q[k], dq) if k > 0 else gt_q[k])
    init_q = np.stack(init_q)
    init_lm = gt_lm + rng.normal(0, lm_noise, gt_lm.shape)

    # Odometry factors from GT relative poses.
    oi, oj, ot, oq = [], [], [], []
    for k in range(P - 1):
        qi_inv = np_geom.quat_inverse(gt_q[k])
        oi.append(k)
        oj.append(k + 1)
        ot.append(np_geom.quat_rotate(qi_inv, gt_t[k + 1] - gt_t[k]))
        oq.append(np_geom.quat_multiply(qi_inv, gt_q[k + 1]))

    from vision_slam_frontend_tpu.backend.tracks import build_gather_tables

    pose_obs, pose_obs_mask, lm_obs, lm_obs_mask = build_gather_tables(
        np.asarray(obs_pose), np.asarray(obs_lm), np.ones(N, bool), P, L
    )
    problem = BAProblem(
        pose_obs=jnp.asarray(pose_obs),
        pose_obs_mask=jnp.asarray(pose_obs_mask),
        lm_obs=jnp.asarray(lm_obs),
        lm_obs_mask=jnp.asarray(lm_obs_mask),
        poses_t=jnp.asarray(init_t, jnp.float32),
        poses_q=jnp.asarray(init_q, jnp.float32),
        pose_mask=jnp.ones(P, bool),
        landmarks=jnp.asarray(init_lm, jnp.float32),
        landmark_mask=jnp.ones(L, bool),
        obs_pose=jnp.asarray(obs_pose, jnp.int32),
        obs_landmark=jnp.asarray(obs_lm, jnp.int32),
        obs_pixel=jnp.asarray(np.stack(obs_px), jnp.float32),
        obs_mask=jnp.ones(N, bool),
        odom_i=jnp.asarray(oi, jnp.int32),
        odom_j=jnp.asarray(oj, jnp.int32),
        odom_t=jnp.asarray(np.stack(ot), jnp.float32),
        odom_q=jnp.asarray(np.stack(oq), jnp.float32),
        odom_mask=jnp.ones(P - 1, bool),
    )
    return cam, problem, gt_t, gt_lm


class TestResiduals:
    def test_perfect_projection_zero_residual(self):
        cam = make_cam()
        t = jnp.array([1.0, 0.5, -0.2])
        q = jnp.array([0.9, 0.1, -0.2, 0.3])
        q = q / jnp.linalg.norm(q)
        lm_cam = jnp.array([0.5, -0.3, 4.0])
        # World landmark from camera point.
        lm_world = jnp.asarray(
            np_geom.quat_rotate(np.asarray(q), np.asarray(lm_cam))
        ) + t
        px = jnp.array(
            [500.0 * 0.5 / 4.0 + 320.0, 500.0 * (-0.3) / 4.0 + 240.0]
        )
        r = reproject_residual(cam, t, q, lm_world, px)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-3)


class TestBA:
    def test_zero_noise_stays(self):
        cam, problem, gt_t, gt_lm = synthetic_ba()
        opt, info = optimize(problem, cam=cam, solver=BASolverConfig(max_iterations=3))
        assert info["cost"] < 1e-2

    def test_landmark_noise_converges(self):
        cam, problem, gt_t, gt_lm = synthetic_ba(lm_noise=0.3, seed=1)
        opt, info = optimize(problem, cam=cam)
        lm_err = np.linalg.norm(np.asarray(opt.landmarks) - gt_lm, axis=-1)
        assert np.median(lm_err) < 0.02, f"median landmark error {np.median(lm_err):.3f}"
        # fp32 floor: ~0.01 px RMS residual over a few hundred observations.
        assert info["cost"] < 0.05

    def test_pose_and_landmark_noise_converges(self):
        cam, problem, gt_t, gt_lm = synthetic_ba(
            pose_noise=0.08, lm_noise=0.3, px_noise=0.3, seed=2
        )
        ate_before = ate_rmse(np.asarray(problem.poses_t), gt_t, align=False)
        opt, info = optimize(problem, cam=cam)
        ate_after = ate_rmse(np.asarray(opt.poses_t), gt_t, align=False)
        assert ate_after < 0.25 * ate_before, (
            f"BA did not improve trajectory: {ate_before:.4f} -> {ate_after:.4f}"
        )
        assert ate_after < 0.02

    def test_huber_rejects_outliers(self):
        cam, problem, gt_t, gt_lm = synthetic_ba(
            pose_noise=0.05, lm_noise=0.2, px_noise=0.3, outlier_frac=0.1, seed=3
        )
        opt, info = optimize(
            problem, cam=cam,
            solver=BASolverConfig(huber_delta=3.0, trim_threshold=10.0),
        )
        ate = ate_rmse(np.asarray(opt.poses_t), gt_t, align=False)
        assert info["trimmed"] > 10  # the injected outliers got dropped
        assert ate < 0.05, f"ATE with outliers: {ate:.4f}"

    def test_cost_monotone_accepts(self):
        cam, problem, *_ = synthetic_ba(pose_noise=0.05, lm_noise=0.2, seed=4)
        opt, info = optimize(problem, cam=cam)
        h = info["history"]
        assert h[-1] <= h[0]
        assert info["accepted"] >= 1


class TestTracks:
    def test_build_from_frontend_problem(self):
        from tests.test_io import make_problem

        problem = make_problem()
        ba = build_ba_problem(problem, min_track_length=2, pad_to_multiple=4)
        n_obs = int(np.sum(np.asarray(ba.obs_mask)))
        assert n_obs >= 4  # two matches chain 2 obs each
        assert int(np.sum(np.asarray(ba.landmark_mask))) >= 2
        op = np.asarray(ba.obs_pose)[np.asarray(ba.obs_mask)]
        assert op.max() < len(problem.nodes)
        assert int(np.sum(np.asarray(ba.odom_mask))) == 2

    def test_min_track_length_filters(self):
        from tests.test_io import make_problem

        problem = make_problem()
        ba2 = build_ba_problem(problem, min_track_length=2, pad_to_multiple=4)
        ba3 = build_ba_problem(problem, min_track_length=3, pad_to_multiple=4)
        assert int(np.sum(np.asarray(ba3.landmark_mask))) <= int(
            np.sum(np.asarray(ba2.landmark_mask))
        )


class TestMetrics:
    def test_ate_alignment_invariance(self):
        rng = np.random.default_rng(5)
        gt = rng.normal(size=(20, 3))
        # Rigidly transform the trajectory; aligned ATE must be ~0.
        q = np_geom.quat_normalize(np.array([0.9, 0.1, 0.2, -0.3]))
        est = np.stack([np_geom.quat_rotate(q, p) for p in gt]) + np.array([5.0, -2.0, 1.0])
        assert ate_rmse(est, gt, align=True) < 1e-6
        assert ate_rmse(est, gt, align=False) > 1.0

    def test_rpe(self):
        gt = np.cumsum(np.ones((10, 3)) * 0.1, axis=0)
        est = gt + np.random.default_rng(6).normal(0, 0.01, gt.shape)
        assert rpe_rmse(est, gt) < 0.05


class TestDenseSchur:
    """Dense-Cholesky reduced-camera solve vs matrix-free PCG (backend/ba.py
    _solve_schur_dense): same step, same optimum."""

    def test_dense_matches_pcg_step(self):
        import jax.numpy as jnp

        from vision_slam_frontend_tpu.backend.ba import (
            _linearize,
            _solve_schur_dense,
            _solve_schur_pcg,
        )

        cam, problem, _, _ = synthetic_ba(
            P=7, L=90, pose_noise=0.04, lm_noise=0.25, px_noise=0.2, seed=5
        )
        hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
        lam = jnp.float32(1e-3)
        r, Jp, Jl, ro, Ji, Jj = _linearize(cam, problem, hd, wt, wr, True)
        dp_d, dl_d, _ = _solve_schur_dense(r, Jp, Jl, ro, Ji, Jj, problem, lam, True)
        dp_p, dl_p, _ = _solve_schur_pcg(
            r, Jp, Jl, ro, Ji, Jj, problem, lam, 200, True
        )
        # Both inner solvers approximate the same Newton step (dense builds
        # the coupling in bf16, PCG truncates) — they must agree to a few
        # percent of the step scale, and both must be descent directions.
        scale = np.abs(np.asarray(dp_p)).max()
        np.testing.assert_allclose(
            np.asarray(dp_d), np.asarray(dp_p), atol=8e-2 * scale
        )
        lscale = np.abs(np.asarray(dl_p)).max()
        # Landmark steps: the dense path deliberately floors per-landmark
        # damping at 1e-5 of the local V trace (the at-scale f32 Cholesky
        # stability fix, backend/ba.py round 5) while PCG damps with a flat
        # lambda*I — so NEAR-DEGENERATE landmarks (V min-eig below the
        # floor) legitimately receive different (both meaningless)
        # null-direction updates. Require elementwise agreement on all but
        # a <=2% degenerate tail, plus global direction alignment.
        dl_d_np, dl_p_np = np.asarray(dl_d), np.asarray(dl_p)
        viol = np.abs(dl_d_np - dl_p_np) > 8e-2 * lscale
        assert viol.mean() <= 0.02, f"{viol.mean():.3%} of d_lm elements diverge"
        cos = (dl_d_np * dl_p_np).sum() / max(
            np.linalg.norm(dl_d_np) * np.linalg.norm(dl_p_np), 1e-12
        )
        # 0.98: the degenerate tail's (arbitrary) null-direction components
        # shave ~0.01 off the global alignment (measured 0.987-0.99).
        assert cos > 0.98, f"d_lm direction misaligned: cos={cos:.4f}"

    def test_chunked_pcg_matches_fused_step(self):
        """The multi-program pose-major PCG (the N>=2.5M compile-ceiling
        escape, backend/ba._solve_schur_pcg_posemajor_chunked) must produce
        the same step as the fused single-program form — identical math,
        different program partitioning."""
        import jax.numpy as jnp

        from vision_slam_frontend_tpu.backend.ba import (
            _linearize,
            _solve_schur_pcg,
            _solve_schur_pcg_posemajor_chunked,
        )

        cam, problem, _, _ = synthetic_ba(
            P=7, L=90, pose_noise=0.04, lm_noise=0.25, px_noise=0.2, seed=5
        )
        hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
        lam = jnp.float32(1e-3)
        r, Jp, Jl, ro, Ji, Jj = _linearize(cam, problem, hd, wt, wr, True)
        fused = _solve_schur_pcg(r, Jp, Jl, ro, Ji, Jj, problem, lam, 24, True)
        chunked = _solve_schur_pcg_posemajor_chunked(
            r, Jp, Jl, ro, Ji, Jj, problem, lam, 24, True
        )
        for f, c in zip(fused, chunked):
            np.testing.assert_allclose(
                np.asarray(f), np.asarray(c), rtol=2e-5, atol=2e-6
            )

    def test_chunked_pcg_optimize_dispatch(self):
        """optimize() with schur_solver='pcg_chunked' (and with the obs-count
        auto-threshold) runs end-to-end and reaches the PCG optimum."""
        cam, problem, _, _ = synthetic_ba(
            P=8, L=100, pose_noise=0.05, lm_noise=0.3, px_noise=0.3, seed=6
        )
        opt_c, info_c = optimize(
            problem, cam=cam,
            solver=BASolverConfig(max_iterations=10, schur_solver="pcg_chunked",
                                  cg_iterations=128),
        )
        opt_p, info_p = optimize(
            problem, cam=cam,
            solver=BASolverConfig(max_iterations=10, schur_solver="pcg",
                                  cg_iterations=128),
        )
        assert abs(info_c["cost"] - info_p["cost"]) / max(info_p["cost"], 1e-9) < 1e-3
        # Auto-dispatch path: force the threshold below N to exercise it.
        opt_a, info_a = optimize(
            problem, cam=cam,
            solver=BASolverConfig(max_iterations=3, cg_iterations=32,
                                  schur_solver="pcg", chunked_obs_threshold=1),
        )
        assert np.isfinite(info_a["cost"])

    def test_pm_linearize_matches_flat(self):
        """Pose-major linearization (the production path: no per-iteration
        Jacobian relayout) must reproduce the flat linearization exactly when
        re-laid-out through the same gather tables."""
        import jax.numpy as jnp

        from vision_slam_frontend_tpu.backend.ba import (
            _build_pm_inputs,
            _linearize,
            _linearize_pm,
        )

        cam, problem, _, _ = synthetic_ba(
            P=7, L=90, pose_noise=0.04, lm_noise=0.25, px_noise=0.2, seed=5
        )
        hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
        pm = _build_pm_inputs(problem)
        r_pm, Jp_pm, Jl_pm, ro2, Ji2, Jj2 = _linearize_pm(
            cam, problem, pm, hd, wt, wr, True
        )
        r, Jp, Jl, ro, Ji, Jj = _linearize(cam, problem, hd, wt, wr, True)
        tbl = np.asarray(problem.pose_obs)
        msk = np.asarray(problem.pose_obs_mask).astype(np.float32)
        for flat, pmv, nd in ((r, r_pm, 1), (Jp, Jp_pm, 2), (Jl, Jl_pm, 2)):
            want = np.asarray(flat)[tbl] * msk.reshape(msk.shape + (1,) * nd)
            # Same math; different XLA fusion order moves f32 values ~1e-5.
            np.testing.assert_allclose(
                np.asarray(pmv), want, rtol=1e-4, atol=1e-4
            )
        np.testing.assert_allclose(np.asarray(ro2), np.asarray(ro), rtol=1e-6)

    def test_pm_pcg_matches_flat_pcg_step(self):
        """The pm-input fused PCG must match the flat-input (relayout) form."""
        import jax.numpy as jnp

        from vision_slam_frontend_tpu.backend.ba import (
            _build_pm_inputs,
            _linearize,
            _linearize_pm,
            _solve_schur_pcg,
            _solve_schur_pcg_posemajor_from_pm,
        )

        cam, problem, _, _ = synthetic_ba(
            P=7, L=90, pose_noise=0.04, lm_noise=0.25, px_noise=0.2, seed=5
        )
        hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
        lam = jnp.float32(1e-3)
        r, Jp, Jl, ro, Ji, Jj = _linearize(cam, problem, hd, wt, wr, True)
        flat = _solve_schur_pcg(r, Jp, Jl, ro, Ji, Jj, problem, lam, 24, True)
        pm = _build_pm_inputs(problem)
        r_pm, Jp_pm, Jl_pm, ro2, Ji2, Jj2 = _linearize_pm(
            cam, problem, pm, hd, wt, wr, True
        )
        pmres = _solve_schur_pcg_posemajor_from_pm(
            pm, r_pm, Jp_pm, Jl_pm, ro2, Ji2, Jj2, problem, lam,
            cg_iters=24, fix_first=True,
        )
        # Identical math; the pm linearization's different fusion order moves
        # inputs ~1e-5, which 24 CG iterations amplify to ~1e-2 of the step.
        for f, c in zip(flat[:2], pmres[:2]):
            scale = max(float(np.abs(np.asarray(f)).max()), 1e-9)
            np.testing.assert_allclose(
                np.asarray(f), np.asarray(c), atol=3e-2 * scale
            )

    def test_banded_coupling_matches_full_width(self):
        """The banded B B^T placement (static _dense_coupling_plan) must
        reproduce the full-width dense step on a pose-local problem, chunk-0
        wraparound outliers (full-width fallback, pmin=-1) included."""
        import jax.numpy as jnp

        from bench_ba import make_problem
        from vision_slam_frontend_tpu.backend.ba import (
            _build_pm_inputs,
            _dense_coupling_plan,
            _linearize_pm,
            _solve_schur_dense_pm,
        )

        problem = make_problem(P=64, L=512, obs_per_lm=3, seed=7)
        cam = make_cam()
        hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
        lam = jnp.float32(1e-3)
        pm = _build_pm_inputs(problem)
        plan = _dense_coupling_plan(problem, chunk=64, pw_multiple=8)
        PW, chunk, pmins = plan[:3]
        assert PW < 64, f"plan not banded: {plan}"
        assert any(p >= 0 for p in pmins)
        r_pm, Jp_pm, Jl_pm, ro, Ji, Jj = _linearize_pm(
            cam, problem, pm, hd, wt, wr, True
        )
        banded = _solve_schur_dense_pm(
            pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lam,
            fix_first=True, plan=plan,
        )
        full = _solve_schur_dense_pm(
            pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lam,
            fix_first=True, plan=None,
        )
        for b, f in zip(banded[:2], full[:2]):
            scale = max(float(np.abs(np.asarray(f)).max()), 1e-9)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(f), atol=2e-3 * scale, rtol=2e-3
            )

    def test_dense_chunked_matches_fused_dense_step(self):
        """The multi-program dense assembly (prep / per-chunk accumulate with
        donated in-place S / Cholesky / backsub — the P>1k compile-ceiling
        escape, backend/ba._solve_schur_dense_chunked_from_pm) must produce
        the same step as the fused single-program dense form: identical math,
        different program partitioning."""
        import jax.numpy as jnp

        from bench_ba import make_problem
        from vision_slam_frontend_tpu.backend.ba import (
            _build_pm_inputs,
            _dense_coupling_plan,
            _linearize_pm,
            _solve_schur_dense_chunked_from_pm,
            _solve_schur_dense_pm,
        )

        problem = make_problem(P=64, L=512, obs_per_lm=3, seed=7)
        cam = make_cam()
        hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
        lam = jnp.float32(1e-3)
        pm = _build_pm_inputs(problem)
        plan = _dense_coupling_plan(problem, chunk=64, pw_multiple=8)
        PW, chunk, pmins = plan[:3]
        assert PW < 64 and any(p >= 0 for p in pmins) and any(
            p < 0 for p in pmins
        ), f"plan must exercise banded AND full-width chunks: {plan}"
        r_pm, Jp_pm, Jl_pm, ro, Ji, Jj = _linearize_pm(
            cam, problem, pm, hd, wt, wr, True
        )
        fused = _solve_schur_dense_pm(
            pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lam,
            fix_first=True, plan=plan,
        )
        chunked = _solve_schur_dense_chunked_from_pm(
            pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lam, True, plan
        )
        # Same phase order; only program partitioning (and full-width
        # sub-chunk summation order) differs — fp-accumulation-level agreement.
        for f, c in zip(fused[:2], chunked[:2]):
            scale = max(float(np.abs(np.asarray(f)).max()), 1e-9)
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(f), atol=1e-4 * scale, rtol=1e-4
            )
        # And with plan=None (pure full-width) it must still agree.
        chunked_fw = _solve_schur_dense_chunked_from_pm(
            pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lam, True, None
        )
        for f, c in zip(fused[:2], chunked_fw[:2]):
            scale = max(float(np.abs(np.asarray(f)).max()), 1e-9)
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(f), atol=2e-3 * scale, rtol=2e-3
            )

    def test_dense_chunked_optimize_dispatch(self):
        """optimize() with schur_solver='dense_chunked' (and the auto window
        dense_max_poses < P <= dense_chunked_max_poses) reaches the dense
        optimum."""
        cam, problem, _, _ = synthetic_ba(
            P=8, L=100, pose_noise=0.05, lm_noise=0.3, px_noise=0.3, seed=6
        )
        opt_c, info_c = optimize(
            problem, cam=cam,
            solver=BASolverConfig(max_iterations=10, schur_solver="dense_chunked"),
        )
        opt_d, info_d = optimize(
            problem, cam=cam,
            solver=BASolverConfig(max_iterations=10, schur_solver="dense"),
        )
        assert abs(info_c["cost"] - info_d["cost"]) / max(info_d["cost"], 1e-9) < 1e-3
        # Auto-dispatch window: force fused-dense off, chunked-dense on.
        opt_a, info_a = optimize(
            problem, cam=cam,
            solver=BASolverConfig(max_iterations=3, schur_solver="auto",
                                  dense_max_poses=4, dense_chunked_max_poses=64),
        )
        assert np.isfinite(info_a["cost"])

    def test_dense_and_pcg_reach_same_optimum(self):
        cam, problem, gt_t, _ = synthetic_ba(
            P=8, L=100, pose_noise=0.05, lm_noise=0.3, px_noise=0.3, seed=6
        )
        # 25 iterations: enough for BOTH solvers to actually plateau (with 10,
        # the comparison measures LM-trajectory luck — a 1-ulp change in CG
        # rounding moved the 10-iteration cost by ~7% while the converged
        # optima agree to <0.2%).
        opt_d, info_d = optimize(
            problem, cam=cam,
            solver=BASolverConfig(max_iterations=25, schur_solver="dense"),
        )
        opt_p, info_p = optimize(
            problem, cam=cam,
            solver=BASolverConfig(max_iterations=25, schur_solver="pcg",
                                  cg_iterations=128),
        )
        assert abs(info_d["cost"] - info_p["cost"]) / max(info_p["cost"], 1e-9) < 0.05
        ate_d = ate_rmse(np.asarray(opt_d.poses_t), gt_t)
        ate_p = ate_rmse(np.asarray(opt_p.poses_t), gt_t)
        assert abs(ate_d - ate_p) < 0.01
