"""BA accuracy pinned AT THE NORTH-STAR SCALE (round-4 verdict item 3).

Every other accuracy fixture tops out at ~2.7k landmarks; the headline bench
shape (P=500, L=100k, N=500k — the scale the 100k-landmark north star and
bench_ba measure) previously had only cost-decrease assertions, so an
at-scale solver bug that degrades geometry while still reducing cost (or a
banded-plan / coupling-precision regression) would pass the suite. These
tests run the PRODUCTION solver paths (fused dense with the banded coupling
plan, and chunked PCG) on a ground-truth synthetic problem at that exact
shape and pin converged ATE against ground truth.

This pin is what caught (round 5) the pre-existing at-scale dense NaN: f32
3x3 Cholesky pivot cancellation on ill-conditioned landmark blocks +
assembly-noise-scale indefiniteness of the compensated S (fixed by the
trace-relative V floor, triple-split bf16 coupling, and the equilibrated
ridge in backend/ba.py).

Reference contract: the SLAMProblem the backend optimizes,
/root/reference/src/slam_frontend.cc:498-503.

CPU runtime: ~3-4 min per solver at P=500/L=100k (marked slow).
"""

import numpy as np
import pytest

from bench_ba import make_problem
from vision_slam_frontend_tpu.backend import ate_rmse
from vision_slam_frontend_tpu.backend.ba import BASolverConfig, optimize
from vision_slam_frontend_tpu.backend.residuals import CameraParams


def _cam():
    import jax.numpy as jnp

    return CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )


@pytest.fixture(scope="module")
def north_star_problem():
    # The exact bench shape (bench_ba defaults): P=500, L=100k, 5 obs/lm.
    # clean=True masks the fixture's geometrically-invalid wraparound
    # observations (z-clamp garbage pixels) — production problems never
    # contain those (the frontend's epipolar + guided gates kill them).
    problem, gt_t, gt_lm = make_problem(
        500, 100_000, 5, return_gt=True, clean=True
    )
    return problem, gt_t


class TestNorthStarScaleAccuracy:
    @pytest.mark.parametrize("solver_name", ["dense", "pcg_chunked"])
    def test_converged_ate_at_bench_shape(self, north_star_problem, solver_name):
        """Both production paths must recover the trajectory at the scale
        they are benched at. Measured (CPU, round 5): init ATE 0.086;
        dense -> 0.0060, chunked PCG (cg=32) -> 0.0063. Pinned at ~1.5x
        measured, plus a >=5x improvement floor so a solver that merely
        fails to diverge cannot pass."""
        problem, gt_t = north_star_problem
        init_ate = ate_rmse(np.asarray(problem.poses_t), gt_t)
        assert init_ate > 0.05  # the fixture actually perturbs the init
        opt, info = optimize(
            problem,
            cam=_cam(),
            solver=BASolverConfig(
                max_iterations=12, schur_solver=solver_name, cg_iterations=32
            ),
        )
        assert np.isfinite(info["cost"])
        ate = ate_rmse(np.asarray(opt.poses_t), gt_t)
        assert ate < 0.010, f"{solver_name} at-scale ATE {ate:.4f} (init {init_ate:.4f})"
        assert ate < init_ate / 5.0, (
            f"{solver_name} did not materially improve: {init_ate:.4f} -> {ate:.4f}"
        )
        # Every-iteration sanity: the LM loop must actually accept steps at
        # this scale (a NaN-step solver "converges" by rejecting everything).
        assert info["accepted"] >= 5, info

    def test_dense_and_pcg_agree_at_scale(self, north_star_problem):
        """The two production solvers must land on the same geometry at the
        bench shape (optimum agreement, not step agreement)."""
        problem, gt_t = north_star_problem
        ates = {}
        for name in ("dense", "pcg_chunked"):
            opt, _ = optimize(
                problem,
                cam=_cam(),
                solver=BASolverConfig(
                    max_iterations=12, schur_solver=name, cg_iterations=32
                ),
            )
            ates[name] = ate_rmse(np.asarray(opt.poses_t), gt_t)
        assert abs(ates["dense"] - ates["pcg_chunked"]) < 0.005, ates
