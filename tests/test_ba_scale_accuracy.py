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
3x3 Cholesky pivot cancellation on ill-conditioned landmark blocks, plus
assembly-noise-scale indefiniteness of the compensated S (fixed by the
trace-relative V floor, the triple-split bf16 coupling, and the equilibrated
ridge in backend/ba.py).

Measured (CPU, round 5, 25 LM iterations): init ATE 0.0870; dense converges
to ATE 0.0251 at cost 42009 — BELOW the ground-truth cost 43711, i.e. AT
the statistical optimum: 0.025 m over a ~250 m trajectory is the
information floor of 0.5 px observation noise, not solver slack. Chunked
PCG (cg=32) reaches 0.0294. Pins ~1.5x measured.

Reference contract: the SLAMProblem the backend optimizes,
/root/reference/src/slam_frontend.cc:498-503.

CPU runtime: ~4 min dense + ~1 min chunked PCG (module-scoped, solved once).
"""

import numpy as np
import pytest

from bench_ba import make_problem
from vision_slam_frontend_tpu.backend import ate_rmse
from vision_slam_frontend_tpu.backend.ba import BASolverConfig, optimize
from vision_slam_frontend_tpu.backend.residuals import CameraParams

SOLVERS = ("dense", "pcg_chunked")
# Measured converged ATE (round 5): dense 0.0251, pcg_chunked 0.0294.
ATE_MAX = {"dense": 0.040, "pcg_chunked": 0.045}


def _cam():
    import jax.numpy as jnp

    return CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )


@pytest.fixture(scope="module")
def north_star_runs():
    """Solve the exact bench shape ONCE per production solver path.

    clean=True masks the fixture's geometrically-invalid wraparound
    observations (z-clamp garbage pixels) — production problems never
    contain those (the frontend's epipolar + guided gates kill them).
    """
    problem, gt_t, _ = make_problem(500, 100_000, 5, return_gt=True, clean=True)
    init_ate = ate_rmse(np.asarray(problem.poses_t), gt_t)
    runs = {}
    for name in SOLVERS:
        opt, info = optimize(
            problem,
            cam=_cam(),
            solver=BASolverConfig(
                max_iterations=25, schur_solver=name, cg_iterations=32
            ),
        )
        runs[name] = (ate_rmse(np.asarray(opt.poses_t), gt_t), info)
    return init_ate, runs


class TestNorthStarScaleAccuracy:
    @pytest.mark.parametrize("solver_name", SOLVERS)
    def test_converged_ate_at_bench_shape(self, north_star_runs, solver_name):
        """Both production paths must recover the trajectory at the scale
        they are benched at, to ~1.5x the measured information floor."""
        init_ate, runs = north_star_runs
        assert init_ate > 0.05  # the fixture actually perturbs the init
        ate, info = runs[solver_name]
        assert np.isfinite(info["cost"])
        assert ate < ATE_MAX[solver_name], (
            f"{solver_name} at-scale ATE {ate:.4f} (init {init_ate:.4f})"
        )
        assert ate < init_ate / 2.5, (
            f"{solver_name} did not materially improve: {init_ate:.4f} -> {ate:.4f}"
        )
        # The LM loop must actually accept steps at this scale (a NaN-step
        # solver would "converge" by rejecting everything — the round-5 bug).
        assert info["accepted"] >= 5, info

    def test_dense_and_pcg_agree_at_scale(self, north_star_runs):
        """The two production solvers must land on the same geometry at the
        bench shape (optimum agreement, not step agreement)."""
        _, runs = north_star_runs
        ates = {name: runs[name][0] for name in SOLVERS}
        assert abs(ates["dense"] - ates["pcg_chunked"]) < 0.008, ates
