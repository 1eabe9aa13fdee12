"""Bundle-adjustment backend: the optimizer the reference only emits a problem for.

The reference frontend's entire purpose is to fill a SLAMProblem for a
closed-source backend (reference: src/slam_frontend.cc:498-503, README.md:3).
This package is that backend, built TPU-first: Levenberg-Marquardt with exact
Schur-complement elimination of landmark blocks and a matrix-free
preconditioned-CG solve of the reduced camera system, all as batched
per-observation XLA ops + segment reductions (shardable across a device mesh
— see parallel/).
"""

from vision_slam_frontend_tpu.backend.tracks import build_ba_problem
from vision_slam_frontend_tpu.backend.ba import (
    BASolverConfig,
    load_solver_checkpoint,
    optimize,
    save_solver_checkpoint,
)
from vision_slam_frontend_tpu.backend.metrics import ate_rmse, rpe_rmse

__all__ = [
    "build_ba_problem",
    "BASolverConfig",
    "optimize",
    "save_solver_checkpoint",
    "load_solver_checkpoint",
    "ate_rmse",
    "rpe_rmse",
]
