"""Distributed bundle adjustment: observation-sharded Schur-PCG over a mesh.

The single-chip solver (backend/ba.py) was built matrix-free on purpose: every
operator application is per-observation batched products + segment-sums. Under
GSPMD that form partitions directly —

  - observation arrays shard over the 'data' mesh axis (each chip owns a
    contiguous slice of reprojection factors);
  - poses (P x 6 blocks) and landmarks (L x 3) stay replicated: even 100k
    landmarks are ~1 MB, far below the cost of resharding gathers;
  - the segment-sums that build V, g, and the reduced-system products become
    partial sums per chip + an all-reduce that XLA lowers onto ICI;
  - PCG's scalars (alpha, beta) come out of replicated reductions, so every
    chip runs the identical iteration lock-step with no host round-trips.

No code duplication with the single-chip path: the same jitted functions are
used; only the input shardings change. Multi-host (DCN) comes from
parallel/mesh.initialize_distributed + the same mesh spanning all processes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vision_slam_frontend_tpu.types.slam_types import BAProblem


def shard_ba_problem(problem: BAProblem, mesh, axis_name: str = "data") -> BAProblem:
    """device_put the problem with observation arrays sharded over the mesh.

    Observation capacity must divide the mesh size (tracks.build_ba_problem
    pads to a multiple of 128, so any power-of-two mesh works).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis_name]
    N = problem.obs_pixel.shape[0]
    if N % n != 0:
        raise ValueError(f"observation capacity {N} not divisible by mesh size {n}")
    obs_shard = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    def put(x, sharding):
        return jax.device_put(np.asarray(x), sharding)

    return BAProblem(
        poses_t=put(problem.poses_t, replicated),
        poses_q=put(problem.poses_q, replicated),
        pose_mask=put(problem.pose_mask, replicated),
        landmarks=put(problem.landmarks, replicated),
        landmark_mask=put(problem.landmark_mask, replicated),
        obs_pose=put(problem.obs_pose, obs_shard),
        obs_landmark=put(problem.obs_landmark, obs_shard),
        obs_pixel=put(problem.obs_pixel, obs_shard),
        obs_mask=put(problem.obs_mask, obs_shard),
        odom_i=put(problem.odom_i, replicated),
        odom_j=put(problem.odom_j, replicated),
        odom_t=put(problem.odom_t, replicated),
        odom_q=put(problem.odom_q, replicated),
        odom_mask=put(problem.odom_mask, replicated),
        # Drop the single-chip gather-plan tables: they index the GLOBAL
        # observation order and would force XLA to all-gather the shards.
        # The sharded path uses the scatter/segment-sum formulation, which
        # GSPMD partitions as local partial sums + one all-reduce over ICI.
        pose_obs=None,
        pose_obs_mask=None,
        lm_obs=None,
        lm_obs_mask=None,
    )


def optimize_sharded(
    problem: BAProblem,
    mesh,
    config=None,
    solver=None,
    cam=None,
    verbose: bool = False,
    axis_name: str = "data",
):
    """Distributed optimize(): same LM loop, observation-sharded inputs.

    Returns (optimized BAProblem, info dict). Results are numerically
    equivalent to the single-chip path up to float reduction order.
    """
    from vision_slam_frontend_tpu.backend.ba import optimize

    sharded = shard_ba_problem(problem, mesh, axis_name)
    return optimize(sharded, config=config, solver=solver, cam=cam, verbose=verbose)
