"""Windowed local bundle adjustment: refine the trailing keyframes online.

The "complete frontend + windowed local BA" configuration from BASELINE.md:
as keyframes stream in, optimize the last `window` poses (+ their landmarks)
against vision + odometry factors while older poses stay frozen — the
standard local-BA stage of a production visual-SLAM system, which the
reference delegates entirely to its offline backend.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vision_slam_frontend_tpu.backend.ba import BASolverConfig, optimize
from vision_slam_frontend_tpu.backend.tracks import build_ba_problem
from vision_slam_frontend_tpu.types.slam_types import (
    OdometryFactor,
    SLAMNode,
    SLAMProblem,
    VisionFactor,
)


def slice_problem(problem: SLAMProblem, start: int) -> SLAMProblem:
    """Sub-problem over nodes with node_idx >= start, re-indexed from 0.
    Factors touching earlier nodes are dropped (their constraints enter via
    the frozen-pose gauge of the retained overlap)."""
    out = SLAMProblem()
    for node in problem.nodes:
        if node.node_idx >= start:
            out.nodes.append(
                SLAMNode(node.node_idx - start, node.timestamp, node.pose, node.features)
            )
    for vf in problem.vision_factors:
        if vf.pose_idx_initial >= start and vf.pose_idx_current >= start:
            out.vision_factors.append(
                VisionFactor(
                    vf.pose_idx_initial - start,
                    vf.pose_idx_current - start,
                    vf.feature_matches,
                )
            )
    for of in problem.odometry_factors:
        if of.pose_i >= start and of.pose_j >= start:
            out.odometry_factors.append(
                OdometryFactor(of.pose_i - start, of.pose_j - start, of.translation, of.rotation)
            )
    return out


def windowed_local_ba(
    problem: SLAMProblem,
    config,
    window: int = 8,
    fixed_overlap: int = 2,
    solver: Optional[BASolverConfig] = None,
):
    """Optimize the last `window` poses; the oldest `fixed_overlap` of them
    stay frozen as the anchor to the rest of the trajectory.

    Mutates `problem` in place (updates the tail nodes' poses). Returns
    (updated_tail_count, info) — info is None when the window is too small
    to optimize.
    """
    import jax.numpy as jnp

    n = len(problem.nodes)
    if n < fixed_overlap + 2:
        return 0, None
    start = max(0, n - window)
    sub = slice_problem(problem, start)
    if len(sub.vision_factors) == 0:
        return 0, None
    ba = build_ba_problem(sub, left_cam_to_robot=config.left_cam_to_robot)
    m = len(sub.nodes)
    fixed = np.zeros(ba.poses_t.shape[0], bool)
    fixed[: min(fixed_overlap, m)] = True
    ba = ba.replace(pose_fixed=jnp.asarray(fixed))
    # Local windows carry small informative residuals (a few px of pose
    # drift) but also the occasional grossly wrong stereo/temporal match
    # (hundreds of px). Huber alone only linearizes those — they still
    # dominate the cost and drag the window — so trimming (with its loose
    # pre-trim gate) is essential here.
    solver = solver or BASolverConfig(
        max_iterations=6, cg_iterations=24, huber_delta=5.0,
        trim_threshold=8.0, trim_rounds=1,
    )
    opt, info = optimize(ba, config=config, solver=solver)
    new_t = np.asarray(opt.poses_t)
    new_q = np.asarray(opt.poses_q)
    for k in range(min(fixed_overlap, m), m):
        node = problem.nodes[start + k]
        node.pose.loc = new_t[k].astype(np.float32)
        node.pose.angle = new_q[k].astype(np.float32)
    return m - min(fixed_overlap, m), info
