"""Segment-parallel bundle adjustment: pose-chain sharding for long trajectories.

The SLAM analogue of context parallelism (SURVEY.md section 5, long-context
row): a long trajectory is split into contiguous keyframe SEGMENTS, each
device owns one or more segments, and all segments run LM *simultaneously* as
one batched (vmapped) dense-Schur program whose leading segment axis shards
over the mesh. Boundary poses are frozen at their incoming values, so every
segment stays in the global frame and no cross-segment collective is needed
during a sweep; a second sweep with boundaries shifted by half a segment
optimizes the poses the first sweep froze (an alternating Gauss-Seidel
pass over submaps — the standard large-scale SfM/SLAM decomposition).

Landmarks are owned by the segment of their first observation; observations
of an owned landmark from poses outside the segment's range are dropped for
that sweep (they re-enter when the shifted sweep moves the boundary). The
per-iteration accept/reject (LM trust region) runs per segment on the host
over a cost VECTOR, so the device program stays one compiled batched step —
never a giant fused multi-iteration program (compile-time trap on this
toolchain, see CLAUDE.md).

Contrast with the other two distributed BA modes:
  - observation-sharded PCG  (shard_ba_problem + optimize): poses+landmarks
    replicated, observations sharded — best for many observations;
  - landmark-sharded dense   (optimize_sharded_dense): landmark blocks
    sharded, reduced camera matrix psum'd — best for many landmarks;
  - segment-parallel (this): POSES sharded — the only mode whose per-device
    pose state shrinks as the trajectory grows, so it is the long-trajectory
    scaling path (6P x 6P dense blocks would not fit otherwise).
"""

from __future__ import annotations

import numpy as np

from vision_slam_frontend_tpu.types.slam_types import BAProblem


def build_segments(
    problem: BAProblem, n_seg: int, overlap: int = 2, offset: int = 0,
):
    """Partition a BAProblem into n_seg stacked fixed-capacity sub-problems.

    Segment k covers poses [k*base - overlap + offset, (k+1)*base + offset)
    (clipped to [0, P)); the first `overlap` poses of segments k>0 are frozen
    boundary poses (and global pose 0 is always frozen). Returns
    (stacked BAProblem with leading axis n_seg, scatter-back info dict).
    """
    from vision_slam_frontend_tpu.backend.tracks import build_gather_tables

    P = int(problem.poses_t.shape[0])
    if n_seg < 1 or n_seg > P:
        raise ValueError(f"n_seg={n_seg} invalid for P={P}")
    base = -(-P // n_seg)  # ceil
    Ps = min(base + overlap, P)

    op = np.asarray(problem.obs_pose)
    ol = np.asarray(problem.obs_landmark)
    omask = np.asarray(problem.obs_mask)
    opix = np.asarray(problem.obs_pixel, np.float32)
    N = op.shape[0]
    if problem.obs_pixel_right is not None:
        opix_r = np.asarray(problem.obs_pixel_right, np.float32)
        omask_r = np.asarray(problem.obs_right_mask)
    else:
        opix_r = np.zeros((N, 2), np.float32)
        omask_r = np.zeros(N, bool)
    poses_t = np.asarray(problem.poses_t, np.float32)
    poses_q = np.asarray(problem.poses_q, np.float32)
    lms = np.asarray(problem.landmarks, np.float32)
    lm_mask_g = np.asarray(problem.landmark_mask)
    oi = np.asarray(problem.odom_i) if problem.odom_i is not None else np.zeros(0, np.int32)
    oj = np.asarray(problem.odom_j) if problem.odom_j is not None else np.zeros(0, np.int32)
    ot = np.asarray(problem.odom_t, np.float32) if problem.odom_t is not None else np.zeros((0, 3), np.float32)
    oq = np.asarray(problem.odom_q, np.float32) if problem.odom_q is not None else np.zeros((0, 4), np.float32)
    om = np.asarray(problem.odom_mask) if problem.odom_mask is not None else np.zeros(0, bool)

    def seg_range(k):
        lo = max(0, k * base - overlap + offset)
        hi = min(P, lo + Ps)
        lo = max(0, hi - Ps)  # keep length Ps where possible
        return lo, hi

    # Landmark ownership: the segment whose CORE range contains the
    # landmark's first valid observation's pose.
    first_pose = np.full(lms.shape[0], -1, np.int64)
    valid_idx = np.nonzero(omask)[0]
    # reverse order so earlier observations overwrite later ones
    for i in valid_idx[::-1]:
        first_pose[ol[i]] = op[i]
    owner = np.clip((first_pose - offset) // base, 0, n_seg - 1)
    owner[first_pose < 0] = -1

    # Per-segment owned landmarks + local observation sets.
    seg_lms = [np.nonzero((owner == k) & lm_mask_g)[0] for k in range(n_seg)]
    Ls = max(max((len(s) for s in seg_lms), default=0), 1)
    Ls = ((Ls + 7) // 8) * 8
    seg_obs = []
    for k in range(n_seg):
        lo, hi = seg_range(k)
        in_seg = omask & (owner[ol] == k) & (op >= lo) & (op < hi)
        seg_obs.append(np.nonzero(in_seg)[0])
    Nsg = max(max((len(s) for s in seg_obs), default=0), 1)
    Nsg = ((Nsg + 7) // 8) * 8

    # Per-segment odometry factors.
    seg_odo = []
    for k in range(n_seg):
        lo, hi = seg_range(k)
        keep = om & (oi >= lo) & (oi < hi) & (oj >= lo) & (oj < hi)
        seg_odo.append(np.nonzero(keep)[0])
    Qs = max(max((len(s) for s in seg_odo), default=0), 1)

    s = {
        "poses_t": np.zeros((n_seg, Ps, 3), np.float32),
        "poses_q": np.zeros((n_seg, Ps, 4), np.float32),
        "pose_mask": np.zeros((n_seg, Ps), bool),
        "pose_fixed": np.zeros((n_seg, Ps), bool),
        "landmarks": np.zeros((n_seg, Ls, 3), np.float32),
        "landmark_mask": np.zeros((n_seg, Ls), bool),
        "obs_pose": np.zeros((n_seg, Nsg), np.int32),
        "obs_landmark": np.zeros((n_seg, Nsg), np.int32),
        "obs_pixel": np.zeros((n_seg, Nsg, 2), np.float32),
        "obs_mask": np.zeros((n_seg, Nsg), bool),
        "obs_pixel_right": np.zeros((n_seg, Nsg, 2), np.float32),
        "obs_right_mask": np.zeros((n_seg, Nsg), bool),
        "odom_i": np.zeros((n_seg, Qs), np.int32),
        "odom_j": np.zeros((n_seg, Qs), np.int32),
        "odom_t": np.zeros((n_seg, Qs, 3), np.float32),
        "odom_q": np.zeros((n_seg, Qs, 4), np.float32),
        "odom_mask": np.zeros((n_seg, Qs), bool),
    }
    s["poses_q"][..., 0] = 1.0
    s["odom_q"][..., 0] = 1.0
    info = {
        "pose_gid": np.zeros((n_seg, Ps), np.int64),
        "pose_own": np.zeros((n_seg, Ps), bool),
        "lm_gid": np.zeros((n_seg, Ls), np.int64),
        "lm_own": np.zeros((n_seg, Ls), bool),
    }

    tables = []
    for k in range(n_seg):
        lo, hi = seg_range(k)
        npose = hi - lo
        s["poses_t"][k, :npose] = poses_t[lo:hi]
        s["poses_q"][k, :npose] = poses_q[lo:hi]
        s["pose_mask"][k, :npose] = True
        info["pose_gid"][k, :npose] = np.arange(lo, hi)
        core_lo, core_hi = max(0, k * base + offset), min(P, (k + 1) * base + offset)
        gids = np.arange(lo, hi)
        core = (gids >= core_lo) & (gids < core_hi)
        info["pose_own"][k, :npose] = core
        # Frozen: non-core poses (boundary overlap) + global pose 0.
        s["pose_fixed"][k, :npose] = ~core | (gids == 0)
        # A segment whose every pose is core still needs a gauge anchor.
        if not s["pose_fixed"][k, :npose].any():
            s["pose_fixed"][k, 0] = True
        # Unused slots: frozen so they can't drift the solve.
        s["pose_fixed"][k, npose:] = True

        lids = seg_lms[k]
        nl = len(lids)
        s["landmarks"][k, :nl] = lms[lids]
        s["landmark_mask"][k, :nl] = True
        info["lm_gid"][k, :nl] = lids
        info["lm_own"][k, :nl] = True
        local_of_global = np.zeros(lms.shape[0], np.int64)
        local_of_global[lids] = np.arange(nl)

        obs = seg_obs[k]
        no = len(obs)
        s["obs_pose"][k, :no] = op[obs] - lo
        s["obs_landmark"][k, :no] = local_of_global[ol[obs]]
        s["obs_pixel"][k, :no] = opix[obs]
        s["obs_mask"][k, :no] = True
        s["obs_pixel_right"][k, :no] = opix_r[obs]
        s["obs_right_mask"][k, :no] = omask_r[obs]

        odo = seg_odo[k]
        nq = len(odo)
        s["odom_i"][k, :nq] = oi[odo] - lo
        s["odom_j"][k, :nq] = oj[odo] - lo
        s["odom_t"][k, :nq] = ot[odo]
        s["odom_q"][k, :nq] = oq[odo]
        s["odom_mask"][k, :nq] = om[odo]

        tables.append(
            build_gather_tables(
                s["obs_pose"][k], s["obs_landmark"][k], s["obs_mask"][k], Ps, Ls
            )
        )

    # Pad the per-segment gather tables to common widths and stack.
    Mp = max(t[0].shape[1] for t in tables)
    Ml = max(t[2].shape[1] for t in tables)
    s["pose_obs"] = np.zeros((n_seg, Ps, Mp), np.int32)
    s["pose_obs_mask"] = np.zeros((n_seg, Ps, Mp), bool)
    s["lm_obs"] = np.zeros((n_seg, Ls, Ml), np.int32)
    s["lm_obs_mask"] = np.zeros((n_seg, Ls, Ml), bool)
    for k, (po, pom, lo_t, lom) in enumerate(tables):
        s["pose_obs"][k, :, : po.shape[1]] = po
        s["pose_obs_mask"][k, :, : pom.shape[1]] = pom
        # lm_obs holds POSE-MAJOR flat indices (row*Mp_k + col); re-map to
        # the common width Mp so the solver's flat (Ps*Mp) space is right.
        Mp_k = po.shape[1]
        remapped = (lo_t // Mp_k) * Mp + (lo_t % Mp_k)
        s["lm_obs"][k, :, : lo_t.shape[1]] = remapped
        s["lm_obs_mask"][k, :, : lom.shape[1]] = lom

    stacked = BAProblem(**s)
    return stacked, info


def optimize_segments(
    problem: BAProblem,
    mesh=None,
    config=None,
    solver=None,
    cam=None,
    n_seg: int | None = None,
    overlap: int = 2,
    sweeps: int = 2,
    verbose: bool = False,
    axis_name: str = "data",
):
    """Segment-parallel LM: all segments advance one iteration per device call.

    With a mesh, the stacked segment axis is sharded over it (n_seg should be
    a multiple of the mesh size); without one, the batched program still runs
    (single device). `sweeps` alternates the segment boundaries by half a
    segment so boundary-frozen poses get optimized too.

    Returns (optimized BAProblem, info dict).
    """
    import jax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.backend.ba import (
        BASolverConfig,
        _apply_step,
        _linearize,
        _solve_schur_dense,
        compute_cost,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    solver = solver or BASolverConfig()
    if cam is None:
        if config is None:
            raise ValueError("need a FrontendConfig or CameraParams")
        cam = CameraParams.from_config(config)
    if n_seg is None:
        n_seg = mesh.shape[axis_name] if mesh is not None else 4

    huber_on = solver.huber_delta > 0
    hd = jnp.float32(solver.huber_delta)
    wt = jnp.float32(solver.odom_t_weight)
    wr = jnp.float32(solver.odom_r_weight)

    def batched_cost(stacked):
        return jax.vmap(
            lambda p: compute_cost(cam, p, hd, wt, wr, huber_on)
        )(stacked)

    def one_iter(stacked, lam):
        def per_seg(p, la):
            r, Jp, Jl, ro, Ji, Jj = _linearize(cam, p, hd, wt, wr, huber_on)
            d_pose, d_lm, _ = _solve_schur_dense(
                r, Jp, Jl, ro, Ji, Jj, p, la, False
            )
            return _apply_step(p, d_pose, d_lm)

        cand = jax.vmap(per_seg)(stacked, lam)
        return cand, batched_cost(cand)

    one_iter = jax.jit(one_iter)
    batched_cost = jax.jit(batched_cost)

    def select(accept, cand, stacked):
        a = accept[:, None, None]
        return stacked.replace(
            poses_t=jnp.where(a, cand.poses_t, stacked.poses_t),
            poses_q=jnp.where(a, cand.poses_q, stacked.poses_q),
            landmarks=jnp.where(a, cand.landmarks, stacked.landmarks),
        )

    select = jax.jit(select)

    base = -(-int(problem.poses_t.shape[0]) // n_seg)
    total_iters = 0
    for sweep in range(sweeps):
        offset = 0 if sweep % 2 == 0 else base // 2
        stacked, info = build_segments(problem, n_seg, overlap, offset)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            shard = NamedSharding(mesh, Pspec(axis_name))
            stacked = jax.tree.map(lambda x: jax.device_put(x, shard), stacked)
        lam = np.full(n_seg, solver.init_lambda, np.float32)
        cost = np.asarray(batched_cost(stacked))
        for it in range(solver.max_iterations):
            cand, new_cost = one_iter(stacked, jnp.asarray(lam))
            new_cost = np.asarray(new_cost)
            accept = np.isfinite(new_cost) & (new_cost < cost)
            stacked = select(jnp.asarray(accept), cand, stacked)
            lam = np.where(accept, np.maximum(lam * solver.lambda_down, 1e-9),
                           np.minimum(lam * solver.lambda_up, 1e6))
            rel = np.where(accept, (cost - new_cost) / np.maximum(cost, 1e-12), 0.0)
            cost = np.where(accept, new_cost, cost)
            total_iters += 1
            if verbose:
                print(
                    f"[BA-seg] sweep {sweep} iter {it}: "
                    f"cost {float(cost.sum()):.4f} "
                    f"({int(accept.sum())}/{n_seg} segments accepted)"
                )
            if not accept.any() or float(rel.max()) < 1e-6:
                break
        # Scatter owned poses / landmarks back to the global problem.
        pt = np.asarray(problem.poses_t).copy()
        pq = np.asarray(problem.poses_q).copy()
        lm = np.asarray(problem.landmarks).copy()
        st = np.asarray(stacked.poses_t)
        sq = np.asarray(stacked.poses_q)
        sl = np.asarray(stacked.landmarks)
        own = info["pose_own"] & ~np.asarray(stacked.pose_fixed)
        pt[info["pose_gid"][own]] = st[own]
        pq[info["pose_gid"][own]] = sq[own]
        lown = info["lm_own"]
        lm[info["lm_gid"][lown]] = sl[lown]
        problem = problem.replace(
            poses_t=jnp.asarray(pt), poses_q=jnp.asarray(pq), landmarks=jnp.asarray(lm)
        )
    final_cost = float(
        compute_cost(cam, problem, hd, wt, wr, huber_on)
    )
    return problem, {
        "cost": final_cost,
        "iterations": total_iters,
        "segments": n_seg,
        "sweeps": sweeps,
    }
