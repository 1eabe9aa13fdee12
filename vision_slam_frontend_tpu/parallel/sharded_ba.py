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
        obs_pixel_right=(
            put(problem.obs_pixel_right, obs_shard)
            if problem.obs_pixel_right is not None else None
        ),
        obs_right_mask=(
            put(problem.obs_right_mask, obs_shard)
            if problem.obs_right_mask is not None else None
        ),
        pose_fixed=(
            put(problem.pose_fixed, replicated)
            if problem.pose_fixed is not None else None
        ),
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


# ---------------------------------------------------------------------------
# Landmark-sharded DENSE Schur solver (shard_map)
#
# The distributed form of backend/ba._solve_schur_dense: each device owns a
# CONTIGUOUS block of landmark ids plus every observation of those landmarks,
# so the landmark elimination (V, V^{-1}, the per-landmark Cholesky factors,
# and the back-substitution) is fully local — zero communication. The only
# collectives are one psum of the (P,6) gradient/RHS partials and one psum of
# the 6Px6P reduced camera matrix per LM iteration, both riding ICI; the
# small replicated system is then Cholesky-solved identically on every
# device. This is SURVEY.md section 2's "landmark blocks sharded across
# chips, psum reductions over ICI" design, with the reduced camera system
# replicated because it is tiny (9 MB at P=500) next to the landmark state.
# ---------------------------------------------------------------------------


def build_lm_sharded(problem: BAProblem, n: int, pad_multiple: int = 8):
    """Host-side prep: re-lay observations landmark-major into n equal shards.

    Shard k owns landmark ids [k*L/n, (k+1)*L/n) and all their observations.
    Returns a dict of numpy arrays, observation arrays stacked (n, Ns, ...),
    per-shard landmark gather tables (n, Lb, Ml) indexing the shard's local
    observation slots. Requires L % n == 0 (tracks.build_ba_problem pads L to
    a multiple of 128, so any power-of-two mesh works).
    """
    L = int(problem.landmarks.shape[0])
    if L % n != 0:
        raise ValueError(f"landmark capacity {L} not divisible by mesh size {n}")
    Lb = L // n

    op = np.asarray(problem.obs_pose)
    ol = np.asarray(problem.obs_landmark)
    msk = np.asarray(problem.obs_mask)
    pix = np.asarray(problem.obs_pixel, np.float32)
    N = op.shape[0]
    if problem.obs_pixel_right is not None:
        pix_r = np.asarray(problem.obs_pixel_right, np.float32)
        msk_r = np.asarray(problem.obs_right_mask)
    else:
        pix_r = np.zeros((N, 2), np.float32)
        msk_r = np.zeros(N, bool)

    def pad(x):
        return max(pad_multiple, ((x + pad_multiple - 1) // pad_multiple) * pad_multiple)

    shard_of = np.where(msk, ol // Lb, -1)
    idxs = [np.nonzero(shard_of == k)[0] for k in range(n)]
    Ns = pad(max(max((len(i) for i in idxs), default=0), 1))
    counts = np.bincount(ol[msk], minlength=L)
    Ml = pad(max(int(counts.max()) if counts.size else 1, 1))

    s_op = np.zeros((n, Ns), np.int32)
    s_olg = np.zeros((n, Ns), np.int32)  # global landmark id (for gathers)
    s_oll = np.zeros((n, Ns), np.int32)  # local landmark id within the shard
    s_pix = np.zeros((n, Ns, 2), np.float32)
    s_msk = np.zeros((n, Ns), bool)
    s_pix_r = np.zeros((n, Ns, 2), np.float32)
    s_msk_r = np.zeros((n, Ns), bool)
    s_tbl = np.zeros((n, Lb, Ml), np.int32)
    s_tmsk = np.zeros((n, Lb, Ml), bool)
    for k, idx in enumerate(idxs):
        c = len(idx)
        # Landmark-major order within the shard keeps each landmark's
        # observations contiguous (friendlier gathers).
        idx = idx[np.argsort(ol[idx], kind="stable")]
        s_op[k, :c] = op[idx]
        s_olg[k, :c] = ol[idx]
        # Padding slots keep a VALID global landmark id (the shard's first)
        # so device gathers stay in range; their mask is False and the
        # linearizer zeroes their residuals/Jacobians.
        s_olg[k, c:] = k * Lb
        s_oll[k] = s_olg[k] - k * Lb
        s_pix[k, :c] = pix[idx]
        s_msk[k, :c] = True
        s_pix_r[k, :c] = pix_r[idx]
        s_msk_r[k, :c] = msk_r[idx]
        loc = ol[idx] - k * Lb
        slot = np.zeros(Lb, np.int64)
        for pos, lid in enumerate(loc):
            s_tbl[k, lid, slot[lid]] = pos
            s_tmsk[k, lid, slot[lid]] = True
            slot[lid] += 1
    return {
        "op": s_op, "ol_g": s_olg, "ol_l": s_oll,
        "pix": s_pix, "msk": s_msk, "pix_r": s_pix_r, "msk_r": s_msk_r,
        "lm_tbl": s_tbl, "lm_msk": s_tmsk,
    }


def _make_lm_sharded_dense_step(
    mesh, axis_name, cam, huber_on: bool, Ns: int, Lb: int, Ml: int,
    P: int, obs_chunk: int = 8192, lm_chunk: int = 8192,
):
    """Build the jitted shard_map'd dense-Schur step.

    Per-device math mirrors backend/ba._solve_schur_dense exactly (same
    gauge, damping, and bf16 coupling matmuls); the pose-side reductions run
    as chunked one-hot f32 matmuls instead of pose-major gather tables so
    every reduction is a local partial + one psum.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as Pspec

    from vision_slam_frontend_tpu.backend.ba import _chol3, _inv_lower3, _sym3_inv
    from vision_slam_frontend_tpu.backend.residuals import (
        huber_weights,
        linearize_odometry,
        linearize_reprojection,
    )

    def local_step(
        poses_t, poses_q, landmarks,
        op, ol_g, ol_l, pix, msk, pix_r, msk_r, lm_tbl, lm_msk,
        odom_i, odom_j, odom_t, odom_q, odom_mask,
        free, hd, wt, wr, lam,
    ):
        op, ol_g, ol_l = op[0], ol_g[0], ol_l[0]
        pix, msk, pix_r, msk_r = pix[0], msk[0], pix_r[0], msk_r[0]
        tbl, lmm = lm_tbl[0], lm_msk[0].astype(jnp.float32)[..., None]

        r, Jp, Jl = linearize_reprojection(
            cam, poses_t, poses_q, landmarks, op, ol_g, pix, msk, pix_r, msk_r
        )
        if huber_on:
            w = huber_weights(r, hd)[:, None]
            r = r * w
            Jp = Jp * w[..., None]
            Jl = Jl * w[..., None]
        ro, Ji, Jj = linearize_odometry(
            poses_t, poses_q, odom_i, odom_j, odom_t, odom_q, odom_mask, wt, wr
        )

        def lm_reduce(x):  # (Ns, F) -> (Lb, F)
            return jnp.sum(x[tbl] * lmm, axis=1)

        # --- Local landmark elimination (zero communication).
        V = lm_reduce(jnp.einsum("nij,nik->njk", Jl, Jl).reshape(Ns, 9))
        V = V.reshape(Lb, 3, 3)
        # Same numeric hardening as the single-chip dense path (backend/
        # ba.py round 5): trace-relative damping floor keeps the f32 3x3
        # Cholesky factorable on ill-conditioned landmark blocks.
        trV = V[..., 0, 0] + V[..., 1, 1] + V[..., 2, 2]
        vfloor = jnp.maximum(lam, 1e-5 * trV / 3.0)[..., None, None]
        V = V + vfloor * jnp.eye(3)[None]
        V_inv = _sym3_inv(V)
        Ginv = _inv_lower3(_chol3(V))
        g_lm = -lm_reduce(jnp.einsum("nij,ni->nj", Jl, r))
        s = jnp.einsum("ljk,lk->lj", V_inv, g_lm)
        Jls = jnp.einsum("nij,nj->ni", Jl, s[ol_l])

        # --- Pose-side partial reductions: chunked one-hot f32 matmuls
        # (masked obs already have zeroed r/J, so padding rows contribute 0).
        JpT_r = jnp.einsum("nij,ni->nj", Jp, r)
        JpT_Jls = jnp.einsum("nij,ni->nj", Jp, Jls)
        U_flat = jnp.einsum("nij,nik->njk", Jp, Jp).reshape(Ns, 36)
        ar = jnp.arange(P)

        def pose_reduce(vals):  # (Ns, F) -> (P, F)
            out = jnp.zeros((P, vals.shape[-1]), jnp.float32)
            for c0 in range(0, Ns, obs_chunk):
                oh = (op[c0 : c0 + obs_chunk, None] == ar[None, :]).astype(jnp.float32)
                out = out + oh.T @ vals[c0 : c0 + obs_chunk]
            return out

        g_vis, coup_b, U_vis = jax.lax.psum(
            (pose_reduce(JpT_r), pose_reduce(JpT_Jls), pose_reduce(U_flat)),
            axis_name,
        )

        # --- Odometry terms (tiny Q): replicated, added once after the psum.
        g_odom = -jax.ops.segment_sum(
            jnp.einsum("qij,qi->qj", Ji, ro), odom_i, num_segments=P
        ) - jax.ops.segment_sum(
            jnp.einsum("qij,qi->qj", Jj, ro), odom_j, num_segments=P
        )
        U_odom = jax.ops.segment_sum(
            jnp.einsum("qij,qik->qjk", Ji, Ji), odom_i, num_segments=P
        ) + jax.ops.segment_sum(
            jnp.einsum("qij,qik->qjk", Jj, Jj), odom_j, num_segments=P
        )

        b = (-g_vis + g_odom - coup_b) * free[:, None]
        U_diag = U_vis.reshape(P, 6, 6) + U_odom + lam * jnp.eye(6)[None]

        # --- Coupling partial: local B B^T chunks on the MXU (bf16, f32 acc).
        W = jnp.einsum("nij,nik->njk", Jp, Jl)  # (Ns, 6, 3)
        W_lm = W.reshape(Ns, 18)[tbl].reshape(Lb, Ml, 6, 3) * lmm[..., None]
        Bt = jnp.einsum("lmij,lcj->lmic", W_lm, Ginv)
        pose_of = op[tbl]  # (Lb, Ml)
        from vision_slam_frontend_tpu.backend.ba import _bbt_compensated

        # _bbt_compensated returns I-MAJOR (6, P, 6, P) blocks (round 5:
        # TPU tiling pads trailing dim-6 axes 21x, see backend/ba.py);
        # accumulate in that layout and permute once to (p, i)-major for
        # the small replicated solve below.
        Sc = jnp.zeros((6, P, 6, P), jnp.float32)
        for l0 in range(0, Lb, lm_chunk):
            lc = min(lm_chunk, Lb - l0)
            oh = pose_of[l0 : l0 + lc, :, None] == ar[None, None, :]
            Sc = Sc + _bbt_compensated(Bt[l0 : l0 + lc], oh)
        Sc = jnp.transpose(
            jax.lax.psum(Sc, axis_name), (1, 0, 3, 2)
        ).reshape(6 * P, 6 * P)

        # --- Replicated small system: identical Cholesky on every device.
        S = jnp.zeros((P, 6, P, 6), jnp.float32).at[ar, :, ar, :].set(U_diag)
        Koff = jnp.einsum("qia,qib->qab", Ji, Jj)
        S = S.at[odom_i, :, odom_j, :].add(Koff)
        S = S.at[odom_j, :, odom_i, :].add(jnp.swapaxes(Koff, -1, -2))
        S2 = S.reshape(6 * P, 6 * P) - Sc
        free6 = jnp.repeat(free, 6)
        S2 = S2 * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
        # Jacobi equilibration + assembly-noise ridge (backend/ba.
        # _dense_solve_core): cond(S) at small lambda exceeds f32 Cholesky
        # range, and the compensated coupling's noise floor sits above S's
        # smallest eigenvalues — identical hardening to the single-chip
        # path, so both exact solvers produce the same step.
        d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(S2), 1e-20))
        S2e = S2 * d[:, None] * d[None, :]
        S2e = S2e + 1e-3 * jnp.eye(S2e.shape[0], dtype=S2e.dtype)
        chol = jax.scipy.linalg.cholesky(S2e, lower=True)
        x = jax.scipy.linalg.cho_solve((chol, True), b.reshape(-1) * d) * d
        d_pose = x.reshape(P, 6) * free[:, None]
        rr = jnp.linalg.norm(b - (S2 @ x).reshape(P, 6))

        # --- Back-substitute the LOCAL landmark block (zero communication).
        y = jnp.einsum("nij,nj->ni", Jp, d_pose[op])
        wtd = lm_reduce(jnp.einsum("nij,ni->nj", Jl, y))
        d_lm = jnp.einsum("ljk,lk->lj", V_inv, g_lm - wtd)
        return d_pose, d_lm[None], rr

    sharded = Pspec(axis_name)
    rep = Pspec()
    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            rep, rep, rep,
            sharded, sharded, sharded, sharded, sharded, sharded, sharded,
            sharded, sharded,
            rep, rep, rep, rep, rep,
            rep, rep, rep, rep, rep,
        ),
        out_specs=(rep, sharded, rep),
        check_vma=False,
    )
    return jax.jit(mapped)


def optimize_sharded_dense(
    problem: BAProblem,
    mesh,
    config=None,
    solver=None,
    cam=None,
    verbose: bool = False,
    axis_name: str = "data",
):
    """Distributed LM with the landmark-sharded dense Schur step.

    Same accept/reject schedule as backend/ba.optimize (single round, no
    outlier trimming — pre-trim with the single-chip path if needed).
    Returns (optimized BAProblem, info dict).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    from vision_slam_frontend_tpu.backend.ba import (
        BASolverConfig,
        _apply_step,
        compute_cost,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    solver = solver or BASolverConfig()
    if cam is None:
        if config is None:
            raise ValueError("need a FrontendConfig or CameraParams")
        cam = CameraParams.from_config(config)

    n = mesh.shape[axis_name]
    data = build_lm_sharded(problem, n)
    obs_sh = NamedSharding(mesh, Pspec(axis_name))
    rep = NamedSharding(mesh, Pspec())
    data = {k: jax.device_put(v, obs_sh) for k, v in data.items()}
    nS, Ns = data["op"].shape
    Lb, Ml = data["lm_tbl"].shape[1:]
    P = problem.poses_t.shape[0]

    fixed = np.zeros(P, bool)
    if solver.fix_first_pose:
        fixed[0] = True
    if problem.pose_fixed is not None:
        fixed |= np.asarray(problem.pose_fixed)
    free = jax.device_put((~fixed).astype(np.float32), rep)

    step = _make_lm_sharded_dense_step(
        mesh, axis_name, cam, solver.huber_delta > 0, Ns, Lb, Ml, P
    )

    hd = jnp.float32(solver.huber_delta)
    wt = jnp.float32(solver.odom_t_weight)
    wr = jnp.float32(solver.odom_r_weight)
    huber_on = solver.huber_delta > 0
    odom = (problem.odom_i, problem.odom_j, problem.odom_t, problem.odom_q,
            problem.odom_mask)

    lam = solver.init_lambda
    cost = float(compute_cost(cam, problem, hd, wt, wr, huber_on))
    history = [cost]
    accepted = 0
    rejected_streak = 0
    for it in range(solver.max_iterations):
        d_pose, d_lm, rr = step(
            problem.poses_t, problem.poses_q, problem.landmarks,
            data["op"], data["ol_g"], data["ol_l"], data["pix"], data["msk"],
            data["pix_r"], data["msk_r"], data["lm_tbl"], data["lm_msk"],
            *odom, free, hd, wt, wr, jnp.float32(lam),
        )
        candidate = _apply_step(problem, d_pose, d_lm.reshape(-1, 3))
        new_cost = float(compute_cost(cam, candidate, hd, wt, wr, huber_on))
        if verbose:
            print(
                f"[BA-dist] iter {it}: cost {cost:.4f} -> {new_cost:.4f} "
                f"(lambda={lam:.2e}, |res|={float(rr):.2e}, shards={nS})"
            )
        if np.isfinite(new_cost) and new_cost < cost:
            rel = (cost - new_cost) / max(cost, 1e-12)
            problem = candidate
            cost = new_cost
            lam = max(lam * solver.lambda_down, 1e-9)
            accepted += 1
            rejected_streak = 0
            history.append(cost)
            if rel < 1e-6:
                break
        else:
            up = solver.lambda_up if np.isfinite(new_cost) else solver.lambda_up**3
            lam = min(lam * up, 1e6)
            rejected_streak += 1
            history.append(cost)
            if lam >= 1e6 or rejected_streak >= 4:
                break
    return problem, {
        "cost": cost,
        "history": history,
        "iterations": len(history) - 1,
        "accepted": accepted,
    }
