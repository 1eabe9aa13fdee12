"""Levenberg-Marquardt bundle adjustment with matrix-free Schur-complement PCG.

The solver the reference hands its SLAMProblem to (closed-source there;
reference: README.md:3, src/slam_frontend.cc:498-503). TPU-first design:

  - landmark blocks V_j (3x3) are eliminated EXACTLY per landmark (batched
    closed-form inverses) — the classic Schur complement;
  - the reduced camera system S = U - W V^{-1} W^T is never materialized:
    PCG applies S with per-observation batched products + segment-sums
    (scatter-adds), which is exactly the form that shards across a device
    mesh (observations sharded, psum-reduced — see parallel/sharded_ba.py);
  - block-Jacobi preconditioner from the U diagonal (batched 6x6 solves);
  - gauge fixed by freezing pose 0; LM damping with accept/reject on the
    true cost.

Everything per-iteration is one jitted program; the LM loop is a thin host
loop (a handful of iterations).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vision_slam_frontend_tpu.backend.residuals import (
    CameraParams,
    huber_weights,
    linearize_odometry,
    linearize_reprojection,
    _apply_pose_delta,
)
from vision_slam_frontend_tpu.geometry.rotation import quat_normalize
from vision_slam_frontend_tpu.types.slam_types import BAProblem


@dataclasses.dataclass
class BASolverConfig:
    max_iterations: int = 15
    cg_iterations: int = 64
    cg_tol: float = 1e-8
    init_lambda: float = 1e-3
    lambda_up: float = 4.0
    lambda_down: float = 0.4
    huber_delta: float = 4.0  # pixels; <= 0 disables
    odom_t_weight: float = 30.0  # 1/sigma: ~3 cm translation noise
    odom_r_weight: float = 60.0  # ~1 deg rotation noise
    fix_first_pose: bool = True
    # Inner linear solver for the reduced camera system:
    #   "auto"  — dense Cholesky when 6P fits comfortably (P <= dense_max_poses
    #             and gather tables present), matrix-free PCG otherwise;
    #   "dense" — always materialize S (exact, MXU-heavy; see _solve_schur_dense);
    #   "dense_chunked" — the same explicit-S solve with the assembly split
    #             into small programs + a host chunk loop (in-place HBM S
    #             accumulation); extends dense past the fused form's
    #             compile ceiling to P ~ 2000+ (_solve_schur_dense_chunked_from_pm);
    #   "pcg"   — always matrix-free PCG (the distributed/sharded form);
    #   "pcg_chunked" — PCG split into several small programs with a host CG
    #             loop (same math; the only form that compiles at N >= ~2.5M
    #             observations on this toolchain — BASELINE.md).
    schur_solver: str = "auto"
    # Round-5 crossover (BASELINE.md): fused dense compiles AND is fastest
    # through P=2000 (3.2 vs PCG 2.9 it/s at L=100k); at P=3000 PCG wins on
    # merit (Cholesky O(P^3) dominates, 1.6 vs 2.8) and P=5000 dense exceeds
    # single-chip HBM — so "auto" is dense <= 2048, PCG above.
    dense_max_poses: int = 2048
    # "auto" uses the chunked dense assembly (multi-program, in-place HBM S)
    # for dense_max_poses < P <= this; with the fused ceiling now at the
    # same P as the measured crossover the window is empty by default —
    # dense_chunked stays an explicit escape hatch for shapes/toolchains
    # where the fused assembly won't compile.
    dense_chunked_max_poses: int = 2048
    # Above this observation count, "auto"/"pcg" switch to the chunked
    # multi-program PCG (the fused single program exceeds the remote compile
    # helper's capacity; see _solve_schur_pcg_posemajor_chunked).
    chunked_obs_threshold: int = 2_000_000
    # Sanitizer mode: validate each solver step host-side before applying it
    # (utils/checks.check_ba_step) — catches non-finite updates at the
    # iteration that produced them instead of as a rejected cost later.
    validate: bool = False
    # Outlier trimming: after each LM convergence, drop observations whose
    # reprojection residual exceeds this (pixels) and re-optimize. Huber
    # bounds outlier *influence*; trimming removes their cost floor entirely.
    trim_threshold: float = 0.0  # <= 0 disables
    trim_rounds: int = 2


def save_solver_checkpoint(path: str, problem: BAProblem, state: dict) -> None:
    """Atomically snapshot BA solver state mid-run.

    The reference's backend is closed-source and its frontend is crash-only
    (SURVEY.md section 5: a crash loses everything); here long BA runs are
    resumable: the current problem estimate plus the LM state (round,
    iteration, lambda, cost history) round-trip through one npz file.
    """
    import os

    data = {}
    for f in dataclasses.fields(problem):
        v = getattr(problem, f.name)
        if v is not None:
            data["ba_" + f.name] = np.asarray(jax.device_get(v))
    data["st_round"] = np.int64(state["round"])
    data["st_iter"] = np.int64(state["iter"])
    data["st_lambda"] = np.float64(state["lambda"])
    data["st_history"] = np.asarray(state["history"], np.float64)
    data["st_accepted"] = np.int64(state["accepted"])
    data["st_trimmed"] = np.int64(state["trimmed"])
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file object: savez won't append ".npz"
        np.savez_compressed(f, **data)
    os.replace(tmp, path)


def load_solver_checkpoint(path: str) -> tuple[BAProblem, dict]:
    """Restore (BAProblem, solver-state dict) saved by save_solver_checkpoint."""
    with np.load(path) as raw:
        data = dict(raw)
    kwargs = {}
    for f in dataclasses.fields(BAProblem):
        key = "ba_" + f.name
        if key in data:
            kwargs[f.name] = jnp.asarray(data[key])
    state = {
        "round": int(data["st_round"]),
        "iter": int(data["st_iter"]),
        "lambda": float(data["st_lambda"]),
        "history": [float(x) for x in data["st_history"]],
        "accepted": int(data["st_accepted"]),
        "trimmed": int(data["st_trimmed"]),
    }
    return BAProblem(**kwargs), state


def _segsum(data, ids, num):
    return jax.ops.segment_sum(data, ids, num_segments=num)


def _sym3_inv(M):
    """Batched closed-form inverse of symmetric 3x3 blocks (adjugate)."""
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m11, m12, m22 = M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]
    c00 = m11 * m22 - m12 * m12
    c01 = m02 * m12 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c11 = m00 * m22 - m02 * m02
    c12 = m01 * m02 - m00 * m12
    c22 = m00 * m11 - m01 * m01
    det = m00 * c00 + m01 * c01 + m02 * c02
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c01, c11, c12], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        -2,
    )
    return inv / det[..., None, None]


@partial(jax.jit, static_argnames=("cfg_huber_enabled",))
def _linearize(cam, problem: BAProblem, huber_delta, odom_t_weight, odom_r_weight, cfg_huber_enabled: bool):
    """Residuals + Jacobians for all factors, with IRLS robust weights."""
    r, Jp, Jl = linearize_reprojection(
        cam, problem.poses_t, problem.poses_q, problem.landmarks,
        problem.obs_pose, problem.obs_landmark, problem.obs_pixel, problem.obs_mask,
        problem.obs_pixel_right, problem.obs_right_mask,
    )
    if cfg_huber_enabled:
        w = huber_weights(r, huber_delta)[:, None]
        r = r * w
        Jp = Jp * w[..., None]
        Jl = Jl * w[..., None]
    ro, Ji, Jj = linearize_odometry(
        problem.poses_t, problem.poses_q, problem.odom_i, problem.odom_j,
        problem.odom_t, problem.odom_q, problem.odom_mask,
        odom_t_weight, odom_r_weight,
    )
    return r, Jp, Jl, ro, Ji, Jj


@jax.jit
def _build_pm_inputs(problem: BAProblem):
    """One-time gather of observation INPUTS into pose-major (P, Mp) layout.

    The observation graph is static during a solve, so pixels / landmark ids /
    masks are re-laid-out ONCE here (≤ 13 bytes per observation) and every LM
    iteration then linearizes directly in pose-major form — instead of
    re-gathering the ~160-byte Jacobian/residual rows per iteration (the
    316 ms/iter relayout phase of the round-3 dense-BA profile, BASELINE.md).
    Rebuilt per optimize round because trimming mutates obs_mask.
    """
    tbl = problem.pose_obs  # (P, Mp) flat observation indices
    mask = problem.pose_obs_mask & problem.obs_mask[tbl]
    pm = {
        "landmark": problem.obs_landmark[tbl],  # (P, Mp)
        "pixel": problem.obs_pixel[tbl],  # (P, Mp, 2)
        "mask": mask,  # (P, Mp) bool
        "pixel_right": None,
        "right_mask": None,
    }
    if problem.obs_pixel_right is not None:
        pm["pixel_right"] = problem.obs_pixel_right[tbl]
        pm["right_mask"] = problem.obs_right_mask[tbl] & mask
    return pm


@partial(jax.jit, static_argnames=("cfg_huber_enabled",))
def _linearize_pm(cam, problem: BAProblem, pm, huber_delta, odom_t_weight, odom_r_weight, cfg_huber_enabled: bool):
    """Pose-major residuals + Jacobians (reprojection) + odometry terms."""
    from vision_slam_frontend_tpu.backend.residuals import linearize_reprojection_pm

    r, Jp, Jl = linearize_reprojection_pm(
        cam, problem.poses_t, problem.poses_q, problem.landmarks,
        pm["landmark"], pm["pixel"], pm["mask"],
        pm["pixel_right"], pm["right_mask"],
    )
    if cfg_huber_enabled:
        w = huber_weights(r, huber_delta)[..., None]  # (P, Mp, 1)
        r = r * w
        Jp = Jp * w[..., None]
        Jl = Jl * w[..., None]
    ro, Ji, Jj = linearize_odometry(
        problem.poses_t, problem.poses_q, problem.odom_i, problem.odom_j,
        problem.odom_t, problem.odom_q, problem.odom_mask,
        odom_t_weight, odom_r_weight,
    )
    return r, Jp, Jl, ro, Ji, Jj


@partial(jax.jit, static_argnames=("cfg_huber_enabled",))
def compute_cost(cam, problem: BAProblem, huber_delta, odom_t_weight, odom_r_weight, cfg_huber_enabled: bool):
    """True robustified cost (not the IRLS quadratic)."""
    from vision_slam_frontend_tpu.backend.residuals import (
        linearize_odometry as _lo,
        linearize_reprojection as _lr,
    )

    r, _, _ = _lr(
        cam, problem.poses_t, problem.poses_q, problem.landmarks,
        problem.obs_pose, problem.obs_landmark, problem.obs_pixel, problem.obs_mask,
        problem.obs_pixel_right, problem.obs_right_mask,
    )
    if cfg_huber_enabled:
        norm = jnp.linalg.norm(r, axis=-1)
        d = huber_delta
        rho = jnp.where(norm <= d, 0.5 * norm**2, d * (norm - 0.5 * d))
        reproj_cost = jnp.sum(rho * problem.obs_mask)
    else:
        reproj_cost = 0.5 * jnp.sum(r * r)
    ro, _, _ = _lo(
        problem.poses_t, problem.poses_q, problem.odom_i, problem.odom_j,
        problem.odom_t, problem.odom_q, problem.odom_mask,
        odom_t_weight, odom_r_weight,
    )
    return reproj_cost + 0.5 * jnp.sum(ro * ro)


@partial(jax.jit, static_argnames=("cg_iters", "fix_first"))
def _solve_schur_pcg(
    r, Jp, Jl, ro, Ji, Jj, problem: BAProblem, lm_damping, cg_iters: int, fix_first: bool,
):
    """One damped GN step: Schur-eliminate landmarks, PCG the camera system,
    back-substitute landmarks. Returns (d_pose (P,6), d_lm (L,3), cg_resnorm).

    Dispatches to the pose-major formulation when the problem carries gather
    tables (fast path on TPU; see _solve_schur_pcg_posemajor), else the
    scatter-based segment-sum formulation (works everywhere, and is what the
    observation-sharded distributed path lowers best from).
    """
    if problem.pose_obs is not None:
        return _solve_schur_pcg_posemajor(
            r, Jp, Jl, ro, Ji, Jj, problem, lm_damping, cg_iters, fix_first
        )
    return _solve_schur_pcg_scatter(
        r, Jp, Jl, ro, Ji, Jj, problem, lm_damping, cg_iters, fix_first
    )


def _odom_terms(problem, Ji, Jj, ro, P):
    """Odometry-factor contributions (tiny Q: scatter is fine here)."""
    g = -_segsum(jnp.einsum("qij,qi->qj", Ji, ro), problem.odom_i, P)
    g += -_segsum(jnp.einsum("qij,qi->qj", Jj, ro), problem.odom_j, P)
    U = _segsum(jnp.einsum("qij,qik->qjk", Ji, Ji), problem.odom_i, P)
    U += _segsum(jnp.einsum("qij,qik->qjk", Jj, Jj), problem.odom_j, P)

    def apply_x(x):
        yo = jnp.einsum("qij,qj->qi", Ji, x[problem.odom_i]) + jnp.einsum(
            "qij,qj->qi", Jj, x[problem.odom_j]
        )
        u = _segsum(jnp.einsum("qij,qi->qj", Ji, yo), problem.odom_i, P)
        u += _segsum(jnp.einsum("qij,qi->qj", Jj, yo), problem.odom_j, P)
        return u

    return g, U, apply_x


def _run_pcg(b, S_apply, M_apply, cg_iters):
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M_apply(r0)

    def cg_body(_, carry):
        x, rr, z, p, rz = carry
        Sp = S_apply(p)
        denom = jnp.sum(p * Sp)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        rr2 = rr - alpha * Sp
        z2 = M_apply(rr2)
        rz2 = jnp.sum(rr2 * z2)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz2 / rz, 0.0)
        p2 = z2 + beta * p
        return x, rr2, z2, p2, rz2

    init = (x0, r0, z0, z0, jnp.sum(r0 * z0))
    x, rr, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, init)
    return x, rr


def _pm_build(r, Jp, Jl, ro, Ji, Jj, problem: BAProblem, lm_damping, fix_first: bool):
    """Flat-input wrapper: pose-major relayout + _pm_build_from_pm.

    Kept for callers that linearized flat (sharded problems, probes); the
    production path linearizes pose-major directly (_linearize_pm) and calls
    _pm_build_from_pm, skipping the relayout gathers entirely.
    """
    tbl = problem.pose_obs  # (P, Mp) flat obs indices
    pm_mask = problem.pose_obs_mask.astype(r.dtype)[..., None]  # (P, Mp, 1)
    Jp_pm = Jp[tbl] * pm_mask[..., None]  # (P, Mp, 2, 6)
    Jl_pm = Jl[tbl] * pm_mask[..., None]  # (P, Mp, 2, 3)
    r_pm = r[tbl] * pm_mask  # (P, Mp, 2)
    pm = {
        "landmark": problem.obs_landmark[tbl],
        "mask": problem.pose_obs_mask,
    }
    return _pm_build_from_pm(pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lm_damping, fix_first)


def _pm_build_from_pm(pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem: BAProblem, lm_damping, fix_first: bool):
    """Every one-time product of a Schur-PCG step, from pose-major inputs.

    Shared by the fused single-program path (_solve_schur_pcg_posemajor,
    traced into its caller's jit) and the chunked multi-program path
    (_solve_schur_pcg_posemajor_chunked, where this compiles standalone so no
    single program exceeds what the remote compile helper can digest at
    N >= ~2.5M observations).

    Returns (state, b, g_lm): `state` is the pytree dict the CG step and
    back-substitution consume.
    """
    P = problem.poses_t.shape[0]
    L = problem.landmarks.shape[0]
    pm_mask = pm["mask"].astype(r_pm.dtype)[..., None]  # (P, Mp, 1)
    lm_tbl = problem.lm_obs  # (L, Ml) indices into flat (P*Mp)
    lm_mask = problem.lm_obs_mask.astype(r_pm.dtype)[..., None]  # (L, Ml, 1)
    ol_pm = pm["landmark"]  # (P, Mp) landmark id per slot
    Mp = ol_pm.shape[1]

    def lm_reduce(x_pm):  # (P, Mp, D) -> (L, D): gather + masked sum
        flat = x_pm.reshape(P * Mp, x_pm.shape[-1])
        return jnp.sum(flat[lm_tbl] * lm_mask, axis=1)

    # --- Landmark blocks.
    VV = jnp.einsum("pmij,pmik->pmjk", Jl_pm, Jl_pm).reshape(P, Mp, 9)
    V = lm_reduce(VV).reshape(L, 3, 3) + lm_damping * jnp.eye(3)[None]
    V_inv = _sym3_inv(V)

    # --- Gauge as a free-pose mask (multiplicative form of ".at[0].set(0)").
    fixed = jnp.zeros((P,), bool)
    if fix_first:
        fixed = fixed.at[0].set(True)
    if problem.pose_fixed is not None:
        fixed = fixed | problem.pose_fixed
    free = (~fixed).astype(r_pm.dtype)

    # --- Gradients.
    g_odom, U_odom, _ = _odom_terms(problem, Ji, Jj, ro, P)
    g_pose = -jnp.einsum("pmij,pmi->pj", Jp_pm, r_pm) + g_odom
    g_lm = -lm_reduce(jnp.einsum("pmij,pmi->pmj", Jl_pm, r_pm))

    # --- Reduced RHS.
    s = jnp.einsum("ljk,lk->lj", V_inv, g_lm)  # (L, 3)
    s_pm = s[ol_pm] * pm_mask  # (P, Mp, 3)
    Jls = jnp.einsum("pmij,pmj->pmi", Jl_pm, s_pm)
    b = (g_pose - jnp.einsum("pmij,pmi->pj", Jp_pm, Jls)) * free[:, None]

    # --- Preconditioner.
    U_diag = jnp.einsum("pmij,pmik->pjk", Jp_pm, Jp_pm) + U_odom
    U_diag += lm_damping * jnp.eye(6)[None]
    M_inv = jnp.linalg.inv(U_diag)

    state = {
        "Jp_pm": Jp_pm, "Jl_pm": Jl_pm, "ol_pm": ol_pm, "pm_mask": pm_mask,
        "lm_tbl": lm_tbl, "lm_mask": lm_mask, "V_inv": V_inv, "M_inv": M_inv,
        "Ji": Ji, "Jj": Jj, "odom_i": problem.odom_i, "odom_j": problem.odom_j,
        "free": free, "lam": lm_damping,
    }
    return state, b, g_lm


def _pm_lm_reduce(state, x_pm):
    """(P, Mp, D) -> (L, D): the pose-major-to-landmark gather + masked sum."""
    P, Mp = state["ol_pm"].shape
    flat = x_pm.reshape(P * Mp, x_pm.shape[-1])
    return jnp.sum(flat[state["lm_tbl"]] * state["lm_mask"], axis=1)


def _pm_sapply(state, x):
    """Apply the reduced camera system S = U + lam*I - W V^{-1} W^T."""
    free = state["free"]
    Jp_pm, Jl_pm = state["Jp_pm"], state["Jl_pm"]
    x = x * free[:, None]
    y = jnp.einsum("pmij,pj->pmi", Jp_pm, x)  # (P, Mp, 2), gather-free
    u = jnp.einsum("pmij,pmi->pj", Jp_pm, y) + state["lam"] * x
    # Odometry coupling.
    P = x.shape[0]
    yo = jnp.einsum("qij,qj->qi", state["Ji"], x[state["odom_i"]]) + jnp.einsum(
        "qij,qj->qi", state["Jj"], x[state["odom_j"]]
    )
    u += _segsum(jnp.einsum("qij,qi->qj", state["Ji"], yo), state["odom_i"], P)
    u += _segsum(jnp.einsum("qij,qi->qj", state["Jj"], yo), state["odom_j"], P)
    # Coupling through the eliminated landmarks.
    t = _pm_lm_reduce(state, jnp.einsum("pmij,pmi->pmj", Jl_pm, y))  # (L, 3)
    st = jnp.einsum("ljk,lk->lj", state["V_inv"], t)
    st_pm = st[state["ol_pm"]] * state["pm_mask"]  # (P, Mp, 3)
    z2 = jnp.einsum("pmij,pmj->pmi", Jl_pm, st_pm)
    z = jnp.einsum("pmij,pmi->pj", Jp_pm, z2)
    return (u - z) * free[:, None]


def _pm_mapply(state, x):
    return jnp.einsum("pij,pj->pi", state["M_inv"], x) * state["free"][:, None]


def _pm_backsub(state, g_lm, d_pose):
    """Landmark back-substitution: d_lm = V^{-1}(g_lm - W^T d_pose)."""
    y = jnp.einsum("pmij,pj->pmi", state["Jp_pm"], d_pose)
    wtd = _pm_lm_reduce(state, jnp.einsum("pmij,pmi->pmj", state["Jl_pm"], y))
    return jnp.einsum("ljk,lk->lj", state["V_inv"], g_lm - wtd)


def _solve_schur_pcg_posemajor(
    r, Jp, Jl, ro, Ji, Jj, problem: BAProblem, lm_damping, cg_iters: int, fix_first: bool,
):
    """Pose-major Schur-PCG: the TPU-fast formulation (one fused program).

    Per-observation tensors are re-laid-out ONCE per linearization into
    (P, Mp, ...) pose blocks (problem.pose_obs is the host-built plan). Then:
      - every pose-side product is a dense einsum + axis-sum (no gathers);
      - landmark reductions gather rows of the pose-major flat space via
        problem.lm_obs (L, Ml) — the only gathers left in the CG loop,
        ~3x less traffic than the flat formulation, and the reason this path
        is ~10x faster than scatter segment-sums on TPU.
    """
    state, b, g_lm = _pm_build(r, Jp, Jl, ro, Ji, Jj, problem, lm_damping, fix_first)
    d_pose, rr = _run_pcg(
        b,
        lambda x: _pm_sapply(state, x),
        lambda x: _pm_mapply(state, x),
        cg_iters,
    )
    d_lm = _pm_backsub(state, g_lm, d_pose)
    return d_pose, d_lm, jnp.linalg.norm(rr)


@partial(jax.jit, static_argnames=("cg_iters", "fix_first"))
def _solve_schur_pcg_posemajor_from_pm(
    pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem: BAProblem, lm_damping,
    cg_iters: int, fix_first: bool,
):
    """Fused pose-major Schur-PCG from pose-major linearization (no relayout)."""
    state, b, g_lm = _pm_build_from_pm(
        pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lm_damping, fix_first
    )
    d_pose, rr = _run_pcg(
        b,
        lambda x: _pm_sapply(state, x),
        lambda x: _pm_mapply(state, x),
        cg_iters,
    )
    d_lm = _pm_backsub(state, g_lm, d_pose)
    return d_pose, d_lm, jnp.linalg.norm(rr)


# --- Chunked multi-program variant: same math, split at natural boundaries
# so each compiled program stays small. At N >= ~2.5M observations the fused
# single-program form above dies in this environment's remote compile helper
# (BASELINE.md "toolchain ceiling"); prepare / cg-step / backsub compile and
# run fine individually. Host-side CG costs ~cg_iters dispatches (~3 ms each
# through the tunnel) — noise against S_apply's cost at that scale.

_pm_build_jit = jax.jit(_pm_build, static_argnames=("fix_first",))
_pm_build_from_pm_jit = jax.jit(_pm_build_from_pm, static_argnames=("fix_first",))


@jax.jit
def _pm_cg_init(state, b):
    z0 = _pm_mapply(state, b)
    return jnp.zeros_like(b), b, z0, z0, jnp.sum(b * z0)


@jax.jit
def _pm_cg_step(state, carry):
    x, rr, z, p, rz = carry
    Sp = _pm_sapply(state, p)
    denom = jnp.sum(p * Sp)
    alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
    x = x + alpha * p
    rr2 = rr - alpha * Sp
    z2 = _pm_mapply(state, rr2)
    rz2 = jnp.sum(rr2 * z2)
    beta = jnp.where(jnp.abs(rz) > 1e-20, rz2 / rz, 0.0)
    p2 = z2 + beta * p
    return x, rr2, z2, p2, rz2


@jax.jit
def _pm_finish(state, g_lm, carry):
    x, rr = carry[0], carry[1]
    return x, _pm_backsub(state, g_lm, x), jnp.linalg.norm(rr)


def _solve_schur_pcg_posemajor_chunked(
    r, Jp, Jl, ro, Ji, Jj, problem: BAProblem, lm_damping, cg_iters: int, fix_first: bool,
):
    """Pose-major Schur-PCG as several small programs + a host CG loop.

    Bit-identical math to _solve_schur_pcg_posemajor (both call _pm_build /
    _pm_sapply / _pm_backsub); only the program partitioning differs. This is
    the path that breaks the N=2.5M compile ceiling.
    """
    state, b, g_lm = _pm_build_jit(
        r, Jp, Jl, ro, Ji, Jj, problem, lm_damping, fix_first
    )
    carry = _pm_cg_init(state, b)
    for _ in range(cg_iters):
        carry = _pm_cg_step(state, carry)
    return _pm_finish(state, g_lm, carry)


def _solve_schur_pcg_posemajor_chunked_from_pm(
    pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem: BAProblem, lm_damping,
    cg_iters: int, fix_first: bool,
):
    """Chunked pose-major Schur-PCG from pose-major linearization."""
    state, b, g_lm = _pm_build_from_pm_jit(
        pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lm_damping, fix_first
    )
    carry = _pm_cg_init(state, b)
    for _ in range(cg_iters):
        carry = _pm_cg_step(state, carry)
    return _pm_finish(state, g_lm, carry)


def _chol3(V):
    """Batched closed-form Cholesky of SPD 3x3 blocks: V = G G^T, G lower."""
    eps = 1e-12
    a11 = jnp.maximum(V[..., 0, 0], eps)
    l11 = jnp.sqrt(a11)
    l21 = V[..., 1, 0] / l11
    l31 = V[..., 2, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(V[..., 1, 1] - l21 * l21, eps))
    l32 = (V[..., 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(V[..., 2, 2] - l31 * l31 - l32 * l32, eps))
    z = jnp.zeros_like(l11)
    return jnp.stack(
        [
            jnp.stack([l11, z, z], -1),
            jnp.stack([l21, l22, z], -1),
            jnp.stack([l31, l32, l33], -1),
        ],
        -2,
    )


def _inv_lower3(G):
    """Batched inverse of lower-triangular 3x3 blocks."""
    l11, l21, l31 = G[..., 0, 0], G[..., 1, 0], G[..., 2, 0]
    l22, l32, l33 = G[..., 1, 1], G[..., 2, 1], G[..., 2, 2]
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i33 = 1.0 / l33
    i21 = -l21 * i11 * i22
    i32 = -l32 * i22 * i33
    i31 = (l21 * l32 - l31 * l22) * i11 * i22 * i33
    z = jnp.zeros_like(i11)
    return jnp.stack(
        [
            jnp.stack([i11, z, z], -1),
            jnp.stack([i21, i22, z], -1),
            jnp.stack([i31, i32, i33], -1),
        ],
        -2,
    )


def _bbt_compensated(Bt_chunk, oh):
    """(6P, 6P) coupling contribution B B^T via compensated bf16 matmuls.

    Bt_chunk: (lc, Ml, 6, 3) f32 per-landmark W G^{-T} blocks;
    oh: (lc, Ml, P) bool one-hot pose placement (exactly one landmark
    observation per (pose, landmark) slot, so the placement einsum is pure
    scatter — exact in bf16 up to input rounding).

    A single bf16 pass has ~2^-8 relative error; on real problems that error
    (thousands, absolute) exceeds the Schur complement's smallest eigenvalues
    and makes S indefinite -> NaN Cholesky (measured: min-eig -4.5 vs exact
    +0.57 on a P=64 synthetic). Splitting B = hi + lo (both bf16) and
    computing hi hi^T + hi lo^T + (hi lo^T)^T cuts the error ~256x
    (min-eig +0.63) for 2x the MXU work — still far cheaper than f32.

    Lowering matters, twice over:
      - the natural einsum "lmis,lmp->pils" placement is broadcast+reduce on
        this toolchain (~450 MB of (l,m,p,i,s) intermediate per
        8192-landmark chunk, 13 ms); the explicit dot_general pair below —
        an l-batched (18, Ml)x(Ml, PW) slab build, then one
        (l, s)-contracting MXU product — measures 4.7 ms for the same chunk
        (round-5 probe, bit-equal to the einsum form up to bf16 rounding);
      - TPU's T(8,128) tiling pads a trailing dim-6 axis to 128, so a
        (PW, 6, PW, 6) pose-major output materializes at 21x its logical
        size (27.6 GB at PW=3000 — the round-5 P=3000 OOM). The result is
        therefore returned I-MAJOR, (6, PW, 6, PW) — trailing (6, PW) tiles
        cleanly — and the whole dense S pipeline works in that layout (a
        symmetric permutation of S, so the Cholesky solve is unaffected).
    """
    P = oh.shape[-1]
    lc, Ml = Bt_chunk.shape[:2]
    f32 = Bt_chunk.astype(jnp.float32)
    hi = f32.astype(jnp.bfloat16)
    f32 = f32 - hi.astype(jnp.float32)
    mid = f32.astype(jnp.bfloat16)
    lo = (f32 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    ohb = oh.astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((0,), (0,)))  # contract m, batch l
    dn2 = (((0, 2), (0, 2)), ((), ()))  # contract (l, s)

    def place(x):
        return jax.lax.dot_general(
            x.reshape(lc, Ml, 18), ohb, dn, preferred_element_type=jnp.bfloat16
        ).reshape(lc, 6, 3, P)

    def dot2(a, b):
        return jax.lax.dot_general(a, b, dn2, preferred_element_type=jnp.float32)

    def symT(M):
        return jnp.transpose(M, (2, 3, 0, 1))

    Bh, Bm, Bl = place(hi), place(mid), place(lo)
    # B = h + m + l (3 x bf16 ~ 24 mantissa bits, f32-class): keep terms down
    # to 2^-16 relative — hh + (hm + mh) + (hl + lh) + mm; ml/ll (~2^-24
    # relative) are dropped. The two-term hi/lo form's 2^-16-relative error
    # reached ~7e7 ABSOLUTE on the at-scale |B| tail and made the compensated
    # S indefinite (round-5 probe at P=100/L=20k) -> NaN Cholesky.
    HH = dot2(Bh, Bh)
    HM = dot2(Bh, Bm)
    HL = dot2(Bh, Bl)
    MM = dot2(Bm, Bm)
    return HH + MM + HM + symT(HM) + HL + symT(HL)  # (6, PW, 6, PW)


def _diag_place(v, off: int):
    """Place vector v (P,) on the (off)-superdiagonal of a zero (P, P)
    matrix — pure pad-and-reshape, no scatter. off=0: main diagonal; off=1:
    superdiagonal (v[P-1] then has no in-range slot and must be zero —
    odometry chain factors guarantee that)."""
    P = v.shape[0]
    Y = jnp.concatenate(
        [
            jnp.zeros((P, off), v.dtype),
            v[:, None],
            jnp.zeros((P, P - off), v.dtype),
        ],
        axis=1,
    )  # (P, P+1): re-chunking rows of P shifts each row right by one
    return Y.reshape(-1)[: P * P].reshape(P, P)


def _block_place_im(blocks, off: int):
    """Place (P, 6, 6) blocks on the (off)-super-block-diagonal of a zero
    I-MAJOR (6, P, 6, P) matrix: out[i, p, j, p+off] = blocks[p, i, j].

    36 vmapped _diag_place calls; every intermediate keeps a large trailing
    axis (P), which tiles cleanly — the reason the dense pipeline is i-major
    (see _bbt_compensated's layout note).
    """
    U36 = jnp.transpose(blocks, (1, 2, 0))  # (6, 6, P)
    D = jax.vmap(jax.vmap(lambda v: _diag_place(v, off)))(U36)  # (6, 6, P, P)
    return jnp.transpose(D, (0, 2, 1, 3))  # (6, P, 6, P)


def _s_init(U_diag, Ji, Jj, odom_i, odom_j, extras):
    """Scatter-free assembly of S's block diagonal + odometry coupling
    blocks, in the I-MAJOR (6, P, 6, P) layout (S_im[i, p, j, q] =
    S[6p+i, 6q+j] — a symmetric permutation of S, solved as-is).

    Scatters into a (P, 6, P, 6) operand (`.at[ar, :, ar, :].set` /
    `.at[oi, :, oj, :].add`) make the TPU compile helper plan ~26.7 GB and
    die at P >= 2000, and a lax.scan of per-factor 6x6 dynamic updates runs
    ~7 s at P=2000 on this toolchain (the (6P)^2 carry is copied per step,
    round-5 probes). Instead:
      - block diagonal + chain-factor coupling via _block_place_im: chain
        factors (j == i+1, every frontend odometry factor) reduce to a
        (P, 6, 6) band (small-operand scatter-add, fine on TPU), placed on
        the block super-diagonal, symmetrized with one cheap transpose;
      - non-chain factors (merge/loop-closure ties — host-static `extras`
        index tuple, usually empty) via a one-hot einsum over just those
        factors (None = no host plan: one-hot einsum over ALL factors,
        small-problem fallback).
    """
    P = U_diag.shape[0]
    S_im = _block_place_im(U_diag, 0)
    if odom_i is None:
        return S_im

    def sym(M):  # M + M^T in i-major land
        return M + jnp.transpose(M, (2, 3, 0, 1))

    Koff = jnp.einsum("qia,qib->qab", Ji, Jj)
    if extras is None:
        oi = jax.nn.one_hot(odom_i, P, dtype=Koff.dtype)
        oj = jax.nn.one_hot(odom_j, P, dtype=Koff.dtype)
        return S_im + sym(jnp.einsum("qab,qp,qr->apbr", Koff, oi, oj))
    chain = odom_j == odom_i + 1
    # Masked factors carry zeroed Jacobians (Koff = 0) and padding ids fail
    # the chain test either way; dump non-chain rows into the P slot.
    band = jnp.zeros((P + 1, 6, 6), Koff.dtype)
    band = band.at[jnp.where(chain, odom_i, P)].add(Koff)
    S_im = S_im + sym(_block_place_im(band[:P], 1))
    if len(extras):
        idx = jnp.asarray(extras, jnp.int32)
        Ke = Koff[idx]
        oi = jax.nn.one_hot(odom_i[idx], P, dtype=Koff.dtype)
        oj = jax.nn.one_hot(odom_j[idx], P, dtype=Koff.dtype)
        S_im = S_im + sym(jnp.einsum("qab,qp,qr->apbr", Ke, oi, oj))
    return S_im


def _dense_coupling_plan(problem: BAProblem, chunk: int = 8192, pw_multiple: int = 64):
    """Host-side static plan for the dense solver's banded B B^T coupling.

    Frontend problems are pose-local: a landmark's observations span only the
    keyframes that kept it in view (window W=10 in the reference,
    src/slam_frontend.cc:424-434), so with landmarks ordered by first
    observing pose each 8192-landmark chunk touches ~tens of consecutive
    poses, not all P. The chunk's B slab then needs only 6*PW rows instead of
    6*P — at the benched P=500/L=100k shape that is ~60x less MXU work and
    ~8x less placement traffic than full-width placement (the round-3
    profile's 391 ms coupling phase vs its 58 ms matmul lower bound).

    Returns (PW, chunk, (pmin per chunk), (extra odom factor indices)) — all
    static ints, so the jitted solver specializes on it (one compile per
    problem, the existing norm). Falls back to full width (PW = P) when
    landmarks aren't pose-local. The extras tuple lists valid NON-CHAIN
    odometry factors (j != i+1 — merge/loop-closure ties); chain factors are
    assembled scatter-free via the banded placement in _s_init.
    """
    P = int(problem.poses_t.shape[0])
    L = int(problem.landmarks.shape[0])
    extras = ()
    if problem.odom_i is not None:
        oi = np.asarray(jax.device_get(problem.odom_i))
        oj = np.asarray(jax.device_get(problem.odom_j))
        om = np.asarray(jax.device_get(problem.odom_mask))
        extras = tuple(int(q) for q in np.nonzero(om & (oj != oi + 1))[0])
    lm_obs = np.asarray(jax.device_get(problem.lm_obs))
    lm_mask = np.asarray(jax.device_get(problem.lm_obs_mask))
    Mp = int(problem.pose_obs.shape[1])
    pose_idx = lm_obs // Mp  # (L, Ml) pose per landmark-observation slot
    lmin = np.where(lm_mask, pose_idx, P).min(axis=1)  # (L,) P if unobserved
    lmax = np.where(lm_mask, pose_idx, -1).max(axis=1)  # (L,) -1 if unobserved
    bounds = []  # (pmin, span) per chunk; span<=0 marks an empty chunk
    for l0 in range(0, L, chunk):
        mx = int(lmax[l0 : l0 + chunk].max())
        if mx < 0:  # chunk of padding landmarks: contributes nothing
            bounds.append((0, 0))
            continue
        mn = min(int(lmin[l0 : l0 + chunk].min()), mx)
        bounds.append((mn, mx - mn + 1))
    # PW covers the pose-local chunks; outlier chunks (e.g. loop-closure
    # landmarks spanning the whole trajectory) place full-width individually
    # (pmin = -1) instead of dragging every chunk to full width.
    local = [s for _, s in bounds if 0 < s <= max(P // 2, pw_multiple)]
    if not local:
        return (P, chunk, tuple(0 for _ in bounds), extras)
    PW = min(-(-max(local) // pw_multiple) * pw_multiple, P)
    if PW >= P:
        return (P, chunk, tuple(0 for _ in bounds), extras)
    return (
        PW,
        chunk,
        tuple(min(mn, P - PW) if 0 <= s <= PW else -1 for mn, s in bounds),
        extras,
    )


def _dense_core(
    pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem: BAProblem, lm_damping,
    fix_first: bool, plan,
):
    """One damped GN step via an EXPLICIT reduced camera matrix + Cholesky.

    TPU-idiomatic alternative to matrix-free PCG for small/medium pose counts
    (6P x 6P fits HBM comfortably up to P ~ 2000): the Schur complement
        S = U + lambda*I - B B^T,   B = W V^{-1/2}  (W = Jp^T Jl per pair)
    is materialized with chunked compensated-bf16 MXU matmuls (hi/lo split,
    f32 accumulation — see _bbt_compensated) and solved EXACTLY with one
    dense Cholesky. Matrix-free PCG pays two
    transaction-bound small-row gathers per CG iteration (~20 ms each at
    500k observations on this hardware); here ALL per-iteration gathers
    vanish and the MXU does the coupling term at speed of light.

    Inputs arrive pose-major (r_pm (P,Mp,D), Jp_pm, Jl_pm + the pm dict from
    _build_pm_inputs) — the production path linearizes directly in this
    layout (_linearize_pm), so no per-iteration relayout gathers exist.
    `plan` is the static banded-coupling plan from _dense_coupling_plan
    (None = full-width placement).
    """
    P = problem.poses_t.shape[0]
    L = problem.landmarks.shape[0]
    pm_mask = pm["mask"].astype(r_pm.dtype)[..., None]  # (P, Mp, 1)
    lm_tbl = problem.lm_obs  # (L, Ml) indices into flat (P*Mp)
    lm_mask = problem.lm_obs_mask.astype(r_pm.dtype)[..., None]
    ol_pm = pm["landmark"]  # (P, Mp)
    Mp = ol_pm.shape[1]
    Ml = lm_tbl.shape[1]

    def lm_reduce(x_pm):  # (P, Mp, D') -> (L, D')
        flat = x_pm.reshape(P * Mp, x_pm.shape[-1])
        return jnp.sum(flat[lm_tbl] * lm_mask, axis=1)

    # Landmark blocks + factorization.
    VV = jnp.einsum("pmij,pmik->pmjk", Jl_pm, Jl_pm).reshape(P, Mp, 9)
    V = lm_reduce(VV).reshape(L, 3, 3)
    # Trace-relative damping floor: with plain lm_damping (~1e-3) against
    # V ~ 1e6, cond(V) reaches ~1e9 and the f32 3x3 Cholesky's pivot
    # cancellation produces garbage factors — B = W G^{-T} inflates ~100x
    # and the EXACT S built from it is indefinite (measured min-eig -2e12 at
    # P=100/L=20k) -> NaN. Flooring per-landmark damping at 1e-5 of the
    # local trace caps cond(V) at ~3e5 (f32-factorable); for well-conditioned
    # landmarks this is a ~3e-5 relative perturbation, for degenerate ones
    # it damps exactly the unconstrained directions. Applied consistently to
    # the factorization, elimination, AND back-substitution, so the Schur
    # algebra stays self-consistent (it is per-landmark-scaled LM damping).
    trV = V[..., 0, 0] + V[..., 1, 1] + V[..., 2, 2]
    vfloor = jnp.maximum(lm_damping, 1e-5 * trV / 3.0)[..., None, None]
    V = V + vfloor * jnp.eye(3)[None]
    V_inv = _sym3_inv(V)
    Ginv = _inv_lower3(_chol3(V))  # V^{-1} = Ginv^T Ginv

    # Gradients + reduced RHS (identical math to the PCG path).
    g_odom, U_odom, _ = _odom_terms(problem, Ji, Jj, ro, P)
    g_pose = -jnp.einsum("pmij,pmi->pj", Jp_pm, r_pm) + g_odom
    g_lm = -lm_reduce(jnp.einsum("pmij,pmi->pmj", Jl_pm, r_pm))

    fixed = jnp.zeros((P,), bool)
    if fix_first:
        fixed = fixed.at[0].set(True)
    if problem.pose_fixed is not None:
        fixed = fixed | problem.pose_fixed
    free = (~fixed).astype(jnp.float32)

    def gauge(x):
        return x * free[:, None]

    s = jnp.einsum("ljk,lk->lj", V_inv, g_lm)
    s_pm = s[ol_pm] * pm_mask
    Jls = jnp.einsum("pmij,pmj->pmi", Jl_pm, s_pm)
    b = gauge(g_pose - jnp.einsum("pmij,pmi->pj", Jp_pm, Jls))

    # --- Dense S. Diagonal: U + odom diag + damping; odometry off-diagonal
    # blocks assembled scatter-free (_s_init — scatters into a (P,6,P,6)
    # operand make the TPU compile helper plan ~26.7 GB and die at P >= 2000).
    U_diag = jnp.einsum("pmij,pmik->pjk", Jp_pm, Jp_pm) + U_odom
    U_diag += lm_damping * jnp.eye(6)[None]
    ar = jnp.arange(P)
    if plan is None:
        chunk = 8192
        plan = (P, chunk, tuple(0 for _ in range(0, max(L, 1), chunk)), None)
    PW, chunk, pmins = plan[:3]
    extras = plan[3] if len(plan) > 3 else None
    S2 = _s_init(U_diag, Ji, Jj, problem.odom_i, problem.odom_j, extras)

    # --- Coupling term: S -= B B^T with B = W V^{-1/2}, built landmark-major
    # in chunks so the pose one-hot placement stays small, then one big MXU
    # matmul per chunk. With a banded plan each chunk's slab covers only the
    # PW-pose window its landmarks actually touch (_dense_coupling_plan).
    W_pm = jnp.einsum("pmij,pmik->pmjk", Jp_pm, Jl_pm)  # (P, Mp, 6, 3)
    W_lm = W_pm.reshape(P * Mp, 18)[lm_tbl].reshape(L, Ml, 6, 3) * lm_mask[..., None]
    Bt = jnp.einsum("lmij,lcj->lmic", W_lm, Ginv)  # (L, Ml, 6, 3) = W G^{-T}
    pose_of = lm_tbl // Mp  # (L, Ml)
    arw = jnp.arange(PW)
    for ci, l0 in enumerate(range(0, L, chunk)):
        lc = min(chunk, L - l0)
        pmin = pmins[ci]
        if pmin < 0:  # outlier chunk (span > PW): full-width placement
            oh = pose_of[l0 : l0 + lc, :, None] == ar[None, None, :]
            S2 = S2 - _bbt_compensated(Bt[l0 : l0 + lc], oh)
            continue
        # Masked slots carry pose 0 but a zeroed Bt row: outside the window
        # they one-hot to nothing; inside they contribute exact zeros.
        oh = (pose_of[l0 : l0 + lc, :, None] - pmin) == arw[None, None, :]
        bbt = _bbt_compensated(Bt[l0 : l0 + lc], oh)  # (6, PW, 6, PW) i-major
        S2 = S2.at[:, pmin : pmin + PW, :, pmin : pmin + PW].add(-bbt)

    # --- Gauge + exact solve on the i-major-permuted system (_dense_solve).
    d_pose, rrn = _dense_solve_core(S2, b, free)

    # --- Back-substitution (identical to the PCG path).
    y = jnp.einsum("pmij,pj->pmi", Jp_pm, d_pose)
    wtd = lm_reduce(jnp.einsum("pmij,pmi->pmj", Jl_pm, y))
    d_lm = jnp.einsum("ljk,lk->lj", V_inv, g_lm - wtd)
    return d_pose, d_lm, rrn


# Pose-major-input dense entry (the production path: _linearize_pm feeds it;
# `plan` from _dense_coupling_plan is static, so one compile per problem).
_solve_schur_dense_pm = jax.jit(_dense_core, static_argnames=("fix_first", "plan"))


# --- Chunked dense solver: the same explicit-S math as _dense_core, split at
# its natural phase boundaries (prep / per-chunk coupling accumulate /
# Cholesky / back-substitution) into separate jitted programs with the S
# matrix accumulated IN PLACE in HBM (buffer donation), so no single program's
# working set exceeds what this environment's remote compile helper digests
# (~1 GB — CLAUDE.md). This is what extends the measured-fastest dense solver
# past the fused form's P~1k compile ceiling to P=2000+ (the pcg_chunked
# pattern applied to dense assembly; round-4 VERDICT item 1).


@partial(jax.jit, static_argnames=("fix_first", "extras"))
def _dense_prep(pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem: BAProblem, lm_damping, fix_first: bool, extras=None):
    """Everything before the coupling accumulation, as one program.

    Returns a dict with the initial S (diag + odometry coupling) in the
    i-major (6, P, 6, P) layout (see _bbt_compensated's layout note), the
    gauged reduced RHS b, the per-landmark coupling slabs Bt = W G^{-T}
    laid out landmark-major, and the pieces back-substitution needs.
    """
    P = problem.poses_t.shape[0]
    L = problem.landmarks.shape[0]
    pm_mask = pm["mask"].astype(r_pm.dtype)[..., None]
    lm_tbl = problem.lm_obs
    lm_mask = problem.lm_obs_mask.astype(r_pm.dtype)[..., None]
    ol_pm = pm["landmark"]
    Mp = ol_pm.shape[1]
    Ml = lm_tbl.shape[1]

    def lm_reduce(x_pm):
        flat = x_pm.reshape(P * Mp, x_pm.shape[-1])
        return jnp.sum(flat[lm_tbl] * lm_mask, axis=1)

    VV = jnp.einsum("pmij,pmik->pmjk", Jl_pm, Jl_pm).reshape(P, Mp, 9)
    V = lm_reduce(VV).reshape(L, 3, 3)
    # Trace-relative damping floor: with plain lm_damping (~1e-3) against
    # V ~ 1e6, cond(V) reaches ~1e9 and the f32 3x3 Cholesky's pivot
    # cancellation produces garbage factors — B = W G^{-T} inflates ~100x
    # and the EXACT S built from it is indefinite (measured min-eig -2e12 at
    # P=100/L=20k) -> NaN. Flooring per-landmark damping at 1e-5 of the
    # local trace caps cond(V) at ~3e5 (f32-factorable); for well-conditioned
    # landmarks this is a ~3e-5 relative perturbation, for degenerate ones
    # it damps exactly the unconstrained directions. Applied consistently to
    # the factorization, elimination, AND back-substitution, so the Schur
    # algebra stays self-consistent (it is per-landmark-scaled LM damping).
    trV = V[..., 0, 0] + V[..., 1, 1] + V[..., 2, 2]
    vfloor = jnp.maximum(lm_damping, 1e-5 * trV / 3.0)[..., None, None]
    V = V + vfloor * jnp.eye(3)[None]
    V_inv = _sym3_inv(V)
    Ginv = _inv_lower3(_chol3(V))

    g_odom, U_odom, _ = _odom_terms(problem, Ji, Jj, ro, P)
    g_pose = -jnp.einsum("pmij,pmi->pj", Jp_pm, r_pm) + g_odom
    g_lm = -lm_reduce(jnp.einsum("pmij,pmi->pmj", Jl_pm, r_pm))

    fixed = jnp.zeros((P,), bool)
    if fix_first:
        fixed = fixed.at[0].set(True)
    if problem.pose_fixed is not None:
        fixed = fixed | problem.pose_fixed
    free = (~fixed).astype(jnp.float32)

    s = jnp.einsum("ljk,lk->lj", V_inv, g_lm)
    s_pm = s[ol_pm] * pm_mask
    Jls = jnp.einsum("pmij,pmj->pmi", Jl_pm, s_pm)
    b = (g_pose - jnp.einsum("pmij,pmi->pj", Jp_pm, Jls)) * free[:, None]

    U_diag = jnp.einsum("pmij,pmik->pjk", Jp_pm, Jp_pm) + U_odom
    U_diag += lm_damping * jnp.eye(6)[None]
    S2 = _s_init(U_diag, Ji, Jj, problem.odom_i, problem.odom_j, extras)

    W_pm = jnp.einsum("pmij,pmik->pmjk", Jp_pm, Jl_pm)
    W_lm = W_pm.reshape(P * Mp, 18)[lm_tbl].reshape(L, Ml, 6, 3) * lm_mask[..., None]
    Bt = jnp.einsum("lmij,lcj->lmic", W_lm, Ginv)
    pose_of = lm_tbl // Mp

    return {
        "S2": S2, "b": b, "free": free,
        "V_inv": V_inv, "g_lm": g_lm, "Bt": Bt, "pose_of": pose_of,
    }


@partial(jax.jit, donate_argnums=(0,))
def _dense_accum_banded(S_im, Bt_chunk, pose_chunk, pmin, arw):
    """S_im -= chunk's B B^T, placed in the i-major PW-pose window at pmin.

    `arw` = jnp.arange(PW) carries the static window width; `pmin` is a
    traced scalar so one compiled program serves every banded chunk. S_im
    ((6, P, 6, P)) is donated: the update is in place in HBM.
    """
    oh = (pose_chunk[:, :, None] - pmin) == arw[None, None, :]
    bbt = _bbt_compensated(Bt_chunk, oh)  # (6, PW, 6, PW)
    PW = arw.shape[0]
    window = jax.lax.dynamic_slice(
        S_im, (0, pmin, 0, pmin), (6, PW, 6, PW)
    )
    return jax.lax.dynamic_update_slice(S_im, window - bbt, (0, pmin, 0, pmin))


@partial(jax.jit, donate_argnums=(0,))
def _dense_accum_full(S_im, Bt_chunk, pose_chunk):
    """Full-width placement for outlier chunks (loop-closure landmarks)."""
    P = S_im.shape[1]
    oh = pose_chunk[:, :, None] == jnp.arange(P)[None, None, :]
    return S_im - _bbt_compensated(Bt_chunk, oh)


def _dense_solve_core(S_im, b, free):
    """Gauge + exact Cholesky solve of the assembled reduced camera system,
    in the i-major layout: the (6, P, 6, P) -> (6P, 6P) reshape is a
    symmetric PERMUTATION of S (row/col order (i, p) instead of (p, i)), so
    Cholesky factors it directly; only the tiny rhs/solution vectors are
    re-ordered at the boundary."""
    P = b.shape[0]
    S_im = S_im * free[None, :, None, None] * free[None, None, None, :]
    S2 = S_im.reshape(6 * P, 6 * P)  # free: i-major is contiguous row-major
    free6 = jnp.tile(free, 6)  # i-major row order: index i*P + p
    S2 = S2 + jnp.diag(1.0 - free6)
    # Jacobi equilibration: at small LM damping the raw S's condition number
    # reaches ~1e12 (diag spans rotation vs translation blocks and pose
    # observation counts), past what an f32 Cholesky can factor; scaling by
    # d = diag(S)^{-1/2} is exact (D S D with the solve rescaled) and brings
    # cond into f32 range — the standard dense-BA practice.
    d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(S2), 1e-20))
    S2e = S2 * d[:, None] * d[None, :]
    # Assembly-noise ridge: the f32/compensated-bf16 coupling accumulates
    # ~1e-7 relative error of |S| (measured equilibrated min-eig -2.5e-4 at
    # P=100/L=20k), which swamps the exact system's smallest eigenvalues at
    # small LM damping and makes Cholesky NaN. A 1e-3 ridge on the
    # EQUILIBRATED matrix is Marquardt-style diag-relative damping at 4x the
    # measured noise floor — it guarantees positive definiteness while
    # perturbing the step by ~0.1% of each coordinate's own curvature.
    S2e = S2e + 1e-3 * jnp.eye(S2e.shape[0], dtype=S2e.dtype)
    chol = jax.scipy.linalg.cholesky(S2e, lower=True)
    xe = jax.scipy.linalg.cho_solve((chol, True), b.T.reshape(-1) * d)
    x = xe * d
    d_pose = x.reshape(6, P).T * free[:, None]
    rr = b - (S2 @ x).reshape(6, P).T
    return d_pose, jnp.linalg.norm(rr)


_dense_solve = jax.jit(_dense_solve_core)


@jax.jit
def _dense_backsub(Jp_pm, Jl_pm, lm_tbl, lm_mask_b, V_inv, g_lm, d_pose):
    """d_lm = V^{-1}(g_lm - W^T d_pose), from pose-major inputs."""
    P, Mp = Jp_pm.shape[:2]
    lm_mask = lm_mask_b.astype(g_lm.dtype)[..., None]
    y = jnp.einsum("pmij,pj->pmi", Jp_pm, d_pose)
    flat = jnp.einsum("pmij,pmi->pmj", Jl_pm, y).reshape(P * Mp, 3)
    wtd = jnp.sum(flat[lm_tbl] * lm_mask, axis=1)
    return jnp.einsum("ljk,lk->lj", V_inv, g_lm - wtd)


# Sub-chunk size for full-width (outlier) placements in the chunked dense
# path: keeps the (6P, 3*lc) bf16 placement slabs small next to the two
# (6P)^2 buffers the accumulate program already holds.
_DENSE_FULL_SUBCHUNK = 2048


def _solve_schur_dense_chunked_from_pm(
    pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem: BAProblem, lm_damping,
    fix_first: bool, plan,
):
    """Chunked dense Schur solve: multi-program assembly, host chunk loop.

    Same math as _dense_core (identical phase order; full-width chunks split
    into fixed sub-chunks, which only reorders a sum), so results match the
    fused dense path to fp accumulation order.
    """
    P = problem.poses_t.shape[0]
    L = problem.landmarks.shape[0]
    if plan is None:
        chunk = 8192
        plan = (P, chunk, tuple(-1 for _ in range(0, max(L, 1), chunk)), None)
    PW, chunk, pmins = plan[:3]
    extras = plan[3] if len(plan) > 3 else None
    prep = _dense_prep(
        pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lm_damping, fix_first,
        extras=extras,
    )
    S2 = prep.pop("S2")  # sole reference: the accumulate programs donate it
    Bt, pose_of = prep["Bt"], prep["pose_of"]
    arw = jnp.arange(PW)
    for ci, l0 in enumerate(range(0, L, chunk)):
        lc = min(chunk, L - l0)
        pmin = pmins[ci]
        if pmin < 0 or PW >= P:  # full-width placement, in sub-chunks
            for s0 in range(l0, l0 + lc, _DENSE_FULL_SUBCHUNK):
                sc = min(_DENSE_FULL_SUBCHUNK, l0 + lc - s0)
                S2 = _dense_accum_full(
                    S2, Bt[s0 : s0 + sc], pose_of[s0 : s0 + sc]
                )
        else:
            S2 = _dense_accum_banded(
                S2, Bt[l0 : l0 + lc], pose_of[l0 : l0 + lc],
                jnp.int32(pmin), arw,
            )
    d_pose, rr = _dense_solve(S2, prep["b"], prep["free"])
    d_lm = _dense_backsub(
        Jp_pm, Jl_pm, problem.lm_obs, problem.lm_obs_mask,
        prep["V_inv"], prep["g_lm"], d_pose,
    )
    return d_pose, d_lm, rr


@partial(jax.jit, static_argnames=("fix_first",))
def _solve_schur_dense(
    r, Jp, Jl, ro, Ji, Jj, problem: BAProblem, lm_damping, fix_first: bool,
):
    """Flat-input dense solve: pose-major relayout + _dense_core (full-width
    coupling). Kept for flat-linearizing callers (segment solver, probes,
    tests); the production LM loop uses _solve_schur_dense_pm directly."""
    tbl = problem.pose_obs
    pm_mask = problem.pose_obs_mask.astype(r.dtype)[..., None]
    Jp_pm = Jp[tbl] * pm_mask[..., None]
    Jl_pm = Jl[tbl] * pm_mask[..., None]
    r_pm = r[tbl] * pm_mask
    pm = {"landmark": problem.obs_landmark[tbl], "mask": problem.pose_obs_mask}
    return _dense_core(
        pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lm_damping, fix_first, None
    )


def _solve_schur_pcg_scatter(
    r, Jp, Jl, ro, Ji, Jj, problem: BAProblem, lm_damping, cg_iters: int, fix_first: bool,
):
    """Flat scatter-based formulation (fallback; also the distributed form)."""
    P = problem.poses_t.shape[0]
    L = problem.landmarks.shape[0]
    op = problem.obs_pose
    ol = problem.obs_landmark

    def reduce_pose(data):
        return _segsum(data, op, P)

    def reduce_lm(data):
        return _segsum(data, ol, L)

    # --- Landmark blocks and their exact elimination.
    V = reduce_lm(jnp.einsum("nij,nik->njk", Jl, Jl))  # (L, 3, 3)
    V = V + lm_damping * jnp.eye(3)[None]
    V_inv = _sym3_inv(V)

    # --- Gradients (RHS of the normal equations): g = -J^T r.
    g_pose = -reduce_pose(jnp.einsum("nij,ni->nj", Jp, r))
    g_pose += -_segsum(jnp.einsum("qij,qi->qj", Ji, ro), problem.odom_i, P)
    g_pose += -_segsum(jnp.einsum("qij,qi->qj", Jj, ro), problem.odom_j, P)
    g_lm = -reduce_lm(jnp.einsum("nij,ni->nj", Jl, r))

    def gauge(x):
        if fix_first:
            x = x.at[0].set(0.0)
        if problem.pose_fixed is not None:
            x = jnp.where(problem.pose_fixed[:, None], 0.0, x)
        return x

    # --- Reduced RHS: b = g_pose - W V^{-1} g_lm, with W s applied
    # per-observation as Jp^T (Jl s).
    s = jnp.einsum("ljk,lk->lj", V_inv, g_lm)  # (L, 3)
    Jls = jnp.einsum("nij,nj->ni", Jl, s[ol])  # (N, 2)
    b = gauge(g_pose - reduce_pose(jnp.einsum("nij,ni->nj", Jp, Jls)))

    # --- Block-Jacobi preconditioner from the U diagonal.
    U_diag = reduce_pose(jnp.einsum("nij,nik->njk", Jp, Jp))
    U_diag += _segsum(jnp.einsum("qij,qik->qjk", Ji, Ji), problem.odom_i, P)
    U_diag += _segsum(jnp.einsum("qij,qik->qjk", Jj, Jj), problem.odom_j, P)
    U_diag += lm_damping * jnp.eye(6)[None]
    M_inv = jnp.linalg.inv(U_diag)  # (P, 6, 6) batched small inverses

    def S_apply(x):  # x: (P, 6)
        x = gauge(x)
        # U x: reprojection part...
        y = jnp.einsum("nij,nj->ni", Jp, x[op])  # (N, 2)
        u = reduce_pose(jnp.einsum("nij,ni->nj", Jp, y))
        # ... odometry part (couples pose pairs):
        yo = jnp.einsum("qij,qj->qi", Ji, x[problem.odom_i]) + jnp.einsum(
            "qij,qj->qi", Jj, x[problem.odom_j]
        )  # (Q, 6)
        u += _segsum(jnp.einsum("qij,qi->qj", Ji, yo), problem.odom_i, P)
        u += _segsum(jnp.einsum("qij,qi->qj", Jj, yo), problem.odom_j, P)
        u += lm_damping * x
        # - W V^{-1} W^T x:
        t = reduce_lm(jnp.einsum("nij,ni->nj", Jl, y))  # (L, 3)
        st = jnp.einsum("ljk,lk->lj", V_inv, t)
        Jlst = jnp.einsum("nij,nj->ni", Jl, st[ol])  # (N, 2)
        z = reduce_pose(jnp.einsum("nij,ni->nj", Jp, Jlst))
        return gauge(u - z)

    def M_apply(x):
        return gauge(jnp.einsum("pij,pj->pi", M_inv, x))

    # --- PCG.
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M_apply(r0)
    p0 = z0

    def cg_body(_, carry):
        x, rr, z, p, rz = carry
        Sp = S_apply(p)
        denom = jnp.sum(p * Sp)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        rr2 = rr - alpha * Sp
        z2 = M_apply(rr2)
        rz2 = jnp.sum(rr2 * z2)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz2 / rz, 0.0)
        p2 = z2 + beta * p
        return x, rr2, z2, p2, rz2

    init = (x0, r0, z0, p0, jnp.sum(r0 * z0))
    x, rr, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, init)
    d_pose = x

    # --- Landmark back-substitution: d_lm = V^{-1}(g_lm - W^T d_pose).
    y = jnp.einsum("nij,nj->ni", Jp, d_pose[op])  # (N, 2)
    wtd = reduce_lm(jnp.einsum("nij,ni->nj", Jl, y))
    d_lm = jnp.einsum("ljk,lk->lj", V_inv, g_lm - wtd)

    return d_pose, d_lm, jnp.linalg.norm(rr)


@partial(jax.jit, static_argnames=("iters", "cfg_huber_enabled"))
def refit_landmarks(cam, problem: BAProblem, huber_delta, iters: int, cfg_huber_enabled: bool):
    """Landmark-only Gauss-Newton refit with poses held fixed.

    The structure half of resection–intersection: each landmark's 3x3 normal
    system is exactly solvable and independent, so the whole refit is one
    batched program (and shards trivially by landmark). Used by the
    segment-parallel solver to reconcile duplicated landmark copies after a
    pose sweep; each inner iteration strictly decreases the global
    reprojection cost in the Gauss-Newton sense.
    """
    L = problem.landmarks.shape[0]

    def one(prob):
        r, _, Jl = linearize_reprojection(
            cam, prob.poses_t, prob.poses_q, prob.landmarks,
            prob.obs_pose, prob.obs_landmark, prob.obs_pixel, prob.obs_mask,
            prob.obs_pixel_right, prob.obs_right_mask,
        )
        if cfg_huber_enabled:
            w = huber_weights(r, huber_delta)[:, None]
            r = r * w
            Jl = Jl * w[..., None]
        if prob.lm_obs is not None:
            lm_tbl = prob.lm_obs
            lm_mask = prob.lm_obs_mask.astype(r.dtype)[..., None]
            # lm_obs indexes the pose-major flat (P*Mp) space; map back to
            # flat observation ids via pose_obs.
            flat_ids = prob.pose_obs.reshape(-1)[lm_tbl]
            r_lm = r[flat_ids] * lm_mask
            Jl_lm = Jl[flat_ids] * lm_mask[..., None]
            V = jnp.einsum("lmij,lmik->ljk", Jl_lm, Jl_lm)
            g = -jnp.einsum("lmij,lmi->lj", Jl_lm, r_lm)
        else:
            V = _segsum(jnp.einsum("nij,nik->njk", Jl, Jl), prob.obs_landmark, L)
            g = -_segsum(jnp.einsum("nij,ni->nj", Jl, r), prob.obs_landmark, L)
        tr = V[..., 0, 0] + V[..., 1, 1] + V[..., 2, 2]
        V = V + (1e-6 * tr[:, None, None] / 3.0 + 1e-9) * jnp.eye(3)[None]
        d = jnp.einsum("ljk,lk->lj", _sym3_inv(V), g)
        # Landmarks with no (valid) observations keep their value.
        has_obs = tr > 1e-12
        d = jnp.where(has_obs[:, None], d, 0.0)
        return prob.replace(landmarks=prob.landmarks + d)

    for _ in range(iters):
        problem = one(problem)
    return problem


@jax.jit
def _apply_step(problem: BAProblem, d_pose, d_lm):
    t2, q2 = jax.vmap(_apply_pose_delta)(problem.poses_t, problem.poses_q, d_pose)
    return problem.replace(
        poses_t=t2,
        poses_q=quat_normalize(q2),
        landmarks=problem.landmarks + d_lm,
    )


@jax.jit
def _reproj_residual_norms(cam, problem: BAProblem):
    from vision_slam_frontend_tpu.backend.residuals import linearize_reprojection as _lr

    r, _, _ = _lr(
        cam, problem.poses_t, problem.poses_q, problem.landmarks,
        problem.obs_pose, problem.obs_landmark, problem.obs_pixel, problem.obs_mask,
        problem.obs_pixel_right, problem.obs_right_mask,
    )
    return jnp.linalg.norm(r, axis=-1)


def optimize(
    problem: BAProblem,
    config=None,
    solver: BASolverConfig | None = None,
    cam: CameraParams | None = None,
    verbose: bool = False,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
):
    """Run LM to convergence (with optional outlier-trimming rounds).

    With `checkpoint_path`, solver state is snapshotted every
    `checkpoint_every` LM iterations; `resume=True` restarts from the last
    snapshot if one exists (fresh run otherwise).

    Returns (optimized BAProblem, info dict)."""
    import os

    solver = solver or BASolverConfig()
    if cam is None:
        if config is None:
            raise ValueError("need a FrontendConfig or CameraParams")
        cam = CameraParams.from_config(config)

    rounds = 1 + (solver.trim_rounds if solver.trim_threshold > 0 else 0)
    total_info = None
    n_trimmed_total = 0
    resume_state = None
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        problem, resume_state = load_solver_checkpoint(checkpoint_path)
        n_trimmed_total = resume_state["trimmed"]
        if verbose:
            print(
                f"[BA] resuming from {checkpoint_path}: round "
                f"{resume_state['round']}, iter {resume_state['iter']}, "
                f"lambda={resume_state['lambda']:.2e}"
            )
    start_round = resume_state["round"] if resume_state else 0
    if solver.trim_threshold > 0 and resume_state is None:
        # Pre-trim at the INITIAL estimate: gross outliers are orders of
        # magnitude above the inlier residual scale before any optimization
        # pulls the estimate toward them, so a loose gate (10x the final
        # threshold) removes them where they are easiest to identify.
        norms = _reproj_residual_norms(cam, problem)
        pre_mask = problem.obs_mask & (norms < 10.0 * solver.trim_threshold)
        n_pre = int(jnp.sum(problem.obs_mask) - jnp.sum(pre_mask))
        if verbose and n_pre:
            print(f"[BA] pre-trim @ {10.0 * solver.trim_threshold:.0f}px: removed {n_pre} observations")
        n_trimmed_total += n_pre
        problem = problem.replace(obs_mask=pre_mask)
    for rnd in range(start_round, rounds):
        rs = resume_state if (resume_state and rnd == start_round) else None
        ckpt_cb = None
        if checkpoint_path:
            def ckpt_cb(prob, st, _rnd=rnd):  # noqa: B023 — _rnd pins the loop var
                st = dict(st, round=_rnd, trimmed=n_trimmed_total)
                save_solver_checkpoint(checkpoint_path, prob, st)

        problem, info = _optimize_round(
            problem, solver, cam, verbose,
            resume_state=rs, ckpt_cb=ckpt_cb, checkpoint_every=checkpoint_every,
        )
        if total_info is None:
            total_info = info
        else:
            total_info = {
                "cost": info["cost"],
                "history": total_info["history"] + info["history"],
                "iterations": total_info["iterations"] + info["iterations"],
                "accepted": total_info["accepted"] + info["accepted"],
            }
        if rnd < rounds - 1:
            # Progressive schedule: loose first (don't trim inliers while the
            # estimate is still biased by outliers), tightening to
            # trim_threshold on the final round.
            thresh = solver.trim_threshold * (4.0 ** (rounds - 2 - rnd))
            norms = _reproj_residual_norms(cam, problem)
            new_mask = problem.obs_mask & (norms < thresh)
            n_trimmed = int(jnp.sum(problem.obs_mask) - jnp.sum(new_mask))
            if verbose:
                print(f"[BA] trim round {rnd} @ {thresh:.0f}px: removed {n_trimmed} observations")
            if n_trimmed == 0:
                break
            n_trimmed_total += n_trimmed
            problem = problem.replace(obs_mask=new_mask)
    total_info["trimmed"] = n_trimmed_total
    return problem, total_info


def _optimize_round(
    problem: BAProblem,
    solver: BASolverConfig,
    cam: CameraParams,
    verbose: bool = False,
    resume_state: dict | None = None,
    ckpt_cb=None,
    checkpoint_every: int = 5,
):

    huber_on = solver.huber_delta > 0
    hd = jnp.float32(solver.huber_delta)
    wt = jnp.float32(solver.odom_t_weight)
    wr = jnp.float32(solver.odom_r_weight)

    lam = solver.init_lambda
    cost = float(compute_cost(cam, problem, hd, wt, wr, huber_on))
    history = [cost]
    accepted = 0
    start_iter = 0
    if resume_state is not None:
        lam = resume_state["lambda"]
        history = list(resume_state["history"]) or [cost]
        cost = history[-1]
        accepted = resume_state["accepted"]
        start_iter = resume_state["iter"]
    rejected_streak = 0
    # Dense needs the pose-major gather tables; observation-sharded problems
    # drop them (parallel/sharded_ba.shard_ba_problem), so even an explicit
    # "dense" request falls back to PCG there (the distributed-appropriate
    # form — the landmark-sharded dense path lives in optimize_sharded_dense).
    use_dense = problem.pose_obs is not None and (
        solver.schur_solver == "dense"
        or (
            solver.schur_solver == "auto"
            and problem.poses_t.shape[0] <= solver.dense_max_poses
        )
    )
    if solver.schur_solver == "dense" and not use_dense and verbose:
        print("[BA] no gather tables (sharded problem?): dense -> PCG fallback")
    use_dense_chunked = problem.pose_obs is not None and not use_dense and (
        solver.schur_solver == "dense_chunked"
        or (
            solver.schur_solver == "auto"
            and problem.poses_t.shape[0] <= solver.dense_chunked_max_poses
        )
    )
    use_chunked = (
        problem.pose_obs is not None
        and not use_dense
        and not use_dense_chunked
        and (
            solver.schur_solver == "pcg_chunked"
            or problem.obs_pose.shape[0] >= solver.chunked_obs_threshold
        )
    )
    # Pose-major path: observation inputs re-laid-out once per round (the
    # graph is static within a round; trimming between rounds mutates
    # obs_mask, hence the rebuild), then every iteration linearizes directly
    # pose-major — no per-iteration Jacobian relayout gathers.
    use_pm = problem.pose_obs is not None
    if use_pm:
        pm = _build_pm_inputs(problem)
        dense_plan = (
            _dense_coupling_plan(problem)
            if (use_dense or use_dense_chunked)
            else None
        )
    for it in range(start_iter, solver.max_iterations):
        if use_pm:
            r_pm, Jp_pm, Jl_pm, ro, Ji, Jj = _linearize_pm(
                cam, problem, pm, hd, wt, wr, huber_on
            )
            if use_dense:
                d_pose, d_lm, cg_res = _solve_schur_dense_pm(
                    pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem,
                    jnp.float32(lam), fix_first=solver.fix_first_pose,
                    plan=dense_plan,
                )
            elif use_dense_chunked:
                d_pose, d_lm, cg_res = _solve_schur_dense_chunked_from_pm(
                    pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem,
                    jnp.float32(lam), solver.fix_first_pose, dense_plan,
                )
            elif use_chunked:
                d_pose, d_lm, cg_res = _solve_schur_pcg_posemajor_chunked_from_pm(
                    pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem,
                    jnp.float32(lam), solver.cg_iterations, solver.fix_first_pose,
                )
            else:
                d_pose, d_lm, cg_res = _solve_schur_pcg_posemajor_from_pm(
                    pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem,
                    jnp.float32(lam), cg_iters=solver.cg_iterations,
                    fix_first=solver.fix_first_pose,
                )
        else:
            r, Jp, Jl, ro, Ji, Jj = _linearize(cam, problem, hd, wt, wr, huber_on)
            d_pose, d_lm, cg_res = _solve_schur_pcg(
                r, Jp, Jl, ro, Ji, Jj, problem,
                jnp.float32(lam), solver.cg_iterations, solver.fix_first_pose,
            )
        if solver.validate:
            from vision_slam_frontend_tpu.utils.checks import check_ba_step

            check_ba_step(it, d_pose, d_lm)
        candidate = _apply_step(problem, d_pose, d_lm)
        new_cost = float(compute_cost(cam, candidate, hd, wt, wr, huber_on))
        if verbose:
            print(
                f"[BA] iter {it}: cost {cost:.4f} -> {new_cost:.4f} "
                f"(lambda={lam:.2e}, |cg_res|={float(cg_res):.2e})"
            )
        if np.isfinite(new_cost) and new_cost < cost:
            rel = (cost - new_cost) / max(cost, 1e-12)
            problem = candidate
            cost = new_cost
            lam = max(lam * solver.lambda_down, 1e-9)
            accepted += 1
            rejected_streak = 0
            history.append(cost)
            stop = rel < 1e-6
        else:
            # Non-finite candidate = the damped system went numerically
            # indefinite; escalate lambda much faster than a plain cost
            # rejection so the solver recovers in one or two iterations.
            up = solver.lambda_up if np.isfinite(new_cost) else solver.lambda_up**3
            lam = min(lam * up, 1e6)
            rejected_streak += 1
            history.append(cost)
            # Plateau: repeated rejections mean we're at the attainable
            # minimum for this linearization scale — stop burning iterations.
            # Before the FIRST acceptance this is not a plateau but an
            # under-damped start (gross-outlier inits need lambda to climb
            # orders of magnitude before any step lands): keep escalating.
            stop = lam >= 1e6 or (rejected_streak >= 4 and accepted > 0)
        if ckpt_cb and checkpoint_every > 0 and (stop or (it + 1) % checkpoint_every == 0):
            ckpt_cb(
                problem,
                {"iter": it + 1, "lambda": lam, "history": history, "accepted": accepted},
            )
        if stop:
            break
    return problem, {
        "cost": cost,
        "history": history,
        "iterations": len(history) - 1,
        "accepted": accepted,
    }
