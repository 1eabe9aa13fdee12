"""Probe: where does the dense-Schur BA iteration spend its 0.53 s?

Times each phase of _solve_schur_dense separately on the TPU at the benched
P=500/L=100k/N=500k shape: linearize, pose-major relayout + V/rhs, the
B B^T coupling chunks, the Cholesky solve, back-substitution.

Run: python probe_dense_ba.py [P] [L]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def t(fn, *args, n=10):
    import jax

    out = fn(*args)  # compile
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), out)
    return (time.perf_counter() - t0) / n * 1e3


def main_pm():
    """Phase profile of the ROUND-4 production path: pose-major linearize
    (no relayout) + banded coupling (run: python probe_dense_ba.py pm [P] [L])."""
    args = [a for a in sys.argv[1:] if a != "pm"]
    P = int(args[0]) if len(args) > 0 else 500
    L = int(args[1]) if len(args) > 1 else 100_000
    import jax
    import jax.numpy as jnp

    from bench_ba import make_problem
    from vision_slam_frontend_tpu.backend.ba import (
        _build_pm_inputs,
        _dense_coupling_plan,
        _linearize_pm,
        _solve_schur_dense_pm,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    cam = CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )
    problem = make_problem(P, L, 5)
    hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
    lam = jnp.float32(1e-3)
    plan = _dense_coupling_plan(problem)
    print(f"P={P} L={L} N={L*5} backend={jax.default_backend()} "
          f"plan PW={plan[0]} chunks={len(plan[2])} "
          f"full_width={sum(1 for x in plan[2] if x < 0)}", flush=True)

    pm = _build_pm_inputs(problem)
    lin = jax.jit(lambda p, pmx: _linearize_pm(cam, p, pmx, hd, wt, wr, True))
    ms = t(lin, problem, pm)
    print(f"pm linearize (no relayout)    {ms:8.1f} ms", flush=True)
    r_pm, Jp_pm, Jl_pm, ro, Ji, Jj = lin(problem, pm)

    for name, pl in (("banded", plan),):
        solve = jax.jit(
            lambda rp, jp, jl, pl=pl: _solve_schur_dense_pm(
                pm, rp, jp, jl, ro, Ji, Jj, problem, lam,
                fix_first=True, plan=pl,
            )
        )
        ms = t(solve, r_pm, Jp_pm, Jl_pm)
        print(f"dense solve ({name:10s})     {ms:8.1f} ms", flush=True)

    def full(p, pmx):
        rp, jp, jl, ro2, ji2, jj2 = _linearize_pm(cam, p, pmx, hd, wt, wr, True)
        return _solve_schur_dense_pm(
            pmx, rp, jp, jl, ro2, ji2, jj2, p, lam, fix_first=True, plan=plan
        )

    ms = t(jax.jit(full), problem, pm)
    print(f"FULL pm iteration (lin+solve) {ms:8.1f} ms = {1e3/ms:.2f} it/s", flush=True)


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    import jax
    import jax.numpy as jnp

    from bench_ba import make_problem
    from vision_slam_frontend_tpu.backend.ba import (
        _bbt_compensated,
        _chol3,
        _inv_lower3,
        _linearize,
        _odom_terms,
        _solve_schur_dense,
        _sym3_inv,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    cam = CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )
    problem = make_problem(P, L, 5)
    hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
    lam = jnp.float32(1e-3)
    print(f"P={P} L={L} N={L*5} backend={jax.default_backend()}", flush=True)

    lin = jax.jit(lambda p: _linearize(cam, p, hd, wt, wr, True))
    ms = t(lin, problem)
    print(f"linearize                     {ms:8.1f} ms", flush=True)
    r, Jp, Jl, ro, Ji, Jj = lin(problem)

    tbl = problem.pose_obs
    Mp = tbl.shape[1]
    lm_tbl = problem.lm_obs
    Ml = lm_tbl.shape[1]
    print(f"Mp={Mp} Ml={Ml}", flush=True)

    def relayout(r, Jp, Jl):
        pm_mask = problem.pose_obs_mask.astype(r.dtype)[..., None]
        return (
            Jp[tbl] * pm_mask[..., None],
            Jl[tbl] * pm_mask[..., None],
            r[tbl] * pm_mask,
            problem.obs_landmark[tbl],
        )

    rel = jax.jit(relayout)
    ms = t(rel, r, Jp, Jl)
    print(f"pose-major relayout           {ms:8.1f} ms", flush=True)
    Jp_pm, Jl_pm, r_pm, ol_pm = rel(r, Jp, Jl)

    def vblocks_rhs(Jp_pm, Jl_pm, r_pm):
        pm_mask = problem.pose_obs_mask.astype(jnp.float32)[..., None]
        lm_mask = problem.lm_obs_mask.astype(jnp.float32)[..., None]

        def lm_reduce(x_pm):
            flat = x_pm.reshape(P * Mp, x_pm.shape[-1])
            return jnp.sum(flat[lm_tbl] * lm_mask, axis=1)

        VV = jnp.einsum("pmij,pmik->pmjk", Jl_pm, Jl_pm).reshape(P, Mp, 9)
        V = lm_reduce(VV).reshape(L, 3, 3) + lam * jnp.eye(3)[None]
        V_inv = _sym3_inv(V)
        g_odom, U_odom, _ = _odom_terms(problem, Ji, Jj, ro, P)
        g_pose = -jnp.einsum("pmij,pmi->pj", Jp_pm, r_pm) + g_odom
        g_lm = -lm_reduce(jnp.einsum("pmij,pmi->pmj", Jl_pm, r_pm))
        s = jnp.einsum("ljk,lk->lj", V_inv, g_lm)
        s_pm = s[ol_pm] * pm_mask
        Jls = jnp.einsum("pmij,pmj->pmi", Jl_pm, s_pm)
        b = g_pose - jnp.einsum("pmij,pmi->pj", Jp_pm, Jls)
        U_diag = jnp.einsum("pmij,pmik->pjk", Jp_pm, Jp_pm) + U_odom
        Ginv = _inv_lower3(_chol3(V))
        W_pm = jnp.einsum("pmij,pmik->pmjk", Jp_pm, Jl_pm)
        W_lm = (
            W_pm.reshape(P * Mp, 18)[lm_tbl].reshape(L, Ml, 6, 3)
            * lm_mask[..., None]
        )
        Bt = jnp.einsum("lmij,lcj->lmic", W_lm, Ginv)
        return V_inv, b, U_diag, Bt, g_lm

    vb = jax.jit(vblocks_rhs)
    ms = t(vb, Jp_pm, Jl_pm, r_pm)
    print(f"V blocks + rhs + Bt           {ms:8.1f} ms", flush=True)
    V_inv, b, U_diag, Bt, g_lm = vb(Jp_pm, Jl_pm, r_pm)

    pose_of = np.asarray(lm_tbl) // Mp
    pose_of = jnp.asarray(pose_of)

    def coupling(Bt):
        ar = jnp.arange(P)
        S2 = jnp.zeros((6 * P, 6 * P), jnp.float32)
        chunk = 8192
        for l0 in range(0, L, chunk):
            lc = min(chunk, L - l0)
            oh = pose_of[l0 : l0 + lc, :, None] == ar[None, None, :]
            S2 = S2 - _bbt_compensated(Bt[l0 : l0 + lc], oh)
        return S2

    cp = jax.jit(coupling)
    ms = t(cp, Bt)
    print(f"B B^T coupling (chunked MXU)  {ms:8.1f} ms", flush=True)
    S2 = cp(Bt)

    def chol_solve(S2, U_diag, b):
        ar = jnp.arange(P)
        S = jnp.zeros((P, 6, P, 6), jnp.float32)
        S = S.at[ar, :, ar, :].set(U_diag + lam * jnp.eye(6)[None])
        Sfull = S.reshape(6 * P, 6 * P) + S2
        chol = jax.scipy.linalg.cholesky(Sfull, lower=True)
        return jax.scipy.linalg.cho_solve((chol, True), b.reshape(-1))

    cs = jax.jit(chol_solve)
    ms = t(cs, S2, U_diag, b)
    print(f"Cholesky (6P={6*P}) + solve     {ms:8.1f} ms", flush=True)

    full = jax.jit(
        lambda *a: _solve_schur_dense(*a, problem, lam, True)
    )
    ms = t(full, r, Jp, Jl, ro, Ji, Jj)
    print(f"FULL dense solve              {ms:8.1f} ms", flush=True)





def probe_chunks():
    """Coupling-phase time vs chunk size (run: python probe_dense_ba.py chunks)."""
    import jax
    import jax.numpy as jnp

    from bench_ba import make_problem
    from vision_slam_frontend_tpu.backend.ba import (
        _bbt_compensated,
        _chol3,
        _inv_lower3,
        _linearize,
        _sym3_inv,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    P, L = 500, 100_000
    cam = CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )
    problem = make_problem(P, L, 5)
    hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
    lam = jnp.float32(1e-3)
    r, Jp, Jl, ro, Ji, Jj = _linearize(cam, problem, hd, wt, wr, True)
    tbl = problem.pose_obs
    Mp = tbl.shape[1]
    lm_tbl = problem.lm_obs
    Ml = lm_tbl.shape[1]
    pm_mask = problem.pose_obs_mask.astype(jnp.float32)[..., None]
    lm_mask = problem.lm_obs_mask.astype(jnp.float32)[..., None]
    Jp_pm = Jp[tbl] * pm_mask[..., None]
    Jl_pm = Jl[tbl] * pm_mask[..., None]

    def lm_reduce(x_pm):
        flat = x_pm.reshape(P * Mp, x_pm.shape[-1])
        return jnp.sum(flat[lm_tbl] * lm_mask, axis=1)

    VV = jnp.einsum("pmij,pmik->pmjk", Jl_pm, Jl_pm).reshape(P, Mp, 9)
    V = lm_reduce(VV).reshape(L, 3, 3) + lam * jnp.eye(3)[None]
    Ginv = _inv_lower3(_chol3(V))
    W_pm = jnp.einsum("pmij,pmik->pmjk", Jp_pm, Jl_pm)
    W_lm = (
        W_pm.reshape(P * Mp, 18)[lm_tbl].reshape(L, Ml, 6, 3) * lm_mask[..., None]
    )
    Bt = jnp.einsum("lmij,lcj->lmic", W_lm, Ginv)
    pose_of = jnp.asarray(np.asarray(lm_tbl) // Mp)

    for chunk in (8192, 16384, 32768, 50000, 100000):
        def coupling(Bt, chunk=chunk):
            ar = jnp.arange(P)
            S2 = jnp.zeros((6 * P, 6 * P), jnp.float32)
            for l0 in range(0, L, chunk):
                lc = min(chunk, L - l0)
                oh = pose_of[l0 : l0 + lc, :, None] == ar[None, None, :]
                S2 = S2 - _bbt_compensated(Bt[l0 : l0 + lc], oh)
            return S2

        try:
            cp = jax.jit(coupling)
            ms = t(cp, Bt)
            print(f"coupling chunk={chunk:6d}          {ms:8.1f} ms", flush=True)
        except Exception as e:
            print(f"coupling chunk={chunk:6d} FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "chunks":
        probe_chunks()
    elif "pm" in sys.argv[1:]:
        main_pm()
    else:
        main()
