"""Probe: which BA sub-program breaks the remote-compile helper at N=2.5M?

Compiles each phase of one LM iteration separately at L=500k/N=2.5M
(the regime BASELINE.md records as the round-2 toolchain ceiling),
reporting compile success + time per phase. Second mode (`pm`) bisects
inside the pose-major prepare program (_pm_build), which round-3 found to
be the failing piece.

Run: python probe_ba.py [mode] [L] [P]   (mode: phases | pm)
"""

from __future__ import annotations

import sys
import time


def try_compile(name, fn, *args, **static):
    import jax

    t0 = time.perf_counter()
    try:
        c = jax.jit(fn, **static).lower(*args).compile()
        dt = time.perf_counter() - t0
        print(f"{name:36s} COMPILED in {dt:.1f}s", flush=True)
        return c
    except Exception as e:
        dt = time.perf_counter() - t0
        print(
            f"{name:36s} FAILED after {dt:.1f}s: {type(e).__name__}: "
            f"{str(e)[:200]}",
            flush=True,
        )
        return None


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "pm"
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    import jax
    import jax.numpy as jnp

    from bench_ba import make_problem
    from vision_slam_frontend_tpu.backend.ba import (
        _linearize,
        _odom_terms,
        _pm_build,
        _pm_cg_init,
        _pm_cg_step,
        _solve_schur_pcg_posemajor,
        _solve_schur_pcg_scatter,
        _sym3_inv,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    cam = CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )
    print(f"building problem P={P} L={L} N={L*5} ...", flush=True)
    problem = make_problem(P, L, 5)
    hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
    lam = jnp.float32(1e-3)

    lin = try_compile(
        "linearize",
        lambda p: _linearize(cam, p, hd, wt, wr, True),
        problem,
    )
    if lin is None:
        return
    t0 = time.perf_counter()
    out = lin(problem)
    r, Jp, Jl, ro, Ji, Jj = jax.block_until_ready(out)
    print(f"linearize ran in {time.perf_counter()-t0:.2f}s", flush=True)

    if mode == "phases":
        try_compile(
            "pm_build",
            lambda *a: _pm_build(*a, problem, lam, True),
            r, Jp, Jl, ro, Ji, Jj,
        )
        try_compile(
            "schur_pcg_posemajor cg=32",
            lambda *a: _solve_schur_pcg_posemajor(*a, problem, lam, 32, True),
            r, Jp, Jl, ro, Ji, Jj,
        )
        try_compile(
            "schur_pcg_scatter cg=32",
            lambda *a: _solve_schur_pcg_scatter(*a, problem, lam, 32, True),
            r, Jp, Jl, ro, Ji, Jj,
        )
        return

    # --- mode "pm": bisect inside _pm_build.
    tbl = problem.pose_obs
    lm_tbl = problem.lm_obs

    def relayout(r, Jp, Jl):
        pm_mask = problem.pose_obs_mask.astype(r.dtype)[..., None]
        Jp_pm = Jp[tbl] * pm_mask[..., None]
        Jl_pm = Jl[tbl] * pm_mask[..., None]
        r_pm = r[tbl] * pm_mask
        ol_pm = problem.obs_landmark[tbl]
        return Jp_pm, Jl_pm, r_pm, ol_pm

    c = try_compile("pm relayout (4 gathers)", relayout, r, Jp, Jl)
    if c is None:
        # Finer: one gather at a time.
        try_compile("pm gather Jp[tbl] only", lambda Jp: Jp[tbl], Jp)
        try_compile("pm gather r[tbl] only", lambda r: r[tbl], r)
        return
    Jp_pm, Jl_pm, r_pm, ol_pm = jax.block_until_ready(c(r, Jp, Jl))
    print(f"relayout shapes: Jp_pm={Jp_pm.shape}", flush=True)
    Lsz = problem.landmarks.shape[0]
    lm_mask = problem.lm_obs_mask.astype(jnp.float32)[..., None]
    Psz, Mp = tbl.shape

    def lm_reduce(x_pm):
        flat = x_pm.reshape(Psz * Mp, x_pm.shape[-1])
        return jnp.sum(flat[lm_tbl] * lm_mask, axis=1)

    def vblocks(Jl_pm):
        VV = jnp.einsum("pmij,pmik->pmjk", Jl_pm, Jl_pm).reshape(Psz, Mp, 9)
        V = lm_reduce(VV).reshape(Lsz, 3, 3) + lam * jnp.eye(3)[None]
        return _sym3_inv(V)

    c2 = try_compile("pm V blocks (lm_reduce gather)", vblocks, Jl_pm)
    if c2 is not None:
        V_inv = jax.block_until_ready(c2(Jl_pm))

        def rhs(Jp_pm, Jl_pm, r_pm, V_inv):
            g_odom, U_odom, _ = _odom_terms(problem, Ji, Jj, ro, Psz)
            g_pose = -jnp.einsum("pmij,pmi->pj", Jp_pm, r_pm) + g_odom
            g_lm = -lm_reduce(jnp.einsum("pmij,pmi->pmj", Jl_pm, r_pm))
            s = jnp.einsum("ljk,lk->lj", V_inv, g_lm)
            pm_mask = problem.pose_obs_mask.astype(jnp.float32)[..., None]
            s_pm = s[ol_pm] * pm_mask
            Jls = jnp.einsum("pmij,pmj->pmi", Jl_pm, s_pm)
            b = g_pose - jnp.einsum("pmij,pmi->pj", Jp_pm, Jls)
            U_diag = jnp.einsum("pmij,pmik->pjk", Jp_pm, Jp_pm) + U_odom
            U_diag += lam * jnp.eye(6)[None]
            return b, g_lm, jnp.linalg.inv(U_diag)

        try_compile("pm rhs+precond", rhs, Jp_pm, Jl_pm, r_pm, V_inv)

    # The full build + one cg step, as the chunked path would run them.
    cb = try_compile(
        "pm_build (full)",
        lambda *a: _pm_build(*a, problem, lam, True),
        r, Jp, Jl, ro, Ji, Jj,
    )
    if cb is not None:
        state, b, g_lm = jax.block_until_ready(cb(r, Jp, Jl, ro, Ji, Jj))
        ci = try_compile("pm_cg_init", _pm_cg_init, state, b)
        if ci is not None:
            carry = jax.block_until_ready(ci(state, b))
            cs = try_compile("pm_cg_step", _pm_cg_step, state, carry)
            if cs is not None:
                t0 = time.perf_counter()
                carry = jax.block_until_ready(cs(state, carry))
                print(f"cg_step ran in {time.perf_counter()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
