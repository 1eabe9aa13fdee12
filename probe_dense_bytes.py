"""Dense-BA byte accounting (round-4 verdict item 7): per-phase time, bytes,
and the implied bandwidth, so "HBM-bound" is arithmetic rather than prose.

Two byte columns per phase:
  - logical GB: XLA cost analysis "bytes accessed" — HLO-level operand +
    output bytes BEFORE fusion; an overcount of physical HBM traffic (the
    same value the MFU tables use for FLOPs);
  - boundary GB: the phase's unique input + output buffer bytes — the
    floor no implementation of the phase can move less than.

Physical HBM traffic lies between the two; time x 819 GB/s (v5e HBM peak)
brackets which phases are bandwidth-bound. Run on TPU:

    python probe_dense_bytes.py [P] [L]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from bench_ba import make_problem
    from vision_slam_frontend_tpu.backend.ba import (
        _build_pm_inputs,
        _dense_accum_banded,
        _dense_accum_full,
        _dense_backsub,
        _dense_coupling_plan,
        _dense_prep,
        _dense_solve,
        _linearize_pm,
        _solve_schur_dense_pm,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    problem = make_problem(P, L, 5)
    cam = CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )
    pm = _build_pm_inputs(problem)
    plan = _dense_coupling_plan(problem)
    PW, chunk, pmins = plan[:3]
    hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
    lam = jnp.float32(1e-3)

    def nbytes(tree):
        return sum(
            np.prod(a.shape) * a.dtype.itemsize
            for a in jtu.tree_leaves(tree)
            if hasattr(a, "shape")
        )

    def cost(jitted, *args, **kw):
        c = jitted.lower(*args, **kw).compile()
        ca = c.cost_analysis()
        return ca.get("bytes accessed", float("nan")), ca.get("flops", float("nan"))

    def timeit(fn, n=8):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n * 1000

    lin = _linearize_pm(cam, problem, pm, hd, wt, wr, True)
    r_pm, Jp_pm, Jl_pm, ro, Ji, Jj = lin
    jax.device_get(ro[0])
    rows = []

    b, f = cost(_linearize_pm, cam, problem, pm, hd, wt, wr, True)
    t = timeit(lambda: jax.device_get(_linearize_pm(cam, problem, pm, hd, wt, wr, True)[3][0]))
    rows.append(("linearize_pm", t, b, nbytes((pm, problem.poses_t, problem.landmarks)) + nbytes(lin), f))

    prep_args = (pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, problem, lam)
    prep = _dense_prep(*prep_args, fix_first=True, extras=plan[3])
    jax.device_get(prep["b"][0])
    b, f = cost(_dense_prep, *prep_args, fix_first=True, extras=plan[3])
    t = timeit(lambda: jax.device_get(_dense_prep(*prep_args, fix_first=True, extras=plan[3])["b"][0]))
    rows.append(("prep (V,Ginv,g,b,S_init,Bt)", t, b, nbytes((r_pm, Jp_pm, Jl_pm)) + nbytes(prep), f))

    Bt, pose_of = prep["Bt"], prep["pose_of"]
    arw = jnp.arange(PW)

    def accum():
        S2 = prep["S2"] + 0.0
        for ci, l0 in enumerate(range(0, L, chunk)):
            lc = min(chunk, L - l0)
            pmin = pmins[ci]
            if pmin < 0 or PW >= P:
                for s0 in range(l0, l0 + lc, 2048):
                    sc = min(2048, l0 + lc - s0)
                    S2 = _dense_accum_full(S2, Bt[s0 : s0 + sc], pose_of[s0 : s0 + sc])
            else:
                S2 = _dense_accum_banded(
                    S2, Bt[l0 : l0 + lc], pose_of[l0 : l0 + lc], jnp.int32(pmin), arw
                )
        jax.device_get(S2[0, 0, 0, 0])
        return S2

    t = timeit(accum, n=4)
    n_banded = sum(1 for x in pmins if x >= 0)
    bb, fb = cost(_dense_accum_banded, prep["S2"], Bt[:chunk], pose_of[:chunk], jnp.int32(0), arw)
    # Boundary: each banded chunk touches its Bt slice + the (6PW)^2 window
    # twice (read+write); donation keeps the rest of S in place.
    bound = n_banded * (chunk * Bt.shape[1] * 18 * 4 + 2 * (6 * PW) ** 2 * 4)
    rows.append((f"coupling accum ({n_banded} banded chunks)", t, bb * max(n_banded, 1), bound, fb * max(n_banded, 1)))

    S2 = accum()
    b, f = cost(_dense_solve, S2, prep["b"], prep["free"])
    t = timeit(lambda: jax.device_get(_dense_solve(S2, prep["b"], prep["free"])[1]))
    rows.append(("solve (equilibrate + Cholesky)", t, b, 2 * (6 * P) ** 2 * 4, f))

    bs_args = (Jp_pm, Jl_pm, problem.lm_obs, problem.lm_obs_mask, prep["V_inv"], prep["g_lm"], jnp.zeros((P, 6)))
    b, f = cost(_dense_backsub, *bs_args)
    t = timeit(lambda: jax.device_get(_dense_backsub(*bs_args)[0]))
    rows.append(("backsub", t, b, nbytes(bs_args), f))

    fused = lambda: _solve_schur_dense_pm(*prep_args, fix_first=True, plan=plan)
    jax.device_get(fused()[0])
    b, f = cost(_solve_schur_dense_pm, *prep_args, fix_first=True, plan=plan)
    t = timeit(lambda: jax.device_get(fused()[2]))
    rows.append(("FUSED dense solve (production)", t, b, nbytes((r_pm, Jp_pm, Jl_pm)), f))

    print(f"P={P} L={L} PW={PW} chunks={len(pmins)} (isolated-phase timings carry ~3 ms dispatch floor)")
    print(f"{'phase':38s} {'ms':>7s} {'logGB':>7s} {'bndGB':>7s} {'log GB/s':>9s} {'GFLOP':>8s}")
    for name, ms, by, bd, fl in rows:
        gbs = by / 1e9 / (ms / 1000) if by == by and ms > 0 else float("nan")
        print(f"{name:38s} {ms:7.1f} {by/1e9:7.2f} {bd/1e9:7.2f} {gbs:9.0f} {fl/1e9:8.1f}")


if __name__ == "__main__":
    main()
