"""Benchmark: bundle-adjustment LM iterations/sec at 100k landmarks.

Prints ONE JSON line (same schema as bench.py). Baseline: 1 LM iter/sec at
100k landmarks / 500k observations — a representative large-scale Ceres-CPU
ballpark for one full linearize + Schur-reduced solve; the C++ reference has
no backend at all (BASELINE.md).

Usage: python bench_ba.py [--landmarks 100000] [--obs-per-lm 5] [--poses 500]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_problem(P, L, obs_per_lm, seed=0, return_gt=False, clean=False):
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.types.slam_types import BAProblem

    rng = np.random.default_rng(seed)
    # Forward trajectory; landmarks scattered ahead.
    gt_t = np.stack([np.array([0.01 * k, 0.0, 0.5 * k]) for k in range(P)])
    q0 = np.zeros((P, 4), np.float32)
    q0[:, 0] = 1.0
    lm = np.stack(
        [
            rng.uniform(-20, 20, L),
            rng.uniform(-5, 5, L),
            rng.uniform(0, 0.5 * P + 20, L),
        ],
        axis=-1,
    )
    N = L * obs_per_lm
    # Each landmark observed from obs_per_lm nearby poses. Wraparound (not
    # clip): clipping piled ~6k observations onto pose 0, a 13x per-pose skew
    # no real trajectory has — it inflated the pose-major padded capacity Mp
    # from ~1100 to 6488 and made every solver look 5x slower than the
    # realistic balanced workload this benchmark is meant to represent.
    # Wraparound here too (not clip): landmarks with z beyond the trajectory
    # end otherwise pile onto pose P-1 (at L=500k that inflated Mp from ~5.5k
    # to 21.7k — a 4x padded-memory blowup no real trajectory has).
    base_pose = (lm[:, 2] / 0.5).astype(np.int64) % P
    # Landmark ids in first-observed-pose order, exactly as
    # tracks.build_ba_problem emits real problems: the dense solver's banded
    # coupling plan (backend/ba._dense_coupling_plan) keys off this locality.
    # (The handful of wraparound landmarks near pose 0 land in chunk 0, which
    # the plan places full-width — the loop-closure-like outlier case.)
    lm_order = np.argsort(base_pose, kind="stable")
    lm, base_pose = lm[lm_order], base_pose[lm_order]
    obs_lm = np.repeat(np.arange(L), obs_per_lm)
    obs_pose = ((base_pose[obs_lm] - rng.integers(1, 12, N)) % P).astype(np.int32)
    # Pose-major observation order, like every real frontend problem (the
    # accumulator appends per keyframe): the pose-major relayout gather then
    # reads contiguous HBM ranges. A randomly-ordered synthetic layout made
    # the relayout look ~2x slower than production problems ever see.
    order = np.argsort(obs_pose, kind="stable")
    obs_pose, obs_lm = obs_pose[order], obs_lm[order]
    rel = lm[obs_lm] - gt_t[obs_pose]
    z = np.maximum(rel[:, 2], 0.5)
    px = np.stack(
        [500.0 * rel[:, 0] / z + 320.0, 500.0 * rel[:, 1] / z + 240.0], -1
    ) + rng.normal(0, 0.5, (N, 2))
    # `clean`: mask observations whose geometry is invalid — wraparound
    # observers behind the landmark (rel_z < 0.5, whose pixels above come
    # from the z clamp and are ~1e4 px of pure garbage) and projections far
    # outside any plausible sensor. The default keeps them (the timing
    # benchmark's layout is unchanged and its full-width outlier-chunk case
    # depends on them); the at-scale ACCURACY pin uses clean=True, matching
    # what production problems look like after the frontend's epipolar +
    # guided-match gates (tests/test_ba_scale_accuracy.py).
    valid = np.ones(N, bool)
    if clean:
        valid = (
            (rel[:, 2] >= 0.5)
            & (np.abs(px[:, 0] - 320.0) < 1000.0)
            & (np.abs(px[:, 1] - 240.0) < 1000.0)
        )
    pad = (-N) % 1024
    if pad:
        obs_pose = np.pad(obs_pose, (0, pad))
        obs_lm = np.pad(obs_lm, (0, pad))
        px = np.pad(px, ((0, pad), (0, 0)))
    mask = np.zeros(N + pad, bool)
    mask[:N] = valid
    from vision_slam_frontend_tpu.backend.tracks import build_gather_tables

    pose_obs, pose_obs_mask, lm_obs, lm_obs_mask = build_gather_tables(
        obs_pose, obs_lm, mask, P, L
    )
    prob = BAProblem(
        poses_t=jnp.asarray(gt_t + rng.normal(0, 0.05, gt_t.shape), jnp.float32),
        poses_q=jnp.asarray(q0),
        pose_mask=jnp.ones(P, bool),
        landmarks=jnp.asarray(lm + rng.normal(0, 0.2, lm.shape), jnp.float32),
        landmark_mask=jnp.ones(L, bool),
        obs_pose=jnp.asarray(obs_pose, jnp.int32),
        obs_landmark=jnp.asarray(obs_lm.astype(np.int32)),
        obs_pixel=jnp.asarray(px, jnp.float32),
        obs_mask=jnp.asarray(mask),
        odom_i=jnp.asarray(np.arange(P - 1), jnp.int32),
        odom_j=jnp.asarray(np.arange(1, P), jnp.int32),
        odom_t=jnp.asarray(np.tile([0.01, 0, 0.5], (P - 1, 1)), jnp.float32),
        odom_q=jnp.asarray(q0[: P - 1]),
        odom_mask=jnp.ones(P - 1, bool),
        pose_obs=jnp.asarray(pose_obs),
        pose_obs_mask=jnp.asarray(pose_obs_mask),
        lm_obs=jnp.asarray(lm_obs),
        lm_obs_mask=jnp.asarray(lm_obs_mask),
    )
    if return_gt:
        # Ground truth for at-scale accuracy pins (tests/test_ba_scale_accuracy):
        # the noiseless trajectory + landmarks the pixels were rendered from.
        return prob, gt_t, lm
    return prob


def _bench_config(P, L, obs_per_lm, solver, cg_iters, n_iters=10, with_mfu=False):
    """Time one LM iteration (linearize + Schur solve + apply) on the device.

    Returns a result dict: iters/s plus (with_mfu) an XLA-cost-analysis FLOPs
    estimate and the implied MFU against the chip's bf16 peak.
    """
    import jax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.backend.ba import (
        _apply_step,
        _build_pm_inputs,
        _dense_coupling_plan,
        _linearize_pm,
        _solve_schur_dense_chunked_from_pm,
        _solve_schur_dense_pm,
        _solve_schur_pcg_posemajor_chunked_from_pm,
        _solve_schur_pcg_posemajor_from_pm,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    cam = CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )
    problem = make_problem(P, L, obs_per_lm)

    hd = jnp.float32(4.0)
    wt = jnp.float32(30.0)
    wr = jnp.float32(60.0)
    lam = jnp.float32(1e-3)

    if solver == "segments":
        # The two-level pose-chain-sharded solver: its unit of progress is one
        # sweep (all segments advance one dense-LM batch + rigid alignment +
        # landmark refit). Benched through the public API; per-sweep inner
        # iterations are held at 1 so a "sweep" costs ~one LM iteration per
        # segment, executed batched.
        from vision_slam_frontend_tpu.backend.ba import BASolverConfig
        from vision_slam_frontend_tpu.parallel.segment_ba import optimize_segments

        n_seg = max(2, P // 256)

        def run(iters):
            t0 = time.perf_counter()
            opt, info = optimize_segments(
                problem, cam=cam,
                solver=BASolverConfig(max_iterations=iters),
                n_seg=n_seg, sweeps=1, polish_iterations=0,
            )
            _ = np.asarray(jax.device_get(opt.poses_t))
            return time.perf_counter() - t0

        run(1)  # compile
        dt = run(n_iters)
        return {
            "P": P, "L": L, "N": L * obs_per_lm, "solver": f"segments{n_seg}",
            "iters_per_sec": round(n_iters / dt, 3),
            "sec_per_iter": round(dt / n_iters, 4),
        }

    # The production pipeline (backend/ba._optimize_round): observation
    # inputs re-laid-out pose-major ONCE, every iteration linearizes directly
    # in that layout — no per-iteration Jacobian relayout gathers.
    pm = _build_pm_inputs(problem)
    plan = (
        _dense_coupling_plan(problem)
        if solver in ("dense", "dense_chunked")
        else None
    )

    def one_iter(p):
        r_pm, Jp_pm, Jl_pm, ro, Ji, Jj = _linearize_pm(cam, p, pm, hd, wt, wr, True)
        if solver == "dense":
            d_pose, d_lm, res = _solve_schur_dense_pm(
                pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, p, lam,
                fix_first=True, plan=plan,
            )
        elif solver == "dense_chunked":
            d_pose, d_lm, res = _solve_schur_dense_chunked_from_pm(
                pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, p, lam, True, plan
            )
        elif solver == "pcg_chunked":
            d_pose, d_lm, res = _solve_schur_pcg_posemajor_chunked_from_pm(
                pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, p, lam, cg_iters, True
            )
        else:
            d_pose, d_lm, res = _solve_schur_pcg_posemajor_from_pm(
                pm, r_pm, Jp_pm, Jl_pm, ro, Ji, Jj, p, lam,
                cg_iters=cg_iters, fix_first=True,
            )
        return _apply_step(p, d_pose, d_lm)

    # Warmup / compile.
    p = one_iter(problem)
    _ = np.asarray(jax.device_get(p.poses_t))

    # device_get forces true completion (block_until_ready has proven
    # unreliable on tunneled backends); the chained state dependency makes
    # one final fetch account for every iteration in the window.
    t0 = time.perf_counter()
    for _ in range(n_iters):
        p = one_iter(p)
    _ = np.asarray(jax.device_get(p.poses_t))
    dt = time.perf_counter() - t0
    out = {
        "P": P, "L": L, "N": L * obs_per_lm,
        "solver": solver if solver == "dense" else f"{solver}{cg_iters}",
        "iters_per_sec": round(n_iters / dt, 3),
        "sec_per_iter": round(dt / n_iters, 4),
    }
    if with_mfu and solver not in ("pcg_chunked", "dense_chunked"):  # chunked is not one program
        try:
            compiled = jax.jit(one_iter).lower(problem).compile()
            flops = compiled.cost_analysis()["flops"]
            # v5e bf16 peak: 197 TFLOP/s (the MXU matmuls here run bf16-compensated;
            # XLA counts each bf16 MAC once, so this is a lower-bound MFU).
            out["flops_per_iter"] = float(flops)
            out["mfu_pct_v5e"] = round(
                100.0 * flops * n_iters / dt / 197e12, 2
            )
        except Exception:
            pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--landmarks", type=int, default=100_000)
    ap.add_argument("--obs-per-lm", type=int, default=5)
    ap.add_argument("--poses", type=int, default=500)
    ap.add_argument("--cg-iters", type=int, default=32)
    ap.add_argument(
        "--solver",
        choices=["dense", "dense_chunked", "pcg", "pcg_chunked", "segments"],
        default="dense",
        help="inner reduced-camera solver (dense Cholesky is the fast path "
        "at this pose count; pcg is the matrix-free/distributed form; "
        "segments is the pose-chain-sharded two-level solver)",
    )
    ap.add_argument(
        "--sweep", action="store_true",
        help="characterize the dense/pcg/segments crossover: P x L x solver "
        "grid, one JSON line per config + a crossover summary "
        "(feeds BASolverConfig.dense_max_poses / BASELINE.md)",
    )
    ap.add_argument("--mfu", action="store_true", help="add XLA-cost-analysis FLOPs + MFU")
    args = ap.parse_args()

    if args.sweep:
        # Order matters: a runtime OOM poisons every LATER config in the
        # process even after jax.clear_caches() (round-5: P=5000 PCG reported
        # phantom RESOURCE_EXHAUSTED after a chunked-dense OOM, while running
        # 2.77 it/s standalone). So all PCG rows run first, dense next, and
        # the OOM-prone chunked/segments rows last; combos measured to exceed
        # single-chip HBM (dense at P=5000: 16.8-25.4 GB planned vs 15.75,
        # BASELINE round 5) are skipped with the reason recorded.
        shapes = [(P, L) for P in (500, 2000, 5000) for L in (100_000, 500_000)]
        grid = [(P, L, "pcg", args.cg_iters) for P, L in shapes]
        grid += [(P, L, "dense", 0) for P, L in shapes if P < 5000]
        grid += [
            (P, L, "segments", 0) for P, L in shapes if P >= 2000
        ]
        grid += [
            (P, L, "dense_chunked", 0) for P, L in shapes if P == 2000
        ]
        skipped = [
            {"P": P, "L": L, "solver": s,
             "skipped": "exceeds single-chip HBM (measured round 5)"}
            for P, L in shapes if P == 5000
            for s in ("dense", "dense_chunked")
        ]
        results = []
        for r in skipped:
            print(json.dumps(r), flush=True)
        for P, L, solver, cg in grid:
            try:
                r = _bench_config(P, L, args.obs_per_lm, solver, cg, with_mfu=args.mfu)
            except Exception as e:  # OOM / compile failure: record, move on
                r = {"P": P, "L": L, "solver": solver, "error": str(e)[:200]}
                del e  # the traceback's frames pin device buffers
            # Free compiled executables + any buffers pinned by dead frames:
            # without this an OOM'd config poisons every LATER config in the
            # same process (round-5 sweep: P=5000 pcg failed only because
            # the preceding dense OOM left HBM allocated).
            import gc

            import jax as _jax

            _jax.clear_caches()
            gc.collect()
            print(json.dumps(r), flush=True)
            results.append(r)
        # Crossover summary: fastest solver per (P, L).
        best = {}
        for r in results:
            if "iters_per_sec" not in r:
                continue
            key = (r["P"], r["L"])
            if key not in best or r["iters_per_sec"] > best[key]["iters_per_sec"]:
                best[key] = r
        print(json.dumps({
            "metric": "ba_solver_crossover",
            "fastest": {f"P{p}_L{l}": v["solver"] for (p, l), v in sorted(best.items())},
        }))
        return

    r = _bench_config(
        args.poses, args.landmarks, args.obs_per_lm, args.solver,
        args.cg_iters, with_mfu=args.mfu,
    )
    print(
        json.dumps(
            {
                "metric": "ba_lm_iterations_per_sec_100k_landmarks",
                "value": r["iters_per_sec"],
                "unit": f"LM iters/s (P={args.poses}, L={args.landmarks}, "
                f"solver={r['solver']}, N={r['N']})",
                "vs_baseline": round(r["iters_per_sec"] / 1.0, 3),
                **{k: r[k] for k in ("flops_per_iter", "mfu_pct_v5e") if k in r},
            }
        )
    )


if __name__ == "__main__":
    main()
