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


def make_problem(P, L, obs_per_lm, seed=0):
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
    base_pose = np.clip((lm[:, 2] / 0.5).astype(np.int64), 0, P - 1)
    obs_lm = np.repeat(np.arange(L), obs_per_lm)
    obs_pose = ((base_pose[obs_lm] - rng.integers(1, 12, N)) % P).astype(np.int32)
    rel = lm[obs_lm] - gt_t[obs_pose]
    z = np.maximum(rel[:, 2], 0.5)
    px = np.stack(
        [500.0 * rel[:, 0] / z + 320.0, 500.0 * rel[:, 1] / z + 240.0], -1
    ) + rng.normal(0, 0.5, (N, 2))
    pad = (-N) % 1024
    if pad:
        obs_pose = np.pad(obs_pose, (0, pad))
        obs_lm = np.pad(obs_lm, (0, pad))
        px = np.pad(px, ((0, pad), (0, 0)))
    mask = np.zeros(N + pad, bool)
    mask[:N] = True
    from vision_slam_frontend_tpu.backend.tracks import build_gather_tables

    pose_obs, pose_obs_mask, lm_obs, lm_obs_mask = build_gather_tables(
        obs_pose, obs_lm, mask, P, L
    )
    return BAProblem(
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--landmarks", type=int, default=100_000)
    ap.add_argument("--obs-per-lm", type=int, default=5)
    ap.add_argument("--poses", type=int, default=500)
    ap.add_argument("--cg-iters", type=int, default=32)
    ap.add_argument(
        "--solver", choices=["dense", "pcg"], default="dense",
        help="inner reduced-camera solver (dense Cholesky is the fast path "
        "at this pose count; pcg is the matrix-free/distributed form)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.backend.ba import (
        _apply_step,
        _linearize,
        _solve_schur_dense,
        _solve_schur_pcg,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    cam = CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )
    problem = make_problem(args.poses, args.landmarks, args.obs_per_lm)

    hd = jnp.float32(4.0)
    wt = jnp.float32(30.0)
    wr = jnp.float32(60.0)
    lam = jnp.float32(1e-3)

    def one_iter(p):
        r, Jp, Jl, ro, Ji, Jj = _linearize(cam, p, hd, wt, wr, True)
        if args.solver == "dense":
            d_pose, d_lm, res = _solve_schur_dense(
                r, Jp, Jl, ro, Ji, Jj, p, lam, True
            )
        else:
            d_pose, d_lm, res = _solve_schur_pcg(
                r, Jp, Jl, ro, Ji, Jj, p, lam, args.cg_iters, True
            )
        return _apply_step(p, d_pose, d_lm)

    # Warmup / compile.
    p = one_iter(problem)
    _ = np.asarray(jax.device_get(p.poses_t))

    # device_get forces true completion (block_until_ready has proven
    # unreliable on tunneled backends); the chained state dependency makes
    # one final fetch account for every iteration in the window.
    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        p = one_iter(p)
    _ = np.asarray(jax.device_get(p.poses_t))
    ips = n_iters / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "ba_lm_iterations_per_sec_100k_landmarks",
                "value": round(ips, 3),
                "unit": f"LM iters/s (P={args.poses}, L={args.landmarks}, solver={args.solver}, "
                f"N={args.landmarks * args.obs_per_lm}, cg={args.cg_iters})",
                "vs_baseline": round(ips / 1.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
