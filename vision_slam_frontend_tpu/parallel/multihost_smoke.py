"""Multi-host (multi-process) smoke: one sharded BA step over DCN.

The reference is strictly single-process (SURVEY.md section 2 parallelism
inventory); this framework's multi-host path is `jax.distributed.initialize`
(parallel/mesh.initialize_distributed) + GSPMD over a global mesh. This module
is the execution evidence for that path: run it once per process and each
process joins the cluster, builds a GLOBAL mesh spanning every process's
devices, shards a synthetic BA problem over it, and runs a short
observation-sharded LM solve whose collectives cross the process boundary
(gloo on CPU; DCN on real pods).

Run (2 processes, e.g. from tests/test_multihost.py):

    python -m vision_slam_frontend_tpu.parallel.multihost_smoke \
        --coordinator localhost:12345 --num_processes 2 --process_id 0 &
    python -m vision_slam_frontend_tpu.parallel.multihost_smoke \
        --coordinator localhost:12345 --num_processes 2 --process_id 1

On success every process prints one `MULTIHOST_OK {...}` JSON line.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True, help="host:port of process 0")
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument(
        "--local_devices", type=int, default=4,
        help="virtual CPU devices per process (CPU smoke mode); ignored on TPU",
    )
    ap.add_argument(
        "--cpu", action="store_true", default=True,
        help="force the CPU backend (the smoke default; real pods drop this)",
    )
    ap.add_argument(
        "--bench_iters", type=int, default=0,
        help="after the smoke, time this many sharded LM iterations at the "
        "--poses/--landmarks shape and print a MULTIHOST_BENCH line (the "
        "measured cross-process point anchoring the analytic scaling model)",
    )
    ap.add_argument("--poses", type=int, default=128)
    ap.add_argument("--landmarks", type=int, default=50_000)
    ap.add_argument("--obs_per_lm", type=int, default=5)
    ap.add_argument("--cg_iters", type=int, default=32)
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vision_slam_frontend_tpu.parallel.mesh import initialize_distributed

    ok = initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert ok, "initialize_distributed returned False with explicit args"

    import jax.numpy as jnp
    import numpy as np

    from vision_slam_frontend_tpu.backend import BASolverConfig, optimize
    from vision_slam_frontend_tpu.io.synthetic import synthetic_ba_problem
    from vision_slam_frontend_tpu.parallel.mesh import make_mesh
    from vision_slam_frontend_tpu.parallel.sharded_ba import shard_ba_problem

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == args.num_processes * n_local, (
        f"global mesh must span processes: {n_global} != "
        f"{args.num_processes} x {n_local}"
    )
    mesh = make_mesh()  # all GLOBAL devices

    # Identical deterministic problem on every process — device_put with a
    # global sharding requires each process to supply the same host data.
    cam, problem, gt_t, _ = synthetic_ba_problem(
        P=16, L=1024, obs_per_lm=4, seed=0, stereo=True, pose_noise=0.03
    )
    N = int(problem.obs_pixel.shape[0])
    pad = (-N) % n_global
    if pad:
        problem = problem.replace(
            obs_pose=jnp.pad(problem.obs_pose, (0, pad)),
            obs_landmark=jnp.pad(problem.obs_landmark, (0, pad)),
            obs_pixel=jnp.pad(problem.obs_pixel, ((0, pad), (0, 0))),
            obs_mask=jnp.pad(problem.obs_mask, (0, pad)),
            obs_pixel_right=jnp.pad(problem.obs_pixel_right, ((0, pad), (0, 0))),
            obs_right_mask=jnp.pad(problem.obs_right_mask, (0, pad)),
        )
    sharded = shard_ba_problem(problem, mesh)
    opt, info = optimize(
        sharded, cam=cam,
        solver=BASolverConfig(max_iterations=2, cg_iterations=8, trim_threshold=0.0),
    )
    final_t = np.asarray(jax.device_get(opt.poses_t))
    assert np.isfinite(final_t).all()
    assert info["cost"] < info["history"][0], (
        f"multi-host sharded BA did not reduce cost: {info['history']}"
    )
    print(
        "MULTIHOST_OK "
        + json.dumps(
            {
                "process_id": args.process_id,
                "num_processes": args.num_processes,
                "global_devices": n_global,
                "local_devices": n_local,
                "cost_initial": round(float(info["history"][0]), 2),
                "cost_final": round(float(info["cost"]), 2),
            }
        ),
        flush=True,
    )

    if args.bench_iters > 0:
        # Measured multi-process point at a load-bearing shape: time the
        # observation-sharded PCG LM iteration across the process boundary.
        # Run the SAME command with --num_processes 1 --local_devices
        # <2x as many> to get the equal-device single-process time; the
        # difference is the measured cross-process collective+sync cost that
        # anchors the analytic model's t_comm (parallel/comm_report.py).
        import time

        from bench_ba import make_problem
        from vision_slam_frontend_tpu.backend.ba import (
            _apply_step,
            _linearize,
            _solve_schur_pcg,
        )
        from vision_slam_frontend_tpu.parallel.comm_report import (
            collective_volume,
        )

        prob = make_problem(args.poses, args.landmarks, args.obs_per_lm)
        N = int(prob.obs_pixel.shape[0])
        pad = (-N) % n_global
        if pad:
            prob = prob.replace(
                obs_pose=jnp.pad(prob.obs_pose, (0, pad)),
                obs_landmark=jnp.pad(prob.obs_landmark, (0, pad)),
                obs_pixel=jnp.pad(prob.obs_pixel, ((0, pad), (0, 0))),
                obs_mask=jnp.pad(prob.obs_mask, (0, pad)),
            )
        sh = shard_ba_problem(prob, mesh)
        hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
        lam = jnp.float32(1e-3)

        def one_iter(p):
            r, Jp, Jl, ro, Ji, Jj = _linearize(cam, p, hd, wt, wr, True)
            d_pose, d_lm, _ = _solve_schur_pcg(
                r, Jp, Jl, ro, Ji, Jj, p, lam, args.cg_iters, True
            )
            return _apply_step(p, d_pose, d_lm)

        compiled = jax.jit(one_iter).lower(sh).compile()
        vol = collective_volume(compiled.as_text())
        p = compiled(sh)  # warmup execution
        _ = np.asarray(jax.device_get(p.poses_t))
        t0 = time.perf_counter()
        for _ in range(args.bench_iters):
            p = compiled(p)
        _ = np.asarray(jax.device_get(p.poses_t))
        dt = (time.perf_counter() - t0) / args.bench_iters
        print(
            "MULTIHOST_BENCH "
            + json.dumps(
                {
                    "process_id": args.process_id,
                    "num_processes": args.num_processes,
                    "global_devices": n_global,
                    "P": args.poses,
                    "L": args.landmarks,
                    "N": args.landmarks * args.obs_per_lm,
                    "cg_iters": args.cg_iters,
                    "sec_per_lm_iter": round(dt, 4),
                    "collective_bytes_per_iter": vol["once_bytes"]
                    + args.cg_iters * vol["loop_bytes"],
                    "collective_count_per_iter": vol["count_once"]
                    + args.cg_iters * vol["count_loop"],
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
