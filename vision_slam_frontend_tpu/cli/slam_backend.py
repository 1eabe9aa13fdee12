"""slam_backend CLI: optimize a saved SLAM problem with bundle adjustment.

The consumer of the frontend's npz artifact — the role the reference delegates
to its closed-source backend (reference: README.md:3 "saved to a file for
offline processing by the backend"). Reads a problem (+ calibration embedded
by the frontend CLI), chains matches into landmark tracks, runs LM with
Schur-complement PCG, and writes the optimized problem + trajectory.

Usage:
  python -m vision_slam_frontend_tpu.cli.slam_backend \
      --input problem.npz --output solved.npz [--ply map.ply] [--verbose]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="slam_backend", description=__doc__)
    p.add_argument("--input", required=True, help="SLAM problem npz (from slam_frontend)")
    p.add_argument("--output", required=True, help="optimized problem npz")
    p.add_argument("--ply", default=None, help="optimized pose-graph + landmark PLY")
    p.add_argument("--config", default=None, help="YAML config (else calib embedded in input)")
    p.add_argument("--max_iterations", type=int, default=15)
    p.add_argument("--huber_delta", type=float, default=4.0)
    p.add_argument("--trim_threshold", type=float, default=8.0)
    p.add_argument("--min_track_length", type=int, default=2)
    p.add_argument("--max_landmarks", type=int, default=None)
    p.add_argument(
        "--checkpoint", default=None,
        help="snapshot solver state to this npz every --checkpoint_every LM iterations",
    )
    p.add_argument("--checkpoint_every", type=int, default=5)
    p.add_argument(
        "--resume", action="store_true",
        help="resume from --checkpoint if it exists (fresh run otherwise)",
    )
    p.add_argument(
        "--validate", action="store_true",
        help="sanitizer mode: check each solver step for non-finite updates",
    )
    p.add_argument(
        "--schur_solver",
        choices=["auto", "dense", "pcg", "pcg_chunked", "segments"],
        default="auto",
        help="inner reduced-camera solver: dense Cholesky (exact, fastest up "
        "to ~1-2k poses), matrix-free PCG (scales past that / distributed), "
        "pcg_chunked (PCG as several small programs + host CG loop — the "
        "only form that compiles at N >= ~2.5M observations; auto switches "
        "to it above BASolverConfig.chunked_obs_threshold), "
        "or segment-parallel submaps (pose-chain sharded two-level solver "
        "for long trajectories; see parallel/segment_ba.py)",
    )
    p.add_argument("--cg_iterations", type=int, default=32)
    p.add_argument(
        "--segments", type=int, default=0,
        help="number of trajectory segments for --schur_solver segments "
        "(0 = one per device, min 4)",
    )
    p.add_argument(
        "--sweeps", type=int, default=4,
        help="Gauss-Seidel sweeps for --schur_solver segments",
    )
    p.add_argument(
        "--devices", type=int, default=0,
        help="shard the solve over the first N local devices (0 = single "
        "device). Observations shard over a 1-D mesh (auto/dense/pcg) or "
        "segments shard over it (--schur_solver segments); reductions psum "
        "over ICI",
    )
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from vision_slam_frontend_tpu.backend import BASolverConfig, build_ba_problem, optimize
    from vision_slam_frontend_tpu.backend.residuals import CameraParams
    from vision_slam_frontend_tpu.io.serialize import load_problem, problem_to_arrays

    try:
        problem = load_problem(args.input)
        with np.load(args.input) as raw:
            data = dict(raw)
    except (FileNotFoundError, ValueError, KeyError) as e:
        print(f"Unable to read {args.input}, reason:\n {e}")
        return 1

    if args.config:
        from vision_slam_frontend_tpu.frontend.config import FrontendConfig

        config = FrontendConfig.load(args.config)
        cam = CameraParams.from_config(config)
        cam_to_robot = np.asarray(config.left_cam_to_robot)
    elif "calib_K_left" in data:
        K = data["calib_K_left"]
        ext = data["calib_left_cam_to_robot"]
        kwargs = {}
        if "calib_right_extrinsic" in data and "calib_K_right" in data:
            Kr = data["calib_K_right"]
            A_r = data["calib_right_extrinsic"]
            kwargs = dict(
                fx_r=jnp.float32(Kr[0, 0]), fy_r=jnp.float32(Kr[1, 1]),
                cx_r=jnp.float32(Kr[0, 2]), cy_r=jnp.float32(Kr[1, 2]),
                R_rl=jnp.asarray(A_r[:, :3]), t_rl=jnp.asarray(A_r[:, 3]),
            )
        cam = CameraParams(
            fx=jnp.float32(K[0, 0]), fy=jnp.float32(K[1, 1]),
            cx=jnp.float32(K[0, 2]), cy=jnp.float32(K[1, 2]),
            R_cr=jnp.asarray(ext[:3, :3]), t_cr=jnp.asarray(ext[:3, 3]),
            **kwargs,
        )
        cam_to_robot = ext
    else:
        print("No calibration: pass --config or use a frontend-written npz")
        return 1

    ba = build_ba_problem(
        problem,
        left_cam_to_robot=cam_to_robot,
        min_track_length=args.min_track_length,
        max_landmarks=args.max_landmarks,
    )
    n_lm = int(np.sum(np.asarray(ba.landmark_mask)))
    n_obs = int(np.sum(np.asarray(ba.obs_mask)))
    print(
        f"BA problem: {ba.num_poses} poses, {n_lm} landmarks, {n_obs} observations, "
        f"{int(np.sum(np.asarray(ba.odom_mask)))} odometry factors"
    )

    solver = BASolverConfig(
        max_iterations=args.max_iterations,
        huber_delta=args.huber_delta,
        trim_threshold=args.trim_threshold,
        validate=args.validate,
        schur_solver=args.schur_solver,
        cg_iterations=args.cg_iterations,
    )
    t0 = time.perf_counter()
    if args.schur_solver == "segments":
        import jax.numpy as jnp

        from vision_slam_frontend_tpu.backend.ba import _reproj_residual_norms
        from vision_slam_frontend_tpu.parallel import make_mesh, optimize_segments

        mesh = make_mesh(args.devices) if args.devices > 1 else None
        n_seg = args.segments or max(args.devices, 4)
        n_trimmed = 0
        if solver.trim_threshold > 0:
            # Same pre-trim rule as backend/ba.optimize: gross outliers are
            # easiest to identify at the initial estimate.
            norms = _reproj_residual_norms(cam, ba)
            keep = ba.obs_mask & (norms < 10.0 * solver.trim_threshold)
            n_trimmed = int(jnp.sum(ba.obs_mask) - jnp.sum(keep))
            ba = ba.replace(obs_mask=keep)
        opt, info = optimize_segments(
            ba, mesh=mesh, cam=cam, solver=solver,
            n_seg=n_seg, sweeps=args.sweeps, verbose=args.verbose,
        )
        if solver.trim_threshold > 0:
            # One tightening round at the converged estimate, then re-sweep.
            norms = _reproj_residual_norms(cam, opt)
            keep = opt.obs_mask & (norms < solver.trim_threshold)
            dropped = int(jnp.sum(opt.obs_mask) - jnp.sum(keep))
            if dropped:
                n_trimmed += dropped
                opt, info2 = optimize_segments(
                    opt.replace(obs_mask=keep), mesh=mesh, cam=cam,
                    solver=solver, n_seg=n_seg, sweeps=args.sweeps,
                    verbose=args.verbose,
                )
                info = {
                    "cost": info2["cost"],
                    "history": info["history"] + info2["history"],
                    "iterations": info["iterations"] + info2["iterations"],
                    "segments": n_seg,
                    "sweeps": args.sweeps,
                }
        info["trimmed"] = n_trimmed
        elapsed = time.perf_counter() - t0
        print(
            f"BA (segments={n_seg}, sweeps={args.sweeps}) converged: cost "
            f"{info['history'][0]:.1f} -> {info['cost']:.1f} in "
            f"{info['iterations']} LM iterations ({elapsed:.2f}s)"
        )
        return _write_output(args, problem, opt, info, data, cam_to_robot)
    if args.devices > 1:
        from vision_slam_frontend_tpu.parallel import make_mesh, shard_ba_problem

        mesh = make_mesh(args.devices)
        # Pad observation capacity up to the mesh size if needed.
        N = ba.obs_pixel.shape[0]
        pad = (-N) % args.devices
        if pad:
            import jax.numpy as _jnp

            ba = ba.replace(
                obs_pose=_jnp.pad(ba.obs_pose, (0, pad)),
                obs_landmark=_jnp.pad(ba.obs_landmark, (0, pad)),
                obs_pixel=_jnp.pad(ba.obs_pixel, ((0, pad), (0, 0))),
                obs_mask=_jnp.pad(ba.obs_mask, (0, pad)),
                obs_pixel_right=_jnp.pad(ba.obs_pixel_right, ((0, pad), (0, 0)))
                if ba.obs_pixel_right is not None else None,
                obs_right_mask=_jnp.pad(ba.obs_right_mask, (0, pad))
                if ba.obs_right_mask is not None else None,
            )
        ba = shard_ba_problem(ba, mesh)
        print(f"Sharded {n_obs} observations over {args.devices} devices")
    opt, info = optimize(
        ba, cam=cam, solver=solver, verbose=args.verbose,
        checkpoint_path=args.checkpoint, checkpoint_every=args.checkpoint_every,
        resume=args.resume,
    )
    elapsed = time.perf_counter() - t0
    print(
        f"BA converged: cost {info['history'][0]:.1f} -> {info['cost']:.1f} in "
        f"{info['iterations']} LM iterations ({elapsed:.2f}s, "
        f"{info['trimmed']} observations trimmed)"
    )
    return _write_output(args, problem, opt, info, data, cam_to_robot)


def _write_output(args, problem, opt, info, data, cam_to_robot) -> int:
    """Write the optimized problem: original structure with updated poses,
    plus the optimized landmark cloud and per-pose trajectory."""
    from vision_slam_frontend_tpu.io.serialize import problem_to_arrays

    for k, node in enumerate(problem.nodes):
        node.pose.loc = np.asarray(opt.poses_t[k])
        node.pose.angle = np.asarray(opt.poses_q[k])
    out = problem_to_arrays(problem)
    out["ba_landmarks"] = np.asarray(opt.landmarks)
    out["ba_landmark_mask"] = np.asarray(opt.landmark_mask)
    out["ba_cost_history"] = np.asarray(info["history"])
    for key in data:
        if key.startswith("calib_"):
            out[key] = data[key]
    np.savez_compressed(args.output, **out)
    print(f"Wrote {args.output}")

    if args.ply:
        from vision_slam_frontend_tpu.viz.ply import export_ply

        stats = export_ply(args.ply, problem, cam_to_robot)
        print(f"Wrote {args.ply}: {stats}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
