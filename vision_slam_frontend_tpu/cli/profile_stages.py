"""profile_stages CLI: per-stage wall-clock breakdown of the keyframe step.

The TPU-native replacement for the reference's valgrind/callgrind `profile`
wrapper script (reference: `profile` at the repo root). Prints a stage table
(detect, match, filter, triangulate...) plus the fused-step time; optionally
captures a jax.profiler trace for Perfetto/XProf.

Usage:
  python -m vision_slam_frontend_tpu.cli.profile_stages [--max_features 512]
      [--frame_life 10] [--iters 10] [--trace_dir /tmp/trace] [--cpu]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="profile_stages", description=__doc__)
    p.add_argument("--max_features", type=int, default=512)
    p.add_argument("--frame_life", type=int, default=10)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--trace_dir", default=None,
                   help="also capture a jax.profiler trace here")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vision_slam_frontend_tpu.frontend.config import FrontendConfig
    from vision_slam_frontend_tpu.io.synthetic import SyntheticRig
    from vision_slam_frontend_tpu.utils.profiling import (
        format_stage_table,
        profile_keyframe_stages,
    )

    rig = SyntheticRig(width=args.width, height=args.height)
    config = FrontendConfig(
        calib=rig.calib(), max_features=args.max_features,
        frame_life=args.frame_life, fast_threshold=12.0,
    )
    print(
        f"Profiling keyframe stages on {jax.devices()[0].platform} "
        f"(K={args.max_features}, W={args.frame_life}, "
        f"{args.width}x{args.height})..."
    )
    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    timings = profile_keyframe_stages(
        config, image_shape=(args.height, args.width),
        iters=args.iters, windows=args.windows,
    )
    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f"Wrote profiler trace to {args.trace_dir}")
    print(format_stage_table(timings))
    return 0


if __name__ == "__main__":
    sys.exit(main())
