"""Multi-config TPU measurement session in ONE process.

The axon TPU tunnel grants the chip to one process at a time and each grant +
remote compile costs ~30 s, so sweeping configs as separate `bench.py`
invocations wastes minutes per point. This driver runs a whole measurement
session — fps grid points (K, pyramid levels, descriptor family, Pallas
on/off) and per-stage profile tables — inside one process, emitting one JSON
line per point. BASELINE.md's roofline/crossover tables come from here.

Usage:
  python bench_sweep.py --fps k=512 k=2048 k=8192
  python bench_sweep.py --fps k=2048,pallas=1 k=8192,pallas=stereo,window
  python bench_sweep.py --fps k=512,family=brisk k=2048,family=brisk
  python bench_sweep.py --profile 512 2048 8192
"""

from __future__ import annotations

import argparse
import json
import os


def _clear_jit_caches() -> None:
    """Drop traces that captured the VSF_ENABLE_PALLAS env state (the flag is
    read at trace time; the jit cache key doesn't include it)."""
    from vision_slam_frontend_tpu.frontend import keyframe
    from vision_slam_frontend_tpu.ops import fast, hamming

    keyframe.keyframe_step.clear_cache()
    hamming.ratio_test_match.clear_cache()
    hamming.match_window.clear_cache()
    fast.fast_detect.clear_cache()


def _parse_spec(spec: str) -> dict:
    """'k=8192,levels=4,family=brisk,pallas=stereo,window' -> config dict.
    Everything after 'pallas=' joins back together (the flag itself is a
    comma list)."""
    out = {"k": 512, "levels": 1, "family": "orb", "pallas": ""}
    if "pallas=" in spec:
        spec, _, pallas = spec.partition("pallas=")
        out["pallas"] = pallas
        spec = spec.rstrip(",")
    for kv in filter(None, spec.split(",")):
        key, _, val = kv.partition("=")
        out[key] = val
    out["k"] = int(out["k"])
    out["levels"] = int(out["levels"])
    return out


def run_fps_point(spec: dict, mfu: bool = True) -> dict:
    import bench

    if spec["pallas"]:
        os.environ["VSF_ENABLE_PALLAS"] = spec["pallas"]
    else:
        os.environ.pop("VSF_ENABLE_PALLAS", None)
    _clear_jit_caches()
    r = bench.bench_step(
        spec["k"], 10, 12, mfu=mfu,
        num_levels=spec["levels"], family=spec["family"],
    )
    return {**spec, **{k: round(v, 3) if isinstance(v, float) else v for k, v in r.items()}}


def run_profile(k: int) -> None:
    import jax

    from vision_slam_frontend_tpu.frontend.config import FrontendConfig
    from vision_slam_frontend_tpu.io.synthetic import SyntheticRig
    from vision_slam_frontend_tpu.utils.profiling import (
        format_stage_table,
        profile_keyframe_stages,
    )

    rig = SyntheticRig()
    config = FrontendConfig(
        calib=rig.calib(), max_features=k, frame_life=10, fast_threshold=12.0
    )
    print(f"=== per-stage profile, K={k}, W=10, 640x480, "
          f"{jax.devices()[0].platform} ===", flush=True)
    timings = profile_keyframe_stages(config, iters=8, windows=3)
    print(format_stage_table(timings), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fps", nargs="*", default=None,
                    help="fps grid specs: k=2048,levels=4,family=brisk,pallas=1")
    ap.add_argument("--profile", nargs="*", type=int, default=None,
                    help="K values for per-stage profile tables")
    ap.add_argument("--no-mfu", action="store_true")
    args = ap.parse_args()

    if args.fps:
        for raw in args.fps:
            spec = _parse_spec(raw)
            try:
                r = run_fps_point(spec, mfu=not args.no_mfu)
            except Exception as e:  # record the failure, keep the session
                r = {**spec, "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(r), flush=True)
    if args.profile:
        for k in args.profile:
            try:
                run_profile(k)
            except Exception as e:
                print(f"profile K={k} failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
