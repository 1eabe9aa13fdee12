"""Benchmark: stereo frontend throughput per chip (detect + match + triangulate).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the real-time target of 30 fps/chip for the full stereo keyframe
step (BASELINE.md north star; the C++ reference publishes no numbers).

Measures the flagship configuration (K=512 features, W=10 window, 640x480)
on the default backend (the TPU chip under the driver), timing steady-state
keyframe steps including host->device image transfer, excluding compile.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.frontend.config import FrontendConfig
    from vision_slam_frontend_tpu.frontend.keyframe import (
        StepParams,
        WindowState,
        keyframe_step,
    )
    from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence

    capacity, window = 512, 10
    rig = SyntheticRig()
    config = FrontendConfig(
        calib=rig.calib(), max_features=capacity, frame_life=window,
        fast_threshold=12.0,
    )
    params = StepParams.from_config(config)
    state = WindowState.create(window, capacity, config.stereo_threshold_init)

    frames = list(generate_sequence(num_frames=6, step=0.25, rig=rig))
    # uint8 transfer (4x less host->device traffic); device casts to f32.
    images = [
        (
            np.clip(f.left, 0, 255).astype(np.uint8),
            np.clip(f.right, 0, 255).astype(np.uint8),
        )
        for f in frames
    ]

    def step(state, left, right, fid):
        return keyframe_step(
            params, state, left, right, fid,
            capacity=capacity, window=window,
            border=config.detect_border, blur_sigma=config.blur_sigma,
        )

    # Warmup / compile.
    fid = 0
    for left, right in images[:3]:
        state, result = step(state, jnp.asarray(left), jnp.asarray(right), jnp.int32(fid))
        fid += 1
    jax.block_until_ready(result)

    # Timed steady-state windows (cycle distinct frames to defeat caching).
    # Best-of-N windows: the env's host<->device path (a TCP tunnel under the
    # test driver) has multi-x run-to-run noise; the best window is the
    # repeatable hardware number.
    n_windows, n_iters = 5, 20
    best = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for i in range(n_iters):
            left, right = images[3 + (i % 3)]
            state, result = step(state, jnp.asarray(left), jnp.asarray(right), jnp.int32(fid))
            fid += 1
        # device_get of a scalar forces true completion of the whole chained
        # window (block_until_ready reports dispatch-only on tunneled
        # backends); the state dependency chains every step into this fetch.
        _ = int(jax.device_get(result.num_features))
        best = min(best, time.perf_counter() - t0)

    fps = n_iters / best
    print(
        json.dumps(
            {
                "metric": "stereo_frontend_fps_per_chip",
                "value": round(fps, 2),
                "unit": "keyframes/s (K=512, W=10, 640x480)",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
