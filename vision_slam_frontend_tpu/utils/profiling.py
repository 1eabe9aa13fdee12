"""Per-stage wall-clock profiling of the keyframe pipeline.

The reference's profiling story is an external valgrind/callgrind wrapper
script (reference: `profile` at the repo root); the TPU-native equivalents
are (a) `--profile_dir` on the frontend CLI (jax.profiler -> Perfetto/XProf
trace) and (b) this module: per-stage wall-clock counters, the quick
"where does the keyframe millisecond budget go" answer without a trace
viewer.

Each stage is jitted and timed in isolation on the same data it would see
inside the fused step, with true completion forced by fetching a scalar
(on tunneled backends `block_until_ready` can return at dispatch time).
The stage-sum exceeds the fused-step time — XLA overlaps and fuses stages —
so the fused step is also timed for reference.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import numpy as np


def _best_of(dispatch: Callable[[], object], sync, iters: int, windows: int) -> float:
    """Best-of-windows seconds per call (tunnel noise is one-sided).

    Queues `iters` dispatches then syncs ONCE: on this backend each
    host->device call has a ~25 ms tunnel round-trip, so per-call syncing
    would time the tunnel, not the op. TPU programs execute in launch order,
    so completion of the last dispatch implies all finished.
    """
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = dispatch()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def profile_keyframe_stages(
    config=None,
    image_shape=(480, 640),
    iters: int = 10,
    windows: int = 3,
) -> dict:
    """Time each pipeline stage in isolation + the fused step.

    Returns {stage_name: milliseconds} (plus "_fused_step_ms" and
    "_stage_sum_ms"). Runs on the default backend.
    """
    import jax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.frontend.config import FrontendConfig
    from vision_slam_frontend_tpu.frontend.keyframe import (
        StepParams,
        WindowState,
        keyframe_step,
    )
    from vision_slam_frontend_tpu.geometry.camera import (
        epipolar_residual,
        triangulate_points,
        undistort_points,
    )
    from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence
    from vision_slam_frontend_tpu.ops.brief import detect_and_describe
    from vision_slam_frontend_tpu.ops.hamming import match_window, ratio_test_match

    rig = SyntheticRig(width=image_shape[1], height=image_shape[0])
    if config is None:
        config = FrontendConfig(calib=rig.calib(), fast_threshold=12.0)
    K, W = config.max_features, config.frame_life
    params = StepParams.from_config(config)

    frames = list(generate_sequence(num_frames=2, step=0.25, rig=rig))
    left = jnp.asarray(np.clip(frames[0].left, 0, 255).astype(np.uint8))
    right = jnp.asarray(np.clip(frames[0].right, 0, 255).astype(np.uint8))

    detect = jax.jit(
        partial(
            detect_and_describe,
            threshold=params.fast_threshold,
            max_keypoints=K,
            border=config.detect_border,
            blur_sigma=config.blur_sigma,
            num_levels=config.num_levels,
            scale_factor=config.pyramid_scale,
        )
    )
    l_kps, _, l_desc, l_valid = detect(left)
    r_kps, _, r_desc, r_valid = detect(right)

    stereo_match = jax.jit(
        lambda a, av, b, bv: ratio_test_match(a, av, b, bv, params.nn_match_ratio)
    )
    r_idx, s_dist, s_matched = stereo_match(l_desc, l_valid, r_desc, r_valid)

    epi = jax.jit(
        lambda lk, rk: epipolar_residual(params.fundamental, lk, rk)
    )
    matched_r = r_kps[r_idx]

    # A warmed window state (as it looks mid-sequence).
    state = WindowState.create(W, K, config.stereo_threshold_init)
    state = state.replace(
        desc=jnp.broadcast_to(l_desc, (W,) + l_desc.shape),
        valid=jnp.broadcast_to(l_valid, (W,) + l_valid.shape),
        count=jnp.int32(W),
    )
    window = jax.jit(
        lambda wd, wv, d, v: match_window(
            wd, wv, d, v, params.nn_match_ratio, params.best_percent
        )
    )

    undist = jax.jit(lambda p: undistort_points(params.intr_left, p))
    tri = jax.jit(
        lambda lu, ru: triangulate_points(params.P_left, params.P_right, lu, ru)
    )
    lu = undist(l_kps)
    ru = jax.jit(lambda p: undistort_points(params.intr_right, p))(matched_r)

    fused = partial(
        keyframe_step,
        capacity=K, window=W, border=config.detect_border,
        blur_sigma=config.blur_sigma, num_levels=config.num_levels,
        scale_factor=config.pyramid_scale,
    )

    def sync(x):
        jax.device_get(jnp.sum(jnp.ravel(x)[0:1]))

    stages = {
        "detect_describe_x2": lambda: detect(left)[2] + detect(right)[2],
        "stereo_ratio_match": lambda: stereo_match(l_desc, l_valid, r_desc, r_valid)[1],
        "epipolar_filter": lambda: epi(l_kps, matched_r),
        "window_match": lambda: window(state.desc, state.valid, l_desc, l_valid)[1],
        "undistort_x2": lambda: undist(l_kps) + undist(matched_r),
        "triangulate": lambda: tri(lu, ru),
    }

    # --- fine-grained sub-stages: where inside detect/match does the time go
    # at high K (the roofline question — VERDICT round 2 item 1). Each is the
    # exact op the fused step runs, timed on the same data.
    from vision_slam_frontend_tpu.ops.brief import unpack_bits
    from vision_slam_frontend_tpu.ops.fast import fast_scores
    from vision_slam_frontend_tpu.ops.hamming import best_percent_mask

    scores_fn = jax.jit(lambda im: fast_scores(im.astype(jnp.float32)))
    smap = scores_fn(left)

    def topk_fn(s):
        flat = s.reshape(-1)
        if jax.default_backend() == "tpu":
            return jax.lax.approx_max_k(flat, K, recall_target=0.95)
        return jax.lax.top_k(flat, K)

    topk = jax.jit(topk_fn)
    wd_raw = window(state.desc, state.valid, l_desc, l_valid)[1]
    wm_raw = window(state.desc, state.valid, l_desc, l_valid)[2]
    bp = jax.jit(
        jax.vmap(lambda d, m: best_percent_mask(d, m, params.best_percent))
    )
    part = jax.jit(lambda keep: jnp.argsort(jnp.where(keep, 0, 1), stable=True))
    unpack_w = jax.jit(jax.vmap(unpack_bits))
    gather_rows = jax.jit(lambda buf, perm: buf[perm])

    stages.update(
        {
            "  detect: fast_scores": lambda: scores_fn(left),
            "  detect: top_k": lambda: topk(smap)[0],
            "  match: unpack_window": lambda: unpack_w(state.desc),
            "  match: best_percent": lambda: bp(wd_raw, wm_raw),
            "  step: stable_partition": lambda: part(s_matched),
            "  step: gather_compact": lambda: gather_rows(l_desc, jnp.flip(jnp.arange(K))),
        }
    )

    out = {}
    for name, fn in stages.items():
        sync(fn())  # compile
        out[name] = _best_of(fn, sync, iters, windows) * 1e3

    st = WindowState.create(W, K, config.stereo_threshold_init)

    def run_fused():
        nonlocal st
        st2, res = fused(params, st, left, right, jnp.int32(1))
        st = st2
        return res.num_features

    sync(run_fused())
    out["_stage_sum_ms"] = sum(v for k, v in out.items() if not k.startswith("_"))
    out["_fused_step_ms"] = _best_of(run_fused, sync, iters, windows) * 1e3
    return out


def format_stage_table(timings: dict) -> str:
    rows = [(k, v) for k, v in timings.items() if not k.startswith("_")]
    rows.sort(key=lambda kv: -kv[1])
    total = timings.get("_stage_sum_ms", sum(v for _, v in rows))
    lines = [f"{'stage':<22} {'ms':>8}  {'% of sum':>8}"]
    for k, v in rows:
        lines.append(f"{k:<22} {v:8.3f}  {100.0 * v / max(total, 1e-9):7.1f}%")
    lines.append(f"{'stage sum':<22} {total:8.3f}")
    if "_fused_step_ms" in timings:
        lines.append(
            f"{'fused keyframe step':<22} {timings['_fused_step_ms']:8.3f}"
            "  (XLA fuses/overlaps stages)"
        )
    return "\n".join(lines)
