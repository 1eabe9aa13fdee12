"""One-shot TPU probe: K=8192 detect+describe substages + Pallas/XLA
matching crossover. Feeds the round-3 optimization work (VERDICT tasks 1-2).

Run: python probe_hotpath.py            (all probes)
     python probe_hotpath.py detect    (detect substages only)
     python probe_hotpath.py match     (matching crossover only)
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def _best_of(dispatch, sync, iters=8, windows=3):
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = dispatch()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence
    from vision_slam_frontend_tpu.ops import fast as fast_mod
    from vision_slam_frontend_tpu.ops.brief import (
        brief_describe,
        compute_orientations,
        detect_and_describe,
        extract_patches,
    )
    from vision_slam_frontend_tpu.ops.image import gaussian_blur
    from vision_slam_frontend_tpu.ops.hamming import match_window, ratio_test_match

    def sync(x):
        jax.device_get(jax.tree_util.tree_leaves(x)[0])

    K = 8192
    rig = SyntheticRig()
    frames = list(generate_sequence(num_frames=2, step=0.25, rig=rig))
    img = jnp.asarray(np.clip(frames[0].left, 0, 255).astype(np.uint8)).astype(
        jnp.float32
    )
    print(f"backend={jax.default_backend()} image={img.shape} K={K}", flush=True)

    def t(name, fn, *args, **kw):
        f = jax.jit(fn) if not hasattr(fn, "lower") else fn
        try:
            out = f(*args, **kw)
            sync(out)
            ms = _best_of(lambda: f(*args, **kw), sync) * 1e3
            print(f"{name:42s} {ms:9.3f} ms", flush=True)
            return out
        except Exception as e:
            print(f"{name:42s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            return None

    if which in ("all", "detect"):
        print("--- detect+describe substages (K=8192, one image) ---", flush=True)
        t("fast_scores", fast_mod.fast_scores, img)

        def scores_nms_topk(image):
            kps, sc, valid = fast_mod.fast_detect(
                image, threshold=12.0, max_keypoints=K, border=19
            )
            return kps

        t("fast_detect (scores+nms+topk+subpix)", scores_nms_topk, img)

        kps, sc, valid = jax.jit(
            partial(fast_mod.fast_detect, threshold=12.0, max_keypoints=K, border=19)
        )(img)
        t("extract_patches", extract_patches, img, kps)
        t("compute_orientations", compute_orientations, img, kps, valid)
        t("gaussian_blur s=2", partial(gaussian_blur, sigma=2.0), img)
        blurred = jax.jit(partial(gaussian_blur, sigma=2.0))(img)
        ori = compute_orientations(img, kps, valid)
        t("brief_describe (mxu all-bins)", partial(brief_describe, method="mxu"),
          blurred, kps, ori, valid)
        t("detect_and_describe FULL", partial(
            detect_and_describe, threshold=12.0, max_keypoints=K, border=19,
            blur_sigma=2.0), img)

    if which in ("all", "mxu"):
        print("--- new MXU pallas kernel vs XLA streamed ---", flush=True)
        from vision_slam_frontend_tpu.ops.pallas_kernels import hamming_top2_mxu
        from vision_slam_frontend_tpu.ops.brief import unpack_bits
        from vision_slam_frontend_tpu.ops.hamming import (
            hamming_distance_matrix,
            knn2_match,
        )

        rng = np.random.RandomState(0)
        # Parity on-chip first (small shape).
        q = jnp.asarray(rng.randint(0, 2**32, (512, 8), dtype=np.uint64).astype(np.uint32))
        tt = jnp.asarray(rng.randint(0, 2**32, (512, 8), dtype=np.uint64).astype(np.uint32))
        vt = jnp.asarray(rng.rand(512) > 0.1)
        try:
            ip, d1p, d2p = jax.device_get(hamming_top2_mxu(q, tt, vt))
            dist = hamming_distance_matrix(unpack_bits(q), unpack_bits(tt))
            ix, d1x, d2x = map(np.asarray, jax.device_get(knn2_match(dist, vt)))
            r1 = d1x < 1e8
            ok = (np.array_equal(np.asarray(ip)[r1], ix[r1])
                  and np.array_equal(np.asarray(d1p)[r1], d1x[r1]))
            print(f"on-chip parity (512x512 w=8): {'OK' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:
            print(f"on-chip parity FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        for words in (8, 16):
            for kq, kt in ((2048, 2048), (8192, 8192), (81920, 8192), (20480, 2048)):
                dq = jnp.asarray(rng.randint(0, 2**32, (kq, words), dtype=np.uint64).astype(np.uint32))
                dt = jnp.asarray(rng.randint(0, 2**32, (kt, words), dtype=np.uint64).astype(np.uint32))
                vt = jnp.ones((kt,), bool)
                t(f"mxu kq={kq} kt={kt} w={words}", hamming_top2_mxu, dq, dt, vt)

    if which in ("all", "step8192"):
        print("--- composed keyframe step, K=8192, new describe path ---", flush=True)
        from vision_slam_frontend_tpu.frontend.config import FrontendConfig
        from vision_slam_frontend_tpu.frontend.keyframe import (
            StepParams,
            WindowState,
            keyframe_step,
        )

        rig2 = SyntheticRig()
        config = FrontendConfig(
            calib=rig2.calib(), max_features=K, frame_life=10, fast_threshold=12.0
        )
        params = StepParams.from_config(config)
        state = WindowState.create(10, K, config.stereo_threshold_init)
        left = jnp.asarray(np.clip(frames[0].left, 0, 255).astype(np.uint8))
        right = jnp.asarray(np.clip(frames[0].right, 0, 255).astype(np.uint8))

        def step(st, l, r, fid):
            return keyframe_step(
                params, st, l, r, fid, capacity=K, window=10,
                border=config.detect_border, blur_sigma=config.blur_sigma,
            )

        st = state
        st, res = step(st, left, right, jnp.int32(0))
        sync(res.num_features)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(8):
                st, res = step(st, left, right, jnp.int32(i))
            sync(res.num_features)
            best = min(best, (time.perf_counter() - t0) / 8)
        print(f"keyframe_step K=8192 fused: {best*1e3:.2f} ms = {1.0/best:.1f} fps", flush=True)
        t("detect_and_describe FULL (new)", partial(
            detect_and_describe, threshold=12.0, max_keypoints=K, border=19,
            blur_sigma=2.0), img)

    if which in ("all", "match"):
        print("--- matching crossover: XLA streamed vs Pallas ---", flush=True)
        rng = np.random.RandomState(0)
        for words in (8, 16):
            for k in (2048, 8192):
                dq = jnp.asarray(
                    rng.randint(0, 2**32, size=(k, words), dtype=np.uint64).astype(
                        np.uint32
                    )
                )
                dt = jnp.asarray(
                    rng.randint(0, 2**32, size=(k, words), dtype=np.uint64).astype(
                        np.uint32
                    )
                )
                vq = jnp.ones((k,), bool)
                vt = jnp.ones((k,), bool)
                W = 10
                dw = jnp.broadcast_to(dq, (W, k, words))
                vw = jnp.broadcast_to(vq, (W, k))

                import os

                for pallas in ("", "stereo,window"):
                    if pallas:
                        os.environ["VSF_ENABLE_PALLAS"] = pallas
                    else:
                        os.environ.pop("VSF_ENABLE_PALLAS", None)
                    ratio_test_match.clear_cache()
                    match_window.clear_cache()
                    tag = "pallas" if pallas else "xla   "
                    t(f"stereo k={k} w={words} {tag}",
                      lambda a, av, b, bv: ratio_test_match(a, av, b, bv, 0.6),
                      dq, vq, dt, vt)
                    t(f"window k={k} w={words} {tag}",
                      lambda a, av, b, bv: match_window(a, av, b, bv, 0.6, 0.3),
                      dw, vw, dt, vt)
                os.environ.pop("VSF_ENABLE_PALLAS", None)


if __name__ == "__main__":
    main()
