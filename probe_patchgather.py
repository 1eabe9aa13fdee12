"""Round-4 TPU probe: K=8192 patch-gather variants + roofline arithmetic.

The round-3 profile left detect_describe_x2 at 26.4 ms (K=8192), attributed
to the 2-channel 31x31 slab gather. This probe measures the non-Pallas
options the round-3 verdict names (task 3):

  A. row-sorted keypoints before the gather (coalesces HBM transactions);
  B. L+R batched into ONE program over a side-by-side (H, 2W, 2ch) image
     (halves per-stage dispatches, doubles the gather batch, one describe
     matmul for both cameras);
  C. A + B combined;

plus the raw-gather roofline: bytes actually moved vs time, against an
ideal contiguous read of the same payload.

Run: python probe_patchgather.py
"""

from __future__ import annotations

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
    import jax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence
    from vision_slam_frontend_tpu.ops import fast as fast_mod
    from vision_slam_frontend_tpu.ops.brief import (
        PATCH_AREA,
        extract_patches,
        orient_and_describe,
    )
    from vision_slam_frontend_tpu.ops.image import gaussian_blur

    def sync(x):
        jax.device_get(jax.tree_util.tree_leaves(x)[0])

    def t(name, fn, *args):
        f = jax.jit(fn)
        try:
            out = f(*args)
            sync(out)
            ms = _best_of(lambda: f(*args), sync) * 1e3
            print(f"{name:52s} {ms:9.3f} ms", flush=True)
            return ms
        except Exception as e:
            print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
            return None

    K = 8192
    rig = SyntheticRig()
    frames = list(generate_sequence(num_frames=2, step=0.25, rig=rig))
    imgL = jnp.asarray(np.clip(frames[0].left, 0, 255).astype(np.float32))
    imgR = jnp.asarray(np.clip(frames[0].right, 0, 255).astype(np.float32))
    H, W = imgL.shape
    print(f"backend={jax.default_backend()} image={imgL.shape} K={K}", flush=True)

    detect = jax.jit(
        partial(fast_mod.fast_detect, threshold=12.0, max_keypoints=K, border=19)
    )
    kpsL, _, validL = detect(imgL)
    kpsR, _, validR = detect(imgR)
    blurL = jax.jit(partial(gaussian_blur, sigma=2.0))(imgL)
    blurR = jax.jit(partial(gaussian_blur, sigma=2.0))(imgR)

    # --- Baseline: two fused orient+describe calls (the production path).
    def baseline(iL, bL, kL, vL, iR, bR, kR, vR):
        tL, dL = orient_and_describe(iL, bL, kL, vL)
        tR, dR = orient_and_describe(iR, bR, kR, vR)
        return dL, dR

    base_ms = t("baseline: orient_and_describe x2", baseline,
                imgL, blurL, kpsL, validL, imgR, blurR, kpsR, validR)

    # --- A: row-sorted keypoints (sort by y, then x; unsort descriptors).
    def sorted_one(i, b, k, v):
        order = jnp.argsort(
            jnp.round(k[:, 1]).astype(jnp.int32) * W
            + jnp.round(k[:, 0]).astype(jnp.int32)
        )
        inv = jnp.argsort(order)
        th, d = orient_and_describe(i, b, k[order], v[order])
        return th[inv], d[inv]

    def variant_a(iL, bL, kL, vL, iR, bR, kR, vR):
        _, dL = sorted_one(iL, bL, kL, vL)
        _, dR = sorted_one(iR, bR, kR, vR)
        return dL, dR

    t("A: row-sorted keypoints x2", variant_a,
      imgL, blurL, kpsL, validL, imgR, blurR, kpsR, validR)

    # --- B: L+R batched over one side-by-side image.
    def variant_b(iL, bL, kL, vL, iR, bR, kR, vR):
        wide = jnp.concatenate([iL, iR], axis=1)  # (H, 2W)
        wide_b = jnp.concatenate([bL, bR], axis=1)
        kR2 = kR + jnp.asarray([W, 0.0], jnp.float32)
        kps = jnp.concatenate([kL, kR2], axis=0)  # (2K, 2)
        v = jnp.concatenate([vL, vR], axis=0)
        th, d = orient_and_describe(wide, wide_b, kps, v)
        return d[:K], d[K:]

    t("B: L+R batched (side-by-side, 2K gather)", variant_b,
      imgL, blurL, kpsL, validL, imgR, blurR, kpsR, validR)

    # --- C: batched + sorted.
    def variant_c(iL, bL, kL, vL, iR, bR, kR, vR):
        wide = jnp.concatenate([iL, iR], axis=1)
        wide_b = jnp.concatenate([bL, bR], axis=1)
        kR2 = kR + jnp.asarray([W, 0.0], jnp.float32)
        kps = jnp.concatenate([kL, kR2], axis=0)
        v = jnp.concatenate([vL, vR], axis=0)
        order = jnp.argsort(
            jnp.round(kps[:, 1]).astype(jnp.int32) * (2 * W)
            + jnp.round(kps[:, 0]).astype(jnp.int32)
        )
        inv = jnp.argsort(order)
        th, d = orient_and_describe(wide, wide_b, kps[order], v[order])
        d = d[inv]
        return d[:K], d[K:]

    t("C: batched + row-sorted", variant_c,
      imgL, blurL, kpsL, validL, imgR, blurR, kpsR, validR)

    # --- Roofline arithmetic: the raw 2-channel gather alone, sorted vs not.
    stacked = jnp.stack([imgL, blurL], axis=-1)  # (H, W, 2)
    ms_raw = t("raw gather (K, 961, 2) unsorted", extract_patches, stacked, kpsL)

    def sorted_gather(img2, k):
        order = jnp.argsort(
            jnp.round(k[:, 1]).astype(jnp.int32) * W
            + jnp.round(k[:, 0]).astype(jnp.int32)
        )
        return extract_patches(img2, k[order])

    ms_sorted = t("raw gather (K, 961, 2) row-sorted", sorted_gather, stacked, kpsL)

    # Ideal: contiguous read+write of the same payload.
    payload = jnp.zeros((K, PATCH_AREA, 2), jnp.float32)
    ms_copy = t("ideal: contiguous copy of same payload", lambda x: x * 1.0001, payload)

    bytes_out = K * PATCH_AREA * 2 * 4
    print(f"\npayload = {bytes_out / 1e6:.1f} MB out "
          f"(+ {K * 31 * 2 * 4 * 31 / 1e6:.1f} MB touched in)", flush=True)
    for name, ms in (("unsorted", ms_raw), ("sorted", ms_sorted), ("copy", ms_copy)):
        if ms:
            print(f"  {name:10s}: {2 * bytes_out / (ms / 1e3) / 1e9:7.1f} GB/s "
                  f"effective (rd+wr)", flush=True)


if __name__ == "__main__":
    main()
