"""Round-4 probe: alternative formulations of the K=8192 patch gather.

probe_describe_stages pinned the cost at ~1.7 us per keypoint INDEPENDENT of
slab size (15x15 == 31x31) — issue-bound, not byte-bound. Candidates:

  - per-pixel advanced-indexing gather (8M 1-element rows);
  - per-sample gather of only the BRIEF sample points (512/keypoint, the
    "gather" describe method — round 1 rejected it vs patch+matmul, but that
    was before the slab cost was known);
  - channel-first (2, H, W) layout;
  - uint8 source;
  - K split into killable chunks (op-level parallelism).

Run: python probe_gather_variants.py [K]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def _best_of(dispatch, sync, iters=8, windows=4):
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
    from vision_slam_frontend_tpu.ops import brief
    from vision_slam_frontend_tpu.ops import fast as fast_mod
    from vision_slam_frontend_tpu.ops.image import gaussian_blur

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    def sync(x):
        jax.device_get(jax.tree_util.tree_leaves(x)[0])

    def t(name, fn, *args):
        f = jax.jit(fn)
        try:
            out = f(*args)
            sync(out)
            ms = _best_of(lambda: f(*args), sync) * 1e3
            print(f"{name:56s} {ms:9.3f} ms", flush=True)
            return ms
        except Exception as e:
            print(f"{name:56s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
            return None

    rig = SyntheticRig()
    frames = list(generate_sequence(num_frames=2, step=0.25, rig=rig))
    img = jnp.asarray(np.clip(frames[0].left, 0, 255).astype(np.float32))
    H, W = img.shape
    print(f"backend={jax.default_backend()} image={img.shape} K={K}", flush=True)

    detect = jax.jit(
        partial(fast_mod.fast_detect, threshold=12.0, max_keypoints=K, border=19)
    )
    kps, _, valid = detect(img)
    blur = jax.jit(partial(gaussian_blur, sigma=2.0))(img)
    stacked = jnp.stack([img, blur], axis=-1)  # (H, W, 2)
    stacked_cf = jnp.stack([img, blur], axis=0)  # (2, H, W)
    stacked_u8 = jnp.clip(stacked, 0, 255).astype(jnp.uint8)
    theta = brief.compute_orientations(img, kps, valid)
    bins = brief.quantize_angle(theta)

    t("baseline: vmap dynamic_slice slabs",
      lambda s, k: jnp.sum(brief.extract_patches(s, k)), stacked, kps)

    # Per-pixel advanced indexing: (K, 961) individual pixel pairs.
    dy, dx = np.mgrid[-15:16, -15:16]
    dyj = jnp.asarray(dy.ravel())
    dxj = jnp.asarray(dx.ravel())

    def per_pixel(s, k):
        ky = jnp.clip(jnp.round(k[:, 1]).astype(jnp.int32), 15, H - 16)
        kx = jnp.clip(jnp.round(k[:, 0]).astype(jnp.int32), 15, W - 16)
        yy = ky[:, None] + dyj[None, :]
        xx = kx[:, None] + dxj[None, :]
        return jnp.sum(s[yy, xx])  # (K, 961, 2)

    t("per-pixel gather (K,961) pairs", per_pixel, stacked, kps)

    def per_pixel_flat(s, k):
        ky = jnp.clip(jnp.round(k[:, 1]).astype(jnp.int32), 15, H - 16)
        kx = jnp.clip(jnp.round(k[:, 0]).astype(jnp.int32), 15, W - 16)
        flat_idx = (ky[:, None] + dyj[None, :]) * W + (kx[:, None] + dxj[None, :])
        return jnp.sum(s.reshape(H * W, 2)[flat_idx.reshape(-1)])

    t("per-pixel gather, flat 1-D indices", per_pixel_flat, stacked, kps)

    # BRIEF-samples-only gather: 2x256 samples of the blurred channel per
    # keypoint (the 'gather' describe method's memory pattern).
    offs = jnp.asarray(brief._ROT_PATTERNS)  # (BINS, 256, 2, 2)

    def brief_samples(bl, k, b):
        o = offs[b]  # (K, 256, 2, 2)
        kx = jnp.round(k[:, 0]).astype(jnp.int32)
        ky = jnp.round(k[:, 1]).astype(jnp.int32)
        xi = jnp.clip(kx[:, None, None] + o[..., 0], 0, W - 1)
        yi = jnp.clip(ky[:, None, None] + o[..., 1], 0, H - 1)
        return jnp.sum(bl.reshape(-1)[yi * W + xi])

    t("BRIEF per-sample gather (K,256,2)", brief_samples, blur, kps, bins)

    t("channel-first slabs (2,31,31)",
      lambda s, k: jnp.sum(
          jax.vmap(lambda sy, sx: jax.lax.dynamic_slice(s, (0, sy, sx), (2, 31, 31)))(
              jnp.clip(jnp.round(k[:, 1]).astype(jnp.int32) - 15, 0, H - 31),
              jnp.clip(jnp.round(k[:, 0]).astype(jnp.int32) - 15, 0, W - 31),
          )
      ), stacked_cf, kps)

    t("uint8 slabs (31,31,2)",
      lambda s, k: jnp.sum(brief.extract_patches(s, k).astype(jnp.float32)),
      stacked_u8, kps)

    def chunked(s, k):
        tot = 0.0
        for c in range(4):
            tot = tot + jnp.sum(brief.extract_patches(s, k[c * (K // 4):(c + 1) * (K // 4)]))
        return tot

    t("4 chunked slab gathers", chunked, stacked, kps)

    # Row-band matmul: patch rows via one-hot (K*31, H) x (H, W) is 10 GFLOP
    # in bf16 but produces (K*31, W) = 622 MB... only at W-slice 64:
    # one-hot rows then dynamic-slice columns per keypoint.
    def onehot_rows_then_cols(s, k):
        ky = jnp.clip(jnp.round(k[:, 1]).astype(jnp.int32) - 15, 0, H - 31)
        kx = jnp.clip(jnp.round(k[:, 0]).astype(jnp.int32) - 15, 0, W - 31)
        # gather rows: (K, 31, W, 2) via row indices
        rows = (ky[:, None] + jnp.arange(31)[None, :]).reshape(-1)
        slab = s[rows].reshape(K, 31, W, 2)
        cols = kx[:, None] + jnp.arange(31)[None, :]  # (K, 31)
        out = jnp.take_along_axis(slab, cols[:, None, :, None], axis=2)
        return jnp.sum(out)

    t("row gather + take_along_axis cols", onehot_rows_then_cols, stacked, kps)


if __name__ == "__main__":
    main()
