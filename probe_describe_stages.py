"""Round-4 probe: where do the K=8192 orient+describe milliseconds go?

Every stage reduces to a scalar before the sync fetch, so the tunnel
transfer cost (which made probe_patchgather's raw-gather rows meaningless —
63 MB device->host per fetch at ~0.5 GB/s) stays out of the measurement.

Run: python probe_describe_stages.py [K]
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
    from vision_slam_frontend_tpu.ops import fast as fast_mod
    from vision_slam_frontend_tpu.ops import brief
    from vision_slam_frontend_tpu.ops.image import gaussian_blur

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    def sync(x):
        jax.device_get(jax.tree_util.tree_leaves(x)[0])

    def t(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        sync(out)
        ms = _best_of(lambda: f(*args), sync) * 1e3
        print(f"{name:56s} {ms:9.3f} ms", flush=True)
        return ms

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
    stacked = jnp.stack([img, blur], axis=-1)
    theta = brief.compute_orientations(img, kps, valid)
    bins = brief.quantize_angle(theta)

    # A scalar-returning stage chain; each adds one piece.
    t("nothing (dispatch floor)", lambda k: jnp.sum(k), kps)

    t("1. gather (K,961,2) -> sum",
      lambda s, k: jnp.sum(brief.extract_patches(s, k)), stacked, kps)

    def g_rot(s, k, b):
        p = brief.extract_patches(s, k)
        return jnp.sum(brief._rotate_patches_90(p[..., 1], b // brief.NUM_FINE))

    t("2. gather + rotate90 -> sum", g_rot, stacked, kps, bins)

    def g_rot_mm(s, k, b):
        p = brief.extract_patches(s, k)
        bits = brief._describe_bits_mxu(p[..., 1], b)
        return jnp.sum(bits)

    t("3. gather + rotate + describe matmul -> sum", g_rot_mm, stacked, kps, bins)

    def full(i, bl, k, v):
        th, d = brief.orient_and_describe(i, bl, k, v)
        return jnp.sum(d.astype(jnp.float32)) + jnp.sum(th)

    t("4. full orient_and_describe -> sum", full, img, blur, kps, valid)

    # Isolate the matmul at this shape (no gather): patches as a dense input.
    patches = jax.jit(lambda s, k: brief.extract_patches(s, k)[..., 1])(stacked, kps)

    t("5. describe matmul only (patches resident)",
      lambda p, b: jnp.sum(brief._describe_bits_mxu(p, b)), patches, bins)

    t("6. rotate90 only (patches resident)",
      lambda p, b: jnp.sum(brief._rotate_patches_90(p, b // brief.NUM_FINE)),
      patches, bins)

    # Gather with a smaller slab: is cost ~ rows touched or ~ bytes?
    for r in (7, 15):
        ps = 2 * r + 1

        def small_gather(s, k, ps=ps):
            kx = jnp.clip(jnp.round(k[:, 0]).astype(jnp.int32) - r, 0, W - ps)
            ky = jnp.clip(jnp.round(k[:, 1]).astype(jnp.int32) - r, 0, H - ps)
            one = lambda sy, sx: jax.lax.dynamic_slice(s, (sy, sx, 0), (ps, ps, 2))
            return jnp.sum(jax.vmap(one)(ky, kx))

        t(f"7. gather radius={r} ({ps}x{ps}x2) -> sum", small_gather, stacked, kps)

    # Row-sorted gather, scalar-reduced.
    def sorted_gather(s, k):
        order = jnp.argsort(
            jnp.round(k[:, 1]).astype(jnp.int32) * W
            + jnp.round(k[:, 0]).astype(jnp.int32)
        )
        return jnp.sum(brief.extract_patches(s, k[order]))

    t("8. row-sorted gather -> sum", sorted_gather, stacked, kps)

    # One-hot matmul alternative to the gather: patches = onehot(K,HW) @ img?
    # (H*W=307k cols — 8192x307k bf16 one-hot is 5 GB; skip.) Instead: the
    # XLA gather as take() of row slabs: rows (K*31, W2) then cols.
    def two_stage(s, k):
        ky = jnp.clip(jnp.round(k[:, 1]).astype(jnp.int32) - 15, 0, H - 31)
        kx = jnp.clip(jnp.round(k[:, 0]).astype(jnp.int32) - 15, 0, W - 31)
        rows = ky[:, None] + jnp.arange(31)[None, :]  # (K, 31)
        slab = s[rows.reshape(-1)]  # (K*31, W, 2) row gather
        slab = slab.reshape(K, 31, W, 2)
        one = lambda sl, sx: jax.lax.dynamic_slice(sl, (0, sx, 0), (31, 31, 2))
        return jnp.sum(jax.vmap(one)(slab, kx))

    t("9. two-stage gather (rows then cols) -> sum", two_stage, stacked, kps)


if __name__ == "__main__":
    main()
