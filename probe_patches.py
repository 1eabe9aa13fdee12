"""Probe: Pallas VMEM patch extraction vs the XLA slab gather, on TPU.

Times the isolated extraction at K in {512, 2048, 8192} (C=2 ORB channels,
C=5 BRISK planes) plus the composed orient_and_describe both ways.
One process, one TPU grant. Run: python probe_patches.py
"""

from __future__ import annotations

import time

import numpy as np


def t(fn, *args, n=30, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.ops import brief
    from vision_slam_frontend_tpu.ops.pallas_kernels import extract_patches_vmem

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    H, W = 480, 640
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)

    for K in (512, 2048, 8192):
        kps = jnp.asarray(
            rng.uniform([20, 20], [W - 20, H - 20], (K, 2)), jnp.float32
        )
        valid = jnp.ones(K, bool)

        stacked_hwc = jnp.stack([img, img2], axis=-1)
        xla = jax.jit(lambda s, k: brief.extract_patches(s, k))
        ms = t(xla, stacked_hwc, kps)
        print(f"K={K} xla gather (C=2)                 {ms:8.3f} ms", flush=True)

        stacked_chw = jnp.stack([img, img2])
        try:
            ms = t(lambda s, k: extract_patches_vmem(s, k), stacked_chw, kps)
            print(f"K={K} pallas vmem (C=2)               {ms:8.3f} ms", flush=True)
        except Exception as e:
            print(f"K={K} pallas vmem FAILED: {type(e).__name__}: {str(e)[:160]}")

        # parity on-chip
        try:
            ref = np.asarray(xla(stacked_hwc, kps))
            out = np.asarray(extract_patches_vmem(stacked_chw, kps))
            ok = np.array_equal(out[:, 0], ref[..., 0]) and np.array_equal(
                out[:, 1], ref[..., 1]
            )
            print(f"K={K} on-chip parity: {'OK' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:
            print(f"K={K} parity check failed: {str(e)[:120]}")

        oad = jax.jit(brief.orient_and_describe)
        ms = t(oad, img, img2, kps, valid)
        print(f"K={K} orient_and_describe (current)    {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
