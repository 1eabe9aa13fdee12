"""Probe: bisect which Mosaic construct breaks VMEM patch extraction.

Minimal kernels, one TPU process. Each isolates one construct:
  E1: dynamic SUBLANE load, static lane slice, 32-row output block
  E2: E1 but 31-row output block (non-multiple-of-8 second-minor)
  E3: E1 + one-hot f32 MXU column select
  E4: E1 + pltpu.roll by traced shift
  E5: E1 with block=8 unroll (vs 64)

Run: python probe_kernel_variants.py
"""

from __future__ import annotations

import time

import numpy as np

PS, LW = 32, 32  # padded patch rows (write 32, consumer slices 31)


def run_variant(name, body, out_rows, K, H, W, block):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Wp = W + LW

    def kernel(ys_ref, xs_ref, img_ref, out_ref):
        i = pl.program_id(0)
        for b in range(block):
            ky = ys_ref[i * block + b]
            kx = xs_ref[i * block + b]
            out_ref[b] = body(img_ref, ky, kx, Wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // block,),
        in_specs=[
            pl.BlockSpec((H + 8, Wp), lambda i, ys, xs: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, out_rows, LW), lambda i, ys, xs: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def fn(img, ys, xs):
        padded = jnp.pad(img, ((0, 8), (0, LW)))
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((K, out_rows, LW), jnp.float32),
        )(ys, xs, padded)

    return jax.jit(fn)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    H, W, K = 480, 640, 8192
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    kps = rng.uniform([20, 20], [W - 20, H - 20], (K, 2)).astype(np.float32)
    ys = jnp.asarray(np.clip(np.rint(kps[:, 1]).astype(np.int32) - 15, 0, H - 31))
    xs = jnp.asarray(np.clip(np.rint(kps[:, 0]).astype(np.int32) - 15, 0, W - 31))
    ys_np, xs_np = np.asarray(ys), np.asarray(xs)

    def body_e1(img_ref, ky, kx, Wp):
        rows = img_ref[pl.ds(ky, 32), :]
        return rows[:, :LW]

    def body_e3(img_ref, ky, kx, Wp):
        rows = img_ref[pl.ds(ky, 32), :]
        cols = jax.lax.broadcasted_iota(jnp.int32, (Wp, LW), 0)
        sel = jax.lax.broadcasted_iota(jnp.int32, (Wp, LW), 1) + kx
        oh = (cols == sel).astype(jnp.float32)
        return jax.lax.dot(rows, oh, preferred_element_type=jnp.float32)

    def body_e4(img_ref, ky, kx, Wp):
        rows = img_ref[pl.ds(ky, 32), :]
        return pltpu.roll(rows, -kx, 1)[:, :LW]

    def body_e2(img_ref, ky, kx, Wp):
        rows = img_ref[pl.ds(ky, 31), :]
        return rows[:, :LW]

    cases = [
        ("E1 dyn-sublane, 32 rows, blk64", body_e1, 32, 64),
        ("E2 dyn-sublane, 31 rows, blk64", body_e2, 31, 64),
        ("E3 + onehot-mxu, blk64", body_e3, 32, 64),
        ("E4 + roll, blk64", body_e4, 32, 64),
        ("E5 dyn-sublane, 32 rows, blk8", body_e1, 32, 8),
    ]
    for name, body, rows, blk in cases:
        try:
            fn = run_variant(name, body, rows, K, H, W, blk)
            t0 = time.perf_counter()
            out = np.asarray(fn(img, ys, xs))
            dt = time.perf_counter() - t0
            # value check vs numpy
            imgn = np.asarray(img)
            i = 17
            exp_rows = imgn[ys_np[i] : ys_np[i] + rows]
            if "onehot" in name or "roll" in name:
                exp = np.pad(exp_rows, ((0, 0), (0, LW)))[
                    :, xs_np[i] : xs_np[i] + LW
                ]
            else:
                exp = exp_rows[:, :LW]
            ok = np.allclose(out[i], exp)
            n = 30
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(img, ys, xs)
            _ = np.asarray(jax.device_get(o))[0, 0, 0]
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"{name:34s} compile {dt:5.1f}s parity={'OK' if ok else 'BAD'} {ms:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
