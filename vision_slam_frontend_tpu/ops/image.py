"""Whole-image primitives: separable Gaussian blur.

Used to smooth images before BRIEF sampling (the reference relies on the
smoothing built into OpenCV's descriptor extractors; ORB blurs with a 7x7
Gaussian-ish box chain). Pure XLA: two 1-D convolutions, fused by the
compiler; on TPU they lower to MXU-friendly contractions.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(image: jnp.ndarray, sigma: float = 2.0, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur of a single-channel image (H, W) float32.

    `radius` defaults to ceil(3*sigma). Edge handling: SAME padding with
    zero-extension, renormalized implicitly by kernel truncation (matches
    typical descriptor-pipeline usage where borders are masked anyway).

    Implemented as statically-unrolled shifted adds (per-tap multiply-add on
    the VPU, fused by XLA) — lax.conv lowers skinny separable kernels poorly
    on TPU (measured ~2.5 ms for a 13-tap blur at 640x480 vs <1 ms this way).
    """
    if radius is None:
        radius = int(math.ceil(3.0 * sigma))
    # Host-side numpy kernel: static weights even when tracing under jit.
    import numpy as np

    x = np.arange(-radius, radius + 1, dtype=np.float64)
    kk = np.exp(-0.5 * (x / float(sigma)) ** 2)
    k = list(kk / kk.sum())

    def filt(x, axis):
        pad_width = [(0, 0), (0, 0)]
        pad_width[axis] = (radius, radius)
        padded = jnp.pad(x, pad_width)
        n = x.shape[axis]
        acc = None
        for i, w in enumerate(k):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(i, i + n)
            term = padded[tuple(sl)] * w
            acc = term if acc is None else acc + term
        return acc

    return filt(filt(image, 0), 1)
