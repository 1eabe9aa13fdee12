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
    """
    if radius is None:
        radius = int(math.ceil(3.0 * sigma))
    k = _gaussian_kernel1d(sigma, radius)
    img = image[None, None, :, :]  # NCHW
    kh = k[None, None, :, None]  # OIHW, vertical
    kw = k[None, None, None, :]  # horizontal
    dn = lax.conv_dimension_numbers(img.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    out = lax.conv_general_dilated(img, kh, (1, 1), [(radius, radius), (0, 0)], dimension_numbers=dn)
    out = lax.conv_general_dilated(out, kw, (1, 1), [(0, 0), (radius, radius)], dimension_numbers=dn)
    return out[0, 0]
