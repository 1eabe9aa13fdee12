"""SIFT-class float descriptors: gradient-histogram over a 4x4 cell grid,
L2-matched — the reference's float-descriptor (NORM_L2) extractor branch.

The reference builds SURF/SIFT/FREAK extractors with BFMatcher(NORM_L2)
behind USE_XFEATURES (reference: src/slam_frontend.cc:222-247,
CMakeLists.txt:45-49 — OFF by default). This family closes that branch of the
extractor enum with a TPU-first design rather than a port:

  - detection reuses the FAST + pyramid machinery (static-shape masked
    top-K, like the ORB family) — the capability under test is the float
    DESCRIPTOR + L2 matching path, not a DoG detector;
  - ONE 31x31 patch slab-gather per keypoint feeds both orientation
    (intensity-centroid moments, an MXU matvec) and the descriptor;
  - rotation invariance via the same quadrant factoring as the binary
    families (ops/brief.py NUM_FINE): the patch is rotated by the exact
    90-degree grid permutation, and only the NUM_FINE fine-rotation spatial
    weight tables enter the histogram contraction;
  - the histogram itself is one batched MXU contraction: per-pixel gradient
    magnitude x soft orientation-bin weights (K, 961, 8) against precomputed
    per-fine-bin spatial cell weights (961, 16) -> (K, 16 cells, 8 bins);
  - standard SIFT normalization (L2 -> clamp 0.2 -> L2) on the 128-d vector.

Descriptors are (K, 128) float32; matching runs as squared-L2 on the MXU
(||a||^2 + ||b||^2 - 2ab^T — the same identity the Hamming matmul uses, since
popcount IS the squared norm of a {0,1} vector; see ops/hamming.py L2 path).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vision_slam_frontend_tpu.ops.brief import (
    _MOMENT_WX,
    _MOMENT_WY,
    _rotate_patches_90,
    NUM_BINS,
    NUM_FINE,
    PATCH_AREA,
    PATCH_RADIUS,
    PATCH_SIZE,
    extract_patches,
    quantize_angle,
)

GRID = 4  # 4x4 spatial cells
ORI_BINS = 8
DIMS = GRID * GRID * ORI_BINS  # 128, the classic SIFT width


def _spatial_weight_tables() -> np.ndarray:
    """(NUM_FINE, PATCH_AREA, GRID*GRID) float32 cell weights per fine bin.

    For fine rotation theta_f, pixel offset p maps into the keypoint frame as
    p' = R(-theta_f) p; its cell weight is the bilinear tent over the 4x4
    grid times a Gaussian window over the patch (SIFT's spatial weighting).
    The 90-degree quadrant part of the rotation is applied to the PATCH as an
    exact grid permutation instead (ops/brief._rotate_patches_90), so only
    NUM_FINE tables are needed — the same factoring that made the binary
    describe 4x cheaper (BASELINE.md round 3).
    """
    dy, dx = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
    dx = dx.astype(np.float64)
    dy = dy.astype(np.float64)
    gauss = np.exp(-(dx**2 + dy**2) / (2.0 * (0.5 * PATCH_SIZE) ** 2))
    cell = PATCH_SIZE / GRID
    out = np.zeros((NUM_FINE, PATCH_AREA, GRID * GRID), np.float32)
    for f in range(NUM_FINE):
        th = 2.0 * np.pi * f / NUM_BINS
        c, s = np.cos(th), np.sin(th)
        xr = c * dx + s * dy  # R(-th) p
        yr = -s * dx + c * dy
        u = xr / cell + GRID / 2 - 0.5  # continuous cell coords
        v = yr / cell + GRID / 2 - 0.5
        for ci in range(GRID):
            for cj in range(GRID):
                wu = np.maximum(0.0, 1.0 - np.abs(u - cj))
                wv = np.maximum(0.0, 1.0 - np.abs(v - ci))
                out[f, :, ci * GRID + cj] = (wu * wv * gauss).ravel()
    return out


_SPATIAL = _spatial_weight_tables()


def _patch_gradients(patches: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients of (K, 31, 31) patches; zero at borders
    (border pixels carry near-zero spatial weight anyway)."""
    z = jnp.zeros_like(patches[:, :, :1])
    gx = jnp.concatenate(
        [z, 0.5 * (patches[:, :, 2:] - patches[:, :, :-2]), z], axis=2
    )
    zr = jnp.zeros_like(patches[:, :1, :])
    gy = jnp.concatenate(
        [zr, 0.5 * (patches[:, 2:, :] - patches[:, :-2, :]), zr], axis=1
    )
    return gx, gy


@jax.jit
def sift_describe_patches(
    patches: jnp.ndarray, orientations: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """(K, PATCH_AREA) flat patches + orientations -> (K, 128) f32 descriptors.

    Quadrant-factored: patch rotated by the 90-degree permutation (which also
    rotates its gradients exactly), gradient angles taken relative to the
    remaining fine rotation, spatial cells assigned by the fine bin's
    precomputed table — then ONE MXU contraction builds all cell histograms.
    """
    K = patches.shape[0]
    bins = quantize_angle(orientations)
    quad = bins // NUM_FINE
    fine = bins % NUM_FINE
    prot = _rotate_patches_90(patches, quad).reshape(K, PATCH_SIZE, PATCH_SIZE)
    gx, gy = _patch_gradients(prot)
    mag = jnp.sqrt(gx * gx + gy * gy).reshape(K, PATCH_AREA)
    ang = jnp.arctan2(gy, gx).reshape(K, PATCH_AREA)
    theta_f = fine.astype(jnp.float32) * (2.0 * np.pi / NUM_BINS)
    rel = ang - theta_f[:, None]  # gradient angle in the keypoint frame

    # Soft circular orientation binning: triangular weights, width = 1 bin.
    centers = jnp.arange(ORI_BINS, dtype=jnp.float32) * (2.0 * np.pi / ORI_BINS)
    delta = rel[..., None] - centers  # (K, A, 8)
    delta = jnp.mod(delta + np.pi, 2.0 * np.pi) - np.pi
    wo = jnp.maximum(0.0, 1.0 - jnp.abs(delta) / (2.0 * np.pi / ORI_BINS))
    A = mag[..., None] * wo  # (K, A, 8)

    # All fine bins in one contraction (8x the needed FLOPs but ~1 GFLOP at
    # K=512 — cheaper than materializing a per-keypoint (K, A, 16) selected
    # weight table), then pick each keypoint's own bin.
    S = jnp.asarray(_SPATIAL)  # (F, A, C)
    T = jnp.einsum("fpc,kpo->kfco", S, A)  # (K, F, 16, 8)
    D = jnp.take_along_axis(T, fine[:, None, None, None], axis=1)[:, 0]
    d = D.reshape(K, DIMS)

    # SIFT normalization: L2 -> clamp 0.2 -> L2 (limits single-gradient
    # dominance; makes matching contrast-invariant).
    n1 = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / jnp.maximum(n1, 1e-12)
    d = jnp.minimum(d, 0.2)
    n2 = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / jnp.maximum(n2, 1e-12)
    return jnp.where(valid[:, None], d, 0.0)


@jax.jit
def orient_and_describe_sift(
    image_blurred: jnp.ndarray, keypoints: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused orientation + descriptor from ONE patch extraction.

    Orientation by intensity centroid over the circular disk (the moment
    matvec the ORB family uses — rotation-covariant and far cheaper on TPU
    than a 36-bin gradient histogram); descriptor from the same patch.
    """
    patches = extract_patches(image_blurred.astype(jnp.float32), keypoints)
    w = jnp.stack([jnp.asarray(_MOMENT_WX), jnp.asarray(_MOMENT_WY)], axis=1)
    m = jax.lax.dot(patches, w, preferred_element_type=jnp.float32)
    theta = jnp.where(valid, jnp.arctan2(m[:, 1], m[:, 0]), 0.0)
    return theta, sift_describe_patches(patches, theta, valid)


@partial(
    jax.jit,
    static_argnames=("max_keypoints", "border", "nms", "blur_sigma", "num_levels", "scale_factor"),
)
def detect_and_describe_sift(
    image: jnp.ndarray,
    threshold: float = 10.0,
    max_keypoints: int = 512,
    border: int = PATCH_RADIUS + 4,
    nms: bool = True,
    blur_sigma: float = 2.0,
    num_levels: int = 1,
    scale_factor: float = 1.4,
):
    """Full float-family extraction: FAST detect (optionally pyramidal) ->
    centroid orient -> gradient-histogram describe.

    Same contract as the binary families' extractors
    (ops/descriptors.DescriptorFamily): returns (keypoints (K, 2) at level-0
    scale, scores (K,), descriptors (K, 128) float32, valid (K,)).
    """
    from vision_slam_frontend_tpu.ops.fast import fast_detect
    from vision_slam_frontend_tpu.ops.image import gaussian_blur

    image = image.astype(jnp.float32)
    H, W = image.shape

    if num_levels <= 1:
        keypoints, scores, valid = fast_detect(
            image, threshold=threshold, max_keypoints=max_keypoints, border=border, nms=nms
        )
        blurred = gaussian_blur(image, sigma=blur_sigma)
        _, descriptors = orient_and_describe_sift(blurred, keypoints, valid)
        return keypoints, scores, descriptors, valid

    budget = max_keypoints // num_levels
    budgets = [budget] * (num_levels - 1) + [max_keypoints - budget * (num_levels - 1)]
    kps_all, scores_all, desc_all, valid_all = [], [], [], []
    level_img = image
    scale = 1.0
    for lvl in range(num_levels):
        if lvl > 0:
            scale *= scale_factor
            h = max(int(round(H / scale)), 2 * border + 8)
            w = max(int(round(W / scale)), 2 * border + 8)
            level_img = jax.image.resize(image, (h, w), method="linear")
        kps, scores, valid = fast_detect(
            level_img, threshold=threshold, max_keypoints=budgets[lvl],
            border=border, nms=nms,
        )
        blurred = gaussian_blur(level_img, sigma=blur_sigma)
        _, desc = orient_and_describe_sift(blurred, kps, valid)
        kps_all.append(kps * scale)
        scores_all.append(scores)
        desc_all.append(desc)
        valid_all.append(valid)
    return (
        jnp.concatenate(kps_all, axis=0),
        jnp.concatenate(scores_all, axis=0),
        jnp.concatenate(desc_all, axis=0),
        jnp.concatenate(valid_all, axis=0),
    )
