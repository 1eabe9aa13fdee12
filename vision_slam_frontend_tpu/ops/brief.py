"""Rotation-steered BRIEF (ORB-class) binary descriptors, batched over keypoints.

TPU-native replacement for the descriptor stage of cv::ORB / cv::AKAZE
(reference: src/slam_frontend.cc:193-220 extractor construction, :274-277
detectAndCompute). Design:

  - orientation by intensity centroid over a circular 31x31 patch
    (the ORB "oriented FAST" moment method), computed as one batched gather
    + masked reduction over all K keypoints at once;
  - steered BRIEF: a fixed 256-pair sampling pattern (our own deterministic
    Gaussian pattern per the BRIEF paper — NOT OpenCV's learned table),
    rotated per-keypoint by the orientation and sampled with bilinear
    interpolation from a Gaussian-blurred image;
  - bits packed into 8 uint32 words per descriptor for compact storage, and
    unpackable to a (K, 256) {0,1} matrix for MXU matmul-based matching
    (see ops/hamming.py).

Everything is fixed-shape: K keypoints in, (K, 8) uint32 out, with a validity
mask passed through. Invalid keypoints produce zero descriptors.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

PATCH_RADIUS = 15  # 31x31 patch, as in ORB
NUM_BITS = 256
NUM_WORDS = NUM_BITS // 32


def brief_pattern(seed: int = 7, num_bits: int = NUM_BITS, radius: int = PATCH_RADIUS) -> np.ndarray:
    """Deterministic BRIEF sampling pattern: (num_bits, 2, 2) float32.

    pattern[i, 0] and pattern[i, 1] are the (x, y) offsets of the i-th
    comparison pair, drawn iid from N(0, (radius/2.5)^2) and clipped to the
    patch (BRIEF paper's G-II sampling). Generated once at import — a fixed
    constant of the framework, like ORB's learned table is for OpenCV.
    """
    rng = np.random.RandomState(seed)
    sigma = radius / 2.5
    pts = rng.normal(0.0, sigma, size=(num_bits, 2, 2))
    pts = np.clip(pts, -(radius - 2), radius - 2)
    return pts.astype(np.float32)


_PATTERN = brief_pattern()


def _circular_offsets(radius: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Integer (dy, dx) offsets of the circular patch and their mask weights."""
    dy, dx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    mask = (dx * dx + dy * dy) <= radius * radius
    return dy.ravel(), dx.ravel(), mask.ravel().astype(np.float32)


_MOMENT_DY, _MOMENT_DX, _MOMENT_MASK = _circular_offsets(PATCH_RADIUS)


@jax.jit
def compute_orientations(image: jnp.ndarray, keypoints: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint: theta = atan2(m01, m10).

    Args:
      image: (H, W) float32 (unblurred, like ORB's moment computation).
      keypoints: (K, 2) float32 (x, y); must be >= PATCH_RADIUS from the edge
        for valid entries (the detector's `border` guarantees this).
      valid: (K,) bool.

    Returns:
      (K,) float32 angle in radians (0 for invalid keypoints).

    TPU-native formulation: square-patch moments for EVERY pixel via
    separable 1-D filters (m10 = colsum(ones) o rowfilter(x-weights),
    m01 transposed), each implemented as statically-unrolled shifted adds —
    pure VPU elementwise work that XLA fuses, far faster here than
    lax.conv's lowering for skinny kernels. The square patch (vs ORB's
    circle) loses nothing in practice: orientation biases are shared between
    the frames being matched, so steering stays consistent.
    """
    H, W = image.shape
    r = PATCH_RADIUS

    def filt(x, axis, ramp: bool):
        """Sum of +-r shifts along `axis`, optionally weighted by offset."""
        pad_width = [(0, 0), (0, 0)]
        pad_width[axis] = (r, r)
        padded = jnp.pad(x, pad_width)
        n = x.shape[axis]
        acc = None
        for d in range(-r, r + 1):
            w = float(d) if ramp else 1.0
            if w == 0.0:
                continue
            sl = [slice(None), slice(None)]
            sl[axis] = slice(r + d, r + d + n)
            term = padded[tuple(sl)] * w if w != 1.0 else padded[tuple(sl)]
            acc = term if acc is None else acc + term
        return acc

    m10_map = filt(filt(image, axis=1, ramp=True), axis=0, ramp=False)
    m01_map = filt(filt(image, axis=0, ramp=True), axis=1, ramp=False)

    kx = keypoints[..., 0].astype(jnp.int32)
    ky = keypoints[..., 1].astype(jnp.int32)
    flat_idx = jnp.clip(ky, 0, H - 1) * W + jnp.clip(kx, 0, W - 1)
    m10 = m10_map.reshape(-1)[flat_idx]
    m01 = m01_map.reshape(-1)[flat_idx]
    theta = jnp.arctan2(m01, m10)
    return jnp.where(valid, theta, 0.0)


def _bilinear_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation at float coords; clamped to the image."""
    H, W = image.shape
    flat = image.reshape(-1)
    x = jnp.clip(x, 0.0, W - 1.000001)
    y = jnp.clip(y, 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    v00 = flat[y0 * W + x0]
    v01 = flat[y0 * W + x1]
    v10 = flat[y1 * W + x0]
    v11 = flat[y1 * W + x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(K, 256) {0,1} -> (K, 8) uint32, little-endian within each word."""
    K = bits.shape[0]
    b = bits.astype(jnp.uint32).reshape(K, NUM_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(K, 8) uint32 -> (K, 256) {0,1} in `dtype` (float for MXU matmul)."""
    K = packed.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(K, NUM_BITS).astype(dtype)


@jax.jit
def brief_describe(
    image_blurred: jnp.ndarray,
    keypoints: jnp.ndarray,
    orientations: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Steered-BRIEF descriptors for all keypoints at once.

    Args:
      image_blurred: (H, W) float32, pre-smoothed (see ops/image.gaussian_blur).
      keypoints: (K, 2) float32 (x, y).
      orientations: (K,) float32 radians (from compute_orientations).
      valid: (K,) bool.

    Returns:
      (K, 8) uint32 packed 256-bit descriptors; zeros for invalid keypoints.
    """
    pattern = jnp.asarray(_PATTERN)  # (256, 2, 2) -- (x, y) offsets
    c = jnp.cos(orientations)
    s = jnp.sin(orientations)
    # Rotate the pattern per keypoint: (K, 256, 2 points, 2 coords)
    px = pattern[None, :, :, 0]  # (1, 256, 2)
    py = pattern[None, :, :, 1]
    rx = c[:, None, None] * px - s[:, None, None] * py
    ry = s[:, None, None] * px + c[:, None, None] * py
    sx = keypoints[:, None, None, 0] + rx  # (K, 256, 2)
    sy = keypoints[:, None, None, 1] + ry
    # Nearest-integer sampling (what OpenCV ORB does — cvRound on the rotated
    # offsets): one gather instead of bilinear's four. On the blurred image
    # the quality difference is negligible and it's ~4x cheaper on TPU, where
    # gathers dominate this kernel.
    H, W = image_blurred.shape
    xi = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, H - 1)
    vals = image_blurred.reshape(-1)[yi * W + xi]  # (K, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (K, 256)
    packed = pack_bits(bits)
    return jnp.where(valid[:, None], packed, jnp.uint32(0))


@partial(
    jax.jit,
    static_argnames=("max_keypoints", "border", "nms", "blur_sigma", "num_levels", "scale_factor"),
)
def detect_and_describe(
    image: jnp.ndarray,
    threshold: float = 10.0,
    max_keypoints: int = 512,
    border: int = PATCH_RADIUS + 4,
    nms: bool = True,
    blur_sigma: float = 2.0,
    num_levels: int = 1,
    scale_factor: float = 1.4,
):
    """Full feature extraction: FAST detect -> orient -> steered BRIEF,
    optionally over an image pyramid for scale covariance.

    The TPU-native equivalent of the reference's
    `descriptor_extractor_->detectAndCompute` (src/slam_frontend.cc:274-277);
    `num_levels > 1` mirrors ORB's pyramid (the reference configures 50
    levels at factor 1.04, src/slam_frontend.cc:205-207; we default to fewer,
    coarser levels — each level is a static-shape detect+describe pass, with
    a fixed per-level keypoint budget so shapes stay jit-stable).

    Returns (keypoints (K,2) at level-0 scale, scores (K,),
    descriptors (K,8) uint32, valid (K,)).
    """
    from vision_slam_frontend_tpu.ops.fast import fast_detect
    from vision_slam_frontend_tpu.ops.image import gaussian_blur

    image = image.astype(jnp.float32)
    H, W = image.shape

    if num_levels <= 1:
        keypoints, scores, valid = fast_detect(
            image, threshold=threshold, max_keypoints=max_keypoints, border=border, nms=nms
        )
        orientations = compute_orientations(image, keypoints, valid)
        blurred = gaussian_blur(image, sigma=blur_sigma)
        descriptors = brief_describe(blurred, keypoints, orientations, valid)
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
        orientations = compute_orientations(level_img, kps, valid)
        blurred = gaussian_blur(level_img, sigma=blur_sigma)
        desc = brief_describe(blurred, kps, orientations, valid)
        kps_all.append(kps * scale)  # back to level-0 pixel coords
        scores_all.append(scores)
        desc_all.append(desc)
        valid_all.append(valid)
    return (
        jnp.concatenate(kps_all, axis=0),
        jnp.concatenate(scores_all, axis=0),
        jnp.concatenate(desc_all, axis=0),
        jnp.concatenate(valid_all, axis=0),
    )
