"""BRISK-class binary descriptors: concentric-ring pattern, 512 bits.

The second registered descriptor family (ops/descriptors.py) — the reference
ships BRISK as one of its six extractor options
(reference: src/slam_frontend.cc:216-220, `cv::BRISK::create()`; enum
src/slam_frontend.h:60-67). This is a TPU-native BRISK-class design, not a
bit-compatible port of OpenCV's kernel:

  - a deterministic concentric-ring sampling pattern (60 points on 5 rings,
    BRISK's geometry) where each ring has its own Gaussian smoothing scale —
    implemented as S pre-blurred images (one per ring) instead of per-sample
    kernels, so smoothing is S separable blurs over the whole image;
  - orientation from long-distance pairs: BRISK's local-gradient sum
    g = sum (p_j - p_i)(I_j - I_i)/||p_j - p_i||^2 is LINEAR in the sample
    vector, so it collapses to a single (K, 60) x (60, 2) matvec against a
    precomputed constant;
  - rotation steering by quantized bins with precomputed integer offsets
    (same scheme as ops/brief.py), sampled via the one-hot patch-matmul
    trick: all bins' samples come out of one (K, S*P^2) x (S*P^2, BINS*60)
    bf16 hi/lo matmul on the MXU — no scattered gathers on the hot path;
  - the 512 shortest pairs (of the 1770 possible) are the descriptor bits,
    packed to (K, 16) uint32; matching runs through the same width-generic
    Hamming machinery as ORB (ops/hamming.py).

Detection is shared with the ORB family (FAST-9, ops/fast.py) — the family
seam swaps the *descriptor*, as in the reference where every extractor option
feeds the same downstream matcher.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vision_slam_frontend_tpu.ops.brief import (
    NUM_BINS,
    NUM_FINE,
    pack_bits,
    quantize_angle,
)

# --- Pattern geometry (fixed constants of the framework) -------------------
# 5 rings: (radius px, #points, smoothing sigma). 60 points total, radii and
# per-ring sigmas follow BRISK's "sigma grows with ring radius" rule (sigma
# proportional to on-ring point spacing).
RINGS = (
    (0.0, 1, 0.6),
    (3.0, 8, 0.8),
    (5.0, 14, 1.0),
    (8.0, 17, 1.5),
    (11.0, 20, 2.0),
)
NUM_POINTS = sum(n for _, n, _ in RINGS)  # 60
NUM_BITS = 512
NUM_WORDS = NUM_BITS // 32  # 16
PATCH_RADIUS = 13  # max ring radius 11 + rotation rounding slack
PATCH_SIZE = 2 * PATCH_RADIUS + 1  # 27
PATCH_AREA = PATCH_SIZE * PATCH_SIZE  # 729
BORDER = PATCH_RADIUS + 4


def _pattern() -> tuple[np.ndarray, np.ndarray]:
    """(60, 2) float32 point offsets (x, y) + (60,) int32 ring index."""
    pts, ring = [], []
    for s, (r, n, _sigma) in enumerate(RINGS):
        for k in range(n):
            # Stagger alternate rings by half a step so points interleave.
            th = 2.0 * np.pi * (k + 0.5 * (s % 2)) / n
            pts.append((r * np.cos(th), r * np.sin(th)))
            ring.append(s)
    return np.asarray(pts, np.float32), np.asarray(ring, np.int32)


_POINTS, _RING = _pattern()


def _pairs() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split all 1770 point pairs by distance.

    Returns (short_pairs (512, 2) int32 — the descriptor bits, shortest
    first; long_pairs (Lp, 2) int32 — orientation; pair_dists for tests).
    BRISK thresholds by distance (delta_max/delta_min); fixing the *count*
    at 512 shortest keeps the descriptor width static and spans the same
    short-distance population.
    """
    idx_a, idx_b, d = [], [], []
    for i in range(NUM_POINTS):
        for j in range(i + 1, NUM_POINTS):
            idx_a.append(i)
            idx_b.append(j)
            d.append(np.linalg.norm(_POINTS[i] - _POINTS[j]))
    idx_a, idx_b, d = np.asarray(idx_a), np.asarray(idx_b), np.asarray(d)
    order = np.argsort(d, kind="stable")
    short = np.stack([idx_a[order[:NUM_BITS]], idx_b[order[:NUM_BITS]]], 1)
    # Long pairs: BRISK's delta_min is ~2/3 of the pattern diameter scale;
    # use the longest third of all pairs.
    long_cut = order[-(len(order) // 3):]
    long = np.stack([idx_a[long_cut], idx_b[long_cut]], 1)
    return short.astype(np.int32), long.astype(np.int32), d[order]


_SHORT_PAIRS, _LONG_PAIRS, _PAIR_DISTS = _pairs()


def _gradient_weights() -> np.ndarray:
    """(60, 2) matrix G with  g = V @ G  the BRISK local-gradient sum.

    For each long pair (i, j): g += (p_j - p_i) * (V_j - V_i) / ||p_j-p_i||^2,
    which is linear in the sample vector V — fold the geometry into G once.
    """
    G = np.zeros((NUM_POINTS, 2), np.float64)
    for i, j in _LONG_PAIRS:
        dp = _POINTS[j] - _POINTS[i]
        w = dp / max(float(dp @ dp), 1e-9)
        G[j] += w
        G[i] -= w
    G /= max(len(_LONG_PAIRS), 1)
    return G.astype(np.float32)


_GRAD_W = _gradient_weights()


def _rotated_indices() -> tuple[np.ndarray, np.ndarray]:
    """Flat (scale-patch) sample indices per rotation bin.

    Returns:
      rot_idx: (NUM_BINS, 60) int32 — index into the concatenated
        (S * PATCH_AREA) per-keypoint multi-scale patch stack: point p of
        ring s at bin b samples plane s at its rotated, rounded offset.
      idx0: (60,) int32 — the unrotated indices (orientation pass).
    """
    def flat(dx, dy, s):
        return (
            s * PATCH_AREA
            + (np.rint(dy).astype(np.int64) + PATCH_RADIUS) * PATCH_SIZE
            + (np.rint(dx).astype(np.int64) + PATCH_RADIUS)
        )

    px, py = _POINTS[:, 0], _POINTS[:, 1]
    idx0 = flat(px, py, _RING).astype(np.int32)
    out = np.zeros((NUM_BINS, NUM_POINTS), np.int32)
    for b in range(NUM_BINS):
        th = 2.0 * np.pi * b / NUM_BINS
        c, s = np.cos(th), np.sin(th)
        out[b] = flat(c * px - s * py, s * px + c * py, _RING)
    return out, idx0


_ROT_IDX, _IDX0 = _rotated_indices()


def _extract_multiscale_patches(image: jnp.ndarray, keypoints: jnp.ndarray) -> jnp.ndarray:
    """(K, S * PATCH_AREA) stacked patches, one plane per ring sigma.

    S separable whole-image blurs + S coalesced slab-gathers (the same
    extract_patches layout ops/brief.py uses; CLAUDE.md perf rule: slab
    gathers beat per-sample scattered gathers).
    """
    from vision_slam_frontend_tpu.ops.image import gaussian_blur

    H, W = image.shape
    K = keypoints.shape[0]
    kx = jnp.clip(
        jnp.round(keypoints[:, 0]).astype(jnp.int32) - PATCH_RADIUS,
        0, W - PATCH_SIZE,
    )
    ky = jnp.clip(
        jnp.round(keypoints[:, 1]).astype(jnp.int32) - PATCH_RADIUS,
        0, H - PATCH_SIZE,
    )
    S = len(RINGS)

    # ONE slab gather over the channel-stacked blur pyramid instead of S
    # separate gathers: the gather is transaction-bound, so packing all S
    # planes into each 27-row slice multiplies the bytes per transaction by S
    # (same trick as brief.orient_and_describe; measured win: BASELINE.md
    # round 3).
    sigmas = {sig: gaussian_blur(image, sigma=sig) for sig in {s for _, _, s in RINGS}}

    from vision_slam_frontend_tpu.ops.brief import _use_pallas_patches

    if _use_pallas_patches(K, S * image.size * 4):
        # VMEM-resident extraction (zero HBM transactions per patch); plane-
        # major output matches the flat layout directly.
        from vision_slam_frontend_tpu.ops.pallas_kernels import (
            extract_patches_vmem,
        )

        planes = jnp.stack([sigmas[RINGS[s][2]] for s in range(S)])  # (S, H, W)
        return extract_patches_vmem(planes, keypoints, ps=PATCH_SIZE).reshape(
            K, S * PATCH_AREA
        )

    stacked = jnp.stack([sigmas[RINGS[s][2]] for s in range(S)], axis=-1)  # (H, W, S)

    def one(sy, sx):
        return jax.lax.dynamic_slice(stacked, (sy, sx, 0), (PATCH_SIZE, PATCH_SIZE, S))

    patches = jax.vmap(one)(ky, kx)  # (K, 27, 27, S)
    # Flat layout must stay plane-major: s * PATCH_AREA + row * 27 + col.
    return patches.transpose(0, 3, 1, 2).reshape(K, S * PATCH_AREA)


@jax.jit
def brisk_describe(
    image: jnp.ndarray,
    keypoints: jnp.ndarray,
    valid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """BRISK-class descriptors + orientations for all keypoints at once.

    Args:
      image: (H, W) float32 (raw; smoothing is internal, per ring sigma).
      keypoints: (K, 2) float32 (x, y), >= BORDER from the edge when valid.
      valid: (K,) bool.

    Returns:
      (descriptors (K, 16) uint32, orientations (K,) float32 radians).
    """
    patches = _extract_multiscale_patches(image.astype(jnp.float32), keypoints)
    K, F = patches.shape

    # Orientation: unrotated samples -> linear gradient sum -> angle.
    v0 = patches[:, jnp.asarray(_IDX0)]  # (K, 60) constant-index take
    g = v0 @ jnp.asarray(_GRAD_W)  # (K, 2)
    theta = jnp.arctan2(g[:, 1], g[:, 0])
    theta = jnp.where(valid, theta, 0.0)
    bins = quantize_angle(theta)  # (K,)

    # Quadrant-factored rotated sampling (same derivation as ops/brief.py
    # NUM_FINE): rotate each scale plane of the patch by the bin's 90-degree
    # quadrant — an exact grid permutation, so
    # rint(R(90c + f) p) == R(90c) rint(R(f) p) and the bits are identical to
    # the all-bins formulation — then one one-hot matmul over only the
    # NUM_FINE fine bins (4x less MXU work + 4x smaller intermediate).
    quad = bins // NUM_FINE
    fine = bins % NUM_FINE
    S = len(RINGS)
    p = patches.reshape(K, S, PATCH_SIZE, PATCH_SIZE)
    p1 = jnp.flip(p, axis=3).transpose(0, 1, 3, 2)  # P1[i,j] = P[j, n-1-i]
    p2 = jnp.flip(p, axis=(2, 3))
    p3 = jnp.flip(p.transpose(0, 1, 3, 2), axis=3)  # P3[i,j] = P[n-1-j, i]
    qd = quad[:, None, None, None]
    selp = jnp.where(qd == 1, p1, p)
    selp = jnp.where(qd == 2, p2, selp)
    selp = jnp.where(qd == 3, p3, selp)
    prot = selp.reshape(K, F)

    sel = jnp.asarray(_ROT_IDX[:NUM_FINE].reshape(-1))  # (NUM_FINE*60,)
    pix = jnp.arange(F, dtype=jnp.int32)[:, None]
    D = (pix == sel[None, :]).astype(jnp.bfloat16)  # (F, NUM_FINE*60)
    hi = prot.astype(jnp.bfloat16)
    lo = (prot - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda x: jax.lax.dot(x, D, preferred_element_type=jnp.float32)
    vals = (dot(hi) + dot(lo)).reshape(K, NUM_FINE, NUM_POINTS)
    mine = jnp.take_along_axis(vals, fine[:, None, None], axis=1)[:, 0, :]  # (K, 60)

    a = jnp.asarray(_SHORT_PAIRS[:, 0])
    b = jnp.asarray(_SHORT_PAIRS[:, 1])
    bits = (mine[:, a] < mine[:, b]).astype(jnp.uint32)  # (K, 512)
    packed = pack_bits(bits)
    return jnp.where(valid[:, None], packed, jnp.uint32(0)), theta


@partial(
    jax.jit,
    static_argnames=("max_keypoints", "border", "nms", "blur_sigma", "num_levels", "scale_factor"),
)
def detect_and_describe_brisk(
    image: jnp.ndarray,
    threshold: float = 10.0,
    max_keypoints: int = 512,
    border: int = BORDER,
    nms: bool = True,
    blur_sigma: float = 2.0,
    num_levels: int = 1,
    scale_factor: float = 1.4,
):
    """Registry-shaped extractor: FAST detect -> BRISK-class describe.

    Same signature/contract as ops/brief.detect_and_describe (the ORB
    family); `blur_sigma` is accepted for signature parity but unused — BRISK
    smoothing is per-ring. Multi-level operation mirrors the ORB pyramid:
    per-level budgets, keypoints reported at level-0 scale.

    Returns (keypoints (K,2), scores (K,), descriptors (K,16) uint32,
    valid (K,)).
    """
    from vision_slam_frontend_tpu.ops.fast import fast_detect

    del blur_sigma  # per-ring sigmas; kept for registry signature parity
    image = image.astype(jnp.float32)
    H, W = image.shape
    border = max(border, BORDER)

    if num_levels <= 1:
        kps, scores, valid = fast_detect(
            image, threshold=threshold, max_keypoints=max_keypoints,
            border=border, nms=nms,
        )
        desc, _theta = brisk_describe(image, kps, valid)
        return kps, scores, desc, valid

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
        desc, _theta = brisk_describe(level_img, kps, valid)
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
