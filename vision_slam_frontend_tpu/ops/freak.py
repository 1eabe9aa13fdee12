"""FREAK-class binary descriptors: retinal sampling pattern, 512 bits.

Closes the FREAK entry of the reference's six-way extractor switch
(reference: src/slam_frontend.cc:235-239, `cv::xfeatures2d::FREAK::create()`
over a FAST detector, enum src/slam_frontend.h:60-67; built behind the
OFF-by-default USE_XFEATURES flag, CMakeLists.txt:45-49). A TPU-native
FREAK-class design, not a bit-compatible port of OpenCV's kernel.

What makes FREAK FREAK (vs BRISK's uniform rings, ops/brisk.py):

  - a RETINAL pattern: receptive fields on exponentially-spaced concentric
    rings — dense small fields near the fovea (center), sparse large fields
    at the periphery — with field size proportional to eccentricity and
    heavy OVERLAP between neighbouring fields (sigma ~ 0.45 r vs BRISK's
    disjoint-field ~0.25 r spacing);
  - a COARSE-TO-FINE pair cascade: the 512 descriptor bits are ordered from
    the largest (peripheral, coarse) field pairs to the smallest (foveal,
    fine) ones — the paper's saccadic-search ordering, which also makes the
    leading words of the packed descriptor the coarse pre-filter;
  - orientation from SYMMETRIC opposite-field pairs (the paper's 45-pair
    scheme): g = sum (I_a - I_b)(p_a - p_b)/||p_a - p_b||, linear in the
    sample vector, so it folds into one (K, 43) x (43, 2) matvec.

The TPU execution machinery is deliberately the same proven design as
ops/brisk.py (this is the framework's ring-pattern engine, specialized by
constants): per-sigma whole-image separable blurs -> ONE channel-stacked
slab gather per keypoint -> quadrant-factored one-hot rotation matmul on
the MXU -> pair comparisons -> bit packing; matching runs through the
width-generic Hamming machinery (ops/hamming.py), and detection is the
shared FAST-9 detector (ops/fast.py) exactly as the reference's FREAK
branch pairs FREAK with FAST.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vision_slam_frontend_tpu.ops.brief import (
    NUM_FINE,
    pack_bits,
    quantize_angle,
)

# --- Retinal pattern geometry (fixed constants of the framework) -----------
# 1 foveal center + 7 rings x 6 points, radii in geometric progression
# (factor 0.7 from the periphery in), field sigma ~ 0.45 * radius (clamped):
# overlapping fields, finest at the fovea — the retinal layout.
_N_RINGS = 7
_PTS_PER_RING = 6
_R_OUTER = 11.0
_R_FACTOR = 0.7
RINGS = tuple(
    (
        _R_OUTER * _R_FACTOR**k,
        _PTS_PER_RING,
        max(0.45 * _R_OUTER * _R_FACTOR**k, 0.6),
    )
    for k in range(_N_RINGS)
) + ((0.0, 1, 0.6),)
NUM_POINTS = _N_RINGS * _PTS_PER_RING + 1  # 43
NUM_BITS = 512
NUM_WORDS = NUM_BITS // 32  # 16
PATCH_RADIUS = 13  # outer radius 11 + rotation rounding slack
PATCH_SIZE = 2 * PATCH_RADIUS + 1  # 27
PATCH_AREA = PATCH_SIZE * PATCH_SIZE  # 729
BORDER = PATCH_RADIUS + 4


def _pattern() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(43, 2) float32 offsets (x, y), (43,) int32 sigma-plane index,
    (43,) float32 per-point sigma."""
    pts, plane, sig = [], [], []
    sigmas: list[float] = []
    for s, (r, n, sigma) in enumerate(RINGS):
        if sigma not in sigmas:
            sigmas.append(sigma)
        for k in range(n):
            # Stagger alternate rings by half a step (interleaved saccades).
            th = 2.0 * np.pi * (k + 0.5 * (s % 2)) / n
            pts.append((r * np.cos(th), r * np.sin(th)))
            plane.append(sigmas.index(sigma))
            sig.append(sigma)
    return (
        np.asarray(pts, np.float32),
        np.asarray(plane, np.int32),
        np.asarray(sig, np.float32),
    )


_POINTS, _PLANE, _SIGMA = _pattern()
_SIGMAS = tuple(dict.fromkeys(s for _, _, s in RINGS))  # unique, ring order
NUM_PLANES = len(_SIGMAS)


def _pairs() -> tuple[np.ndarray, np.ndarray]:
    """Coarse-to-fine descriptor pairs + symmetric orientation pairs.

    Descriptor: all C(43, 2) = 903 pairs sorted by DECREASING combined
    field size (sigma_i + sigma_j, ties by decreasing pair distance): the
    512 coarsest-first pairs are the bits — the retinal cascade ordering.
    Orientation: opposite points within each ring (offset n/2) — the
    paper's symmetric-pair scheme (21 pairs here), whose gradient sum is
    rotation-covariant by construction.
    """
    idx_a, idx_b, key = [], [], []
    for i in range(NUM_POINTS):
        for j in range(i + 1, NUM_POINTS):
            idx_a.append(i)
            idx_b.append(j)
            d = float(np.linalg.norm(_POINTS[i] - _POINTS[j]))
            key.append((-(float(_SIGMA[i]) + float(_SIGMA[j])), -d))
    order = sorted(range(len(key)), key=lambda q: key[q])
    idx_a, idx_b = np.asarray(idx_a), np.asarray(idx_b)
    bits = np.stack(
        [idx_a[order[:NUM_BITS]], idx_b[order[:NUM_BITS]]], 1
    ).astype(np.int32)
    orient = []
    base = 0
    for r, n, _sigma in RINGS:
        if n >= 2 and r > 0:
            for k in range(n // 2):
                orient.append((base + k, base + k + n // 2))
        base += n
    return bits, np.asarray(orient, np.int32)


_BIT_PAIRS, _ORIENT_PAIRS = _pairs()


def _gradient_weights() -> np.ndarray:
    """(43, 2) matrix G with g = V @ G the FREAK orientation gradient sum
    over the symmetric pairs: g = sum (V_a - V_b)(p_a - p_b)/||p_a - p_b||."""
    G = np.zeros((NUM_POINTS, 2), np.float64)
    for a, b in _ORIENT_PAIRS:
        dp = _POINTS[a] - _POINTS[b]
        w = dp / max(float(np.linalg.norm(dp)), 1e-9)
        G[a] += w
        G[b] -= w
    G /= max(len(_ORIENT_PAIRS), 1)
    return G.astype(np.float32)


_GRAD_W = _gradient_weights()


def _rotated_indices() -> tuple[np.ndarray, np.ndarray]:
    """Flat (plane-stacked) sample indices per fine-rotation bin (same
    quadrant-factored scheme as ops/brief.py / ops/brisk.py)."""

    def flat(dx, dy, s):
        return (
            s * PATCH_AREA
            + (np.rint(dy).astype(np.int64) + PATCH_RADIUS) * PATCH_SIZE
            + (np.rint(dx).astype(np.int64) + PATCH_RADIUS)
        )

    px, py = _POINTS[:, 0], _POINTS[:, 1]
    idx0 = flat(px, py, _PLANE).astype(np.int32)
    out = np.zeros((NUM_FINE, NUM_POINTS), np.int32)
    for b in range(NUM_FINE):
        th = 2.0 * np.pi * b / (NUM_FINE * 4)
        c, s = np.cos(th), np.sin(th)
        out[b] = flat(c * px - s * py, s * px + c * py, _PLANE)
    return out, idx0


_ROT_IDX, _IDX0 = _rotated_indices()


def _extract_retina_patches(image: jnp.ndarray, keypoints: jnp.ndarray) -> jnp.ndarray:
    """(K, NUM_PLANES * PATCH_AREA) stacked patches, one plane per field
    sigma — the channel-stacked slab-gather layout (CLAUDE.md perf rule)."""
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
    blurred = {sig: gaussian_blur(image, sigma=sig) for sig in _SIGMAS}

    from vision_slam_frontend_tpu.ops.brief import _use_pallas_patches

    if _use_pallas_patches(K, NUM_PLANES * image.size * 4):
        from vision_slam_frontend_tpu.ops.pallas_kernels import (
            extract_patches_vmem,
        )

        planes = jnp.stack([blurred[s] for s in _SIGMAS])  # (NP, H, W)
        return extract_patches_vmem(planes, keypoints, ps=PATCH_SIZE).reshape(
            K, NUM_PLANES * PATCH_AREA
        )

    stacked = jnp.stack([blurred[s] for s in _SIGMAS], axis=-1)  # (H, W, NP)

    def one(sy, sx):
        return jax.lax.dynamic_slice(
            stacked, (sy, sx, 0), (PATCH_SIZE, PATCH_SIZE, NUM_PLANES)
        )

    patches = jax.vmap(one)(ky, kx)  # (K, 27, 27, NP)
    return patches.transpose(0, 3, 1, 2).reshape(K, NUM_PLANES * PATCH_AREA)


@jax.jit
def freak_describe(
    image: jnp.ndarray,
    keypoints: jnp.ndarray,
    valid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FREAK-class descriptors + orientations for all keypoints at once.

    Returns (descriptors (K, 16) uint32 — coarse-to-fine bit order,
    orientations (K,) float32 radians).
    """
    patches = _extract_retina_patches(image.astype(jnp.float32), keypoints)
    K, F = patches.shape

    # Orientation: unrotated retinal samples -> symmetric-pair gradient sum.
    v0 = patches[:, jnp.asarray(_IDX0)]  # (K, 43)
    g = v0 @ jnp.asarray(_GRAD_W)  # (K, 2)
    theta = jnp.arctan2(g[:, 1], g[:, 0])
    theta = jnp.where(valid, theta, 0.0)
    bins = quantize_angle(theta)

    # Quadrant-factored rotated sampling (ops/brief.py NUM_FINE derivation).
    quad = bins // NUM_FINE
    fine = bins % NUM_FINE
    p = patches.reshape(K, NUM_PLANES, PATCH_SIZE, PATCH_SIZE)
    p1 = jnp.flip(p, axis=3).transpose(0, 1, 3, 2)
    p2 = jnp.flip(p, axis=(2, 3))
    p3 = jnp.flip(p.transpose(0, 1, 3, 2), axis=3)
    qd = quad[:, None, None, None]
    selp = jnp.where(qd == 1, p1, p)
    selp = jnp.where(qd == 2, p2, selp)
    selp = jnp.where(qd == 3, p3, selp)
    prot = selp.reshape(K, F)

    sel = jnp.asarray(_ROT_IDX.reshape(-1))  # (NUM_FINE*43,)
    pix = jnp.arange(F, dtype=jnp.int32)[:, None]
    D = (pix == sel[None, :]).astype(jnp.bfloat16)
    hi = prot.astype(jnp.bfloat16)
    lo = (prot - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda x: jax.lax.dot(x, D, preferred_element_type=jnp.float32)
    vals = (dot(hi) + dot(lo)).reshape(K, NUM_FINE, NUM_POINTS)
    mine = jnp.take_along_axis(vals, fine[:, None, None], axis=1)[:, 0, :]

    a = jnp.asarray(_BIT_PAIRS[:, 0])
    b = jnp.asarray(_BIT_PAIRS[:, 1])
    bits = (mine[:, a] < mine[:, b]).astype(jnp.uint32)  # (K, 512)
    packed = pack_bits(bits)
    return jnp.where(valid[:, None], packed, jnp.uint32(0)), theta


@partial(
    jax.jit,
    static_argnames=("max_keypoints", "border", "nms", "blur_sigma", "num_levels", "scale_factor"),
)
def detect_and_describe_freak(
    image: jnp.ndarray,
    threshold: float = 10.0,
    max_keypoints: int = 512,
    border: int = BORDER,
    nms: bool = True,
    blur_sigma: float = 2.0,
    num_levels: int = 1,
    scale_factor: float = 1.4,
):
    """Registry-shaped extractor: FAST detect -> FREAK-class describe
    (the reference's FREAK branch is FAST + FREAK, slam_frontend.cc:235-239).

    Returns (keypoints (K,2), scores (K,), descriptors (K,16) uint32,
    valid (K,)).
    """
    from vision_slam_frontend_tpu.ops.fast import fast_detect

    del blur_sigma  # per-field sigmas; kept for registry signature parity
    image = image.astype(jnp.float32)
    H, W = image.shape
    border = max(border, BORDER)

    if num_levels <= 1:
        kps, scores, valid = fast_detect(
            image, threshold=threshold, max_keypoints=max_keypoints,
            border=border, nms=nms,
        )
        desc, _theta = freak_describe(image, kps, valid)
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
        desc, _theta = freak_describe(level_img, kps, valid)
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
