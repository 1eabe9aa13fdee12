"""AKAZE-class descriptor family: nonlinear scale space + MLDB binary bits.

The reference's DEFAULT extractor is cv::AKAZE (reference:
src/slam_frontend.cc:193-202, the `descriptor_extract_type_ == AKAZE` branch);
this is the TPU-native third family behind the extractor-switch seam
(ops/descriptors.py) — a class-equivalent re-design, not an OpenCV port:

  - **Nonlinear diffusion scale space** (the thing that makes AKAZE AKAZE):
    Perona-Malik g2 conductivity `g = 1/(1 + |grad L|^2 / k^2)` evolved with
    statically-unrolled explicit diffusion steps — pure shifted-add/multiply
    stencils on the VPU (CLAUDE.md perf rule: unrolled shifts beat lax.conv
    for skinny kernels). Edges diffuse slowly, flat regions smooth fast, so
    corners stay localized across scales where a Gaussian pyramid blurs them.
    The contrast scale k is the 70th percentile of base-level gradient
    magnitude (AKAZE's rule), computed on-device with static shapes.
  - **Hessian-determinant detector**: per level, sigma^4-normalized
    `Lxx*Lyy - Lxy^2` from central-difference stencils, strict 3x3 NMS,
    per-level top-K budgets, sub-pixel quadratic refinement — the same
    static-shape selection machinery as ops/fast.py.
  - **MLDB-style descriptor**: means of three channels (L, and the
    gradient rotated into the feature frame) over 2x2 + 3x3 + 4x4 cell grids
    of the oriented disk patch; all within-grid cell pairs compared ->
    486 bits, padded to 512 in 16 uint32 words. Cell means for ALL rotation
    bins come out of one (K, 961) x (961, BINS*29) bf16 hi/lo matmul on the
    MXU (the one-hot-weights trick from ops/brief.py), so rotation steering
    costs one matmul, not scattered gathers.
  - Orientation: disk-Gaussian-weighted mean gradient, one (K, 961) x
    (961, 2) matvec per axis channel.

Matching runs through the width-generic Hamming machinery (ops/hamming.py)
exactly like BRISK (16 words). Parity target is capability-level (rotation
robustness, repeatability, trajectory accuracy), not OpenCV bit-equality —
per SURVEY.md's "numerical parity" note.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vision_slam_frontend_tpu.ops.brief import (
    PATCH_AREA,
    PATCH_RADIUS,
    PATCH_SIZE,
    NUM_BINS,
    extract_patches,
    pack_bits,
    quantize_angle,
)

SIGMA0 = 1.6  # base evolution scale (AKAZE's soffset)
TAU = 0.20  # explicit diffusion step (stable for the 4-neighbor stencil)
GRIDS = (2, 3, 4)  # MLDB cell grids
NUM_CELLS = sum(g * g for g in GRIDS)  # 29
NUM_CHANNELS = 3  # L, Lx', Ly'
NUM_BITS = 512  # 486 real pair bits + 26 zero pad -> 16 words
NUM_WORDS = NUM_BITS // 32
BORDER = PATCH_RADIUS + 4
# Detector response gain: maps the registry's shared `threshold` knob
# (FAST intensity units, config default ~10-12) onto the Hessian-determinant
# response scale. det(H) has intensity^2/length^4 units; on 0-255 imagery a
# sigma^4-normalized corner response is O(1e3-1e5), so response_thresh =
# threshold^2 keeps the same "weak corners out" role at the same knob value.
THRESHOLD_GAIN = 1.0  # applied to threshold**2


def _cell_weights() -> np.ndarray:
    """(PATCH_AREA, NUM_BINS * NUM_CELLS) f32 rotated cell-mean weights.

    Column (b, c) holds the averaging weights over patch pixels whose
    coordinates, rotated by -theta_b into the feature's canonical frame,
    fall in cell c. Only pixels inside the inscribed disk participate
    (a rotated disk is the same disk, so every bin sees identical support).
    """
    R = PATCH_RADIUS
    dy, dx = np.mgrid[-R : R + 1, -R : R + 1]
    dx = dx.ravel().astype(np.float64)
    dy = dy.ravel().astype(np.float64)
    disk = dx * dx + dy * dy <= R * R
    out = np.zeros((PATCH_AREA, NUM_BINS * NUM_CELLS), np.float64)
    for b in range(NUM_BINS):
        th = 2.0 * np.pi * b / NUM_BINS
        c, s = np.cos(th), np.sin(th)
        # Rotate the pixel offset INTO the canonical frame (by -theta).
        xr = c * dx + s * dy
        yr = -s * dx + c * dy
        base = 0
        for g in GRIDS:
            # Cell index of each pixel for an n x n grid over [-R, R].
            cw = 2.0 * R / g
            cx = np.clip(((xr + R) / cw).astype(np.int64), 0, g - 1)
            cy = np.clip(((yr + R) / cw).astype(np.int64), 0, g - 1)
            cell = cy * g + cx
            for cc in range(g * g):
                m = disk & (cell == cc)
                n = m.sum()
                if n:
                    out[m, b * NUM_CELLS + base + cc] = 1.0 / n
            base += g * g
    return out.astype(np.float32)


_CELL_W = _cell_weights()


def _cell_pairs() -> np.ndarray:
    """(162, 2) int32 within-grid cell index pairs (global cell ids)."""
    pairs = []
    base = 0
    for g in GRIDS:
        n = g * g
        for i in range(n):
            for j in range(i + 1, n):
                pairs.append((base + i, base + j))
        base += n
    return np.asarray(pairs, np.int32)


_PAIRS = _cell_pairs()  # 6 + 36 + 120 = 162


def _orientation_weights() -> np.ndarray:
    """(PATCH_AREA,) Gaussian disk weights for the mean-gradient orientation."""
    R = PATCH_RADIUS
    dy, dx = np.mgrid[-R : R + 1, -R : R + 1]
    r2 = (dx * dx + dy * dy).astype(np.float64)
    w = np.exp(-r2 / (2.0 * (0.5 * R) ** 2)) * (r2 <= R * R)
    return (w / w.sum()).ravel().astype(np.float32)


_ORI_W = _orientation_weights()


# ---------------------------------------------------------------------------
# Nonlinear scale space
# ---------------------------------------------------------------------------


def _shift(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Neighbor view with Neumann (edge-replicate) boundary."""
    H, W = a.shape
    p = jnp.pad(a, 1, mode="edge")
    return p[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]


def _grad_central(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    gx = 0.5 * (_shift(a, 0, 1) - _shift(a, 0, -1))
    gy = 0.5 * (_shift(a, 1, 0) - _shift(a, -1, 0))
    return gx, gy


def _diffusion_step(L: jnp.ndarray, k2: jnp.ndarray, tau: float) -> jnp.ndarray:
    """One explicit Perona-Malik step: L += tau * div(g(|grad L|) grad L).

    g2 conductivity, half-point conductivities by neighbor averaging — the
    standard 4-neighbor discretization, all shifted elementwise VPU ops.
    """
    gx, gy = _grad_central(L)
    g = 1.0 / (1.0 + (gx * gx + gy * gy) / k2)
    flux = (
        (_shift(g, 0, 1) + g) * (_shift(L, 0, 1) - L)
        + (_shift(g, 0, -1) + g) * (_shift(L, 0, -1) - L)
        + (_shift(g, 1, 0) + g) * (_shift(L, 1, 0) - L)
        + (_shift(g, -1, 0) + g) * (_shift(L, -1, 0) - L)
    )
    return L + (0.5 * tau) * flux


def _contrast_k2(L0: jnp.ndarray) -> jnp.ndarray:
    """k^2 from the 70th percentile of gradient magnitude (AKAZE's kcontrast).

    jnp.percentile over the interior is one static-shape sort — fine off the
    per-keyframe hot path's inner loop (runs once per image)."""
    gx, gy = _grad_central(L0)
    mag = jnp.sqrt(gx * gx + gy * gy)[3:-3, 3:-3]
    k = jnp.percentile(mag, 70.0)
    k = jnp.maximum(k, 1e-3)
    return k * k


def evolution_sigmas(num_levels: int, scale_factor: float) -> list[float]:
    """Per-level evolution scales: sigma_i = SIGMA0 * scale_factor^(i+1)."""
    return [SIGMA0 * (scale_factor ** (i + 1)) for i in range(num_levels)]


def build_scale_space(
    image: jnp.ndarray, num_levels: int, scale_factor: float
) -> list[jnp.ndarray]:
    """Full-resolution nonlinear scale space: `num_levels` evolution images.

    Octaveless (no subsampling) so every level shares one static shape —
    keypoint coords never need rescaling and the per-level programs are
    identical for XLA. Step counts are static Python ints derived from the
    (static) sigma ladder, so the whole evolution unrolls into one fused
    stencil program.
    """
    from vision_slam_frontend_tpu.ops.image import gaussian_blur

    L = gaussian_blur(image.astype(jnp.float32), sigma=SIGMA0)
    k2 = _contrast_k2(L)
    levels = []
    t_prev = 0.5 * SIGMA0 * SIGMA0
    for sigma in evolution_sigmas(num_levels, scale_factor):
        t_next = 0.5 * sigma * sigma
        n_steps = max(1, int(math.ceil((t_next - t_prev) / TAU)))
        tau = (t_next - t_prev) / n_steps
        for _ in range(n_steps):
            L = _diffusion_step(L, k2, tau)
        levels.append(L)
        t_prev = t_next
    return levels


# ---------------------------------------------------------------------------
# Hessian-determinant detection
# ---------------------------------------------------------------------------


def hessian_response(L: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """sigma^4-normalized determinant-of-Hessian response map."""
    Lx, Ly = _grad_central(L)
    Lxx, _ = _grad_central(Lx)
    _, Lyy = _grad_central(Ly)
    _, Lxy = _grad_central(Lx)
    return (sigma ** 4) * (Lxx * Lyy - Lxy * Lxy)


def _detect_on_response(
    resp: jnp.ndarray, threshold, max_keypoints: int, border: int
):
    """Strict-NMS + thresholded top-K + sub-pixel fit on a response map.

    The same static-shape selection tail as ops/fast.py fast_detect, applied
    to the Hessian response."""
    from jax import lax

    H, W = resp.shape
    raw = resp
    padded = jnp.pad(resp, 1, constant_values=-jnp.inf)
    neigh = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = padded[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            neigh = n if neigh is None else jnp.maximum(neigh, n)
    score = jnp.where(resp > neigh, resp, -jnp.inf)

    ys = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    score = jnp.where(in_border & (score > threshold), score, -jnp.inf)

    flat = score.reshape(-1)
    if jax.default_backend() == "tpu":
        top_scores, top_idx = lax.approx_max_k(flat, max_keypoints, recall_target=0.95)
    else:
        top_scores, top_idx = lax.top_k(flat, max_keypoints)
    valid = jnp.isfinite(top_scores)
    kxi = top_idx % W
    kyi = top_idx // W

    rflat = jnp.where(jnp.isfinite(raw), raw, 0.0).reshape(-1)

    def axis_offset(idx_m, idx_p, idx_c):
        s_m = rflat[idx_m]
        s_p = rflat[idx_p]
        s_c = rflat[idx_c]
        denom = s_m - 2.0 * s_c + s_p
        off = 0.5 * (s_m - s_p) / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        return jnp.clip(jnp.where(jnp.abs(denom) < 1e-6, 0.0, off), -0.5, 0.5)

    ic = kyi * W + kxi
    dx = axis_offset(ic - 1, ic + 1, ic)
    dy = axis_offset(ic - W, ic + W, ic)
    kx = kxi.astype(jnp.float32) + dx
    ky = kyi.astype(jnp.float32) + dy
    keypoints = jnp.where(valid[:, None], jnp.stack([kx, ky], axis=-1), 0.0)
    scores = jnp.where(valid, top_scores, 0.0)
    return keypoints, scores, valid


# ---------------------------------------------------------------------------
# MLDB-style description
# ---------------------------------------------------------------------------


@jax.jit
def akaze_describe(
    L: jnp.ndarray,
    Lx: jnp.ndarray,
    Ly: jnp.ndarray,
    keypoints: jnp.ndarray,
    valid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MLDB-style 486-bit descriptors from one evolution level's channels.

    Args:
      L, Lx, Ly: (H, W) f32 evolution image + its first derivatives.
      keypoints: (K, 2) f32 (x, y), >= BORDER from the edge when valid.
      valid: (K,) bool.

    Returns (descriptors (K, 16) uint32, orientations (K,) f32 radians).
    """
    # ONE channel-stacked slab gather instead of three: the patch gather is
    # transaction-bound, so packing (L, Lx, Ly) into each 31-row slice
    # triples the bytes per HBM transaction (same trick as
    # brief.orient_and_describe; BASELINE.md round 3).
    p3 = extract_patches(jnp.stack([L, Lx, Ly], axis=-1), keypoints)
    pL, pX, pY = p3[..., 0], p3[..., 1], p3[..., 2]
    K = pL.shape[0]

    # Orientation: Gaussian-disk mean gradient.
    w = jnp.asarray(_ORI_W)
    gx = pX @ w
    gy = pY @ w
    theta = jnp.arctan2(gy, gx)
    theta = jnp.where(valid, theta, 0.0)
    bins = quantize_angle(theta)  # (K,)

    # Cell means for every rotation bin in one matmul per channel (bf16 hi/lo
    # split for f32-exact means, as in brief_describe's MXU path).
    Wc = jnp.asarray(_CELL_W)  # (961, BINS*29) f32 weights
    Whi = Wc.astype(jnp.bfloat16)
    Wlo = (Wc - Whi.astype(jnp.float32)).astype(jnp.bfloat16)

    def cell_means(patch):
        hi = patch.astype(jnp.bfloat16)
        lo = (patch - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.float32)
        m = dot(hi, Whi) + dot(hi, Wlo) + dot(lo, Whi)
        m = m.reshape(K, NUM_BINS, NUM_CELLS)
        return jnp.take_along_axis(m, bins[:, None, None], axis=1)[:, 0, :]

    mL = cell_means(pL)  # (K, 29)
    mX = cell_means(pX)
    mY = cell_means(pY)

    # Rotate the gradient channels into the feature frame (per-bin angle so
    # the rotation matches the quantized cell steering exactly).
    th_b = bins.astype(jnp.float32) * (2.0 * np.pi / NUM_BINS)
    c = jnp.cos(th_b)[:, None]
    s = jnp.sin(th_b)[:, None]
    mXr = c * mX + s * mY
    mYr = -s * mX + c * mY

    a = jnp.asarray(_PAIRS[:, 0])
    b = jnp.asarray(_PAIRS[:, 1])
    bits = jnp.concatenate(
        [
            (ch[:, a] > ch[:, b]).astype(jnp.uint32)
            for ch in (mL, mXr, mYr)
        ],
        axis=1,
    )  # (K, 486)
    bits = jnp.pad(bits, ((0, 0), (0, NUM_BITS - bits.shape[1])))
    packed = pack_bits(bits)
    return jnp.where(valid[:, None], packed, jnp.uint32(0)), theta


# ---------------------------------------------------------------------------
# Registry extractor
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("max_keypoints", "border", "nms", "blur_sigma", "num_levels", "scale_factor"),
)
def detect_and_describe_akaze(
    image: jnp.ndarray,
    threshold: float = 10.0,
    max_keypoints: int = 512,
    border: int = BORDER,
    nms: bool = True,
    blur_sigma: float = 2.0,
    num_levels: int = 1,
    scale_factor: float = 1.4,
):
    """Registry-shaped extractor: nonlinear scale space -> Hessian detect ->
    MLDB describe. (reference: the cv::AKAZE default branch,
    src/slam_frontend.cc:193-202.)

    `threshold` shares the registry knob (FAST intensity units); it is mapped
    to the Hessian response scale as threshold^2 (see THRESHOLD_GAIN).
    `num_levels` is the number of nonlinear EVOLUTION levels (full-res,
    octaveless — even 1 level detects on a nonlinearly-diffused image, the
    family's defining property); `scale_factor` is the per-level sigma ratio.
    `blur_sigma` is accepted for signature parity but unused (smoothing is
    the diffusion itself). `nms` likewise: the Hessian detector always NMSes.

    Returns (keypoints (K,2), scores (K,), descriptors (K,16) uint32,
    valid (K,)).
    """
    del blur_sigma, nms
    image = image.astype(jnp.float32)
    border = max(border, BORDER)
    num_levels = max(num_levels, 1)
    resp_thresh = THRESHOLD_GAIN * threshold * threshold

    levels = build_scale_space(image, num_levels, scale_factor)
    sigmas = evolution_sigmas(num_levels, scale_factor)

    budget = max_keypoints // num_levels
    budgets = [budget] * (num_levels - 1) + [max_keypoints - budget * (num_levels - 1)]
    kps_all, scores_all, desc_all, valid_all = [], [], [], []
    for lvl in range(num_levels):
        L = levels[lvl]
        resp = hessian_response(L, sigmas[lvl])
        kps, scores, valid = _detect_on_response(
            resp, resp_thresh, budgets[lvl], border
        )
        Lx, Ly = _grad_central(L)
        desc, _theta = akaze_describe(L, Lx, Ly, kps, valid)
        kps_all.append(kps)
        scores_all.append(scores)
        desc_all.append(desc)
        valid_all.append(valid)
    if num_levels == 1:
        return kps_all[0], scores_all[0], desc_all[0], valid_all[0]
    return (
        jnp.concatenate(kps_all, axis=0),
        jnp.concatenate(scores_all, axis=0),
        jnp.concatenate(desc_all, axis=0),
        jnp.concatenate(valid_all, axis=0),
    )
