"""FAST-9/16 corner detection as whole-image vectorized XLA ops.

TPU-native replacement for cv::FastFeatureDetector / the detection stage of
cv::ORB (reference: src/slam_frontend.cc:191 `FastFeatureDetector::create(10, true)`,
:266-280 ExtractFeatures). Instead of the reference's per-pixel early-exit
scalar loop, we compute the FAST decision for every pixel simultaneously on
the VPU using the identity:

    bright_score(p) = max over the 16 circular 9-long arcs of
                        min over the arc of (ring - center)
    dark_score(p)   = same with (center - ring)
    corner(p)      <=> max(bright_score, dark_score) > threshold

i.e. the corner *test* and the OpenCV-style corner *score* (max threshold at
which p stays a corner) are one and the same reduction — 18 shifted-min passes
over a (24, H, W) stack, no boolean arc bookkeeping. Non-max suppression is a
3x3 max-pool compare; top-K selection keeps shapes static for downstream jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# The 16-pixel Bresenham circle of radius 3, clockwise from 12 o'clock,
# as (dy, dx) offsets — the standard FAST ring.
RING_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LENGTH = 9  # FAST-9/16: at least 9 contiguous ring pixels


def _use_pallas_fast() -> bool:
    """Select the fused Pallas FAST+NMS kernel for detection.

    Opt-in via VSF_ENABLE_PALLAS=1 (or a comma list containing "fast");
    requires a TPU backend. Measured on v5e (640x480, composed in the full
    keyframe step, round 2): 108.8 fps vs 105-108 fps pure-XLA — parity
    within tunnel noise. See BASELINE.md "Pallas vs XLA".
    """
    import os

    flag = os.environ.get("VSF_ENABLE_PALLAS", "")
    if not (flag == "1" or "fast" in flag.split(",")):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _ring_stack(image: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) stack of the ring-neighbor intensity at every pixel.

    Implemented with static pad+slice (no gather): each ring position is one
    shifted view of the padded image, which XLA fuses into the consuming
    elementwise ops.
    """
    H, W = image.shape
    padded = jnp.pad(image, 3, mode="edge")
    views = [padded[3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W] for (dy, dx) in RING_OFFSETS]
    return jnp.stack(views, axis=0)


def fast_scores(image: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel FAST-9 corner score (H, W) float32.

    score(p) > t  <=>  p is a FAST-9 corner at threshold t. Border pixels
    (within 3 of the edge) are forced to -inf.
    """
    image = image.astype(jnp.float32)
    H, W = image.shape
    ring = _ring_stack(image)  # (16, H, W)
    diff_bright = ring - image[None]  # ring brighter than center
    diff_dark = -diff_bright

    def polarity_score(diff):
        # Windowed min of circular length-9 arcs: extend to 24 rows, then
        # min-reduce 9 shifted views; row s of the result is the arc min
        # starting at ring position s. Max over the 16 start positions.
        ext = jnp.concatenate([diff, diff[: ARC_LENGTH - 1]], axis=0)  # (24, H, W)
        wmin = ext[0:16]
        for i in range(1, ARC_LENGTH):
            wmin = jnp.minimum(wmin, ext[i : i + 16])
        return jnp.max(wmin, axis=0)  # (H, W)

    score = jnp.maximum(polarity_score(diff_bright), polarity_score(diff_dark))
    # Invalidate the 3-pixel border (ring would read padding).
    ys = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(interior, score, -jnp.inf)


@partial(jax.jit, static_argnames=("max_keypoints", "border", "nms"))
def fast_detect(
    image: jnp.ndarray,
    threshold: float = 10.0,
    max_keypoints: int = 512,
    border: int = 16,
    nms: bool = True,
):
    """Detect up to `max_keypoints` FAST-9 corners.

    Args:
      image: (H, W) grayscale, any real dtype.
      threshold: FAST intensity threshold (reference default 10,
        src/slam_frontend.cc:191).
      max_keypoints: static top-K capacity.
      border: exclude keypoints within this many pixels of the edge (give the
        descriptor patch room; >= 3).
      nms: 3x3 non-max suppression (reference passes true).

    Returns:
      keypoints: (K, 2) float32 (x, y) pixel coords, padded with zeros.
      scores:    (K,) float32 corner scores, 0 for padding.
      valid:     (K,) bool.
    """
    H, W = image.shape
    raw_pallas = None
    if nms and _use_pallas_fast():
        from vision_slam_frontend_tpu.ops.pallas_kernels import fast_scores_nms

        raw_pallas, score = fast_scores_nms(image.astype(jnp.float32))
        # The kernel zero-pads instead of edge-padding: re-impose the XLA
        # path's 3-pixel border invalidation (subsumed by `border` below,
        # kept for exact parity of the score map).
        ys3 = lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs3 = lax.broadcasted_iota(jnp.int32, (H, W), 1)
        interior = (ys3 >= 3) & (ys3 < H - 3) & (xs3 >= 3) & (xs3 < W - 3)
        score = jnp.where(interior, score, -jnp.inf)
    else:
        score = fast_scores(image)
        if nms:
            # Strict non-max suppression: survive only if strictly greater
            # than all 8 neighbors (OpenCV's rule — equal-score plateaus die
            # entirely).
            padded = jnp.pad(score, 1, constant_values=-jnp.inf)
            neigh = [
                padded[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
                if (dy, dx) != (0, 0)
            ]
            neighbor_max = neigh[0]
            for n in neigh[1:]:
                neighbor_max = jnp.maximum(neighbor_max, n)
            score = jnp.where(score > neighbor_max, score, -jnp.inf)

    ys = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    score = jnp.where(in_border & (score > threshold), score, -jnp.inf)

    flat = score.reshape(-1)
    if jax.default_backend() == "tpu":
        # TPU-optimized approximate top-K (binned partial reduction) — ~2x
        # faster than exact top_k at 300k candidates. Corner budgeting is a
        # heuristic cut anyway; >=95% recall of the true top-K is lossless
        # in practice (the missed corners are the weakest ones).
        top_scores, top_idx = lax.approx_max_k(flat, max_keypoints, recall_target=0.95)
    else:
        top_scores, top_idx = lax.top_k(flat, max_keypoints)
    valid = jnp.isfinite(top_scores)
    kxi = top_idx % W
    kyi = top_idx // W

    # Sub-pixel refinement: 1-D quadratic fit on the raw score surface along
    # each axis (the corner is a strict local max after NMS, so the fit is
    # concave). Crucial for stereo accuracy: integer corners alone cost
    # ~0.5 px of disparity = several % depth error at range.
    # (Pallas path: the kernel already emitted the raw map; XLA path: this
    # second fast_scores call CSEs with the first inside the jit.)
    raw = fast_scores(image) if raw_pallas is None else raw_pallas
    raw = jnp.where(jnp.isfinite(raw), raw, 0.0)
    rflat = raw.reshape(-1)

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
