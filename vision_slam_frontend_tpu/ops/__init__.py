"""Compute kernels: FAST detect, oriented-BRIEF describe, Hamming match.

Each op has an XLA (pure jnp) implementation that runs everywhere, and — for
the hot paths — a Pallas TPU kernel selected automatically on TPU backends.
TPU-native replacements for the reference's OpenCV feature stack
(reference: src/slam_frontend.cc:188-248 extractor construction, :266-280
ExtractFeatures, :521-538 GetMatches).
"""

from vision_slam_frontend_tpu.ops.image import gaussian_blur
from vision_slam_frontend_tpu.ops.fast import fast_scores, fast_detect
from vision_slam_frontend_tpu.ops.brief import (
    brief_pattern,
    compute_orientations,
    brief_describe,
    pack_bits,
    unpack_bits,
)
from vision_slam_frontend_tpu.ops.hamming import (
    hamming_distance_matrix,
    knn2_match,
    ratio_test_match,
    best_percent_mask,
)

__all__ = [
    "gaussian_blur",
    "fast_scores",
    "fast_detect",
    "brief_pattern",
    "compute_orientations",
    "brief_describe",
    "pack_bits",
    "unpack_bits",
    "hamming_distance_matrix",
    "knn2_match",
    "ratio_test_match",
    "best_percent_mask",
]
