"""Descriptor-family registry: the extractor-switch seam.

The reference ships a six-way descriptor switch — AKAZE (default), ORB,
BRISK, SURF, SIFT, FREAK — selected by `FrontendConfig::descriptor_extract_type_`
(reference: src/slam_frontend.cc:188-248, enum src/slam_frontend.h:60-67).
SURVEY.md section 2 deliberately scopes this framework to the ORB family
(FAST + oriented BRIEF: the binary-descriptor design that maps onto the MXU
as an XOR-popcount / one-hot matmul); this module preserves the SWITCH
itself, so a second family is a `register_family` call away instead of a
refactor.

A family supplies:
  - `extractor(image, threshold, max_keypoints, border, nms, blur_sigma,
     num_levels, scale_factor) -> (keypoints, scores, descriptors, valid)`
    with static shapes (K-capacity masked outputs, descriptors bit-packed
    into uint32 words for Hamming families);
  - `distance`: "hamming" (bit-packed uint32) or "l2" (float vectors) — the
    matcher dispatches on it (ops/hamming.py);
  - `words`: descriptor width in packed uint32 words (or float dims for l2).
"""

from __future__ import annotations

import dataclasses
from typing import Callable


@dataclasses.dataclass(frozen=True)
class DescriptorFamily:
    name: str
    extractor: Callable
    distance: str = "hamming"
    words: int = 8


_REGISTRY: dict[str, DescriptorFamily] = {}


def register_family(
    name: str,
    extractor: Callable,
    distance: str = "hamming",
    words: int = 8,
) -> DescriptorFamily:
    """Register a descriptor family under `name` (lowercase). Re-registering
    a name replaces it (latest wins, mirroring plugin-style overrides)."""
    if distance not in ("hamming", "l2"):
        raise ValueError(f"unknown distance metric {distance!r} (hamming|l2)")
    fam = DescriptorFamily(name.lower(), extractor, distance, words)
    _REGISTRY[fam.name] = fam
    return fam


def get_family(name: str) -> DescriptorFamily:
    """Look up a registered family; unknown names fail with the full menu
    (the reference exits with LOG(ERROR) on a bad extractor string,
    src/slam_frontend.cc:243-244)."""
    fam = _REGISTRY.get(name.lower())
    if fam is None:
        raise ValueError(
            f"unknown descriptor family {name!r}; registered: "
            f"{registered_families()}"
        )
    return fam


def registered_families() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins() -> None:
    from vision_slam_frontend_tpu.ops.akaze import detect_and_describe_akaze
    from vision_slam_frontend_tpu.ops.brief import detect_and_describe
    from vision_slam_frontend_tpu.ops.brisk import detect_and_describe_brisk

    # ORB family: FAST-9 corners + quantized-rotation steered BRIEF, 256 bits
    # packed into 8 uint32 words (reference ORB config:
    # src/slam_frontend.cc:205-207).
    register_family("orb", detect_and_describe, distance="hamming", words=8)
    # BRISK family: concentric-ring pattern with per-ring smoothing, 512 bits
    # in 16 words (reference BRISK option: src/slam_frontend.cc:216-220).
    register_family(
        "brisk", detect_and_describe_brisk, distance="hamming", words=16
    )
    # AKAZE family — the reference's DEFAULT extractor
    # (src/slam_frontend.cc:193-202): nonlinear-diffusion scale space,
    # Hessian-determinant detection, MLDB-style 486-bit descriptor (16 words).
    register_family(
        "akaze", detect_and_describe_akaze, distance="hamming", words=16
    )
    # SIFT-class float family — the reference's NORM_L2 extractor branch
    # (SURF/SIFT/FREAK behind USE_XFEATURES, src/slam_frontend.cc:222-247):
    # 128-d gradient-histogram descriptors, squared-L2 MXU matching. `words`
    # is the float dimensionality for L2 families.
    from vision_slam_frontend_tpu.ops.sift import detect_and_describe_sift

    register_family("sift", detect_and_describe_sift, distance="l2", words=128)
    # FREAK family: retinal pattern (exponentially-spaced overlapping
    # fields), coarse-to-fine pair cascade, FAST detector — the reference's
    # FREAK branch (src/slam_frontend.cc:235-239, FAST + FREAK behind
    # USE_XFEATURES). 512 bits in 16 words, Hamming matching.
    from vision_slam_frontend_tpu.ops.freak import detect_and_describe_freak

    register_family(
        "freak", detect_and_describe_freak, distance="hamming", words=16
    )


_register_builtins()
