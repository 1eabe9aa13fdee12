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


NUM_BINS = 32  # rotation quantization (OpenCV ORB quantizes to 30 steps)
PATCH_SIZE = 2 * PATCH_RADIUS + 1  # 31
PATCH_AREA = PATCH_SIZE * PATCH_SIZE  # 961

# Patch-gather payload dtype. The 31x31 slab gather is issue-bound on this
# toolchain with payload size its one lever (probe_gather_variants.py:
# f32 17.0 -> u8 13.8 ms at K=8192) — but u8 quantization of the BLURRED
# image costs real accuracy on low-contrast imagery (the golden-loop world
# has 93% of blurred gradients < 1 intensity unit; u8 sampling sent its BA
# ATE 0.14 -> 1.42). float16 keeps ~0.06-unit precision at intensity 100
# (10 mantissa bits) for the same 2-byte payload. Values are cast back to
# f32 before any arithmetic; the hi/lo bf16 describe matmul preserves the
# sampled precision exactly.
PATCH_DTYPE = jnp.float16


def brief_pattern(seed: int = 7, num_bits: int = NUM_BITS, radius: int = PATCH_RADIUS) -> np.ndarray:
    """Deterministic BRIEF sampling pattern: (num_bits, 2, 2) float32.

    pattern[i, 0] and pattern[i, 1] are the (x, y) offsets of the i-th
    comparison pair, drawn iid from N(0, (radius/2.5)^2) and radially clipped
    to norm <= radius - 2 (BRIEF paper's G-II sampling, disk support) so every
    rotated+rounded sample stays inside the 31x31 patch. Generated once at
    import — a fixed constant of the framework, like ORB's learned table is
    for OpenCV.
    """
    rng = np.random.RandomState(seed)
    sigma = radius / 2.5
    pts = rng.normal(0.0, sigma, size=(num_bits, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    lim = radius - 2
    pts = np.where(norm > lim, pts * (lim / np.maximum(norm, 1e-9)), pts)
    return pts.astype(np.float32)


_PATTERN = brief_pattern()


def _rotated_patterns() -> np.ndarray:
    """Integer sample offsets per rotation bin: (NUM_BINS, 256, 2 pts, 2) int32.

    [..., 0] is dx, [..., 1] is dy — rotated by the bin angle and rounded,
    exactly like OpenCV ORB's cvRound of the steered pattern. |offset| <=
    radius - 1 by the pattern's disk clip, so patch-local sampling is safe.
    """
    out = np.zeros((NUM_BINS, NUM_BITS, 2, 2), np.int32)
    px, py = _PATTERN[..., 0], _PATTERN[..., 1]  # (256, 2)
    for b in range(NUM_BINS):
        th = 2.0 * np.pi * b / NUM_BINS
        c, s = np.cos(th), np.sin(th)
        out[b, ..., 0] = np.rint(c * px - s * py)
        out[b, ..., 1] = np.rint(s * px + c * py)
    return out


_ROT_PATTERNS = _rotated_patterns()
# Flat patch-local indices per bin/bit for the MXU (patch-matmul) path.
_ROT_A = (
    (_ROT_PATTERNS[:, :, 0, 1] + PATCH_RADIUS) * PATCH_SIZE
    + (_ROT_PATTERNS[:, :, 0, 0] + PATCH_RADIUS)
).astype(np.int32)  # (NUM_BINS, 256)
_ROT_B = (
    (_ROT_PATTERNS[:, :, 1, 1] + PATCH_RADIUS) * PATCH_SIZE
    + (_ROT_PATTERNS[:, :, 1, 0] + PATCH_RADIUS)
).astype(np.int32)

# Quadrant factoring of the rotation bins: bin b = 90deg*(b // NUM_FINE) +
# fine angle of bin (b % NUM_FINE). A 90deg rotation maps the integer patch
# grid onto itself EXACTLY, so rint(R(90c + f) p) == R(90c) rint(R(f) p) and
# rotating the PATCH by the 90deg permutation + matching against only the
# NUM_FINE fine-bin patterns produces bit-identical descriptors with 4x less
# MXU work and a 4x smaller (K, bins, 256) intermediate (the win at K >= 2048,
# where the all-bins matmul dominated the describe stage: BASELINE.md round 3).
NUM_FINE = NUM_BINS // 4  # 8


def quantize_angle(theta: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians) -> rotation bin in [0, NUM_BINS)."""
    step = 2.0 * np.pi / NUM_BINS
    return jnp.mod(jnp.round(theta / step).astype(jnp.int32), NUM_BINS)


def _moment_weights() -> tuple[np.ndarray, np.ndarray]:
    """Circular-disk intensity-centroid weights over the flat 31x31 patch."""
    dy, dx = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
    mask = (dx * dx + dy * dy) <= PATCH_RADIUS * PATCH_RADIUS
    wx = (dx * mask).ravel().astype(np.float32)
    wy = (dy * mask).ravel().astype(np.float32)
    return wx, wy


_MOMENT_WX, _MOMENT_WY = _moment_weights()


def extract_patches(image: jnp.ndarray, keypoints: jnp.ndarray) -> jnp.ndarray:
    """Flat 31x31 patches centered at round(keypoint).

    vmapped dynamic_slice — XLA lowers it to one gather of row-contiguous
    slabs, far friendlier to HBM than per-sample scattered gathers
    (CLAUDE.md perf rule: small-row gathers are transaction-bound).
    Starts are clamped EXPLICITLY: lax.dynamic_slice's own clamp sends
    negative starts to the high corner on current JAX (unsigned
    interpretation) — harmless for the masked invalid/padded keypoints but
    ill-defined; the explicit clip pins the semantics the Pallas VMEM kernel
    (ops/pallas_kernels.extract_patches_vmem) reproduces exactly.

    Accepts (H, W) -> (K, 961) or multichannel (H, W, C) -> (K, 961, C).
    The gather is issue-bound (~1.5 us/slab regardless of slab size) with a
    payload-size component, so the ORB path extracts ONE f16 channel (the
    blurred image feeds both orientation moments and BRIEF bits —
    orient_and_describe); multi-plane families (BRISK/AKAZE) stack their
    pyramid planes as channels to share the single gather.
    """
    H, W = image.shape[0], image.shape[1]
    kx = jnp.clip(
        jnp.round(keypoints[:, 0]).astype(jnp.int32) - PATCH_RADIUS,
        0, W - PATCH_SIZE,
    )
    ky = jnp.clip(
        jnp.round(keypoints[:, 1]).astype(jnp.int32) - PATCH_RADIUS,
        0, H - PATCH_SIZE,
    )
    K = keypoints.shape[0]

    if image.ndim == 3:
        C = image.shape[-1]

        def one3(sy, sx):
            return jax.lax.dynamic_slice(
                image, (sy, sx, 0), (PATCH_SIZE, PATCH_SIZE, C)
            )

        return jax.vmap(one3)(ky, kx).reshape(K, PATCH_AREA, C)

    def one(sy, sx):
        return jax.lax.dynamic_slice(image, (sy, sx), (PATCH_SIZE, PATCH_SIZE))

    patches = jax.vmap(one)(ky, kx)  # (K, 31, 31)
    return patches.reshape(K, PATCH_AREA)


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

    TPU-native formulation: extract the 31x31 patch per keypoint (one
    coalesced slab-gather), then the circular-disk moments m10/m01 are a
    single (K, 961) x (961, 2) matvec on the MXU — ORB's exact circular
    window, no whole-image moment maps. Intensities pass through PATCH_DTYPE
    (the gather payload precision) to stay bit-identical to the fused
    orient_and_describe path.
    """
    patches = extract_patches(
        image.astype(jnp.float32).astype(PATCH_DTYPE).astype(jnp.float32),
        keypoints,
    )
    w = jnp.stack([jnp.asarray(_MOMENT_WX), jnp.asarray(_MOMENT_WY)], axis=1)
    m = patches @ w  # (K, 2): m10, m01
    theta = jnp.arctan2(m[:, 1], m[:, 0])
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
    """(K, 32*words) {0,1} -> (K, words) uint32, little-endian per word.

    Width-generic: 256-bit ORB packs to 8 words, 512-bit BRISK to 16."""
    K, nbits = bits.shape
    b = bits.astype(jnp.uint32).reshape(K, nbits // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(K, words) uint32 -> (K, 32*words) {0,1} in `dtype` (float for MXU
    matmul); width inferred from the input."""
    K, words = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(K, words * 32).astype(dtype)


@partial(jax.jit, static_argnames=("method",))
def brief_describe(
    image_blurred: jnp.ndarray,
    keypoints: jnp.ndarray,
    orientations: jnp.ndarray,
    valid: jnp.ndarray,
    method: str = "auto",
) -> jnp.ndarray:
    """Steered-BRIEF descriptors for all keypoints at once.

    Rotation is quantized to NUM_BINS precomputed integer patterns and the
    patch center is rounded — OpenCV ORB's exact semantics (it cvRounds both).

    Two equivalent implementations (same bits up to float near-ties):

      - "gather": look up the bin's integer offsets and gather the 2x256
        samples per keypoint from the image. Fast on CPU.
      - "mxu": extract the 31x31 patch per keypoint (coalesced slab-gather),
        then evaluate ALL bins' comparisons as one (K, 961) x (961,
        NUM_BINS*256) bf16 matmul against a {+1, 0, -1} selection matrix and
        pick each keypoint's bin. Turns a transaction-bound scattered gather
        into MXU work — ~8x faster on TPU (CLAUDE.md perf rule).
      - "auto": "mxu" on TPU, "gather" elsewhere.

    Args:
      image_blurred: (H, W) float32, pre-smoothed (see ops/image.gaussian_blur).
      keypoints: (K, 2) float32 (x, y).
      orientations: (K,) float32 radians (from compute_orientations).
      valid: (K,) bool.

    Returns:
      (K, 8) uint32 packed 256-bit descriptors; zeros for invalid keypoints.
    """
    if method == "auto":
        method = "mxu" if jax.default_backend() == "tpu" else "gather"
    H, W = image_blurred.shape
    bins = quantize_angle(orientations)  # (K,)
    # Pass the smoothed intensities through PATCH_DTYPE (the fused path's
    # gather payload precision — see the constant's comment) so both methods
    # stay bit-identical to each other and to orient_and_describe.
    image_q = image_blurred.astype(PATCH_DTYPE).astype(jnp.float32)

    if method == "gather":
        offs = jnp.asarray(_ROT_PATTERNS)[bins]  # (K, 256, 2, 2) int32
        kx = jnp.round(keypoints[:, 0]).astype(jnp.int32)
        ky = jnp.round(keypoints[:, 1]).astype(jnp.int32)
        xi = jnp.clip(kx[:, None, None] + offs[..., 0], 0, W - 1)
        yi = jnp.clip(ky[:, None, None] + offs[..., 1], 0, H - 1)
        vals = image_q.reshape(-1)[yi * W + xi]  # (K, 256, 2)
        bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (K, 256)
    else:
        patches = extract_patches(image_q, keypoints)  # (K, 961)
        bits = _describe_bits_mxu(patches, bins)
    packed = pack_bits(bits)
    return jnp.where(valid[:, None], packed, jnp.uint32(0))


def _rotate_patches_90(patches: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """Rotate each flat patch by quad * 90 degrees (exact grid permutation).

    patch'(o) = patch(R(90*quad) o): pure flips/transposes + a 3-way select,
    all VPU work — no gathers, no matmuls.
    """
    K = patches.shape[0]
    p = patches.reshape(K, PATCH_SIZE, PATCH_SIZE)
    p1 = jnp.flip(p, axis=2).transpose(0, 2, 1)  # P1[i,j] = P[j, S-1-i]
    p2 = jnp.flip(p, axis=(1, 2))  # P2[i,j] = P[S-1-i, S-1-j]
    p3 = jnp.flip(p.transpose(0, 2, 1), axis=2)  # P3[i,j] = P[S-1-j, i]
    q = quad[:, None, None]
    sel = jnp.where(q == 1, p1, p)
    sel = jnp.where(q == 2, p2, sel)
    sel = jnp.where(q == 3, p3, sel)
    return sel.reshape(K, PATCH_AREA)


def _describe_bits_mxu(patches: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """Steered-BRIEF bits from flat patches via the quadrant-factored one-hot
    matmul: rotate the patch by the bin's 90deg quadrant (exact permutation),
    then evaluate only the NUM_FINE fine-rotation patterns as one
    (K, 961) x (961, NUM_FINE*256) bf16 matmul. Bit-identical to the all-bins
    formulation (see the NUM_FINE comment above) at 1/4 the MXU work."""
    quad = bins // NUM_FINE
    fine = bins % NUM_FINE
    prot = _rotate_patches_90(patches, quad)
    # Selection matrix built on device from the small index constants:
    # column (f, s) has +1 at flat index A[f, s], -1 at B[f, s]; the
    # matmul then computes v_a - v_b for every fine bin at once.
    a = jnp.asarray(_ROT_A[:NUM_FINE].reshape(-1))  # (NUM_FINE*256,)
    b = jnp.asarray(_ROT_B[:NUM_FINE].reshape(-1))
    pix = jnp.arange(PATCH_AREA, dtype=jnp.int32)[:, None]
    D = (pix == a[None, :]).astype(jnp.bfloat16) - (pix == b[None, :]).astype(
        jnp.bfloat16
    )  # (961, NUM_FINE*256)
    # Hi/lo bf16 split: bf16 would round patch values by up to ~0.5
    # intensity units and flip near-tie bits vs the gather path; two
    # matmuls with f32 accumulation recover ~16-bit input precision, so
    # both methods produce identical bits (2x MXU work, still ~0.1 ms).
    hi = prot.astype(jnp.bfloat16)
    lo = (prot - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda x: jax.lax.dot(x, D, preferred_element_type=jnp.float32)
    diff = (dot(hi) + dot(lo)).reshape(-1, NUM_FINE, NUM_BITS)
    mine = jnp.take_along_axis(diff, fine[:, None, None], axis=1)[:, 0, :]
    return (mine < 0).astype(jnp.uint32)  # (K, 256)


def _use_pallas_patches(k: int, image_bytes: int = 0) -> bool:
    """Dispatch patch extraction to the Pallas VMEM kernel?

    OPT-IN ONLY (VSF_ENABLE_PALLAS=1 or a comma list containing "patches"),
    never "auto": the kernel is parity-tested and structurally eliminates the
    gather's HBM transactions, but THIS environment's remote Mosaic toolchain
    rejects its essential construct — any VMEM vector load whose address
    comes from an SMEM scalar (probe: grid-derived dynamic starts compile,
    scalar-prefetch-derived ones exit the compile helper; BASELINE.md round 3
    "toolchain limits"). On a standard libtpu/Mosaic build, flip this on and
    measure. Requirements when forced: TPU backend, K % 64 == 0, stacked
    image fits VMEM with headroom.
    """
    import os

    flag = os.environ.get("VSF_ENABLE_PALLAS", "")
    if not (flag == "1" or "patches" in flag.split(",")):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if k % 64 != 0:
        return False
    # Leave headroom in the ~16 MB scoped VMEM for output double-buffering.
    if image_bytes > 10 * 1024 * 1024:
        return False
    return True


@jax.jit
def orient_and_describe(
    image: jnp.ndarray,
    image_blurred: jnp.ndarray,
    keypoints: jnp.ndarray,
    valid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused orientation + steered BRIEF with ONE single-channel extraction.

    Both the centroid orientation and the BRIEF bits read the BLURRED patch:
    the intensity-centroid moment is a smooth functional, so computing it on
    the sigma=2-smoothed image is an equally rotation-covariant (and
    noise-stabler) convention than ORB's raw-image moments — and it makes
    the slab gather single-channel. The gather is issue-bound on this
    toolchain (~1.5 us/slab regardless of slab size, sort order, or layout —
    probe_gather_variants.py) with payload size its one lever: one f16
    channel is the smallest payload that keeps sub-integer blur gradients
    (u8 was faster still but collapsed descriptor distinctiveness on
    low-contrast imagery — see PATCH_DTYPE's comment).

    `image` (unblurred) is accepted for API compatibility but unused.
    Returns (orientations (K,) f32, descriptors (K, 8) uint32).
    """
    del image  # orientation reads the blurred patch (see docstring)
    blur_q = image_blurred.astype(jnp.float32)
    if _use_pallas_patches(keypoints.shape[0], image_blurred.size * 4):
        # VMEM-resident extraction: the slab gather is transaction-bound in
        # HBM; the Pallas kernel keeps the whole image in VMEM and pays zero
        # HBM transactions per patch (ops/pallas_kernels.extract_patches_vmem,
        # exact value parity with the gather below).
        from vision_slam_frontend_tpu.ops.pallas_kernels import (
            extract_patches_vmem,
        )

        out = extract_patches_vmem(
            blur_q[None].astype(PATCH_DTYPE).astype(jnp.float32), keypoints
        )
        p = out[:, 0]  # (K, 961)
    else:
        p = extract_patches(blur_q.astype(PATCH_DTYPE), keypoints)
        p = p.astype(jnp.float32)  # (K, 961)
    w = jnp.stack([jnp.asarray(_MOMENT_WX), jnp.asarray(_MOMENT_WY)], axis=1)
    m = jax.lax.dot(p, w, preferred_element_type=jnp.float32)
    theta = jnp.where(valid, jnp.arctan2(m[:, 1], m[:, 0]), 0.0)
    bits = _describe_bits_mxu(p, quantize_angle(theta))
    packed = pack_bits(bits)
    return theta, jnp.where(valid[:, None], packed, jnp.uint32(0))


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

    fused = jax.default_backend() == "tpu"  # gather method wins on CPU

    if num_levels <= 1:
        keypoints, scores, valid = fast_detect(
            image, threshold=threshold, max_keypoints=max_keypoints, border=border, nms=nms
        )
        blurred = gaussian_blur(image, sigma=blur_sigma)
        if fused:
            _, descriptors = orient_and_describe(image, blurred, keypoints, valid)
        else:
            # Orientation from the BLURRED image, matching the fused path's
            # convention (see orient_and_describe) so both are bit-identical.
            orientations = compute_orientations(blurred, keypoints, valid)
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
        blurred = gaussian_blur(level_img, sigma=blur_sigma)
        if fused:
            _, desc = orient_and_describe(level_img, blurred, kps, valid)
        else:
            orientations = compute_orientations(blurred, kps, valid)
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
