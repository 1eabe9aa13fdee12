"""Pallas TPU kernels for the frontend's hot ops.

Two code paths exist for every op (ops/hamming.py, ops/fast.py):
  - the XLA path (pure jnp) — runs everywhere, used on CPU and as reference;
  - these Pallas kernels — TPU-native, selected on TPU backends.

Kernels:
  hamming_top2: brute-force kNN(k=2) over bit-packed 256-bit descriptors as
    XOR + popcount on uint32 words, with the top-2 reduction FUSED in VMEM —
    the (Kq x Kt) distance matrix never touches HBM (the XLA matmul path
    materializes it). Queries tile over the grid; the whole train set
    (K x 8 uint32 = 16 KB) sits in VMEM.

  fast_score_kernel: the FAST-9 corner score (max-over-arcs of min margin,
    see ops/fast.py) computed in one fused pass over row bands held in VMEM.

(reference: these replace cv::BFMatcher::knnMatch and cv::FastFeatureDetector
— src/slam_frontend.cc:521-538, :191 — per SURVEY.md's native-component
checklist items 1 and 3.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1 << 20  # python int: pallas kernels cannot capture traced constants

TT = 128  # train tile


def _hamming_top2_kernel(
    q_ref, t_ref, tvalid_ref, d1_ref, d2_ref, idx_ref,
    *, kt: int, tq: int, words: int,
):
    """One query block vs the full train set; running top-2 merge over train tiles.

    The train-tile loop is a ROLLED fori_loop: a Python-unrolled loop makes
    Mosaic stack-allocate every tile's temporaries simultaneously, which blows
    the 16 MB scoped-VMEM limit at Kt >= 2048 (measured: 26.5 MB requested at
    Kt=2048, tq=1024). Rolled, the working set is one (tq, TT) tile
    regardless of Kt."""
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, TT), 1)
    q = q_ref[:, :]  # (tq, words), loaded once

    def tile_body(jt, carry):
        d1, d2, idx1 = carry
        tb = t_ref[pl.ds(jt * TT, TT), :]  # (TT, words)
        # Distance block (TQ, TT): XOR + popcount per packed word, summed.
        d = jnp.zeros((tq, TT), jnp.int32)
        for w in range(words):
            x = q[:, w][:, None] ^ tb[:, w][None, :]
            d = d + jax.lax.population_count(x).astype(jnp.int32)
        tv = tvalid_ref[pl.ds(jt * TT, TT)]  # (TT,) int32
        d = jnp.where(tv[None, :] > 0, d, _BIG)

        # Tile-local top-2 along the train axis. No argmin: Mosaic's
        # reduce-index only handles f32, so recover the index as the min
        # column where d equals the row minimum (smallest index on ties,
        # same as argmin).
        tmin1 = jnp.min(d, axis=1)
        amin1 = jnp.min(jnp.where(d == tmin1[:, None], col, _BIG), axis=1)
        dm = jnp.where(col == amin1[:, None], _BIG, d)
        tmin2 = jnp.min(dm, axis=1)

        # Merge (d1, d2) with (tmin1, tmin2).
        new_idx1 = jnp.where(tmin1 < d1, amin1 + jt * TT, idx1)
        new_d2 = jnp.minimum(jnp.maximum(d1, tmin1), jnp.minimum(d2, tmin2))
        new_d1 = jnp.minimum(d1, tmin1)
        return new_d1, new_d2, new_idx1

    init = (
        jnp.full((tq,), _BIG, jnp.int32),
        jnp.full((tq,), _BIG, jnp.int32),
        jnp.zeros((tq,), jnp.int32),
    )
    d1, d2, idx1 = jax.lax.fori_loop(0, kt // TT, tile_body, init)

    d1_ref[:, :] = d1.reshape(tq // 128, 128)
    d2_ref[:, :] = d2.reshape(tq // 128, 128)
    idx_ref[:, :] = idx1.reshape(tq // 128, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(desc_q: jnp.ndarray, desc_t: jnp.ndarray, valid_t: jnp.ndarray, interpret: bool = False):
    """Fused kNN(k=2) Hamming search over packed descriptors.

    Args:
      desc_q: (Kq, words) uint32; Kq must be a multiple of 128. words is 8
        for 256-bit ORB-class, 16 for 512-bit BRISK-class descriptors.
      desc_t: (Kt, words) uint32; Kt must be a multiple of 128.
      valid_t: (Kt,) bool.

    Returns (best_idx (Kq,) int32, d1 (Kq,) f32, d2 (Kq,) f32).
    """
    kq, kt = desc_q.shape[0], desc_t.shape[0]
    words = desc_q.shape[1]
    assert desc_t.shape[1] == words, (desc_q.shape, desc_t.shape)
    assert kq % 128 == 0 and kt % TT == 0, (kq, kt)
    # Queries per program: largest 128-multiple <= 1024 that divides kq.
    tq = next(c for c in range(min(kq, 1024), 0, -128) if kq % c == 0)
    rows = tq // 128
    grid = (kq // tq,)
    d1, d2, idx = pl.pallas_call(
        functools.partial(_hamming_top2_kernel, kt=kt, tq=tq, words=words),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, words), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, words), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kq // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((kq // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((kq // 128, 128), jnp.int32),
        ],
        interpret=interpret,
    )(desc_q, desc_t, valid_t.astype(jnp.int32))
    return (
        idx.reshape(kq),
        d1.reshape(kq).astype(jnp.float32),
        d2.reshape(kq).astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# MXU-based fused kNN(2): bf16 +-1 matmul tiles + in-VMEM top-2 merge
# ---------------------------------------------------------------------------

MXU_TT = 512  # train tile (columns of the distance block per MXU matmul)


def _hamming_top2_mxu_kernel(
    q_ref, t_ref, pen_ref, d1_ref, d2_ref, idx_ref, *, kt: int, tq: int, nbits: int
):
    """One query block vs the full train set, distances via the MXU.

    Descriptor bits arrive as +-1 bf16 rows, so
        dot(q, t^T) = #agree - #disagree = nbits - 2 * hamming
    and a single bf16 matmul per (tq, MXU_TT) tile yields the distance block
    in f32 exactly (products are +-1: f32 accumulation is integer-exact).
    The top-2 running merge happens in VMEM — the (Kq, Kt) matrix never
    touches HBM. This is the same arithmetic the XLA path feeds the MXU, but
    XLA materializes each streamed (Kq, block) distance tile to HBM and
    re-reads it for the argmin/min passes (~10 GB of traffic at K=8192, W=10);
    here the tile dies in VMEM.

    pen_ref: (1, kt) f32 additive penalty row (0 valid / 1e9 invalid).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, MXU_TT), 1)
    q = q_ref[:, :]  # (tq, nbits) bf16 +-1

    def tile_body(jt, carry):
        d1, d2, idx1 = carry
        tb = t_ref[pl.ds(jt * MXU_TT, MXU_TT), :]  # (MXU_TT, nbits) bf16
        dot = jax.lax.dot_general(
            q, tb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (tq, MXU_TT)
        d = 0.5 * (float(nbits) - dot) + pen_ref[0, pl.ds(jt * MXU_TT, MXU_TT)][None, :]

        tmin1 = jnp.min(d, axis=1)
        amin1 = jnp.min(jnp.where(d == tmin1[:, None], col, _BIG), axis=1)
        dm = jnp.where(col == amin1[:, None], jnp.float32(3e9), d)
        tmin2 = jnp.min(dm, axis=1)

        new_idx1 = jnp.where(tmin1 < d1, amin1 + jt * MXU_TT, idx1)
        new_d2 = jnp.minimum(jnp.maximum(d1, tmin1), jnp.minimum(d2, tmin2))
        new_d1 = jnp.minimum(d1, tmin1)
        return new_d1, new_d2, new_idx1

    init = (
        jnp.full((tq,), 3e9, jnp.float32),
        jnp.full((tq,), 3e9, jnp.float32),
        jnp.zeros((tq,), jnp.int32),
    )
    d1, d2, idx1 = jax.lax.fori_loop(0, kt // MXU_TT, tile_body, init)

    d1_ref[:, :] = d1.reshape(tq // 128, 128)
    d2_ref[:, :] = d2.reshape(tq // 128, 128)
    idx_ref[:, :] = idx1.reshape(tq // 128, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2_mxu(
    desc_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    valid_t: jnp.ndarray,
    interpret: bool = False,
):
    """Fused kNN(2) Hamming search with MXU matmul tiles (see kernel above).

    Args:
      desc_q: (Kq, words) uint32 packed; Kq % 128 == 0.
      desc_t: (Kt, words) uint32 packed; Kt % 512 == 0.
      valid_t: (Kt,) bool.

    Returns (best_idx (Kq,) int32, d1 (Kq,) f32, d2 (Kq,) f32) — identical to
    the XLA knn2_match/_knn2_match_streamed results for valid trains
    (sentinel values for all-invalid rows differ: ~3e9 here vs 1e9 there).
    """
    from vision_slam_frontend_tpu.ops.brief import unpack_bits

    kq, kt = desc_q.shape[0], desc_t.shape[0]
    words = desc_q.shape[1]
    nbits = words * 32
    assert desc_t.shape[1] == words, (desc_q.shape, desc_t.shape)
    assert kq % 128 == 0 and kt % MXU_TT == 0, (kq, kt)
    # +-1 encoding: s = 1 - 2b.
    sq = (1.0 - 2.0 * unpack_bits(desc_q, dtype=jnp.float32)).astype(jnp.bfloat16)
    st = (1.0 - 2.0 * unpack_bits(desc_t, dtype=jnp.float32)).astype(jnp.bfloat16)
    pen = jnp.where(valid_t, 0.0, 1e9).astype(jnp.float32).reshape(1, kt)

    # Output blocks are (tq//128, 128): Mosaic requires the sublane dim of a
    # PARTIAL block to divide by 8, so tq must be a 1024-multiple unless one
    # program covers all queries (full-array blocks are exempt).
    if kq % 1024 == 0:
        tq = 1024
    else:
        tq = next(c for c in range(min(kq, 1024), 0, -128) if kq % c == 0)
        assert kq // tq == 1, (
            f"Kq={kq} must be a multiple of 1024 (or <= 1024 and a multiple of 128)"
        )
    rows = tq // 128
    grid = (kq // tq,)
    d1, d2, idx = pl.pallas_call(
        functools.partial(_hamming_top2_mxu_kernel, kt=kt, tq=tq, nbits=nbits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, nbits), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, nbits), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kq // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((kq // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((kq // 128, 128), jnp.int32),
        ],
        interpret=interpret,
    )(sq, st, pen)
    return idx.reshape(kq), d1.reshape(kq), d2.reshape(kq)


def hamming_top2_available() -> bool:
    """Pallas path is selected on TPU backends only."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# FAST-9 corner score + strict NMS, fused over row bands
# ---------------------------------------------------------------------------

_RING = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
_ARC = 9
_HALO = 4  # ring radius 3 + NMS radius 1


def _fast_kernel(img_ref, raw_ref, out_ref, *, band: int, width: int):
    """One row band: compute FAST-9 scores for band+2 rows in VMEM, then
    strict 8-neighbor NMS, writing `band` raw + suppressed score rows.

    img_ref: the full padded image resident in VMEM (~1.3 MB at 640x480) —
    overlapping halo windows can't be expressed as BlockSpec blocks, so each
    program dynamic-slices its band.
    raw_ref / out_ref blocks: (band, width) f32 — the raw score (needed by
    the caller's sub-pixel quadratic fit) and the NMS-suppressed score.
    """
    prog = pl.program_id(0)
    img = img_ref[pl.ds(prog * band, band + 2 * _HALO), :]
    rows = band + 2  # score rows needed (band + NMS halo)
    H0 = _HALO - 1  # first score row offset such that ring halo fits

    center = img[H0 : H0 + rows, H0 : H0 + width + 2]

    # Ring stack via static shifted slices of the VMEM block.
    def polarity_score(sign):
        # windowed min over circular arcs: build 16 diffs, extend to 24.
        diffs = []
        for (dy, dx) in _RING:
            ring = img[H0 + dy : H0 + dy + rows, H0 + dx : H0 + dx + width + 2]
            diffs.append(sign * (ring - center))
        ext = diffs + diffs[: _ARC - 1]
        wmin16 = []
        for start in range(16):
            m = ext[start]
            for k in range(1, _ARC):
                m = jnp.minimum(m, ext[start + k])
            wmin16.append(m)
        out = wmin16[0]
        for m in wmin16[1:]:
            out = jnp.maximum(out, m)
        return out

    score = jnp.maximum(polarity_score(1.0), polarity_score(-1.0))
    raw_ref[:, :] = score[1 : 1 + band, 1 : 1 + width]

    # Strict NMS: survive iff greater than all 8 neighbors.
    c = score[1 : 1 + band, 1 : 1 + width]
    neigh = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = score[1 + dy : 1 + dy + band, 1 + dx : 1 + dx + width]
            neigh = n if neigh is None else jnp.maximum(neigh, n)
    out_ref[:, :] = jnp.where(c > neigh, c, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_scores_nms(image: jnp.ndarray, interpret: bool = False):
    """Fused FAST-9 score + strict NMS via Pallas row-band kernel.

    Returns (raw, suppressed) (H, W) score maps. `suppressed` is -inf at
    non-maxima, matching the XLA path `fast_scores` + strict NMS composition
    in ops/fast.py except at the 3-pixel border (handled by the caller's
    border mask; the XLA path uses edge-padding there, this kernel
    zero-padding). `raw` is the unsuppressed score the sub-pixel fit reads.
    """
    H, W = image.shape
    band = 16  # small bands keep Mosaic's scoped-VMEM stack under its 16 MB limit
    Hp = ((H + band - 1) // band) * band
    padded = jnp.zeros((Hp + 2 * _HALO, W + 2 * _HALO), jnp.float32)
    padded = padded.at[_HALO : _HALO + H, _HALO : _HALO + W].set(
        image.astype(jnp.float32)
    )
    grid = (Hp // band,)
    raw, out = pl.pallas_call(
        functools.partial(_fast_kernel, band=band, width=W),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],  # full padded image
        out_specs=[
            pl.BlockSpec((band, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, W), jnp.float32),
            jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        ],
        interpret=interpret,
    )(padded)
    return raw[:H], out[:H]


# ---------------------------------------------------------------------------
# Patch extraction: the transaction-bound slab gather done from VMEM instead.
# ---------------------------------------------------------------------------

_PATCH_LW = 32  # lane width per patch row (>= patch size; excess sliced off)


def _extract_patches_kernel(
    ys_ref, xs_ref, img_ref, patch_ref, *, block: int, ps: int, channels: int
):
    """One program extracts `block` patches from the VMEM-resident image.

    Per keypoint: a dynamic (ps, _PATCH_LW) slice per channel — sublane AND
    lane starts are runtime values (Mosaic lowers the unaligned lane start to
    a shift), but every read hits VMEM, so there are no HBM transactions at
    all; the XLA gather path pays ~31 row-transactions per keypoint per
    channel in HBM (CLAUDE.md: small-row gathers are transaction-bound).
    """
    i = pl.program_id(0)
    for b in range(block):
        ky = ys_ref[i * block + b]
        kx = xs_ref[i * block + b]
        for c in range(channels):
            patch_ref[b, c] = img_ref[c, pl.ds(ky, ps), pl.ds(kx, _PATCH_LW)]


@functools.partial(
    jax.jit, static_argnames=("ps", "block", "interpret")
)
def extract_patches_vmem(
    images: jnp.ndarray,
    keypoints: jnp.ndarray,
    ps: int = 31,
    block: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, H, W) images + (K, 2) keypoints -> (K, C, ps*ps) flat patches.

    Drop-in for ops/brief.extract_patches on stacked channels (there:
    (H, W, C) -> (K, ps*ps, C)); identical values including the
    dynamic_slice start clamping, channel-major here. K must be a multiple
    of `block` (detector capacities are powers of two).

    CAVEAT (this environment): the remote Mosaic toolchain rejects VMEM
    loads addressed by SMEM scalars — the essential construct here — so the
    kernel only runs in interpret mode or on a standard libtpu build; the
    dispatch (ops/brief._use_pallas_patches) is opt-in accordingly.
    BASELINE.md round 3 "toolchain limit" records the probe
    (probe_kernel_variants.py: grid-derived dynamic starts compile,
    scalar-derived ones do not).
    """
    C, H, W = images.shape
    K = keypoints.shape[0]
    assert K % block == 0, (K, block)
    r = ps // 2
    ys = jnp.clip(jnp.round(keypoints[:, 1]).astype(jnp.int32) - r, 0, H - ps)
    xs = jnp.clip(jnp.round(keypoints[:, 0]).astype(jnp.int32) - r, 0, W - ps)
    # Lane-dim pad so the fixed 32-wide read never crosses the array end
    # (cols >= W are junk; sliced off below).
    padded = jnp.pad(images, ((0, 0), (0, 0), (0, _PATCH_LW)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // block,),
        in_specs=[
            pl.BlockSpec(
                (C, H, W + _PATCH_LW), lambda i, ys, xs: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block, C, ps, _PATCH_LW), lambda i, ys, xs: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _extract_patches_kernel, block=block, ps=ps, channels=C
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, C, ps, _PATCH_LW), jnp.float32),
        interpret=interpret,
    )(ys, xs, padded.astype(jnp.float32))
    return out[:, :, :, :ps].reshape(K, C, ps * ps)
