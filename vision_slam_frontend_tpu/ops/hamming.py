"""Hamming descriptor matching on the MXU: distance matrices as matmuls.

TPU-native replacement for cv::BFMatcher::knnMatch with NORM_HAMMING plus the
reference's Lowe ratio test and best-percent cut
(reference: src/slam_frontend.cc:521-538 GetMatches, :282-309 GetFeatureMatches).

Key idea: for binary descriptors unpacked to {0,1} rows A (Kq x 256) and
B (Kt x 256),

    hamming(a, b) = |a| + |b| - 2 * a.b

so the full Kq x Kt distance matrix is one 256-deep matmul — exactly what the
TPU's systolic array is built for — instead of the reference's O(Kq*Kt)
scalar XOR/popcount loop. bf16 operands are exact here (integers <= 256) with
fp32 accumulation. The temporal window's W frames batch into a single
(W*K x 256) x (256 x K) matmul.

All outputs are fixed-capacity query-aligned arrays with validity masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from vision_slam_frontend_tpu.ops.brief import unpack_bits

_LARGE = 1e9


# Below this train-set size the XLA formulation (materialized distance
# matrix, min/argmin top-2) is at or past parity with the fused Pallas
# kernel; at and above it the kernel wins big by keeping distance tiles in
# VMEM. Measured crossover on v5e round 3 (BASELINE.md "Pallas vs XLA"):
# window (81920 x 8192): 7.8 ms Pallas vs 27.2 ms XLA streamed (3.5x);
# (20480 x 2048): 4.2 vs 4.9 ms; at Kt <= 1024 both are dispatch-floor-bound.
_MXU_KERNEL_MIN_KT = 2048


def _use_pallas(kq: int, kt: int, site: str = "", words: int = 8) -> bool:
    """Dispatch to the fused Pallas MXU kNN(2) kernel for this call site?

    Default policy ("auto"): on TPU backends, use the kernel when the train
    set is large enough that XLA's materialized/streamed distance passes
    become HBM-bound (Kt >= _MXU_KERNEL_MIN_KT, the measured crossover) and
    the shapes meet the kernel's alignment contract. Overrides:
      VSF_ENABLE_PALLAS=1 (or a comma list with this site name) forces the
        kernel at every size; VSF_ENABLE_PALLAS=0 forces pure XLA.
    The retired XOR-popcount kernel (hamming_top2) is no longer dispatched:
    it loses to this MXU formulation standalone and its Mosaic compile fails
    at Kt >= 2048 on the current toolchain (BASELINE.md round 3).
    """
    import os

    flag = os.environ.get("VSF_ENABLE_PALLAS", "auto")
    if flag in ("0", "off"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    # Kernel alignment contract (ops/pallas_kernels.hamming_top2_mxu).
    aligned = (
        kt % 512 == 0
        and (kq % 1024 == 0 or (kq <= 1024 and kq % 128 == 0))
    )
    if not aligned:
        return False
    if flag == "1" or (site and site in flag.split(",")):
        return True
    return kt >= _MXU_KERNEL_MIN_KT


def hamming_distance_matrix(
    bits_q: jnp.ndarray, bits_t: jnp.ndarray
) -> jnp.ndarray:
    """Pairwise Hamming distances between unpacked {0,1} descriptor matrices.

    Args:
      bits_q: (..., Kq, 256) float (0/1 values).
      bits_t: (Kt, 256) float.

    Returns:
      (..., Kq, Kt) float32 distances.
    """
    pop_q = jnp.sum(bits_q, axis=-1)  # (..., Kq)
    pop_t = jnp.sum(bits_t, axis=-1)  # (Kt,)
    cross = jax.lax.dot_general(
        bits_q.astype(jnp.bfloat16),
        bits_t.astype(jnp.bfloat16),
        dimension_numbers=(((bits_q.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return pop_q[..., :, None] + pop_t[None, :] - 2.0 * cross


def _compensated_cross(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """q @ t.T with hi/lo-split bf16 operands, f32 accumulation.

    For {0,1} bit rows bf16 is already exact; for float descriptors (the L2
    families) a single bf16 pass rounds ~2^-8 relative — enough to flip
    near-tie nearest-neighbour ranks. Three MXU passes (hi.hi + hi.lo +
    lo.hi) recover ~16-bit input precision, same trick as the BA coupling
    (backend/ba._bbt_compensated)."""
    hq = q.astype(jnp.bfloat16)
    lq = (q - hq.astype(jnp.float32)).astype(jnp.bfloat16)
    ht = t.astype(jnp.bfloat16)
    lt = (t - ht.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda a, b: lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dot(hq, ht) + dot(hq, lt) + dot(lq, ht)


def l2_sq_distance_matrix(feat_q: jnp.ndarray, feat_t: jnp.ndarray) -> jnp.ndarray:
    """Pairwise SQUARED-L2 distances between float descriptor matrices, as
    ||a||^2 + ||b||^2 - 2ab^T on the MXU — the identity the Hamming matmul is
    a special case of (popcount IS the squared norm of a {0,1} vector).

    The reference's BFMatcher(NORM_L2) branch for SURF/SIFT/FREAK
    (src/slam_frontend.cc:225,231)."""
    nq = jnp.sum(feat_q * feat_q, axis=-1)
    nt = jnp.sum(feat_t * feat_t, axis=-1)
    return nq[:, None] + nt[None, :] - 2.0 * _compensated_cross(feat_q, feat_t)


def knn2_match(
    dist: jnp.ndarray, valid_t: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-query best and second-best over the train axis.

    min/argmin + one masked second pass instead of lax.top_k: top_k lowers
    to a full row sort on this toolchain, which is the dominant cost of the
    whole keyframe step at K >= 2048 (measured: the K=8192 step spent
    ~0.5 s in it). Three cheap reduction passes are rank-2-exact, and ties
    resolve to the lowest index exactly like top_k.

    Args:
      dist: (Kq, Kt) distances.
      valid_t: (Kt,) bool train validity (invalid columns are ignored).

    Returns:
      (best_idx (Kq,) int32, best_dist (Kq,), second_dist (Kq,)).
    """
    masked = jnp.where(valid_t[None, :], dist, _LARGE)
    best_idx = jnp.argmin(masked, axis=1).astype(jnp.int32)
    d1 = jnp.take_along_axis(masked, best_idx[:, None], axis=1)[:, 0]
    cols = jnp.arange(masked.shape[1])
    d2 = jnp.min(
        jnp.where(cols[None, :] == best_idx[:, None], _LARGE, masked), axis=1
    )
    return best_idx, d1, d2


def _knn2_match_streamed(
    feat_q: jnp.ndarray,
    feat_t: jnp.ndarray,
    valid_t: jnp.ndarray,
    block: int = 1024,
    compensated: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Blocked top-2 match: never materializes the (Kq, Kt) matrix.

    At K=8192 the full window distance matrix is (W*K, K) f32 = 2.7 GB of
    HBM traffic per extra pass; streaming the train axis in `block`-column
    tiles keeps the working set at (Kq, block) and folds the top-2 merge
    into a lax.scan — the flash-attention-style formulation of kNN.

    Works for unpacked {0,1} bit rows (Hamming) AND float descriptor rows
    (squared L2): both are ||a||^2 + ||b||^2 - 2ab^T, since popcount is the
    squared norm of a bit vector. Pass compensated=True for float rows
    (hi/lo bf16 cross term; bits are bf16-exact without it).

    Args:
      feat_q: (Kq, D) queries.
      feat_t: (Kt, D) trains; Kt must divide by `block`.
      valid_t: (Kt,) bool.

    Returns:
      (best_idx (Kq,) int32, best_dist (Kq,), second_dist (Kq,)).
    """
    Kq, D = feat_q.shape
    Kt = feat_t.shape[0]
    assert Kt % block == 0, (Kt, block)
    nb = Kt // block
    bq = feat_q.astype(jnp.bfloat16)
    pop_q = jnp.sum(feat_q * feat_q, axis=-1)
    bt_blocks = feat_t.reshape(nb, block, D)
    pop_t = jnp.sum(feat_t * feat_t, axis=-1).reshape(nb, block)
    v_blocks = valid_t.reshape(nb, block)
    base = (jnp.arange(nb) * block).astype(jnp.int32)
    cols = jnp.arange(block)

    def body(carry, blk):
        d1, d2, i1 = carry
        btb, ptb, vb, b0 = blk
        if compensated:
            cross = _compensated_cross(feat_q, btb)
        else:
            cross = lax.dot_general(
                bq, btb.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        d = pop_q[:, None] + ptb[None, :] - 2.0 * cross
        d = jnp.where(vb[None, :], d, _LARGE)
        bi = jnp.argmin(d, axis=1)
        bd1 = jnp.take_along_axis(d, bi[:, None], axis=1)[:, 0]
        bd2 = jnp.min(
            jnp.where(cols[None, :] == bi[:, None], _LARGE, d), axis=1
        )
        gi = b0 + bi.astype(jnp.int32)
        # Merge running (d1, d2, i1) with block (bd1, bd2, gi). Strict <
        # keeps the earlier (lower-index) block on ties — matching the
        # single-pass argmin's lowest-index tie rule.
        nd1 = jnp.minimum(d1, bd1)
        ni1 = jnp.where(bd1 < d1, gi, i1)
        nd2 = jnp.minimum(jnp.maximum(d1, bd1), jnp.minimum(d2, bd2))
        return (nd1, nd2, ni1), None

    init = (
        jnp.full(Kq, _LARGE, jnp.float32),
        jnp.full(Kq, _LARGE, jnp.float32),
        jnp.zeros(Kq, jnp.int32),
    )
    (d1, d2, i1), _ = lax.scan(body, init, (bt_blocks, pop_t, v_blocks, base))
    return i1, d1, d2


# Above this train-set size, stream the distance matrix in blocks instead of
# materializing (Kq, Kt) in HBM (measured crossover on v5e: BASELINE.md).
_STREAM_THRESHOLD = 2048

# Any REAL L2 descriptor distance is far below this (normalized SIFT-class
# vectors have d <= 2); the no-valid-train sentinel is sqrt(_LARGE) ~ 3e4.
_L2_MAX_REAL = 1e4


def _l2_knn2(
    desc_q: jnp.ndarray, desc_t: jnp.ndarray, valid_t: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """kNN(2) over float descriptors: (best_idx, d1, d2) with TRUE L2
    distances (computed squared on the MXU, sqrt'd at the end — Kq scalars)."""
    fq = desc_q.astype(jnp.float32)
    ft = desc_t.astype(jnp.float32)
    Kt = ft.shape[0]
    if Kt > _STREAM_THRESHOLD and Kt % 1024 == 0:
        best_idx, d1, d2 = _knn2_match_streamed(fq, ft, valid_t, compensated=True)
    else:
        dist = l2_sq_distance_matrix(fq, ft)
        best_idx, d1, d2 = knn2_match(dist, valid_t)
    # Masked/sentinel entries stay huge through the sqrt; clamp tiny negative
    # rounding from the compensated cross term.
    return (
        best_idx,
        jnp.sqrt(jnp.maximum(d1, 0.0)),
        jnp.sqrt(jnp.maximum(d2, 0.0)),
    )


@jax.jit
def ratio_test_match(
    desc_q: jnp.ndarray,
    valid_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    valid_t: jnp.ndarray,
    ratio: float = 0.6,
):
    """Brute-force kNN(k=2) + Lowe ratio test, query-aligned.

    The exact semantics of the reference's GetMatches
    (src/slam_frontend.cc:521-538): a query keypoint matches its nearest
    train keypoint iff d1 < ratio * d2.

    Args:
      desc_q / desc_t: (K, 8) uint32 packed descriptors.
      valid_q / valid_t: (K,) bool.
      ratio: nn_match_ratio (reference default 0.6, src/slam_frontend.cc:555).

    Returns:
      train_idx: (Kq,) int32 matched train index (0 where invalid).
      dist: (Kq,) float32 match distance (+LARGE where invalid).
      matched: (Kq,) bool.
    """
    if jnp.issubdtype(desc_q.dtype, jnp.floating):
        # Float-descriptor family (distance="l2"): the reference's
        # BFMatcher(NORM_L2) branch. Squared-L2 on the MXU, sqrt'd so the
        # ratio test keeps the reference's NORM_L2 semantics.
        best_idx, d1, d2 = _l2_knn2(desc_q, desc_t, valid_t)
        matched = valid_q & (d1 < ratio * d2) & (d1 <= _L2_MAX_REAL)
        return (
            jnp.where(matched, best_idx, 0),
            jnp.where(matched, d1, _LARGE),
            matched,
        )
    if _use_pallas(
        desc_q.shape[0], desc_t.shape[0], site="stereo", words=desc_q.shape[1]
    ):
        from vision_slam_frontend_tpu.ops.pallas_kernels import hamming_top2_mxu

        best_idx, d1, d2 = hamming_top2_mxu(desc_q, desc_t, valid_t)
    else:
        bq = unpack_bits(desc_q)
        bt = unpack_bits(desc_t)
        Kt = desc_t.shape[0]
        if Kt > _STREAM_THRESHOLD and Kt % 1024 == 0:
            best_idx, d1, d2 = _knn2_match_streamed(bq, bt, valid_t)
        else:
            dist = hamming_distance_matrix(bq, bt)
            best_idx, d1, d2 = knn2_match(dist, valid_t)
    # Accept only real distances: any true Hamming distance is <= bit width
    # (words * 32), so this cut rejects exactly the no-valid-train sentinel.
    # Width-derived so 512-bit BRISK matches with d in (256, 512] survive.
    matched = valid_q & (d1 < ratio * d2) & (d1 <= float(desc_q.shape[1] * 32))
    return (
        jnp.where(matched, best_idx, 0),
        jnp.where(matched, d1, _LARGE),
        matched,
    )


@jax.jit
def best_percent_mask(
    dist: jnp.ndarray, matched: jnp.ndarray, best_percent: float
) -> jnp.ndarray:
    """Keep only the best `best_percent` fraction of matches by distance.

    Mirrors the reference's sort-and-truncate
    (src/slam_frontend.cc:289-291): num_good = floor(num_matches * pct),
    keep the num_good smallest distances. Implemented as a rank threshold so
    shapes stay static.
    """
    masked = jnp.where(matched, dist, _LARGE)
    K = masked.shape[0]
    num_valid = jnp.sum(matched.astype(jnp.int32))
    num_good = (num_valid.astype(jnp.float32) * best_percent).astype(jnp.int32)
    if K <= 1024:
        # Counting ranks instead of argsort: rank_i = #{j : d_j < d_i or
        # (d_j == d_i and j < i)} — a (K, K) comparison reduction that runs
        # on the VPU, cheaper than a sort at these sizes, and identical to a
        # stable ascending sort's ranks.
        less = masked[None, :] < masked[:, None]
        idx = jnp.arange(K)
        tie_before = (masked[None, :] == masked[:, None]) & (idx[None, :] < idx[:, None])
        ranks = jnp.sum((less | tie_before).astype(jnp.int32), axis=1)
        return matched & (ranks < num_good)
    # Large K: the K^2 counting reduction loses to one K-row sort. Exact
    # stable-rank semantics via the cut value: keep everything strictly below
    # the num_good-th smallest distance, and break ties AT the cut value by
    # index order (cumsum), which reproduces counting-rank output bit-for-bit.
    sorted_d = jnp.sort(masked)
    v = sorted_d[jnp.maximum(num_good - 1, 0)]
    n_less = jnp.sum((masked < v) & matched)
    tie = matched & (masked == v)
    tie_rank = jnp.cumsum(tie.astype(jnp.int32)) - tie.astype(jnp.int32)
    keep = (masked < v) | (tie & (tie_rank < num_good - n_less))
    return matched & keep & (num_good > 0)


def _dedup_per_train(best_idx, d1, keep):
    """One-to-one cut: per (frame, train) keep only the closest query.

    OpenCV BFMatcher's crossCheck analog, restricted to colliding claims
    (the dominant failure on self-similar texture: many past features lock
    onto the same strong current feature, chaining distinct physical points
    into one union-find track — which poisons BA far beyond what
    Huber/trimming absorb). Same scatter-min trick as the track-priority
    scheme in frontend/keyframe.py; exact-distance ties keep both (rare,
    harmless).
    """
    W, K = keep.shape
    tgt = jnp.where(keep, best_idx, K)  # K = parked pad slot
    flat = (tgt + jnp.arange(W, dtype=tgt.dtype)[:, None] * (K + 1)).reshape(-1)
    dm = jnp.where(keep, d1, _LARGE).reshape(-1)
    m = jnp.full((W * (K + 1),), _LARGE, d1.dtype).at[flat].min(dm)
    return keep & (d1 <= m.reshape(-1)[flat].reshape(W, K))


@partial(jax.jit, static_argnames=("mutual",))
def match_window(
    desc_window: jnp.ndarray,
    valid_window: jnp.ndarray,
    desc_curr: jnp.ndarray,
    valid_curr: jnp.ndarray,
    ratio: float,
    best_percent: float,
    mutual: bool = False,
):
    """Match all W past frames against the current frame in one shot.

    The reference loops GetFeatureMatches over <=10 past frames
    (src/slam_frontend.cc:424-434); here the whole window is a single
    (W*K x 256) x (256 x K) MXU matmul + batched reductions.

    Args:
      desc_window: (W, K, 8) uint32 past descriptors (query side — the
        reference passes past as query, current as train).
      valid_window: (W, K) bool.
      desc_curr: (K, 8) uint32, valid_curr: (K,) bool.
      ratio, best_percent: reference defaults 0.6 / 0.3.

    Returns:
      train_idx: (W, K) int32 current-frame index matched by each past feature.
      dist: (W, K) float32.
      matched: (W, K) bool (ratio test + per-frame best-percent cut applied).
    """
    W, K, _ = desc_window.shape
    if jnp.issubdtype(desc_curr.dtype, jnp.floating):
        # Float-descriptor family: one (W*K)-query L2 kNN over the shared
        # current-frame train set, then the same ratio/best-percent cuts.
        i_f, d1_f, d2_f = _l2_knn2(
            desc_window.reshape(W * K, -1), desc_curr, valid_curr
        )
        best_idx = i_f.reshape(W, K)
        d1 = d1_f.reshape(W, K)
        d2 = d2_f.reshape(W, K)
        matched = valid_window & (d1 < ratio * d2) & (d1 <= _L2_MAX_REAL)
        d1m = jnp.where(matched, d1, _LARGE)
        keep = jax.vmap(lambda d, m: best_percent_mask(d, m, best_percent))(
            d1m, matched
        )
        if mutual:
            keep = _dedup_per_train(best_idx, d1, keep)
        return (
            jnp.where(keep, best_idx, 0),
            jnp.where(keep, d1, _LARGE),
            keep,
        )
    if _use_pallas(
        W * K, desc_curr.shape[0], site="window", words=desc_curr.shape[1]
    ):
        from vision_slam_frontend_tpu.ops.pallas_kernels import hamming_top2_mxu

        # All W past frames share the current train set: flatten to one
        # (W*K)-query kernel launch.
        idx_f, d1_f, d2_f = hamming_top2_mxu(
            desc_window.reshape(W * K, -1), desc_curr, valid_curr
        )
        best_idx = idx_f.reshape(W, K)
        d1 = d1_f.reshape(W, K)
        d2 = d2_f.reshape(W, K)
    else:
        bq = jax.vmap(unpack_bits)(desc_window)  # (W, K, 256)
        bt = unpack_bits(desc_curr)  # (K, 256)
        Kt = desc_curr.shape[0]
        if Kt > _STREAM_THRESHOLD and Kt % 1024 == 0:
            # Large K: stream train blocks — the (W*K, K) f32 matrix would be
            # GBs of HBM traffic per pass (2.7 GB at K=8192, W=10).
            i_f, d1_f, d2_f = _knn2_match_streamed(
                bq.reshape(W * K, -1), bt, valid_curr
            )
            best_idx = i_f.reshape(W, K)
            d1 = d1_f.reshape(W, K)
            d2 = d2_f.reshape(W, K)
        else:
            dist = hamming_distance_matrix(bq.reshape(W * K, -1), bt).reshape(W, K, K)
            best_idx, d1, d2 = jax.vmap(lambda d: knn2_match(d, valid_curr))(dist)
    matched = (
        valid_window
        & (d1 < ratio * d2)
        & (d1 <= float(desc_curr.shape[1] * 32))  # width-derived sentinel cut
    )
    d1m = jnp.where(matched, d1, _LARGE)
    keep = jax.vmap(lambda d, m: best_percent_mask(d, m, best_percent))(d1m, matched)
    if mutual:
        keep = _dedup_per_train(best_idx, d1, keep)
    return (
        jnp.where(keep, best_idx, 0),
        jnp.where(keep, d1, _LARGE),
        keep,
    )
