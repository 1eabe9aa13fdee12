"""Host-side Frontend driver: odometry gating + problem accumulation.

The thin streaming shell around the jitted keyframe step — the TPU-native
equivalent of the reference's slam::Frontend class surface
(reference: src/slam_frontend.h:117-143): ObserveImage / ObserveOdometry /
GetSLAMProblem / GetNumPoses / GetConfig + debug accessors.

Behavioral fixes vs the reference (SURVEY.md quirks): the first odometry
observation initializes prev_* from the current message instead of from
uninitialized members (quirk 5); vision factors still get emitted for every
window pair regardless of match count, matching the reference's effective
behavior (its min_vision_matches filter is commented out).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)

from vision_slam_frontend_tpu.frontend.config import FrontendConfig
from vision_slam_frontend_tpu.frontend.keyframe import (
    KeyframeResult,
    StepParams,
    WindowState,
    keyframe_step,
)
from vision_slam_frontend_tpu.types.slam_types import (
    FeatureMatch,
    OdometryFactor,
    RobotPose,
    SLAMNode,
    SLAMProblem,
    VisionFactor,
    VisionFeature,
)
from vision_slam_frontend_tpu.utils import np_geom


@jax.jit
def _pack_result(r: KeyframeResult):
    """Concatenate the host-needed result fields into ONE device i32 buffer.

    Transfer-latency optimization: device_get costs one link round trip PER
    ARRAY, which dominates the per-keyframe fetch on high-latency links
    (~15 leaves x ~0.5 ms through this environment's tunnel; packing to 4
    arrays was the round-4 cut, 4 -> 1 finishes it). The f32 fields travel
    as raw bits via bitcast — int transfers are bit-exact (no NaN
    canonicalization hazard) — with a 2-element [K, rows] header so the
    host unpacker needs no side-channel shapes. Track ids stay int32 (they
    exceed f32's 2^24 exact-integer range on long runs).
    """
    import jax.lax as lax

    F = jnp.concatenate(
        [r.pixels_undist, r.right_pixels_undist, r.points3d], axis=1
    )  # (K, 7) f32
    I1 = jnp.stack(
        [r.track_id, r.feat_valid.astype(jnp.int32)], axis=1
    )  # (K, 2) i32
    K = r.pixels_undist.shape[0]
    fids = jnp.zeros((1, K), jnp.int32).at[0, : r.window_frame_id.shape[0]].set(
        r.window_frame_id
    )
    I2 = jnp.concatenate(
        [r.window_curr_idx, r.window_matched.astype(jnp.int32), fids], axis=0
    )  # (2W + 1, K) i32
    meta = jnp.stack(
        [
            r.num_features.astype(jnp.float32),
            r.num_stereo_candidates.astype(jnp.float32),
            r.stereo_threshold,
        ]
    )  # (3,) f32
    return jnp.concatenate([
        jnp.array([K, I2.shape[0]], jnp.int32),  # header (trace constants)
        lax.bitcast_convert_type(F, jnp.int32).reshape(-1),
        I1.reshape(-1),
        I2.reshape(-1),
        lax.bitcast_convert_type(meta, jnp.int32),
    ])


def _unpack_result(buf):
    """Host-side inverse of _pack_result -> a KeyframeResult over numpy."""
    buf = np.asarray(buf)
    K, rows = int(buf[0]), int(buf[1])
    off = 2
    F = buf[off : off + K * 7].view(np.float32).reshape(K, 7)
    off += K * 7
    I1 = buf[off : off + K * 2].reshape(K, 2)
    off += K * 2
    I2 = buf[off : off + rows * K].reshape(rows, K)
    off += rows * K
    meta = buf[off : off + 3].view(np.float32)
    W = (rows - 1) // 2
    return KeyframeResult(
        pixels_undist=F[:, 0:2],
        pixels_raw=None,
        right_pixels_raw=None,
        right_pixels_undist=F[:, 2:4],
        points3d=F[:, 4:7],
        feat_valid=I1[:, 1].astype(bool),
        track_id=I1[:, 0],
        window_curr_idx=I2[:W],
        window_match_dist=None,
        window_matched=I2[W : 2 * W].astype(bool),
        window_frame_id=I2[2 * W, :W],
        num_features=np.int32(meta[0]),
        num_stereo_candidates=np.int32(meta[1]),
        stereo_threshold=np.float32(meta[2]),
    )


import jax.numpy as jnp  # noqa: E402  (used by _pack_result)


class Frontend:
    """Stateful stereo SLAM frontend.

    Feed it odometry and stereo images; it emits a SLAMProblem. All heavy
    compute runs as one jitted XLA program per keyframe; this class only
    gates keyframes on odometry and converts device outputs into the
    host-side problem containers.
    """

    def __init__(self, config: Optional[FrontendConfig | str] = None):
        if config is None or config == "":
            config = FrontendConfig()
        elif isinstance(config, str):
            config = FrontendConfig.load(config)
        self.config = config
        self._params = StepParams.from_config(config)
        from vision_slam_frontend_tpu.ops.descriptors import get_family

        fam = get_family(config.descriptor_family)
        import jax.numpy as _jnp

        self._state = WindowState.create(
            config.frame_life, config.max_features, config.stereo_threshold_init,
            words=fam.words,
            desc_dtype=_jnp.float32 if fam.distance == "l2" else _jnp.uint32,
        )
        self._curr_frame_id = 0

        self._odom_initialized = False
        self._init_odom_t = np.zeros(3)
        self._init_odom_q = np.array([1.0, 0, 0, 0])
        self._prev_odom_t = np.zeros(3)
        self._prev_odom_q = np.array([1.0, 0, 0, 0])
        self._odom_t = np.zeros(3)
        self._odom_q = np.array([1.0, 0, 0, 0])
        self._odom_timestamp = 0.0

        self._nodes: List[SLAMNode] = []
        self._vision_factors: List[VisionFactor] = []
        self._odometry_factors: List[OdometryFactor] = []
        self._node_track_ids: List[np.ndarray] = []

        self._debug_data: List[dict] = []
        self._last_image_shape = None
        self._stats: List[dict] = []
        self.verbosity = 0
        # Result pipelining: the device result of keyframe k is fetched while
        # keyframe k+1 computes (one entry deep), hiding the device->host
        # transfer behind compute. `_pending` holds (host context, device
        # result) for the newest keyframe; every public accessor flushes it
        # first, so observable state is always consistent. Disabled when
        # config.validate (validation wants errors AT the offending frame).
        self._pending = None
        # Streaming debug sink: when set (callable(entry, frontend)), each
        # keyframe's debug entry is handed over immediately instead of being
        # buffered in _debug_data — keeps memory flat on long runs (the
        # reference streams its debug images out per keyframe over ROS
        # topics, src/slam_frontend_main.cc:295-309).
        self.debug_sink = None

    # ------------------------------------------------------------------
    # Observation API
    # ------------------------------------------------------------------

    def observe_odometry(
        self, translation: np.ndarray, rotation: np.ndarray, timestamp: float
    ) -> None:
        """Latch the latest odometry pose. `rotation` is [w, x, y, z].

        (reference: src/slam_frontend.cc:250-263 ObserveOdometry)
        """
        translation = np.asarray(translation, np.float64)
        rotation = np_geom.quat_normalize(np.asarray(rotation, np.float64))
        if not self._odom_initialized:
            self._init_odom_t = translation.copy()
            self._init_odom_q = rotation.copy()
            self._prev_odom_t = translation.copy()
            self._prev_odom_q = rotation.copy()
            self._odom_initialized = True
        self._odom_t = translation
        self._odom_q = rotation
        self._odom_timestamp = float(timestamp)

    def _odom_check(self) -> bool:
        """Keyframe gate: moved >= min_odom_translation or rotated >=
        min_odom_rotation since the last keyframe
        (reference: src/slam_frontend.cc:175-186 OdomCheck)."""
        if not self._odom_initialized:
            return False
        if np.linalg.norm(self._prev_odom_t - self._odom_t) > self.config.min_odom_translation:
            return True
        if np_geom.quat_angular_distance(self._prev_odom_q, self._odom_q) > self.config.min_odom_rotation:
            return True
        return False

    def observe_image(
        self, left_image: np.ndarray, right_image: np.ndarray, time: float
    ) -> bool:
        """Process a stereo pair; returns True iff a new SLAM node was added.

        (reference: src/slam_frontend.cc:400-472 ObserveImage)
        """
        if not self._odom_check():
            return False
        shape = (np.shape(left_image), np.shape(right_image))
        if self._last_image_shape is not None and shape != self._last_image_shape:
            import warnings

            warnings.warn(
                f"stereo image shape changed {self._last_image_shape} -> {shape}: "
                "the keyframe step will silently recompile (slow on TPU); feed "
                "fixed-size images",
                stacklevel=2,
            )
        self._last_image_shape = shape
        fid = self._curr_frame_id
        # Odometry-estimated world pose of THIS keyframe (same formula the
        # accumulator uses for the node pose, src/slam_frontend.cc:444-446) —
        # feeds the device step's odometry-guided match gate.
        q_init_inv = np_geom.quat_inverse(self._init_odom_q)
        pose_t = np_geom.quat_rotate(q_init_inv, self._odom_t - self._init_odom_t)
        pose_q = np_geom.quat_multiply(self._odom_q, q_init_inv)

        # Ship images as uint8 (4x less host->device traffic than float32);
        # the device step casts to f32 on-chip. Pre-uploaded uint8 device
        # arrays (the CLI's prefetch thread issues the transfer ahead of
        # time) pass straight through.
        def as_u8(img):
            if isinstance(img, jax.Array) and img.dtype == np.uint8:
                return img
            return np.clip(np.asarray(img), 0, 255).astype(np.uint8)

        self._state, result = keyframe_step(
            self._params,
            self._state,
            as_u8(left_image),
            as_u8(right_image),
            np.int32(fid),
            capacity=self.config.max_features,
            window=self.config.frame_life,
            border=self.config.detect_border,
            blur_sigma=self.config.blur_sigma,
            num_levels=self.config.num_levels,
            scale_factor=self.config.pyramid_scale,
            descriptor_family=self.config.descriptor_family,
            mutual_check=self.config.mutual_check,
            curr_pose_t=pose_t.astype(np.float32),
            curr_pose_q=pose_q.astype(np.float32),
        )
        # Host context the deferred accumulation needs (odometry snapshot at
        # THIS keyframe; raw images only when debug images are on).
        ctx = {
            "fid": fid,
            "timestamp": self._odom_timestamp,
            "odom_t": self._odom_t.copy(),
            "odom_q": self._odom_q.copy(),
            "prev_odom_t": self._prev_odom_t.copy(),
            "prev_odom_q": self._prev_odom_q.copy(),
            "image_shape": np.shape(left_image)[:2],
        }
        if self.config.debug_images:
            ctx["left_image"] = np.asarray(left_image)
            ctx["right_image"] = np.asarray(right_image)
        elif not self.config.validate:
            # Pack the host-needed fields into ONE device i32 buffer (one
            # tiny jitted concat program): device_get pays a per-array round
            # trip on high-latency links (this environment's tunnel), so 11
            # result leaves -> 1 is a direct per-keyframe latency cut.
            # (pixels_raw / right_pixels_raw / window_match_dist only feed
            # debug drawing and are excluded entirely; validation mode keeps
            # the full result: check_keyframe_result inspects raw pixels.)
            result = _pack_result(result)
        if self.config.validate:
            # Validation wants the error AT the offending frame: synchronous.
            self._flush_pending()
            self._materialize(ctx, jax.device_get(result))
        else:
            # Pipeline one deep: fetch keyframe k-1 while k computes.
            self._flush_pending()
            # Start all result leaves' device->host copies NOW: by the time
            # the next keyframe flushes this one, every transfer has already
            # streamed in the background instead of paying one link
            # round-trip per leaf inside device_get (~15 leaves; measurable
            # on high-latency links like this environment's tunnel).
            for leaf in jax.tree_util.tree_leaves(result):
                try:
                    leaf.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    break
            self._pending = (ctx, result)
        self._prev_odom_t = self._odom_t.copy()
        self._prev_odom_q = self._odom_q.copy()
        self._curr_frame_id += 1
        return True

    def _flush_pending(self) -> None:
        if self._pending is None:
            return
        ctx, result = self._pending
        self._pending = None
        if isinstance(result, jax.Array):  # packed fetch (see observe_image)
            result = _unpack_result(jax.device_get(result))
        else:
            result = jax.device_get(result)
        self._materialize(ctx, result)

    def _materialize(self, ctx: dict, r: KeyframeResult) -> None:
        """Host-side bookkeeping for one fetched keyframe result."""
        fid = ctx["fid"]
        if self.config.validate:
            from vision_slam_frontend_tpu.utils.checks import check_keyframe_result

            check_keyframe_result(
                fid, r, ctx["image_shape"], self.config.max_features
            )
        self._accumulate(fid, r, ctx)
        # Per-keyframe observability (the reference's only metric is one
        # end-of-run summary line; SURVEY.md section 5).
        matched_per_slot = np.asarray(r.window_matched).sum(axis=1)
        self._stats.append(
            {
                "frame_id": fid,
                "timestamp": ctx["timestamp"],
                "num_features": int(r.num_features),
                "num_stereo_candidates": int(r.num_stereo_candidates),
                "stereo_threshold": float(r.stereo_threshold),
                "window_matches": matched_per_slot.tolist(),
            }
        )
        if self.verbosity > 1:
            print(
                f"[frontend] keyframe {fid}: {int(r.num_features)} features "
                f"({int(r.num_stereo_candidates)} stereo candidates, "
                f"epipolar gate {float(r.stereo_threshold):.1f}), window matches "
                f"{matched_per_slot.tolist()}"
            )
        if self.config.debug_images:
            entry = {
                "frame_id": fid,
                "left_image": ctx["left_image"],
                "right_image": ctx["right_image"],
                "result": r,
            }
            if self.debug_sink is not None:
                self.debug_sink(entry, self)
            else:
                self._debug_data.append(entry)

    def _accumulate(self, fid: int, r: KeyframeResult, ctx: dict) -> None:
        """Convert one keyframe's device outputs into problem entries."""
        n = int(r.num_features)
        feats = [
            VisionFeature(
                i,
                r.pixels_undist[i].copy(),
                r.points3d[i].copy(),
                pixel_right=r.right_pixels_undist[i].copy(),
            )
            for i in range(n)
        ]
        # World pose relative to odometry start
        # (reference: src/slam_frontend.cc:444-446).
        q_init_inv = np_geom.quat_inverse(self._init_odom_q)
        loc = np_geom.quat_rotate(q_init_inv, ctx["odom_t"] - self._init_odom_t)
        angle = np_geom.quat_multiply(ctx["odom_q"], q_init_inv)
        self._nodes.append(
            SLAMNode(
                node_idx=fid,
                timestamp=ctx["timestamp"],
                pose=RobotPose(loc=loc.astype(np.float32), angle=angle.astype(np.float32)),
                features=feats,
            )
        )
        self._node_track_ids.append(np.asarray(r.track_id[:n]).copy())

        # Vision factors: one per filled window slot, oldest first, even if
        # empty (the reference's disabled min_vision_matches filter).
        for w in range(self.config.frame_life):
            past_id = int(r.window_frame_id[w])
            if past_id < 0:
                continue
            m = np.asarray(r.window_matched[w])
            qs = np.nonzero(m)[0]
            matches = [
                FeatureMatch(int(q), int(r.window_curr_idx[w][q])) for q in qs
            ]
            self._vision_factors.append(
                VisionFactor(
                    pose_idx_initial=past_id,
                    pose_idx_current=fid,
                    feature_matches=matches,
                )
            )

        # Odometry factor between consecutive keyframes
        # (reference: src/slam_frontend.cc:311-321 AddOdometryFactor).
        if fid > 0:
            q_prev_inv = np_geom.quat_inverse(ctx["prev_odom_q"])
            self._odometry_factors.append(
                OdometryFactor(
                    pose_i=fid - 1,
                    pose_j=fid,
                    translation=np_geom.quat_rotate(
                        q_prev_inv, ctx["odom_t"] - ctx["prev_odom_t"]
                    ).astype(np.float32),
                    rotation=np_geom.quat_multiply(ctx["odom_q"], q_prev_inv).astype(
                        np.float32
                    ),
                )
            )

    # ------------------------------------------------------------------
    # Checkpoint / resume (the reference has none: a crash mid-bag loses
    # everything, SURVEY.md section 5 — this makes long runs resumable)
    # ------------------------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        """Snapshot the full frontend state: accumulated problem, device
        window state, odometry latch, frame counter."""
        self._flush_pending()
        import jax

        from vision_slam_frontend_tpu.io.serialize import problem_to_arrays

        data = problem_to_arrays(self.get_slam_problem(), self._node_track_ids)
        state = jax.device_get(self._state)
        data.update(
            {
                "ckpt_window_kps": state.kps,
                "ckpt_window_desc": state.desc,
                "ckpt_window_valid": state.valid,
                "ckpt_window_track_id": state.track_id,
                "ckpt_window_frame_id": state.frame_id,
                "ckpt_window_count": state.count,
                "ckpt_stereo_threshold": state.stereo_threshold,
                "ckpt_window_points3d": state.points3d,
                "ckpt_window_pose_t": state.pose_t,
                "ckpt_window_pose_q": state.pose_q,
                "ckpt_curr_frame_id": np.int64(self._curr_frame_id),
                "ckpt_odom_initialized": np.bool_(self._odom_initialized),
                "ckpt_init_odom_t": self._init_odom_t,
                "ckpt_init_odom_q": self._init_odom_q,
                "ckpt_prev_odom_t": self._prev_odom_t,
                "ckpt_prev_odom_q": self._prev_odom_q,
                "ckpt_odom_t": self._odom_t,
                "ckpt_odom_q": self._odom_q,
                "ckpt_odom_timestamp": np.float64(self._odom_timestamp),
            }
        )
        import os

        tmp = path + ".tmp"
        with open(tmp, "wb") as f:  # file object: savez won't append ".npz"
            np.savez_compressed(f, **data)
        os.replace(tmp, path)

    def load_checkpoint(self, path: str) -> float:
        """Restore state saved by save_checkpoint; returns the last processed
        odometry timestamp (callers skip events at or before it)."""
        from vision_slam_frontend_tpu.frontend.keyframe import WindowState
        from vision_slam_frontend_tpu.io.serialize import arrays_to_problem

        with np.load(path) as raw:
            data = dict(raw)
        problem = arrays_to_problem(data)
        self._nodes = problem.nodes
        self._vision_factors = problem.vision_factors
        self._odometry_factors = problem.odometry_factors
        if "feat_track" in data and len(self._nodes):
            flat = data["feat_track"]
            self._node_track_ids = []
            off = 0
            for n in self._nodes:
                k = len(n.features)
                self._node_track_ids.append(flat[off : off + k].copy())
                off += k
        self._state = WindowState(
            kps=jnp_asarray(data["ckpt_window_kps"]),
            desc=jnp_asarray(data["ckpt_window_desc"]),
            valid=jnp_asarray(data["ckpt_window_valid"]),
            track_id=jnp_asarray(data["ckpt_window_track_id"]),
            frame_id=jnp_asarray(data["ckpt_window_frame_id"]),
            count=jnp_asarray(data["ckpt_window_count"]),
            stereo_threshold=jnp_asarray(data["ckpt_stereo_threshold"]),
            # Round-4 fields; zero-filled for pre-round-4 checkpoints (the
            # guided gate passes features without depth through).
            points3d=jnp_asarray(
                data.get(
                    "ckpt_window_points3d",
                    np.zeros(data["ckpt_window_kps"].shape[:2] + (3,), np.float32),
                )
            ),
            pose_t=jnp_asarray(
                data.get(
                    "ckpt_window_pose_t",
                    np.zeros((data["ckpt_window_kps"].shape[0], 3), np.float32),
                )
            ),
            pose_q=jnp_asarray(
                data.get(
                    "ckpt_window_pose_q",
                    np.tile(
                        np.array([1.0, 0, 0, 0], np.float32),
                        (data["ckpt_window_kps"].shape[0], 1),
                    ),
                )
            ),
        )
        self._curr_frame_id = int(data["ckpt_curr_frame_id"])
        self._odom_initialized = bool(data["ckpt_odom_initialized"])
        self._init_odom_t = data["ckpt_init_odom_t"]
        self._init_odom_q = data["ckpt_init_odom_q"]
        self._prev_odom_t = data["ckpt_prev_odom_t"]
        self._prev_odom_q = data["ckpt_prev_odom_q"]
        self._odom_t = data["ckpt_odom_t"]
        self._odom_q = data["ckpt_odom_q"]
        self._odom_timestamp = float(data["ckpt_odom_timestamp"])
        return self._odom_timestamp

    # ------------------------------------------------------------------
    # Output API
    # ------------------------------------------------------------------

    def peek_accumulated(self):
        """Already-materialized problem content WITHOUT flushing the result
        pipeline: (nodes, vision_factors, odometry_factors) lists, trailing
        the device by at most one keyframe (the pending pipeline slot).

        The live-viewer seam: per-keyframe publishing reads deltas from here
        so the device->host fetch stays off the critical path (get_slam_problem
        flushes, which stalls the one-deep pipeline every call)."""
        return self._nodes, self._vision_factors, self._odometry_factors

    def get_slam_problem(self) -> SLAMProblem:
        """(reference: src/slam_frontend.cc:498-503 GetSLAMProblem)"""
        self._flush_pending()
        return SLAMProblem(
            nodes=list(self._nodes),
            vision_factors=list(self._vision_factors),
            odometry_factors=list(self._odometry_factors),
        )

    def get_num_poses(self) -> int:
        self._flush_pending()
        return len(self._nodes)

    def update_poses(self, nodes_or_t, poses_q=None) -> int:
        """Write refined poses (e.g. from local/global BA) back into the
        accumulated problem.

        Accepts either a list of SLAMNodes (poses copied by node_idx) or a
        pair of arrays (poses_t (N, 3), poses_q (N, 4)) aligned with node
        order. Returns the number of poses updated. This is the supported
        write-back seam for BA refinement — callers must not reach into
        `_nodes` (get_slam_problem copies the node LIST, not the nodes, so
        mutating its result aliases internal state)."""
        self._flush_pending()
        if poses_q is None:
            by_idx = {n.node_idx: n for n in self._nodes}
            count = 0
            for src in nodes_or_t:
                dst = by_idx.get(src.node_idx)
                if dst is None:
                    continue
                dst.pose.loc = np.asarray(src.pose.loc, np.float32).copy()
                dst.pose.angle = np.asarray(src.pose.angle, np.float32).copy()
                count += 1
            return count
        poses_t = np.asarray(nodes_or_t, np.float32)
        poses_q = np.asarray(poses_q, np.float32)
        if len(poses_t) != len(self._nodes) or len(poses_q) != len(self._nodes):
            raise ValueError(
                f"pose arrays ({len(poses_t)}, {len(poses_q)}) do not match "
                f"{len(self._nodes)} nodes"
            )
        for node, t, q in zip(self._nodes, poses_t, poses_q):
            node.pose.loc = t.copy()
            node.pose.angle = q.copy()
        return len(self._nodes)

    def get_config(self) -> FrontendConfig:
        return self.config

    @property
    def node_track_ids(self) -> List[np.ndarray]:
        """Per-node persistent track ids (framework extension for BA)."""
        self._flush_pending()
        return self._node_track_ids

    @property
    def stats(self) -> List[dict]:
        """Per-keyframe pipeline statistics (features, stereo survival,
        adaptive threshold, window match counts)."""
        self._flush_pending()
        return self._stats

    def stats_summary(self) -> dict:
        self._flush_pending()
        if not self._stats:
            return {}
        feats = [s["num_features"] for s in self._stats]
        cands = [s["num_stereo_candidates"] for s in self._stats]
        return {
            "keyframes": len(self._stats),
            "features_mean": float(np.mean(feats)),
            "features_min": int(np.min(feats)),
            "stereo_survival_mean": float(
                np.mean([f / max(c, 1) for f, c in zip(feats, cands)])
            ),
            "stereo_threshold_last": self._stats[-1]["stereo_threshold"],
        }

    # Debug accessors (reference: getDebugImages / GetLastDebugImage etc.)

    def get_debug_data(self) -> List[dict]:
        self._flush_pending()
        return self._debug_data

    def get_last_debug_data(self) -> Optional[dict]:
        self._flush_pending()
        return self._debug_data[-1] if self._debug_data else None
