"""Windowed local bundle adjustment: refine the trailing keyframes online.

The "complete frontend + windowed local BA" configuration from BASELINE.md:
as keyframes stream in, optimize the last `window` poses (+ their landmarks)
against vision + odometry factors while older poses stay frozen — the
standard local-BA stage of a production visual-SLAM system, which the
reference delegates entirely to its offline backend.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vision_slam_frontend_tpu.backend.ba import BASolverConfig, optimize
from vision_slam_frontend_tpu.backend.tracks import build_ba_problem
from vision_slam_frontend_tpu.types.slam_types import (
    OdometryFactor,
    SLAMNode,
    SLAMProblem,
    VisionFactor,
)


def slice_problem(problem: SLAMProblem, start: int) -> SLAMProblem:
    """Sub-problem over nodes with node_idx >= start, re-indexed from 0.
    Factors touching earlier nodes are dropped (their constraints enter via
    the frozen-pose gauge of the retained overlap)."""
    out = SLAMProblem()
    for node in problem.nodes:
        if node.node_idx >= start:
            out.nodes.append(
                SLAMNode(node.node_idx - start, node.timestamp, node.pose, node.features)
            )
    for vf in problem.vision_factors:
        if vf.pose_idx_initial >= start and vf.pose_idx_current >= start:
            out.vision_factors.append(
                VisionFactor(
                    vf.pose_idx_initial - start,
                    vf.pose_idx_current - start,
                    vf.feature_matches,
                )
            )
    for of in problem.odometry_factors:
        if of.pose_i >= start and of.pose_j >= start:
            out.odometry_factors.append(
                OdometryFactor(of.pose_i - start, of.pose_j - start, of.translation, of.rotation)
            )
    return out


def _pad_up(n: int, mult: int) -> int:
    return max(mult, -(-n // mult) * mult)


def _pad_ba_for_device(ba, n_poses: int, lm_mult: int = 512, obs_mult: int = 2048, odom_cap: int = 32):
    """Pad a (numpy) BAProblem to bucketed capacities so the device LM
    program compiles a handful of times per session instead of per keyframe.
    Padded poses are masked AND frozen (no factors touch them); padded
    observations/landmarks/odometry are masked out."""
    P0 = ba.poses_t.shape[0]
    L0 = ba.landmarks.shape[0]
    N0 = ba.obs_pose.shape[0]
    Q0 = ba.odom_i.shape[0]
    P = max(n_poses, P0)
    L = _pad_up(L0, lm_mult)
    N = _pad_up(N0, obs_mult)
    Q = max(odom_cap, Q0)

    def padn(a, n, fill=0):
        pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(np.asarray(a), pad, constant_values=fill)

    fixed = padn(np.asarray(ba.pose_fixed, bool) if ba.pose_fixed is not None
                 else np.zeros(P0, bool), P, fill=True)
    q_pad = padn(ba.poses_q, P)
    q_pad[P0:, 0] = 1.0  # identity quaternions on padded poses
    oq_pad = padn(ba.odom_q, Q)
    oq_pad[Q0:, 0] = 1.0
    return ba.replace(
        poses_t=padn(ba.poses_t, P),
        poses_q=q_pad,
        pose_mask=padn(ba.pose_mask, P),
        pose_fixed=fixed,
        landmarks=padn(ba.landmarks, L),
        landmark_mask=padn(ba.landmark_mask, L),
        obs_pose=padn(ba.obs_pose, N),
        obs_landmark=padn(ba.obs_landmark, N),
        obs_pixel=padn(ba.obs_pixel, N),
        obs_mask=padn(ba.obs_mask, N),
        obs_pixel_right=(padn(ba.obs_pixel_right, N)
                         if ba.obs_pixel_right is not None else None),
        obs_right_mask=(padn(ba.obs_right_mask, N)
                        if ba.obs_right_mask is not None else None),
        odom_i=padn(ba.odom_i, Q),
        odom_j=padn(ba.odom_j, Q),
        odom_t=padn(ba.odom_t, Q),
        odom_q=oq_pad,
        odom_mask=padn(ba.odom_mask, Q),
        # Scatter formulation on device: no gather tables needed.
        pose_obs=None, pose_obs_mask=None, lm_obs=None, lm_obs_mask=None,
    )


def _pack_ba(ba):
    """Flatten the padded window problem into ONE host i32 buffer (the f32
    leaves ride as raw bits via a view — int transfers have no NaN
    canonicalization hazard, so the round trip is bit-exact) so each
    keyframe's local-BA call pays 1 host->device transfer instead of ~17:
    through this rig's tunnel each array transfer costs an RTT (3-25 ms),
    which dominated the soak's 216 ms p50. Returns (buf, shapes) with
    `shapes` the static (P, L, N, Q, has_right) key the device unpacker
    derives all slice offsets from."""
    P = ba.poses_t.shape[0]
    L = ba.landmarks.shape[0]
    N = ba.obs_pose.shape[0]
    Q = ba.odom_i.shape[0]
    has_right = ba.obs_pixel_right is not None
    f = [
        np.asarray(ba.poses_t, np.float32).ravel(),
        np.asarray(ba.poses_q, np.float32).ravel(),
        np.asarray(ba.landmarks, np.float32).ravel(),
        np.asarray(ba.obs_pixel, np.float32).ravel(),
        np.asarray(ba.odom_t, np.float32).ravel(),
        np.asarray(ba.odom_q, np.float32).ravel(),
    ]
    if has_right:
        f.append(np.asarray(ba.obs_pixel_right, np.float32).ravel())
    i = [
        np.asarray(ba.obs_pose, np.int32).ravel(),
        np.asarray(ba.obs_landmark, np.int32).ravel(),
        np.asarray(ba.odom_i, np.int32).ravel(),
        np.asarray(ba.odom_j, np.int32).ravel(),
        np.asarray(ba.obs_mask, np.int32).ravel(),
        np.asarray(ba.odom_mask, np.int32).ravel(),
        np.asarray(ba.pose_fixed, np.int32).ravel(),
    ]
    if has_right:
        i.append(np.asarray(ba.obs_right_mask, np.int32).ravel())
    fbuf = np.ascontiguousarray(np.concatenate(f))
    return (
        np.concatenate([fbuf.view(np.int32), np.concatenate(i)]),
        (P, L, N, Q, has_right),
    )


def _f_count(shapes) -> int:
    """Number of f32 elements at the head of the packed buffer (static)."""
    P, L, N, Q, has_right = shapes
    return P * 7 + L * 3 + N * 2 + Q * 7 + (N * 2 if has_right else 0)


def _unpack_ba(buf, shapes):
    """Rebuild the BAProblem pytree from the packed i32 buffer (traced; all
    slice offsets are static from `shapes`; the f32 head is bitcast back)."""
    import jax.lax as lax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.types.slam_types import BAProblem

    P, L, N, Q, has_right = shapes
    nf = _f_count(shapes)
    fbuf = lax.bitcast_convert_type(buf[:nf], jnp.float32)
    ibuf = buf[nf:]
    off = 0

    def takef(n, shape):
        nonlocal off
        out = fbuf[off : off + n].reshape(shape)
        off += n
        return out

    poses_t = takef(P * 3, (P, 3))
    poses_q = takef(P * 4, (P, 4))
    landmarks = takef(L * 3, (L, 3))
    obs_pixel = takef(N * 2, (N, 2))
    odom_t = takef(Q * 3, (Q, 3))
    odom_q = takef(Q * 4, (Q, 4))
    obs_pixel_right = takef(N * 2, (N, 2)) if has_right else None
    ioff = 0

    def takei(n, shape, as_bool=False):
        nonlocal ioff
        out = ibuf[ioff : ioff + n].reshape(shape)
        ioff += n
        return out.astype(bool) if as_bool else out

    obs_pose = takei(N, (N,))
    obs_landmark = takei(N, (N,))
    odom_i = takei(Q, (Q,))
    odom_j = takei(Q, (Q,))
    obs_mask = takei(N, (N,), as_bool=True)
    odom_mask = takei(Q, (Q,), as_bool=True)
    pose_fixed = takei(P, (P,), as_bool=True)
    obs_right_mask = takei(N, (N,), as_bool=True) if has_right else None

    return BAProblem(
        poses_t=poses_t, poses_q=poses_q,
        pose_mask=jnp.ones((P,), bool), pose_fixed=pose_fixed,
        landmarks=landmarks, landmark_mask=jnp.ones((L,), bool),
        obs_pose=obs_pose, obs_landmark=obs_landmark,
        obs_pixel=obs_pixel, obs_mask=obs_mask,
        obs_pixel_right=obs_pixel_right, obs_right_mask=obs_right_mask,
        odom_i=odom_i, odom_j=odom_j, odom_t=odom_t, odom_q=odom_q,
        odom_mask=odom_mask,
    )


def _device_lm_solve_packed_impl(cam, buf, hd, wt, wr, trim,
                                 shapes, iters: int, cg_iters: int):
    """Packed-transfer entry: unpack the single buffer, run the standard
    device LM solve, and pack the result into ONE f32 vector
    [poses_t.ravel() | poses_q.ravel() | cost0 | cost] so the host pays a
    single fetch RTT instead of four. hd/wt/wr/trim arrive as static Python
    floats (constants of the production local-BA call site), so they are
    baked into the trace — zero upload cost."""
    import jax.numpy as jnp

    prob = _unpack_ba(buf, shapes)
    pt, pq, cost0, cost = _device_lm_solve_impl(
        cam, prob, jnp.float32(hd), jnp.float32(wt), jnp.float32(wr),
        jnp.float32(trim), iters, cg_iters,
    )
    return jnp.concatenate(
        [pt.reshape(-1), pq.reshape(-1), jnp.stack([cost0, cost])]
    )


def _device_lm_solve_impl(cam, prob, hd, wt, wr, trim, iters: int, cg_iters: int):
    """The ENTIRE windowed-LM solve as one traced program: pre-trim ->
    iters x (linearize -> Schur-PCG -> accept/reject with lambda control).

    Why: the host-loop optimize() costs ~30 host<->device round trips per
    keyframe (6 LM iterations x several dispatches + cost fetches), which
    through this rig's TCP tunnel measured 747 ms p50 per keyframe in the
    round-5 1000-frame soak — pure link latency, not compute. One fused
    program turns local BA into a single dispatch + one result fetch.
    """
    import jax
    import jax.numpy as jnp

    from vision_slam_frontend_tpu.backend.ba import (
        _apply_step,
        _linearize,
        _reproj_residual_norms,
        _solve_schur_pcg_scatter,
        compute_cost,
    )

    # Pre-trim gross outliers at the initial estimate (the loose 10x gate of
    # optimize()'s trimming path — local windows see the occasional
    # hundreds-of-px false match that Huber alone only linearizes).
    norms = _reproj_residual_norms(cam, prob)
    prob = prob.replace(obs_mask=prob.obs_mask & (norms < 10.0 * trim))
    cost0 = compute_cost(cam, prob, hd, wt, wr, True)

    def body(_, carry):
        pt, pq, lm, lam, cost = carry
        p = prob.replace(poses_t=pt, poses_q=pq, landmarks=lm)
        r, Jp, Jl, ro, Ji, Jj = _linearize(cam, p, hd, wt, wr, True)
        dp, dl, _ = _solve_schur_pcg_scatter(
            r, Jp, Jl, ro, Ji, Jj, p, lam, cg_iters, False
        )
        cand = _apply_step(p, dp, dl)
        nc = compute_cost(cam, cand, hd, wt, wr, True)
        ok = jnp.isfinite(nc) & (nc < cost)

        def sel(a, b):
            return jnp.where(ok, a, b)

        return (
            sel(cand.poses_t, pt), sel(cand.poses_q, pq),
            sel(cand.landmarks, lm),
            jnp.where(ok, jnp.maximum(lam * 0.4, 1e-9),
                      jnp.minimum(lam * 4.0, 1e6)),
            jnp.where(ok, nc, cost),
        )

    init = (prob.poses_t, prob.poses_q, prob.landmarks, jnp.float32(1e-3), cost0)
    pt, pq, _lm, _lam, cost = jax.lax.fori_loop(0, iters, body, init)
    return pt, pq, cost0, cost


_device_lm_solve = None  # jitted lazily (keeps jax import out of module load)


def _get_device_solver():
    global _device_lm_solve
    if _device_lm_solve is None:
        import jax

        _device_lm_solve = jax.jit(
            _device_lm_solve_packed_impl,
            static_argnames=("hd", "wt", "wr", "trim", "shapes",
                             "iters", "cg_iters"),
        )
    return _device_lm_solve


_cam_cache: dict = {}  # id(config) -> (config, device-committed CameraParams)


def _device_camera(config):
    """CameraParams committed to the device ONCE per config object: its 12
    pytree leaves would otherwise be re-uploaded on every keyframe's
    local-BA call (12 tunnel RTTs for ~200 bytes of calibration)."""
    import jax

    from vision_slam_frontend_tpu.backend.residuals import CameraParams

    hit = _cam_cache.get(id(config))
    if hit is not None and hit[0] is config:
        return hit[1]
    cam = jax.device_put(CameraParams.from_config(config))
    _cam_cache[id(config)] = (config, cam)
    return cam


# Pipelined local BA (opt-in): the in-flight device solve from the previous
# keyframe, flushed (result applied) at the START of the next call — the
# solve + fetch then overlap the inter-keyframe frame IO / keyframe step
# instead of blocking. Math is IDENTICAL to the synchronous path: the
# pending result is applied before the next window problem is built, so
# every solve sees exactly the poses the synchronous schedule would.
_pending = None  # (node_refs, k0, out_device_array) or None


def flush_local_ba():
    """Apply the in-flight local-BA result (blocks until the async fetch
    completes — usually already streamed in). Returns (updated, info)."""
    global _pending
    if _pending is None:
        return 0, None
    nodes, k0, P, dev_out = _pending  # P = PADDED pose capacity of the solve
    _pending = None
    out = np.asarray(dev_out)
    new_t = out[: P * 3].reshape(P, 3)
    new_q = out[P * 3 : P * 7].reshape(P, 4)
    cost0, cost = float(out[-2]), float(out[-1])
    for k in range(k0, len(nodes)):
        nodes[k].pose.loc = new_t[k].astype(np.float32)
        nodes[k].pose.angle = new_q[k].astype(np.float32)
    return len(nodes) - k0, {"cost": cost, "history": [cost0, cost]}


def windowed_local_ba(
    problem: SLAMProblem,
    config,
    window: int = 8,
    fixed_overlap: int = 2,
    solver: Optional[BASolverConfig] = None,
    pipeline: bool = False,
):
    """Optimize the last `window` poses; the oldest `fixed_overlap` of them
    stay frozen as the anchor to the rest of the trajectory.

    Runs as ONE device program per keyframe (see _device_lm_solve_impl) over
    bucketed fixed capacities. Mutates `problem` in place (updates the tail
    nodes' poses). Returns (updated_tail_count, info) — info is None when
    the window is too small to optimize. Passing an explicit `solver` opts
    into the host-loop optimize() path (full trimming/validation knobs).

    With `pipeline=True` (the CLI's streaming loop) the device solve is
    dispatched asynchronously and applied at the NEXT call (or at
    `flush_local_ba()`): same math — the pending result lands
    before the next window is built — but the solve + result fetch overlap
    the caller's inter-keyframe work. The returned (updated, info) then
    describe the PREVIOUS keyframe's flushed solve.
    """
    import jax.numpy as jnp

    flushed = flush_local_ba() if pipeline else None

    n = len(problem.nodes)
    if n < fixed_overlap + 2:
        return flushed if pipeline else (0, None)
    start = max(0, n - window)
    sub = slice_problem(problem, start)
    if len(sub.vision_factors) == 0:
        return flushed if pipeline else (0, None)
    ba = build_ba_problem(sub, left_cam_to_robot=config.left_cam_to_robot)
    m = len(sub.nodes)
    fixed = np.zeros(ba.poses_t.shape[0], bool)
    fixed[: min(fixed_overlap, m)] = True
    ba = ba.replace(pose_fixed=fixed)

    if solver is not None:
        # Host-loop path: the full BASolverConfig surface (multi-round
        # trimming, validation, checkpointing) at host-loop dispatch cost.
        ba = ba.replace(pose_fixed=jnp.asarray(ba.pose_fixed))
        opt, info = optimize(ba, config=config, solver=solver)
        new_t, new_q = np.asarray(opt.poses_t), np.asarray(opt.poses_q)
    else:
        ba = _pad_ba_for_device(ba, n_poses=window)
        buf, shapes = _pack_ba(ba)
        cam = _device_camera(config)
        fn = _get_device_solver()
        dev_out = fn(
            cam, buf, hd=5.0, wt=30.0, wr=60.0, trim=8.0,
            shapes=shapes, iters=6, cg_iters=24,
        )
        if pipeline:
            global _pending
            try:
                dev_out.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
            k0 = min(fixed_overlap, m)
            _pending = ([problem.nodes[start + k] for k in range(m)], k0,
                        shapes[0], dev_out)
            return flushed
        out = np.asarray(dev_out)
        P = shapes[0]
        new_t = out[: P * 3].reshape(P, 3)
        new_q = out[P * 3 : P * 7].reshape(P, 4)
        cost0, cost = float(out[-2]), float(out[-1])
        info = {"cost": cost, "history": [cost0, cost]}
    for k in range(min(fixed_overlap, m), m):
        node = problem.nodes[start + k]
        node.pose.loc = new_t[k].astype(np.float32)
        node.pose.angle = new_q[k].astype(np.float32)
    return m - min(fixed_overlap, m), info
