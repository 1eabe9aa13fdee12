"""Runtime invariant checking — the framework's sanitizer subsystem.

The reference has no sanitizers (single-threaded, no TSAN/ASAN flags,
reference: CMakeLists.txt — and real memory bugs a sanitizer would catch,
SURVEY.md "Reference quirks" 2-4). Its runtime verification is glog CHECK
macros that abort the process (reference: src/slam_frontend.cc:158,340,
src/slam_frontend_main.cc:290-291).

The TPU-native analogue has two layers:

  1. host-side invariant checks on every keyframe's device outputs
     (`check_keyframe_result`) — NaN/Inf, pixel bounds, index ranges,
     capacity overflow. Cheap (numpy on already-fetched arrays), enabled
     with `FrontendConfig(validate=True)` or `--validate`;
  2. device-side float checks via `jax.experimental.checkify`
     (`checkified`) for debugging NaN origins *inside* a jitted program —
     opt-in because checkify disables fusion-friendly paths and slows the
     step down.

Deterministic kernels make data races structurally impossible; these checks
cover the numeric failure modes instead.
"""

from __future__ import annotations

import numpy as np


class InvariantViolation(RuntimeError):
    """A keyframe/solver output violated a framework invariant."""


def _fail(frame_id: int, msg: str):
    raise InvariantViolation(f"keyframe {frame_id}: {msg}")


def check_keyframe_result(frame_id: int, r, image_shape, capacity: int) -> None:
    """Validate one KeyframeResult fetched from device.

    Raises InvariantViolation with the frame id and the violated invariant
    (the glog-CHECK role, without aborting the interpreter).
    """
    h, w = int(image_shape[0]), int(image_shape[1])
    n = int(r.num_features)
    if not (0 <= n <= capacity):
        _fail(frame_id, f"num_features {n} outside [0, {capacity}]")
    valid = np.asarray(r.feat_valid)
    if int(valid.sum()) != n:
        _fail(frame_id, f"feat_valid popcount {int(valid.sum())} != num_features {n}")
    if n == 0:
        return

    for name, arr in (
        ("pixels_undist", r.pixels_undist),
        ("pixels_raw", r.pixels_raw),
        ("right_pixels_raw", r.right_pixels_raw),
        ("right_pixels_undist", r.right_pixels_undist),
        ("points3d", r.points3d),
    ):
        a = np.asarray(arr)[:n]
        if not np.isfinite(a).all():
            bad = int(np.sum(~np.isfinite(a).all(axis=-1)))
            _fail(frame_id, f"{name}: {bad}/{n} rows non-finite")

    raw = np.asarray(r.pixels_raw)[:n]
    # Raw detections must lie inside the image (undistorted pixels may leave
    # the frame legitimately; raw FAST corners cannot).
    if (raw[:, 0] < 0).any() or (raw[:, 0] >= w).any() or (raw[:, 1] < 0).any() or (raw[:, 1] >= h).any():
        _fail(frame_id, f"pixels_raw outside {w}x{h} image bounds")

    tid = np.asarray(r.track_id)[:n]
    if (tid < 0).any():
        _fail(frame_id, "negative track id")
    if (tid > frame_id * capacity + capacity).any():
        _fail(frame_id, f"track id exceeds newest possible id for frame {frame_id}")

    widx = np.asarray(r.window_curr_idx)
    wmatched = np.asarray(r.window_matched)
    if wmatched.any():
        sel = widx[wmatched]
        if (sel < 0).any() or (sel >= capacity).any():
            _fail(frame_id, "window match index outside [0, capacity)")
        # Matches must point at valid (compacted) current features.
        if (sel >= n).any():
            _fail(frame_id, f"window match points at invalid feature (>= {n})")


def check_ba_step(it: int, d_pose, d_lm) -> None:
    """Validate one BA solver step before it is applied."""
    dp = np.asarray(d_pose)
    dl = np.asarray(d_lm)
    if not np.isfinite(dp).all():
        raise InvariantViolation(f"BA iter {it}: non-finite pose update")
    if not np.isfinite(dl).all():
        raise InvariantViolation(f"BA iter {it}: non-finite landmark update")


def checkified(fn, *args, **static):
    """Run `fn(*args)` under jax.experimental.checkify float checks.

    Returns (error, result); `error.throw()` raises at the first NaN/Inf/OOB
    produced *inside* the jitted program — the device-side sanitizer for
    locating where a NaN is born. Debug tool: much slower than the plain
    path.
    """
    import jax
    from jax.experimental import checkify as ck
    from functools import partial

    wrapped = ck.checkify(
        partial(fn, **static), errors=ck.float_checks | ck.index_checks
    )
    return jax.jit(wrapped)(*args)
