"""Sanitizer subsystem tests (utils/checks.py).

The reference's runtime verification is abort-on-CHECK (glog); here the
invariant checks raise catchable InvariantViolation and the device-side
checkify path localizes NaNs inside jitted programs.
"""

import dataclasses

import numpy as np
import pytest

from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence
from vision_slam_frontend_tpu.utils.checks import (
    InvariantViolation,
    check_ba_step,
    check_keyframe_result,
    checkified,
)


def _run_frontend(validate):
    rig = SyntheticRig()
    fe = Frontend(
        FrontendConfig(
            calib=rig.calib(), max_features=192, frame_life=4,
            fast_threshold=12.0, validate=validate,
        )
    )
    for f in generate_sequence(num_frames=4, step=0.25, rig=rig):
        fe.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
        fe.observe_image(f.left, f.right, f.timestamp)
    return fe


class TestKeyframeChecks:
    def test_clean_run_passes(self):
        fe = _run_frontend(validate=True)
        assert fe.get_num_poses() >= 3  # checks ran on every keyframe, no raise

    def test_nan_pixels_rejected(self):
        rig = SyntheticRig()
        fe = Frontend(FrontendConfig(calib=rig.calib(), max_features=192,
                                     frame_life=4, fast_threshold=12.0))
        frames = list(generate_sequence(num_frames=2, step=0.25, rig=rig))
        for f in frames:
            fe.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
            fe.observe_image(f.left, f.right, f.timestamp)
        # Rebuild a poisoned result by rerunning the device step by hand.
        import jax

        from vision_slam_frontend_tpu.frontend.keyframe import (
            StepParams, WindowState, keyframe_step,
        )

        params = StepParams.from_config(fe.config)
        state = WindowState.create(4, 192, fe.config.stereo_threshold_init)
        f = frames[0]
        _, result = keyframe_step(
            params, state,
            np.clip(f.left, 0, 255).astype(np.uint8),
            np.clip(f.right, 0, 255).astype(np.uint8),
            np.int32(0), capacity=192, window=4,
            border=fe.config.detect_border, blur_sigma=fe.config.blur_sigma,
        )
        r = jax.device_get(result)
        shape = f.left.shape[:2]
        check_keyframe_result(0, r, shape, 192)  # clean: passes

        bad_px = np.array(r.pixels_undist)
        bad_px[1] = np.nan
        poisoned = dataclasses.replace(r, pixels_undist=bad_px)
        with pytest.raises(InvariantViolation, match="pixels_undist"):
            check_keyframe_result(0, poisoned, shape, 192)

        oob = np.array(r.pixels_raw)
        oob[0] = [1e6, 1e6]
        poisoned = dataclasses.replace(r, pixels_raw=oob)
        with pytest.raises(InvariantViolation, match="bounds"):
            check_keyframe_result(0, poisoned, shape, 192)

        bad_tid = np.array(r.track_id)
        bad_tid[0] = -5
        poisoned = dataclasses.replace(r, track_id=bad_tid)
        with pytest.raises(InvariantViolation, match="track id"):
            check_keyframe_result(0, poisoned, shape, 192)

    def test_count_mismatch_rejected(self):
        rig = SyntheticRig()
        fe = _run_frontend(validate=False)
        # Synthesise a result-like object with inconsistent counts.
        import jax

        from vision_slam_frontend_tpu.frontend.keyframe import (
            StepParams, WindowState, keyframe_step,
        )

        params = StepParams.from_config(fe.config)
        state = WindowState.create(4, 192, fe.config.stereo_threshold_init)
        f = next(iter(generate_sequence(num_frames=1, step=0.25, rig=rig)))
        _, result = keyframe_step(
            params, state,
            np.clip(f.left, 0, 255).astype(np.uint8),
            np.clip(f.right, 0, 255).astype(np.uint8),
            np.int32(0), capacity=192, window=4,
            border=fe.config.detect_border, blur_sigma=fe.config.blur_sigma,
        )
        r = jax.device_get(result)
        poisoned = dataclasses.replace(r, num_features=np.int32(500))
        with pytest.raises(InvariantViolation):
            check_keyframe_result(0, poisoned, f.left.shape[:2], 192)


class TestBAStepChecks:
    def test_finite_passes(self):
        check_ba_step(0, np.zeros((4, 6)), np.zeros((10, 3)))

    def test_nonfinite_raises(self):
        d = np.zeros((4, 6))
        d[2, 3] = np.inf
        with pytest.raises(InvariantViolation, match="pose update"):
            check_ba_step(1, d, np.zeros((10, 3)))
        with pytest.raises(InvariantViolation, match="landmark update"):
            check_ba_step(1, np.zeros((4, 6)), np.full((10, 3), np.nan))

    def test_solver_validate_flag(self):
        from test_backend import synthetic_ba

        from vision_slam_frontend_tpu.backend import BASolverConfig, optimize

        cam, problem, _, _ = synthetic_ba(P=5, L=60, pose_noise=0.03,
                                          lm_noise=0.2, seed=1)
        solver = BASolverConfig(max_iterations=2, validate=True)
        _, info = optimize(problem, cam=cam, solver=solver)
        assert info["iterations"] >= 1  # clean problem: validation is silent


class TestCheckify:
    def test_checkify_localizes_nan(self):
        import jax.numpy as jnp

        def f(x):
            return jnp.log(x) / jnp.sum(x)

        err, _ = checkified(f, jnp.array([1.0, 2.0, 3.0]))
        err.throw()  # clean input: no error

        err, _ = checkified(f, jnp.array([-1.0, 2.0, 3.0]))
        with pytest.raises(Exception, match="nan"):
            err.throw()
