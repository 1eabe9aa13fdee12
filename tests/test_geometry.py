"""Unit tests for geometry: quaternions, SE(3), camera model, triangulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vision_slam_frontend_tpu.geometry import (
    quat_identity,
    quat_multiply,
    quat_inverse,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    quat_to_axis_angle,
    axis_angle_to_quat,
    quat_angular_distance,
    Pose3,
    pose_compose,
    pose_inverse,
    pose_relative,
    pose_transform_points,
    camera_matrix,
    project_points,
    distort_points,
    undistort_points,
    triangulate_points,
    fundamental_from_stereo,
    epipolar_residual,
)
from vision_slam_frontend_tpu.geometry.camera import Intrinsics


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternions:
    def test_identity(self):
        q = quat_identity()
        v = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(quat_rotate(q, v), v, atol=1e-6)

    def test_multiply_vs_matrix(self):
        rng = np.random.default_rng(0)
        a, b = random_quats(rng, 32), random_quats(rng, 32)
        m_ab = quat_to_matrix(quat_multiply(a, b))
        m_a_m_b = quat_to_matrix(a) @ quat_to_matrix(b)
        np.testing.assert_allclose(m_ab, m_a_m_b, atol=1e-5)

    def test_rotate_vs_matrix(self):
        rng = np.random.default_rng(1)
        q = random_quats(rng, 16)
        v = rng.normal(size=(16, 3)).astype(np.float32)
        rv = quat_rotate(q, v)
        mv = jnp.einsum("nij,nj->ni", quat_to_matrix(q), v)
        np.testing.assert_allclose(rv, mv, atol=1e-5)

    def test_inverse(self):
        rng = np.random.default_rng(2)
        q = random_quats(rng, 16)
        qq = quat_multiply(q, quat_inverse(q))
        expected = np.tile([1.0, 0, 0, 0], (16, 1))
        # Allow sign flip.
        qq = np.asarray(qq) * np.sign(np.asarray(qq)[..., :1])
        np.testing.assert_allclose(qq, expected, atol=1e-5)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(3)
        q = random_quats(rng, 64)
        q = q * np.sign(q[..., :1])  # canonical sign
        q2 = matrix_to_quat(quat_to_matrix(q))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_axis_angle_roundtrip(self):
        rng = np.random.default_rng(4)
        aa = rng.normal(size=(64, 3)).astype(np.float32)
        # Keep angles below pi so the representation is unique.
        aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * rng.uniform(
            0.0, 3.0, size=(64, 1)
        ).astype(np.float32)
        aa2 = quat_to_axis_angle(axis_angle_to_quat(aa))
        np.testing.assert_allclose(aa2, aa, atol=1e-4)

    def test_axis_angle_small_angle(self):
        aa = jnp.array([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
        q = axis_angle_to_quat(aa)
        assert np.all(np.isfinite(np.asarray(q)))
        aa2 = quat_to_axis_angle(q)
        assert np.all(np.isfinite(np.asarray(aa2)))
        np.testing.assert_allclose(aa2, aa, atol=1e-6)

    def test_angular_distance(self):
        q0 = quat_identity()
        for angle in [0.1, 0.5, 1.5]:
            q1 = axis_angle_to_quat(jnp.array([0.0, 0.0, angle]))
            np.testing.assert_allclose(
                quat_angular_distance(q0, q1), angle, atol=1e-5
            )

    def test_grad_safe(self):
        # No NaN gradients at identity (small-angle branch).
        g = jax.grad(lambda aa: jnp.sum(axis_angle_to_quat(aa)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestPose3:
    def test_compose_inverse(self):
        rng = np.random.default_rng(5)
        t = rng.normal(size=3).astype(np.float32)
        q = random_quats(rng, 1)[0]
        p = Pose3(t=jnp.array(t), q=jnp.array(q))
        ident = pose_compose(p, pose_inverse(p))
        np.testing.assert_allclose(ident.t, np.zeros(3), atol=1e-5)
        np.testing.assert_allclose(np.abs(np.asarray(ident.q)[0]), 1.0, atol=1e-5)

    def test_relative(self):
        rng = np.random.default_rng(6)
        qa, qb = random_quats(rng, 2)
        a = Pose3(t=jnp.array(rng.normal(size=3), jnp.float32), q=jnp.array(qa))
        b = Pose3(t=jnp.array(rng.normal(size=3), jnp.float32), q=jnp.array(qb))
        rel = pose_relative(a, b)
        b2 = pose_compose(a, rel)
        np.testing.assert_allclose(b2.t, b.t, atol=1e-5)
        dq = quat_angular_distance(b2.q, b.q)
        assert float(dq) < 1e-4

    def test_transform_points_matches_matrix(self):
        rng = np.random.default_rng(7)
        q = random_quats(rng, 1)[0]
        p = Pose3(t=jnp.array(rng.normal(size=3), jnp.float32), q=jnp.array(q))
        x = jnp.array(rng.normal(size=(10, 3)), jnp.float32)
        y = pose_transform_points(p, x)
        m = np.asarray(p.as_matrix())
        y2 = (m[:3, :3] @ np.asarray(x).T).T + m[:3, 3]
        np.testing.assert_allclose(y, y2, atol=1e-5)


def make_test_intrinsics():
    # The reference rig's left camera (reference: src/slam_frontend.cc:565-573).
    return Intrinsics.create(
        fx=527.873518, fy=527.276819, cx=482.823413, cy=298.033945,
        k1=-0.153137, k2=0.075666, p1=-0.000227, p2=-0.000320, k3=0.0,
    )


class TestCamera:
    def test_undistort_inverts_distort(self):
        intr = make_test_intrinsics()
        rng = np.random.default_rng(8)
        pixels = rng.uniform([100, 100], [860, 500], size=(200, 2)).astype(np.float32)
        distorted = distort_points(intr, jnp.array(pixels))
        recovered = undistort_points(intr, distorted)
        np.testing.assert_allclose(recovered, pixels, atol=1e-2)

    def test_undistort_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        intr = make_test_intrinsics()
        K = np.asarray(camera_matrix(intr))
        dist = np.array([intr.k1, intr.k2, intr.p1, intr.p2, intr.k3], np.float32)
        rng = np.random.default_rng(9)
        pixels = rng.uniform([50, 50], [910, 550], size=(100, 2)).astype(np.float32)
        ours = np.asarray(undistort_points(intr, jnp.array(pixels)))
        theirs = cv2.undistortPoints(
            pixels.reshape(-1, 1, 2), K, dist, None, K
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, theirs, atol=0.05)

    def test_project_unproject(self):
        intr = make_test_intrinsics()
        rng = np.random.default_rng(10)
        pts = np.stack(
            [
                rng.uniform(-2, 2, 50),
                rng.uniform(-1, 1, 50),
                rng.uniform(2, 10, 50),
            ],
            axis=-1,
        ).astype(np.float32)
        px = project_points(intr, jnp.array(pts))
        # Rays through pixels should hit the points.
        xn = (np.asarray(px) - [intr.cx, intr.cy]) / [intr.fx, intr.fy]
        np.testing.assert_allclose(xn * pts[:, 2:3], pts[:, :2], atol=1e-3)


class TestTriangulation:
    def _stereo_rig(self):
        intr_l = make_test_intrinsics()
        intr_r = Intrinsics.create(
            fx=530.158021, fy=529.682234, cx=475.540633, cy=299.995465
        )
        K_l = np.asarray(camera_matrix(intr_l))
        K_r = np.asarray(camera_matrix(intr_r))
        # Right camera: small rotation, ~13 cm baseline (like the reference rig).
        from vision_slam_frontend_tpu.geometry.rotation import axis_angle_to_matrix

        R = np.asarray(axis_angle_to_matrix(jnp.array([0.01, -0.02, 0.015])))
        t = np.array([-0.1317, 0.0032, -0.0011], np.float32)
        P_l = K_l @ np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
        P_r = K_r @ np.hstack([R, t[:, None]]).astype(np.float32)
        return K_l, K_r, R, t, P_l, P_r

    def test_triangulate_synthetic(self):
        K_l, K_r, R, t, P_l, P_r = self._stereo_rig()
        rng = np.random.default_rng(11)
        X = np.stack(
            [rng.uniform(-2, 2, 100), rng.uniform(-1, 1, 100), rng.uniform(1, 15, 100)],
            axis=-1,
        ).astype(np.float32)
        xl_h = (P_l @ np.hstack([X, np.ones((100, 1), np.float32)]).T).T
        xr_h = (P_r @ np.hstack([X, np.ones((100, 1), np.float32)]).T).T
        xl = xl_h[:, :2] / xl_h[:, 2:3]
        xr = xr_h[:, :2] / xr_h[:, 2:3]
        X_hat = triangulate_points(jnp.array(P_l), jnp.array(P_r), jnp.array(xl), jnp.array(xr))
        np.testing.assert_allclose(X_hat, X, rtol=1e-2, atol=2e-2)

    def test_triangulate_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        K_l, K_r, R, t, P_l, P_r = self._stereo_rig()
        rng = np.random.default_rng(12)
        X = np.stack(
            [rng.uniform(-2, 2, 50), rng.uniform(-1, 1, 50), rng.uniform(1, 15, 50)],
            axis=-1,
        ).astype(np.float32)
        xl_h = (P_l @ np.hstack([X, np.ones((50, 1), np.float32)]).T).T
        xr_h = (P_r @ np.hstack([X, np.ones((50, 1), np.float32)]).T).T
        xl = (xl_h[:, :2] / xl_h[:, 2:3]) + rng.normal(0, 0.3, (50, 2))  # noisy
        xr = (xr_h[:, :2] / xr_h[:, 2:3]) + rng.normal(0, 0.3, (50, 2))
        xl = xl.astype(np.float32)
        xr = xr.astype(np.float32)
        ours = np.asarray(
            triangulate_points(jnp.array(P_l), jnp.array(P_r), jnp.array(xl), jnp.array(xr))
        )
        cv_h = cv2.triangulatePoints(P_l, P_r, xl.T, xr.T)
        theirs = (cv_h[:3] / cv_h[3:]).T
        np.testing.assert_allclose(ours, theirs, rtol=5e-2, atol=5e-2)

    def test_epipolar_constraint(self):
        K_l, K_r, R, t, P_l, P_r = self._stereo_rig()
        F = fundamental_from_stereo(jnp.array(K_l), jnp.array(K_r), jnp.array(R), jnp.array(t))
        rng = np.random.default_rng(13)
        X = np.stack(
            [rng.uniform(-2, 2, 50), rng.uniform(-1, 1, 50), rng.uniform(1, 15, 50)],
            axis=-1,
        ).astype(np.float32)
        xl_h = (P_l @ np.hstack([X, np.ones((50, 1), np.float32)]).T).T
        xr_h = (P_r @ np.hstack([X, np.ones((50, 1), np.float32)]).T).T
        xl = xl_h[:, :2] / xl_h[:, 2:3]
        xr = xr_h[:, :2] / xr_h[:, 2:3]
        res = epipolar_residual(F, jnp.array(xl), jnp.array(xr))
        # True correspondences satisfy the constraint (F is scale-free; normalize).
        F_np = np.asarray(F)
        scale = np.abs(F_np).max()
        assert np.max(np.asarray(res)) / scale < 1e-2
        # Mismatched pairs violate it.
        res_bad = epipolar_residual(F, jnp.array(xl), jnp.array(np.roll(xr, 7, axis=0)))
        assert np.median(np.asarray(res_bad)) > 10 * np.max(np.asarray(res))
