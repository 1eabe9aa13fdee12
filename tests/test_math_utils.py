"""math_util.h-equivalent utilities."""

import numpy as np
import jax.numpy as jnp

from vision_slam_frontend_tpu.utils import math as mu


def test_clamp_ramp():
    np.testing.assert_allclose(mu.clamp(jnp.array([-1.0, 0.5, 2.0]), 0.0, 1.0), [0, 0.5, 1])
    np.testing.assert_allclose(mu.ramp(5.0, 0.0, 10.0, 100.0, 200.0), 150.0)
    np.testing.assert_allclose(mu.ramp(-5.0, 0.0, 10.0, 100.0, 200.0), 100.0)


def test_angles():
    assert abs(abs(float(mu.angle_mod(3 * np.pi))) - np.pi) < 1e-6  # +/-pi boundary
    np.testing.assert_allclose(float(mu.angle_dist(0.1, 2 * np.pi - 0.1)), 0.2, atol=1e-6)
    np.testing.assert_allclose(float(mu.deg_to_rad(180.0)), np.pi)
    np.testing.assert_allclose(float(mu.rad_to_deg(np.pi / 2)), 90.0)


def test_solve_quadratic():
    n, r0, r1 = mu.solve_quadratic(1.0, -3.0, 2.0)  # roots 1, 2
    assert int(n) == 2
    np.testing.assert_allclose([float(r0), float(r1)], [1.0, 2.0], atol=1e-5)
    n, r0, r1 = mu.solve_quadratic(1.0, 0.0, 1.0)  # no real roots
    assert int(n) == 0
    n, r0, r1 = mu.solve_quadratic(0.0, 2.0, -4.0)  # linear: root 2
    assert int(n) == 1
    np.testing.assert_allclose(float(r0), 2.0, atol=1e-5)


def test_solve_cubic():
    # (x-1)(x-2)(x-3) = x^3 -6x^2 +11x -6: bisection finds one real root.
    r = float(mu.solve_cubic(1.0, -6.0, 11.0, -6.0))
    assert min(abs(r - 1), abs(r - 2), abs(r - 3)) < 1e-4
    r = float(mu.solve_cubic(2.0, 0.0, 0.0, -16.0))  # x^3 = 8
    np.testing.assert_allclose(r, 2.0, atol=1e-4)
