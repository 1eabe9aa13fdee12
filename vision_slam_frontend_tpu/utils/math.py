"""General math utilities: the reference's math_util.h equivalents.

(reference: src/math_util.h:32-221 — Clamp, deg/rad, angle normalization,
powers, ramp, quadratic/cubic solvers). jnp-based, batch-friendly, jit-safe;
like the reference's header, most of these exist for completeness of the
shared toolkit rather than use by the core pipeline.
"""

from __future__ import annotations

import math as _math

import jax.numpy as jnp

TWO_PI = 2.0 * _math.pi


def clamp(x, lo, hi):
    """(reference: math_util.h Clamp)"""
    return jnp.minimum(jnp.maximum(x, lo), hi)


def deg_to_rad(d):
    return jnp.asarray(d) * (_math.pi / 180.0)


def rad_to_deg(r):
    return jnp.asarray(r) * (180.0 / _math.pi)


def angle_mod(a):
    """Normalize angle to (-pi, pi] (reference: math_util.h AngleMod)."""
    return jnp.asarray(a) - TWO_PI * jnp.floor((jnp.asarray(a) + _math.pi) / TWO_PI)


def angle_diff(a, b):
    """Signed difference a - b normalized to (-pi, pi]."""
    return angle_mod(jnp.asarray(a) - jnp.asarray(b))


def angle_dist(a, b):
    """Absolute angular distance (reference: math_util.h AngleDist)."""
    return jnp.abs(angle_diff(a, b))


def sq(x):
    return jnp.asarray(x) ** 2


def cube(x):
    return jnp.asarray(x) ** 3


def ramp(x, x0, x1, y0, y1):
    """Linear interpolation of x from [x0, x1] to [y0, y1], clamped
    (reference: math_util.h Ramp)."""
    t = clamp((jnp.asarray(x) - x0) / (x1 - x0), 0.0, 1.0)
    return y0 + t * (y1 - y0)


def solve_quadratic(a, b, c):
    """Real roots of a x^2 + b x + c = 0.

    Returns (num_roots, r0, r1) — jit-safe via NaN-free masking; with
    num_roots == 1 both r0 and r1 hold the root; 0 roots -> zeros.
    (reference: math_util.h SolveQuadratic)
    """
    a = jnp.asarray(a, jnp.float64 if jnp.asarray(a).dtype == jnp.float64 else jnp.float32)
    disc = b * b - 4.0 * a * c
    sq_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    # Numerically stable form: q = -(b + sign(b)|sqrt disc|)/2.
    q = -0.5 * (b + jnp.where(b >= 0, sq_disc, -sq_disc))
    linear = jnp.abs(a) < 1e-12
    r_lin = jnp.where(jnp.abs(b) > 1e-12, -c / jnp.where(jnp.abs(b) > 1e-12, b, 1.0), 0.0)
    r0 = jnp.where(linear, r_lin, q / jnp.where(linear, 1.0, a))
    r1 = jnp.where(linear, r_lin, jnp.where(jnp.abs(q) > 1e-30, c / jnp.where(jnp.abs(q) > 1e-30, q, 1.0), r0))
    n = jnp.where(
        linear,
        jnp.where(jnp.abs(b) > 1e-12, 1, 0),
        jnp.where(disc > 0, 2, jnp.where(disc == 0, 1, 0)),
    )
    r0, r1 = jnp.minimum(r0, r1), jnp.maximum(r0, r1)
    valid = n > 0
    return n, jnp.where(valid, r0, 0.0), jnp.where(valid, r1, 0.0)


def solve_cubic(a, b, c, d, iters: int = 64):
    """One real root of a x^3 + b x^2 + c x + d = 0 (a != 0), via bisection on
    a bracketing interval (jit-safe; the reference uses the trigonometric /
    Cardano form — bisection is branch-free and robust in fp32).
    (reference: math_util.h SolveCubic)
    """
    b_, c_, d_ = b / a, c / a, d / a

    def f(x):
        return ((x + b_) * x + c_) * x + d_

    # Cauchy bound on root magnitude.
    bound = 1.0 + jnp.maximum(jnp.abs(b_), jnp.maximum(jnp.abs(c_), jnp.abs(d_)))
    lo, hi = -bound, bound
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        same = jnp.sign(f(mid)) == jnp.sign(f(lo))
        lo = jnp.where(same, mid, lo)
        hi = jnp.where(same, hi, mid)
    return 0.5 * (lo + hi)
