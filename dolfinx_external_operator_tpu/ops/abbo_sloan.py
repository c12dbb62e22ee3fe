"""Abbo-Sloan smoothed Mohr-Coulomb surface with closed-form derivatives.

The reference evaluates this surface symbolically and differentiates it with
``jax.jacfwd`` — twice, nested, inside every inner-Newton iteration
(reference ``demo_plasticity_mohr_coulomb.py:282-374`` builds f/g, ``:474-533``
runs Newton on jacfwd-of-jacfwd residuals).  On TPU the f64 transcendentals
are software-emulated and dominate the kernel (profiled r1: ~65 ms/step of
~120 ms), and AD-of-AD multiplies their count.

This module is the TPU-first replacement: the surface value and gradient are
computed JOINTLY in closed form, sharing one (arcsin, sin, cos) set per
evaluation, exploiting two identities that remove transcendentals entirely:

  * sin(3*theta) == x         (theta := arcsin(x)/3 by construction)
  * cos(3*theta) == sqrt(1-x^2)

so the outer-branch K(theta) = A + B sin3t + C sin3t^2 and its derivative are
POLYNOMIAL in x, and only the inner branch needs sin/cos of theta itself.
The Hessian (needed for the closed-form return-map Jacobian) is one jacfwd
of the closed-form gradient — all algebraic given the cached trig.

Parity oracle: tests/test_abbo_sloan.py checks value/grad/Hessian against
jax.grad/jax.hessian of the naive formulation across the Lode range.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["make_surface"]


def make_surface(c, angle, a_coef, theta_T, dtype):
    """Build the smoothed-surface evaluators for one (cohesion, angle, apex)
    parameter set and dtype.

    Returns ``terms(sigma) -> (f, grad_f)`` (joint value+gradient, shared
    transcendentals) and ``hess(sigma) -> (4, 4)`` (jacfwd of the closed-form
    gradient).  ``sigma`` is the Mandel 4-vector [sxx, syy, szz, sqrt2*sxy].

    All scalar constants are Python floats (weak-typed) so the f32
    specialization never silently upcasts to emulated f64.
    """
    f64 = dtype == jnp.float64
    eps_clip = 1e-12 if f64 else 1e-6

    DEV = jnp.asarray(
        [
            [2 / 3, -1 / 3, -1 / 3, 0.0],
            [-1 / 3, 2 / 3, -1 / 3, 0.0],
            [-1 / 3, -1 / 3, 2 / 3, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype,
    )
    TR = jnp.asarray([1.0, 1.0, 1.0, 0.0], dtype)

    sin_a = float(np.sin(angle))
    cos_a = float(np.cos(angle))
    c_cos_a = float(c * np.cos(angle))
    asa2 = float((a_coef * sin_a) ** 2)
    inv_sqrt3 = float(1.0 / np.sqrt(3.0))
    c0 = float(3.0 * np.sqrt(3.0) / 2.0)

    # Abbo-Sloan outer-branch coefficients for sgn(theta) = +1 / -1
    cosT, sinT = float(np.cos(theta_T)), float(np.sin(theta_T))
    cos3T, sin3T = float(np.cos(3 * theta_T)), float(np.sin(3 * theta_T))
    cos6T, sin6T = float(np.cos(6 * theta_T)), float(np.sin(6 * theta_T))
    denom = float(18.0 * cos3T**3)

    def _abc(sgn):
        c1 = cosT - sin_a * sinT * inv_sqrt3
        c2 = sgn * sinT + sin_a * cosT * inv_sqrt3
        Cc = (-cos3T * c1 - 3.0 * sgn * sin3T * c2) / denom
        Bc = (sgn * sin6T * c1 - 6.0 * cos6T * c2) / denom
        Ac = -(sin_a * inv_sqrt3) * sgn * sinT - Bc * sgn * sin3T - Cc * sin3T**2 + cosT
        return float(Ac), float(Bc), float(Cc)

    Ap, Bp, Cp = _abc(1.0)
    Am, Bm, Cm = _abc(-1.0)

    if f64:
        # f64 (arcsin, sin, cos) are software-emulated double-double series
        # on TPU — the dominant kernel cost (docs/ROOFLINE.md).  The surface
        # only ever uses st = sin(arcsin(x)/3) and ct = cos(arcsin(x)/3),
        # and st is the root of the ALGEBRAIC cubic  3 s - 4 s^3 = x  (the
        # triple-angle identity), so: seed with native f32 trig (~1e-7),
        # then two f64 Newton steps (pure mul/add) reach full f64 accuracy
        # on the inner branch (|x| <= sin 3*theta_T, where st/ct are used;
        # validated 3.3e-16 in tests/test_abbo_sloan.py).  The seed is
        # gradient-stopped: tangents flow only through the Newton updates,
        # whose converged JVP equals the implicit derivative
        # ds/dx = 1/(3 - 12 s^2) to O(seed_err) — and the f32 arcsin'
        # singularity at |x32| = 1 never meets a tangent.  The seed clamp
        # to [-sinT, sinT] (the inner-branch range) keeps 3 - 12 s^2
        # bounded away from zero for outer-branch lanes whose st/ct are
        # discarded by the `outer` select below.
        def _sincos_third(x):
            x32 = x.astype(jnp.float32)
            s0 = jnp.sin(jnp.arcsin(x32) * jnp.float32(1.0 / 3.0))
            s0 = jax.lax.stop_gradient(
                jnp.clip(s0.astype(dtype), -sinT, sinT))

            def newton(s):
                return s - (3.0 * s - 4.0 * s * s * s - x) / (3.0 - 12.0 * s * s)

            st = newton(newton(s0))
            ct = jnp.sqrt(1.0 - st * st)
            return st, ct
    else:
        def _sincos_third(x):
            theta = jnp.arcsin(x) * (1.0 / 3.0)
            return jnp.sin(theta), jnp.cos(theta)

    def terms(sigma):
        s = DEV @ sigma
        I1 = TR @ sigma
        J2 = 0.5 * jnp.vdot(s, s)
        safe = J2 > 0.0
        J2s = jnp.where(safe, J2, 1.0)
        J3 = s[2] * (s[0] * s[1] - s[3] * s[3] / 2.0)
        sqJ2 = jnp.sqrt(J2s)
        invJ2_32 = 1.0 / (J2s * sqJ2)
        arg_raw = jnp.where(safe, -c0 * J3 * invJ2_32, 0.0)
        x = jnp.clip(arg_raw, -1.0 + eps_clip, 1.0 - eps_clip)  # == sin(3*theta)

        # trig set: one f32-seeded algebraic solve (f64) or ONE
        # arcsin + sin + cos (f32); everything else algebraic
        st, ct = _sincos_third(x)
        c3t = jnp.sqrt(1.0 - x * x)  # cos(3*theta), >= sqrt(2*eps_clip) > 0

        pos = x >= 0.0
        Ac = jnp.where(pos, Ap, Am)
        Bc = jnp.where(pos, Bp, Bm)
        Cc = jnp.where(pos, Cp, Cm)

        K_in = ct - sin_a * st * inv_sqrt3
        K_out = Ac + (Bc + Cc * x) * x
        dKin_dx = (-st - sin_a * ct * inv_sqrt3) / (3.0 * c3t)
        dKout_dx = Bc + 2.0 * Cc * x
        outer = jnp.abs(x) > sin3T
        K = jnp.where(outer, K_out, K_in)
        dK_dx = jnp.where(outer, dKout_dx, dKin_dx)

        Q = jnp.sqrt(J2 * K * K + asa2)
        f = I1 / 3.0 * sin_a + Q - c_cos_a

        # gradient: df = sin_a/3 TR + (K^2 dJ2 + 2 J2 K dK/dx dx) / (2 Q)
        dJ3_ds = jnp.stack(
            [s[1] * s[2], s[0] * s[2], s[0] * s[1] - s[3] * s[3] / 2.0, -s[2] * s[3]]
        )
        dJ3 = DEV @ dJ3_ds
        unclipped = jnp.logical_and(safe, jnp.abs(arg_raw) < 1.0 - eps_clip)
        darg = -c0 * (dJ3 - 1.5 * (J3 / J2s) * s) * invJ2_32
        dx = jnp.where(unclipped, darg, 0.0)
        Qs = jnp.maximum(Q, jnp.asarray(1e-30 if f64 else 1e-20, dtype))
        df = sin_a / 3.0 * TR + (K * K * s + (2.0 * J2 * K * dK_dx) * dx) / (2.0 * Qs)
        return f, df

    def grad(sigma):
        return terms(sigma)[1]

    hess = jax.jacfwd(grad)
    return terms, hess
