"""Closed-form Abbo-Sloan surface derivatives vs AD of the naive formulation.

Oracle: the straightforward (reference-style, ``demo_plasticity_mohr_coulomb
.py:282-374``) surface expression differentiated with jax.grad/jax.hessian.
States sweep the Lode range incl. both K branches, the triaxial corners,
the hydrostatic axis (s = 0), and random states.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dolfinx_external_operator_tpu.ops.abbo_sloan import make_surface

C_ = 3.45
PHI = 30 * np.pi / 180
THETA_T = 26 * np.pi / 180
A_COEF = 0.26 * C_ / np.tan(PHI)

DEV = jnp.asarray(
    [
        [2 / 3, -1 / 3, -1 / 3, 0.0],
        [-1 / 3, 2 / 3, -1 / 3, 0.0],
        [-1 / 3, -1 / 3, 2 / 3, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
)
TR = jnp.asarray([1.0, 1.0, 1.0, 0.0])


def naive_surface(sigma, angle=PHI, a_coef=A_COEF):
    """Reference-style formulation (arcsin Lode angle, branchy K)."""
    s = DEV @ sigma
    I1 = TR @ sigma
    J2 = 0.5 * jnp.vdot(s, s)
    safe = J2 > 0.0
    J2s = jnp.where(safe, J2, 1.0)
    J3 = s[2] * (s[0] * s[1] - s[3] * s[3] / 2.0)
    arg = -(3.0 * np.sqrt(3.0) * J3) / (2.0 * jnp.sqrt(J2s**3))
    arg = jnp.where(safe, arg, 0.0)
    theta = jnp.arcsin(jnp.clip(arg, -1.0 + 1e-12, 1.0 - 1e-12)) / 3.0

    sgn = jnp.where(theta < 0.0, -1.0, 1.0)
    sin_a = np.sin(angle)
    cosT, sinT = np.cos(THETA_T), np.sin(THETA_T)
    cos3T, sin3T = np.cos(3 * THETA_T), np.sin(3 * THETA_T)
    cos6T, sin6T = np.cos(6 * THETA_T), np.sin(6 * THETA_T)
    denom = 18.0 * cos3T**3
    inv_sqrt3 = 1.0 / np.sqrt(3.0)
    c1 = cosT - sin_a * sinT * inv_sqrt3
    c2 = sgn * sinT + sin_a * cosT * inv_sqrt3
    Cc = (-cos3T * c1 - 3.0 * sgn * sin3T * c2) / denom
    Bc = (sgn * sin6T * c1 - 6.0 * cos6T * c2) / denom
    Ac = -(sin_a * inv_sqrt3) * sgn * sinT - Bc * sgn * sin3T - Cc * sin3T**2 + cosT
    s3t = jnp.sin(3.0 * theta)
    K_in = jnp.cos(theta) - sin_a * jnp.sin(theta) * inv_sqrt3
    K_out = Ac + Bc * s3t + Cc * s3t * s3t
    K = jnp.where(jnp.abs(theta) > THETA_T, K_out, K_in)
    return I1 / 3.0 * sin_a + jnp.sqrt(J2 * K * K + (a_coef * sin_a) ** 2) - C_ * np.cos(angle)


def lode_states():
    """Stress states spanning the Lode range at several pressures/radii."""
    states = []
    for p in (-5.0, 0.0, 4.0):
        for rho in (0.3, 2.0, 7.5):
            for th in np.linspace(-np.pi / 6, np.pi / 6, 13):
                # principal deviatoric stresses at Lode angle th (Mandel, no shear)
                sdev = (
                    2.0
                    / np.sqrt(3.0)
                    * rho
                    * np.array(
                        [np.sin(th - 2 * np.pi / 3), np.sin(th), np.sin(th + 2 * np.pi / 3)]
                    )
                )
                states.append(np.array([p + sdev[0], p + sdev[1], p + sdev[2], 0.0]))
    # shear-carrying and random states
    rng = np.random.default_rng(7)
    for _ in range(25):
        states.append(rng.normal(scale=4.0, size=4))
    # hydrostatic axis (s = 0) and near-apex
    states.append(np.array([2.0, 2.0, 2.0, 0.0]))
    states.append(np.array([5.97, 5.97, 5.97, 0.0]))
    return np.stack(states)


@pytest.mark.parametrize("angle", [PHI, 20 * np.pi / 180])
def test_value_and_grad_parity(angle):
    a_coef = 0.26 * C_ / np.tan(PHI)
    terms, _ = make_surface(C_, angle, a_coef, THETA_T, jnp.float64)
    naive = lambda sig: naive_surface(sig, angle, a_coef)
    states = jnp.asarray(lode_states())
    f, df = jax.jit(jax.vmap(terms))(states)
    fref = jax.jit(jax.vmap(naive))(states)
    gref = np.asarray(jax.jit(jax.vmap(jax.grad(naive)))(states))
    assert np.allclose(np.asarray(f), np.asarray(fref), rtol=1e-12, atol=1e-12)
    finite = np.isfinite(gref).all(axis=1)  # naive AD NaNs on the hydrostatic axis
    assert np.allclose(np.asarray(df)[finite], gref[finite], rtol=1e-9, atol=1e-11)


def test_hessian_parity():
    terms, hess = make_surface(C_, PHI, A_COEF, THETA_T, jnp.float64)
    states = jnp.asarray(lode_states())
    H = np.asarray(jax.jit(jax.vmap(hess))(states))
    Href = np.asarray(jax.jit(jax.vmap(jax.hessian(naive_surface)))(states))
    finite = np.isfinite(Href).all(axis=(1, 2))
    assert np.allclose(H[finite], Href[finite], rtol=1e-7, atol=1e-9)


def test_gradient_finite_everywhere():
    """Closed form must stay finite where naive AD NaNs (hydrostatic axis,
    clipped corners)."""
    terms, hess = make_surface(C_, PHI, A_COEF, THETA_T, jnp.float64)
    hard = [
        np.zeros(4),
        np.array([3.0, 3.0, 3.0, 0.0]),
        np.array([1.0, 1.0, -2.0, 0.0]),  # triaxial corner (|sin3theta| = 1)
        np.array([-1.0, -1.0, 2.0, 0.0]),
    ]
    for sig in hard:
        f, df = terms(jnp.asarray(sig))
        H = hess(jnp.asarray(sig))
        assert np.isfinite(float(f))
        assert np.isfinite(np.asarray(df)).all()
        assert np.isfinite(np.asarray(H)).all()


def test_f32_variant_close():
    terms64, _ = make_surface(C_, PHI, A_COEF, THETA_T, jnp.float64)
    terms32, _ = make_surface(C_, PHI, A_COEF, THETA_T, jnp.float32)
    states = lode_states()[:20]
    f64v, g64 = jax.jit(jax.vmap(terms64))(jnp.asarray(states))
    f32v, g32 = jax.jit(jax.vmap(terms32))(jnp.asarray(states, dtype=jnp.float32))
    assert g32.dtype == jnp.float32
    assert np.allclose(np.asarray(f64v), np.asarray(f32v, np.float64), atol=5e-4, rtol=5e-4)
    assert np.allclose(np.asarray(g64), np.asarray(g32, np.float64), atol=5e-4)
