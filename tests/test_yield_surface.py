"""Yield-surface tracing verification (reference demo_plasticity_mohr_coulomb.py:853-994).

Stress paths are generated in Haigh-Westergaard coordinates (xi, rho, theta)
via the principal-stress formula; the return mapping must project elastic
predictors beyond the surface back ONTO the smoothed Mohr-Coulomb surface
(f ~= 0) across the full Lode-angle range, including the smoothed corners.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dolfinx_external_operator_tpu.models.mohr_coulomb import MohrCoulombMaterial


def principal_to_mandel(sig_principal):
    """Principal stresses (3,) -> Mandel 4-vector [sxx, syy, szz, sqrt2*sxy]
    with principal axes aligned to x/y (s_xy = 0)."""
    s1, s2, s3 = sig_principal
    return np.array([s1, s2, s3, 0.0])


def haigh_westergaard(xi, rho, theta):
    """Principal stresses from HW coordinates (reference :823-840)."""
    c = np.sqrt(2.0 / 3.0)
    s1 = xi / np.sqrt(3.0) + c * rho * np.cos(theta)
    s2 = xi / np.sqrt(3.0) + c * rho * np.cos(theta - 2.0 * np.pi / 3.0)
    s3 = xi / np.sqrt(3.0) + c * rho * np.cos(theta + 2.0 * np.pi / 3.0)
    return np.array([s1, s2, s3])


@pytest.fixture(scope="module")
def mat():
    return MohrCoulombMaterial()


def test_surface_points_have_zero_f(mat):
    """1D Newton in rho finds the surface; f there must vanish."""
    xi = -5.0
    for theta in np.linspace(-np.pi / 6 + 0.01, np.pi / 6 - 0.01, 9):
        rho = 1.0
        for _ in range(60):
            f = float(mat.f_yield(jnp.asarray(principal_to_mandel(haigh_westergaard(xi, rho, theta)))))
            fp = float(mat.f_yield(jnp.asarray(principal_to_mandel(haigh_westergaard(xi, rho + 1e-6, theta)))))
            df = (fp - f) / 1e-6
            rho_new = rho - f / df
            if abs(rho_new - rho) < 1e-12:
                rho = rho_new
                break
            rho = max(rho_new, 1e-3)
        f_final = float(mat.f_yield(jnp.asarray(principal_to_mandel(haigh_westergaard(xi, rho, theta)))))
        assert abs(f_final) < 1e-9, (theta, rho, f_final)


def test_return_mapping_projects_onto_surface(mat):
    """Elastic predictors pushed beyond the surface return to f ~= 0 across
    the Lode range (the corner-smoothing region included)."""
    S_elas = np.linalg.inv(mat.C_elas)
    xi = -6.0
    thetas = np.linspace(-np.pi / 6 + 0.02, np.pi / 6 - 0.02, 11)
    for theta in thetas:
        # a stress state well beyond the surface
        sig_out = principal_to_mandel(haigh_westergaard(xi, 14.0, theta))
        f_out = float(mat.f_yield(jnp.asarray(sig_out)))
        if f_out <= 0.1:
            continue  # not beyond the surface at this angle; skip
        # strain increment that elastically produces sig_out from zero stress
        deps = S_elas @ sig_out
        sig_ret, aux = mat.return_mapping(jnp.asarray(deps), jnp.zeros(4))
        f_ret = float(mat.f_yield(jnp.asarray(np.asarray(sig_ret))))
        assert abs(f_ret) < 5e-7, (theta, f_out, f_ret)
        # the plastic multiplier is positive and the correction is nontrivial
        assert float(aux[4]) > 0.0