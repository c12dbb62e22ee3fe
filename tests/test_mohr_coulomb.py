"""Mohr-Coulomb plasticity: constitutive verification + slope stability.

Reference oracles:
- inner Newton tol 1e-8, <= 200 iters (demo_plasticity_mohr_coulomb.py:469)
- consistent tangent = d sigma / d eps through the return map (AD, :555)
- slope stability factor ~= 6.69 at the collapse plateau (:751,764)
- Taylor test: zeroth remainder O(k), first remainder O(k^2) (:1149,:1230-1235)
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dolfinx_external_operator_tpu.models.mohr_coulomb import (
    MohrCoulombMaterial,
    solve_slope_stability,
    solve_small,
)


@pytest.fixture(scope="module")
def mat():
    return MohrCoulombMaterial()


def test_solve_small_pivoted(mat):
    rng = np.random.default_rng(42)
    for _ in range(5):
        A = rng.standard_normal((5, 5))
        b = rng.standard_normal(5)
        x = np.asarray(solve_small(jnp.asarray(A), jnp.asarray(b)))
        assert np.abs(A @ x - b).max() < 1e-12
    # needs pivoting: zero leading diagonal
    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    x = np.asarray(solve_small(jnp.asarray(A), jnp.asarray([2.0, 3.0])))
    assert np.allclose(x, [3.0, 2.0])


def test_elastic_return_is_linear(mat):
    deps = jnp.array([1e-5, -2e-5, 0.0, 5e-6])
    Ct, sig, stats = mat.tangent_and_stress(deps, jnp.zeros(4))
    assert np.allclose(np.asarray(sig), mat.C_elas @ np.asarray(deps), atol=1e-12)
    assert np.allclose(np.asarray(Ct).reshape(4, 4), mat.C_elas, atol=1e-8)


def test_plastic_return_on_yield_surface(mat):
    deps = jnp.array([0.0, 0.0, 0.0, 1e-2])  # pure shear, well past yield
    f_pred = float(mat.f_yield(jnp.asarray(mat.C_elas) @ deps))
    assert f_pred > 1.0
    Ct, sig, stats = mat.tangent_and_stress(deps, jnp.zeros(4))
    f_ret = float(mat.f_yield(jnp.asarray(np.asarray(sig))))
    assert abs(f_ret) < 1e-6  # returned to the yield surface (tol 1e-8 rel)
    assert int(np.asarray(stats["niter"])[0]) <= 200


def test_consistent_tangent_matches_fd(mat):
    deps0 = np.array([0.0, 0.0, 0.0, 1e-2])
    Ct, _, _ = mat.tangent_and_stress(jnp.asarray(deps0), jnp.zeros(4))
    Ct = np.asarray(Ct).reshape(4, 4)
    eps = 1e-7
    Ct_fd = np.zeros((4, 4))
    for j in range(4):
        dp = deps0.copy(); dp[j] += eps
        dm = deps0.copy(); dm[j] -= eps
        _, sp, _ = mat.tangent_and_stress(jnp.asarray(dp), jnp.zeros(4))
        _, sm, _ = mat.tangent_and_stress(jnp.asarray(dm), jnp.zeros(4))
        Ct_fd[:, j] = (np.asarray(sp) - np.asarray(sm)) / (2 * eps)
    rel = np.abs(Ct - Ct_fd).max() / np.abs(Ct_fd).max()
    assert rel < 1e-8


def test_zero_strain_no_nan(mat):
    Ct, sig, _ = mat.tangent_and_stress(jnp.zeros(4), jnp.zeros(4))
    assert not np.isnan(np.asarray(Ct)).any()
    assert not np.isnan(np.asarray(sig)).any()


def test_associative_tangent_symmetry(mat):
    """phi == psi (associative flow) => consistent tangent is symmetric."""
    deps = jnp.array([1e-3, -4e-3, 0.0, 6e-3])
    Ct, _, _ = mat.tangent_and_stress(deps, jnp.zeros(4))
    Ct = np.asarray(Ct).reshape(4, 4)
    assert np.abs(Ct - Ct.T).max() / np.abs(Ct).max() < 1e-9


@pytest.mark.slow
def test_slope_stability_small():
    out = solve_slope_stability(Nx=6, Ny=6, load_steps=np.linspace(2, 18, 6))
    r = out["results"]
    du = np.diff(r[1:, 0])
    assert np.all(np.asarray(out["iterations"]) <= 15)
    assert np.all(du >= -1e-14)  # monotone displacement
    # plasticity must be active by the last step: compliance increases
    dl = np.diff(r[1:, 1])
    assert du[-1] / dl[-1] > 1.5 * du[0] / dl[0]


def test_sorted_chunked_kernel_parity():
    """Difficulty-sorted chunked kernel (the high-throughput batch path)
    matches the plain vmapped kernel to solver precision."""
    import jax.numpy as jnp

    mat = MohrCoulombMaterial()
    n = 1500
    rng = np.random.default_rng(0)
    deps = rng.normal(scale=1e-3, size=(n, 4))
    deps[:, :3] -= 1.5e-3
    deps[: n // 2, 3] += 6e-3
    sn = np.zeros((n, 4))
    C1, s1, _ = mat.tangent_and_stress(jnp.asarray(deps).ravel(), jnp.asarray(sn).ravel())
    C2, s2, _ = mat.tangent_and_stress_sorted(jnp.asarray(deps).ravel(), jnp.asarray(sn).ravel(), chunk=256)
    C_scale = float(jnp.abs(C1).max())
    assert float(jnp.abs(C1 - C2).max()) / C_scale < 1e-9
    assert float(jnp.abs(s1 - s2).max()) < 1e-8


def test_sorted_kernel_elastic_shortcut_bitwise():
    """Whole-chunk-elastic short-circuit in the sorted kernel is bitwise:
    an all-elastic batch returns exactly C_elas and exactly the trial
    stress (the full kernel's elastic branch produces the same, since its
    Newton system is exactly the identity)."""
    import jax.numpy as jnp

    mat = MohrCoulombMaterial()
    n = 512
    rng = np.random.default_rng(3)
    deps = rng.normal(scale=1e-5, size=(n, 4))  # tiny strains: all elastic
    sn = np.zeros((n, 4))
    C2, s2, _ = mat.tangent_and_stress_sorted(
        jnp.asarray(deps).ravel(), jnp.asarray(sn).ravel(), chunk=256)
    C2 = np.asarray(C2).reshape(n, 4, 4)
    s2 = np.asarray(s2).reshape(n, 4)
    sig_tr = deps @ mat.C_elas.T
    assert np.all(C2 == mat.C_elas[None, :, :])
    assert np.abs(s2 - sig_tr).max() < 1e-14
    # and the unsorted kernel agrees exactly on the tangent
    C1, s1, _ = mat.tangent_and_stress(
        jnp.asarray(deps).ravel(), jnp.asarray(sn).ravel())
    assert np.array_equal(np.asarray(C1).reshape(n, 4, 4), C2)
    assert np.array_equal(np.asarray(s1).reshape(n, 4), s2)
