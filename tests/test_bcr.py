"""Block-cyclic-reduction direct solver (parallel/bcr.py).

Oracles:
- Algebraic exactness: ``bcr_factor``/``bcr_apply`` on a random SPD block
  tridiagonal system (f64 on the CPU backend) reproduces
  ``np.linalg.solve`` on the assembled dense matrix — including odd block
  counts (padded interleave) and the boundary blocks.
- Solver parity: the fused Mohr-Coulomb step with ``linear_solver="bcr"``
  reproduces the mg/direct path's iterates (Newton counts AND Du) deep
  into the plastic regime — the reference's per-Newton direct-LU behavior
  (``demo_plasticity_mohr_coulomb.py:662-672``) with zero Krylov
  iterations.
- Guard rails: a non-lattice mesh raises with guidance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dolfinx_external_operator_tpu import locate_dofs_geometrical
from dolfinx_external_operator_tpu.models.mohr_coulomb import (
    MohrCoulombMaterial,
    build_slope_problem,
)
from dolfinx_external_operator_tpu.parallel import bcr as bcrmod
from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

jax.config.update("jax_enable_x64", True)


def _random_block_tridiag(m, B, seed=0):
    """Random SPD block-tridiagonal system as (T, A_dense): T is the
    (m, B, 3B) row-band layout bcr_factor consumes."""
    rng = np.random.default_rng(seed)
    n = m * B
    L = rng.normal(size=(m, B, B)) * 0.3
    L[0] = 0.0
    D = rng.normal(size=(m, B, B))
    D = 0.5 * (D + np.swapaxes(D, 1, 2))
    A = np.zeros((n, n))
    for i in range(m):
        A[i * B:(i + 1) * B, i * B:(i + 1) * B] = D[i]
        if i > 0:
            A[i * B:(i + 1) * B, (i - 1) * B:i * B] = L[i]
            A[(i - 1) * B:i * B, i * B:(i + 1) * B] = L[i].T
    # make SPD with a diagonal shift past the spectral radius
    A += np.eye(n) * (np.abs(A).sum(axis=1).max() + 1.0)
    T = np.zeros((m, B, 3 * B))
    for i in range(m):
        T[i, :, B:2 * B] = A[i * B:(i + 1) * B, i * B:(i + 1) * B]
        if i > 0:
            T[i, :, :B] = A[i * B:(i + 1) * B, (i - 1) * B:i * B]
        if i < m - 1:
            T[i, :, 2 * B:] = A[i * B:(i + 1) * B, (i + 1) * B:(i + 2) * B]
    return T, A


@pytest.mark.parametrize("m,B", [(1, 6), (2, 6), (5, 8), (8, 8), (11, 4)])
def test_bcr_factor_apply_exact(m, B):
    """f64 BCR solve == np.linalg.solve across odd/even/power-of-two block
    counts (exercises every padding/interleave branch)."""
    T, A = _random_block_tridiag(m, B)
    rng = np.random.default_rng(1)
    b = rng.normal(size=m * B)
    fact = bcrmod.bcr_factor(jnp.asarray(T), m, B)
    x = np.asarray(bcrmod.bcr_apply(fact, jnp.asarray(b)))
    x_ref = np.linalg.solve(A, b)
    assert np.abs(x - x_ref).max() < 1e-10 * np.abs(x_ref).max()


def test_bcr_equilibrate_identity_rows():
    """Diagonal equilibration leaves identity (bc/padding) rows with
    d == 1, preserving the identity-row invariant of the solve."""
    m, B = 3, 4
    T, A = _random_block_tridiag(m, B)
    Tflat = jnp.asarray(T.ravel())
    rows = np.arange(m * B)
    diag_slot = (rows // B) * (B * 3 * B) + (rows % B) * (3 * B) + B + (rows % B)
    # forge two identity rows
    r0, r1 = 5, 9
    T2 = T.copy()
    T2[r0 // B, r0 % B, :] = 0.0
    T2[r1 // B, r1 % B, :] = 0.0
    T2[r0 // B, r0 % B, B + r0 % B] = 1.0
    T2[r1 // B, r1 % B, B + r1 % B] = 1.0
    _, d = bcrmod.equilibrate(jnp.asarray(T2.ravel()), jnp.asarray(diag_slot), m, B)
    assert float(d[r0]) == 1.0 and float(d[r1]) == 1.0


def _slope_fixture(Nx):
    mat = MohrCoulombMaterial()
    P = build_slope_problem(Nx=Nx, Ny=Nx)
    mesh, V, S = P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc_dofs = np.concatenate(
        [np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C_tang, state = mat.tangent_stress_point(deps, sn)
        return C_tang, state[0]

    return mesh, V, S, kernel, bc_dofs


def _run(fp, loads):
    Du, sig = fp.zero_state()
    hist = []
    for load in loads:
        Du, sig, norm, its, cg = fp.run_step(Du, sig, float(load))
        hist.append((int(its), int(cg), float(norm)))
    return np.asarray(Du), hist


def test_bcr_matches_mg_on_slope_problem():
    """Newton counts identical and Du parity vs the mg path, on a load
    ramp reaching the plastic regime (the BASELINE.json
    identical-iteration-counts clause, solved with ZERO Krylov its)."""
    mesh, V, S, kernel, bc_dofs = _slope_fixture(Nx=12)
    loads = np.linspace(2, 22.9, 50)[:8]
    fp_mg = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver="mg")
    fp_bcr = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver="bcr")
    Du_mg, h_mg = _run(fp_mg, loads)
    Du_bcr, h_bcr = _run(fp_bcr, loads)
    assert [h[0] for h in h_mg] == [h[0] for h in h_bcr]
    assert np.abs(Du_mg - Du_bcr).max() < 1e-12
    # plastic regime actually reached (multi-Newton steps)
    assert sum(h[0] for h in h_bcr) > len(loads)
    # refinement rounds stay single-digit per Newton at rtol 1e-13
    rounds = sum(h[1] for h in h_bcr)
    newts = sum(h[0] for h in h_bcr)
    assert rounds <= 6 * newts


def test_auto_selects_bcr_on_lattice():
    """auto -> bcr on single-device lattice meshes above the dense
    crossover and below the BCR memory bound (NOTES.md round 4)."""
    mesh, V, S, kernel, bc_dofs = _slope_fixture(Nx=36)
    assert V.num_dofs > 10_000
    fp = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver="auto")
    assert fp.linear_solver == "bcr"


def test_bcr_requires_lattice_mesh():
    from dolfinx_external_operator_tpu import functionspace, mesh as meshmod

    msh, _, _ = meshmod.build_square_with_elliptic_holes(lc=0.25)
    V = functionspace(msh, ("Lagrange", 1, (2,)))
    S = functionspace(msh, ("Quadrature", 2, (4,)))

    def kernel(deps, sn):
        return jnp.eye(4), deps

    with pytest.raises(ValueError, match="lattice"):
        FusedPlasticityStep(msh, V, S, kernel, np.array([0, 1]),
                            linear_solver="bcr")


def test_ir_direct_signed_rounds_telemetry():
    """``ir_direct`` negates the round count when the refinement exits
    without reaching the target (stall / round budget), so a stalled f32
    direct solve is distinguishable from success in telemetry (ADVICE r4)."""
    T, A = _random_block_tridiag(4, 6)
    m, B = 4, 6
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.normal(size=m * B))
    A_j = jnp.asarray(A)
    fact = bcrmod.bcr_factor(jnp.asarray(T), m, B)

    def mv64(x):
        return A_j @ x

    # healthy: exact f64 factorization converges in one round, count > 0
    x, k = bcrmod.ir_direct(mv64, lambda r: bcrmod.bcr_apply(fact, r),
                            b, rtol=1e-12)
    assert int(k) > 0
    assert float(jnp.linalg.norm(b - A_j @ x)) < 1e-11 * float(jnp.linalg.norm(b))

    # stalled: a garbage inner solve makes no progress -> negative count
    x_bad, k_bad = bcrmod.ir_direct(mv64, lambda r: 1e-3 * r, b, rtol=1e-12,
                                    max_rounds=5)
    assert int(k_bad) < 0
