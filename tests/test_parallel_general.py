"""General-pipeline SPMD: the whole evaluate/assemble/solve stack on a
device mesh (the ``mpirun -n 3`` CI analog for the GENERAL path, not just
the fused plasticity step — reference
``.github/workflows/build-and-test.yml:44-54``).

A default device mesh is installed; every form/expression compiled after
that shards its cell axis over the 8 virtual devices via GSPMD.  Oracle:
identical results (1e-14) and identical Newton counts vs the unsharded
pipeline.  Mesh sizes are chosen NOT divisible by 8 to exercise the padded
cell batches.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu import (
    FEMExternalOperator, evaluate_external_operators, evaluate_operands,
    parallel, replace_external_operators, solvers,
)


@pytest.fixture
def device_mesh8():
    dm = parallel.make_device_mesh(8)
    parallel.set_default_device_mesh(dm)
    yield dm
    parallel.set_default_device_mesh(None)


def _heat_forms(n=5):
    """5x5 triangle mesh: 50 cells, NOT divisible by 8 (padding path)."""
    mesh = fem.create_unit_square(n, n)
    V = fem.functionspace(mesh, ("Lagrange", 2))
    T = fem.Function(V)
    T.interpolate(lambda x: 1.0 + x[0] ** 2 + 0.3 * x[1])
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), degree=4))
    dx = fem.Measure("dx", metadata={"quadrature_degree": 4, "quadrature_scheme": "default"})
    k = FEMExternalOperator(T, function_space=Q)
    k.external_function = lambda d: {
        (0,): lambda t: (1.0 / (1.0 + jnp.asarray(t))).reshape(-1),
        (1,): lambda t: (-1.0 / (1.0 + jnp.asarray(t)) ** 2).reshape(-1),
    }[d]
    v, uh = fem.TestFunction(V), fem.TrialFunction(V)
    F = fem.inner(k * fem.grad(T), fem.grad(v)) * dx
    J = fem.derivative(F, T, uh)
    return mesh, V, T, F, J


def _assemble_pipeline():
    mesh, V, T, F, J = _heat_forms()
    F_r, F_ops = replace_external_operators(F)
    J_r, J_ops = replace_external_operators(J)
    operands = evaluate_operands(F_ops)
    evaluate_external_operators(F_ops, operands)
    evaluate_external_operators(J_ops, operands)
    b = np.asarray(fem.assemble_vector(F_r))
    A = np.asarray(fem.assemble_matrix(J_r))
    return b, A, {op.derivatives: np.asarray(op.ref_coefficient.data) for op in F_ops + J_ops}


def test_assembly_parity_sharded_vs_single(device_mesh8):
    b_s, A_s, coeffs_s = _assemble_pipeline()
    parallel.set_default_device_mesh(None)
    b_1, A_1, coeffs_1 = _assemble_pipeline()
    np.testing.assert_allclose(b_s, b_1, rtol=0, atol=1e-14)
    np.testing.assert_allclose(A_s, A_1, rtol=0, atol=1e-14)
    for d in coeffs_1:
        np.testing.assert_allclose(coeffs_s[d], coeffs_1[d], rtol=0, atol=1e-14)


def test_sharded_statics_actually_sharded(device_mesh8):
    mesh, V, T, F, J = _heat_forms(8)  # 128 cells: divisible, no padding
    Jc = fem.create_form(J)
    coords = Jc.kernels[0].batches[0][1]["coords"]
    assert "cells" in str(coords.sharding), coords.sharding


def test_full_solve_parity_sharded_vs_single(device_mesh8):
    def solve():
        mesh, V, T, F, J = _heat_forms()
        F_r, F_ops = replace_external_operators(F)
        J_r, J_ops = replace_external_operators(J)

        def callback():
            ops = evaluate_operands(F_ops)
            evaluate_external_operators(F_ops, ops)
            evaluate_external_operators(J_ops, ops)

        bdofs = fem.locate_dofs_geometrical(
            V, lambda X: np.isclose(X[0], 0) | np.isclose(X[0], 1))
        bc = fem.DirichletBC(bdofs, np.zeros(len(bdofs)))
        T.interpolate(lambda X: 0.02 + 0.0 * X[0])
        prob = solvers.NonlinearProblem(
            F_r, T, J_r, bcs=[bc], petsc_options={"ksp_type": "cg"},
            external_callback=callback)
        its, conv = prob.solve()
        return its, np.asarray(T.data).copy()

    its_s, sol_s = solve()
    parallel.set_default_device_mesh(None)
    its_1, sol_1 = solve()
    assert its_s == its_1
    np.testing.assert_allclose(sol_s, sol_1, rtol=0, atol=1e-12)


def test_facet_assembly_sharded(device_mesh8):
    """Exterior-facet batches are tiny (< 8 facets per local-facet group):
    the padding path in its extreme."""
    def build():
        mesh = fem.create_unit_square(3, 3)
        V = fem.functionspace(mesh, ("Lagrange", 1))
        u = fem.Function(V)
        u.interpolate(lambda x: x[0] + 2.0 * x[1])
        v = fem.TestFunction(V)
        ds = fem.Measure("ds")
        return np.asarray(fem.assemble_vector(u * v * ds))

    b_s = build()
    parallel.set_default_device_mesh(None)
    b_1 = build()
    np.testing.assert_allclose(b_s, b_1, rtol=0, atol=1e-14)


def test_krylov_sharded(device_mesh8):
    """EBE Jacobi-PCG over sharded element tensors."""
    def solve():
        mesh = fem.create_unit_square(5, 5)
        V = fem.functionspace(mesh, ("Lagrange", 1))
        u = fem.Function(V)
        v, uh = fem.TestFunction(V), fem.TrialFunction(V)
        dx = fem.Measure("dx", metadata={"quadrature_degree": 2, "quadrature_scheme": "default"})
        F = fem.inner(fem.grad(u), fem.grad(v)) * dx - 1.0 * v * dx
        J = fem.derivative(F, u, uh)
        bd = fem.locate_dofs_geometrical(V, lambda X: np.isclose(X[0], 0) | np.isclose(X[0], 1))
        prob = solvers.NonlinearProblem(F, u, J, bcs=[fem.DirichletBC(bd, np.zeros(len(bd)))],
                                        petsc_options={"ksp_type": "cg"})
        its, conv = prob.solve()
        return np.asarray(u.data).copy()

    s_s = solve()
    parallel.set_default_device_mesh(None)
    s_1 = solve()
    np.testing.assert_allclose(s_s, s_1, rtol=0, atol=1e-12)
