"""Assembly parity for external operators on DG, CG, and mixed output spaces.

Mirrors the reference oracle suite ``test/test_external_operators_evaluation.py``:
assemble residual vector and Jacobian matrix through the external-operator
pipeline and through an explicit pure-form twin; allclose (reference
``check_vector_matrix``, ``:20-45``).

Note on array conventions: this framework's ``evaluate_operands`` returns
(n_cells, n_points) for scalars and (n_cells, n_points, value_size) with the
value flattened row-major, so test kernels reshape accordingly.
"""
import numpy as np
import pytest

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu import (
    FEMExternalOperator,
    evaluate_external_operators,
    evaluate_operands,
    replace_external_operators,
)
from dolfinx_external_operator_tpu.sym import split


def check_vector_matrix(F, F_explicit, u, atol=1e-12):
    """Reference test_external_operators_evaluation.py:20-45."""
    V = u.function_space
    J = fem.derivative(F, u, fem.TrialFunction(V))
    F_replaced, F_ops = replace_external_operators(F)
    J_replaced, J_ops = replace_external_operators(J)
    operands = evaluate_operands(F_ops)
    evaluate_external_operators(F_ops, operands)
    evaluate_external_operators(J_ops, operands)

    b = np.asarray(fem.assemble_vector(F_replaced))
    A = np.asarray(fem.assemble_matrix(J_replaced))

    b_ex = np.asarray(fem.assemble_vector(F_explicit))
    assert np.allclose(b, b_ex, atol=atol), np.abs(b - b_ex).max()

    J_ex = fem.derivative(F_explicit, u, fem.TrialFunction(V))
    A_ex = np.asarray(fem.assemble_matrix(J_ex))
    assert np.allclose(A, A_ex, atol=10 * atol), np.abs(A - A_ex).max()


def test_discontinuous_space():
    """External operator valued in DG1 (reference :109-148)."""
    mesh = fem.create_unit_square(6, 6)
    V = fem.functionspace(mesh, ("Lagrange", 1, (2,)))
    u = fem.Function(V)
    u.interpolate(lambda x: (x[0], x[1]))

    def N_impl(div_u_, grad_u_):
        div_u_ = np.asarray(div_u_)
        grad_u_ = np.asarray(grad_u_).reshape(div_u_.shape[0], div_u_.shape[1], 2, 2)
        return (div_u_ + np.einsum("...ij,...ij->...", grad_u_, grad_u_)).reshape(-1)

    def dNddivu_impl(div_u_, grad_u_):
        return np.ones(np.asarray(div_u_).size)

    def dNdgradu_impl(div_u_, grad_u_):
        return 2 * np.asarray(grad_u_).reshape(-1)

    N_external = lambda d: {(0, 0): N_impl, (1, 0): dNddivu_impl, (0, 1): dNdgradu_impl}[d]

    Q = fem.functionspace(mesh, ("DG", 1))
    N = FEMExternalOperator(fem.div(u), fem.grad(u), function_space=Q, external_function=N_external)
    v = fem.TestFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 2})
    F = N * fem.inner(u, v) * dx
    N_explicit = fem.div(u) + fem.inner(fem.grad(u), fem.grad(u))
    F_explicit = N_explicit * fem.inner(u, v) * dx
    check_vector_matrix(F, F_explicit, u)


def test_continuous_space():
    """External operator valued in the (vector CG1) solution space itself
    (reference :151-183) — exercises the unrolled-dofmap write-back."""
    mesh = fem.create_unit_square(6, 6)
    V = fem.functionspace(mesh, ("Lagrange", 1, (2,)))
    u = fem.Function(V)
    u.x.array[:] = np.ones(V.num_dofs)

    def N_impl(u_):
        return np.asarray(u_).reshape(-1)

    Id = np.eye(2)

    def dNdu_impl(u_):
        u_ = np.asarray(u_)
        n = u_.shape[0] * u_.shape[1]
        return np.repeat(Id[np.newaxis], n, axis=0).reshape(-1)

    N = FEMExternalOperator(u, function_space=V,
                            external_function=lambda d: {(0,): N_impl, (1,): dNdu_impl}[d])
    v = fem.TestFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 2})
    F = fem.inner(N, v) * dx
    F_explicit = fem.inner(u, v) * dx
    check_vector_matrix(F, F_explicit, u)


def test_mixed_element_space_scalar_subspaces():
    """Mixed P1 x P2 output space, all-scalar subspaces (2D write-back,
    reference :186-228)."""
    mesh = fem.create_unit_square(6, 6)
    e1 = fem.element("Lagrange", mesh.cell_name(), 1)
    e2 = fem.element("Lagrange", mesh.cell_name(), 2)
    V = fem.functionspace(mesh, fem.mixed_element([e1, e2]))
    u = fem.Function(V)
    u.sub(0).interpolate(lambda x: x[1] + 2.0)
    u.sub(1).interpolate(lambda x: x[1] + 1.0)
    u1, u2 = split(u)
    v = fem.TestFunction(V)

    pts_V1 = V.sub(0).element.interpolation_points.shape[0]
    pts_V2 = V.sub(1).element.interpolation_points.shape[0]
    pts_total = pts_V1 + pts_V2

    def N_impl(u_):
        u_ = np.asarray(u_)
        out = np.zeros_like(u_)
        out[:, pts_V1:pts_total] = u_[:, pts_V1:pts_total]
        return out.reshape(-1)

    def dN_impl(u_):
        u_ = np.asarray(u_)
        out = np.zeros_like(u_)
        out[:, pts_V1:pts_total] = 1.0
        return out.reshape(-1)

    N_tensor = FEMExternalOperator(u2, function_space=V, name="N",
                                   external_function=lambda d: {(0,): N_impl, (1,): dN_impl}[d])
    N1, N2 = split(N_tensor)
    v1, v2 = split(v)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 4})
    F = N1 * v1 * dx + N2 * v2 * dx
    F_explicit = u2 * v2 * dx
    check_vector_matrix(F, F_explicit, u)


def test_mixed_element_space_vector_subspace():
    """Mixed P4-scalar x P2-vector output space (3D padded write-back),
    faithful to the reference oracle's element degrees
    (``test_external_operators_evaluation.py:230-306``)."""
    mesh = fem.create_unit_square(4, 4)
    e1 = fem.element("Lagrange", mesh.cell_name(), 4)
    e2 = fem.element("Lagrange", mesh.cell_name(), 2, shape=(2,))
    V = fem.functionspace(mesh, fem.mixed_element([e1, e2]))
    u = fem.Function(V)
    u.sub(0).interpolate(lambda x: x[1] + 2.0)
    u.sub(1).interpolate(lambda x: (x[0], x[1]))
    u1, u2 = split(u)
    v = fem.TestFunction(V)

    pts_V1 = V.sub(0).element.interpolation_points.shape[0]
    pts_V2 = V.sub(1).element.interpolation_points.shape[0]
    pts_total = pts_V1 + pts_V2

    # N = [N1, N2]; N1 = u1 + u2.u2 — u1 affine and u2 linear, so N1 is
    # quadratic and exactly representable by interpolation into the P4 sub
    def N_tensor_impl(u1_, u2_):
        u1_ = np.asarray(u1_)
        u2_ = np.asarray(u2_)
        n_cells = u2_.shape[0]
        out = np.zeros((n_cells, pts_total, 2))
        u2_first = u2_[:, :pts_V1, :]
        out[:, :pts_V1, 0] = u1_[:, :pts_V1] + np.einsum("...i,...i->...", u2_first, u2_first)
        out[:, pts_V1:, :] = u2_[:, pts_V1:, :]
        return out.reshape(-1)

    def dNdu1_impl(u1_, u2_):
        n_cells = np.asarray(u2_).shape[0]
        out = np.zeros((n_cells, pts_total, 2))
        out[:, :pts_V1, 0] = 1.0
        return out.reshape(-1)

    def dNdu2_impl(u1_, u2_):
        u2_ = np.asarray(u2_)
        n_cells = u2_.shape[0]
        out = np.zeros((n_cells, pts_total, 4))
        out[:, :pts_V1, 0:2] = 2.0 * u2_[:, :pts_V1, :]
        out[:, pts_V1:, 0] = 1.0
        out[:, pts_V1:, 3] = 1.0
        return out.reshape(-1)

    N = FEMExternalOperator(
        u1, u2, function_space=V, name="N",
        external_function=lambda d: {(0, 0): N_tensor_impl, (1, 0): dNdu1_impl, (0, 1): dNdu2_impl}[d],
    )
    N1, N2 = split(N)
    v1, v2 = split(v)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 5})
    F = N1 * v1 * dx + fem.inner(N2, v2) * dx
    N1_explicit = u1 + fem.inner(u2, u2)
    F_explicit = N1_explicit * v1 * dx + fem.inner(u2, v2) * dx
    check_vector_matrix(F, F_explicit, u)
