"""External-operator pipeline parity tests: the nonlinear heat equation.

Rebuilds the reference demos as assertions:
- part 1 (one operand T, NumPy kernel):        demo_nonlinear_heat_equation_part1.py:427,436,448
- part 2 (two operands T and grad(T)):         demo_nonlinear_heat_equation_part2.py
- part 3 (JAX kernels w/ jacfwd, full solve):  demo_nonlinear_heat_equation_part3.py

Oracle: assemble residual/Jacobian through the external-operator pipeline and
through an explicit pure-form twin; allclose (reference test strategy,
test_external_operators_evaluation.py:20-45).
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

A_, B_ = 1.0, 1.0


def _setup(n=6):
    mesh = fem.create_unit_square(n, n)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    T = fem.Function(V)
    T.interpolate(lambda x: x[0] ** 2 + x[1])
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), degree=2))
    dx = fem.Measure("dx", metadata={"quadrature_scheme": "default", "quadrature_degree": 2})
    return mesh, V, T, Q, dx


def test_heat_part1_residual_jacobian_parity():
    mesh, V, T, Q, dx = _setup()
    k = FEMExternalOperator(T, function_space=Q)

    def k_impl(T):
        return (1.0 / (A_ + B_ * np.asarray(T))).reshape(-1)

    def dkdT_impl(T):
        return -B_ * k_impl(T) ** 2

    k.external_function = lambda d: {(0,): k_impl, (1,): dkdT_impl}[d]

    T_tilde, T_hat = fem.TestFunction(V), fem.TrialFunction(V)
    F = fem.inner(-1.0 * k * fem.grad(T), fem.grad(T_tilde)) * dx
    J = fem.expand_derivatives(fem.derivative(F, T, T_hat))

    F_replaced, F_ops = replace_external_operators(F)
    J_replaced, J_ops = replace_external_operators(J)
    assert len(F_ops) == 1
    assert {op.derivatives for op in J_ops} == {(0,), (1,)}

    operands = evaluate_operands(F_ops)
    evaluate_external_operators(F_ops, operands)
    evaluate_external_operators(J_ops, operands)

    b = np.asarray(fem.assemble_vector(F_replaced))
    A = np.asarray(fem.assemble_matrix(J_replaced))

    # explicit twin (reference :422-436)
    k_explicit = 1.0 / (A_ + B_ * T)
    F_explicit = fem.inner(-1.0 * k_explicit * fem.grad(T), fem.grad(T_tilde)) * dx
    b_ex = np.asarray(fem.assemble_vector(F_explicit))
    assert np.allclose(b, b_ex, atol=1e-14)

    A_ex = np.asarray(fem.assemble_matrix(fem.derivative(F_explicit, T, T_hat)))
    assert np.allclose(A, A_ex, atol=1e-13)

    # hand-derived Jacobian twin (reference :442-448)
    J_manual = (
        fem.inner(B_ * k_explicit**2 * fem.grad(T) * T_hat, fem.grad(T_tilde)) * dx
        + fem.inner(-1.0 * k_explicit * fem.dot(fem.Identity(2), fem.grad(T_hat)), fem.grad(T_tilde)) * dx
    )
    A_man = np.asarray(fem.assemble_matrix(J_manual))
    assert np.allclose(A, A_man, atol=1e-13)


def test_heat_part2_two_operands():
    """Operator q(T, sigma=grad(T)) with derivative multi-indices (1,0),(0,1)."""
    mesh, V, T, Q0, dx = _setup()
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), degree=2, value_shape=(2,)))
    sigma = fem.grad(T)
    q_ = FEMExternalOperator(T, sigma, function_space=Q)
    gdim = 2
    Id = np.eye(gdim)

    def k(T):
        return 1.0 / (A_ + B_ * T)

    def q_impl(T, sigma):
        T = np.asarray(T)
        sigma = np.asarray(sigma)
        num_cells = T.shape[0]
        sigma_ = sigma.reshape((num_cells, -1, gdim))
        return (-k(T)[:, :, np.newaxis] * sigma_).reshape(-1)

    def dqdT_impl(T, sigma):
        T = np.asarray(T)
        sigma = np.asarray(sigma)
        num_cells = T.shape[0]
        sigma_ = sigma.reshape((num_cells, -1, gdim))
        return (B_ * (k(T) ** 2)[:, :, np.newaxis] * sigma_).reshape(-1)

    def dqdsigma_impl(T, sigma):
        T = np.asarray(T)
        out = -k(T)[:, :, np.newaxis, np.newaxis] * Id[np.newaxis, np.newaxis, :, :]
        return out.reshape(-1)

    q_.external_function = lambda d: {(0, 0): q_impl, (1, 0): dqdT_impl, (0, 1): dqdsigma_impl}[d]

    T_tilde, T_hat = fem.TestFunction(V), fem.TrialFunction(V)
    F = fem.inner(q_, fem.grad(T_tilde)) * dx
    J = fem.expand_derivatives(fem.derivative(F, T, T_hat))

    F_replaced, F_ops = replace_external_operators(F)
    J_replaced, J_ops = replace_external_operators(J)
    # shape law: dq/dsigma has shape (2,) + (2,)
    dshapes = {op.derivatives: op.shape for op in J_ops}
    assert dshapes[(0, 1)] == (2, 2)
    assert dshapes[(1, 0)] == (2,)

    operands = evaluate_operands(F_ops)
    evaluate_external_operators(F_ops, operands)
    evaluate_external_operators(J_ops, operands)

    b = np.asarray(fem.assemble_vector(F_replaced))
    A = np.asarray(fem.assemble_matrix(J_replaced))

    k_explicit = 1.0 / (A_ + B_ * T)
    F_ex = fem.inner(-1.0 * k_explicit * fem.grad(T), fem.grad(T_tilde)) * dx
    assert np.allclose(b, np.asarray(fem.assemble_vector(F_ex)), atol=1e-14)
    A_ex = np.asarray(fem.assemble_matrix(fem.derivative(F_ex, T, T_hat)))
    assert np.allclose(A, A_ex, atol=1e-13)


def test_heat_part3_jax_kernel_full_solve():
    """Part 3: JAX kernels via vmap+jacfwd; solve the nonlinear problem with
    our Newton and compare against a pure-form twin solve."""
    import jax
    import jax.numpy as jnp

    mesh, V, T, Q, dx = _setup(n=8)
    k_ext = FEMExternalOperator(T, function_space=Q)

    def k_pt(T):
        return 1.0 / (A_ + B_ * T)

    dk_pt = jax.jacfwd(k_pt)
    k_vec = jax.jit(jax.vmap(jax.vmap(k_pt)))
    dk_vec = jax.jit(jax.vmap(jax.vmap(dk_pt)))
    k_ext.external_function = lambda d: {(0,): lambda t: k_vec(t).reshape(-1),
                                         (1,): lambda t: dk_vec(t).reshape(-1)}[d]

    T_tilde, T_hat = fem.TestFunction(V), fem.TrialFunction(V)
    x = fem.SpatialCoordinate(mesh)
    f_src = 2.0 * x[0] + x[1]  # a source term
    F = fem.inner(k_ext * fem.grad(T), fem.grad(T_tilde)) * dx - f_src * T_tilde * dx
    J = fem.derivative(F, T, T_hat)
    F_replaced, F_ops = replace_external_operators(F)
    J_replaced, J_ops = replace_external_operators(J)

    bdofs = fem.locate_dofs_geometrical(
        V, lambda X: np.isclose(X[0], 0) | np.isclose(X[0], 1) | np.isclose(X[1], 0) | np.isclose(X[1], 1)
    )
    bc = fem.DirichletBC(bdofs, np.zeros(len(bdofs)))

    from dolfinx_external_operator_tpu import solvers

    T.interpolate(lambda X: 0.0 * X[0] + 0.01)

    def callback():
        ops = evaluate_operands(F_ops)
        evaluate_external_operators(F_ops, ops)
        evaluate_external_operators(J_ops, ops)

    prob = solvers.NonlinearProblem(
        F_replaced, T, J_replaced, bcs=[bc],
        petsc_options={"snes_atol": 1e-10, "snes_rtol": 1e-10},
        external_callback=callback,
    )
    its_ext, conv = prob.solve()
    assert conv
    T_ext = np.asarray(T.data).copy()

    # pure twin solve from the same initial guess
    T.interpolate(lambda X: 0.0 * X[0] + 0.01)
    k_explicit = 1.0 / (A_ + B_ * T)
    F_tw = fem.inner(k_explicit * fem.grad(T), fem.grad(T_tilde)) * dx - f_src * T_tilde * dx
    J_tw = fem.derivative(F_tw, T, T_hat)
    prob_tw = solvers.NonlinearProblem(F_tw, T, J_tw, bcs=[bc],
                                       petsc_options={"snes_atol": 1e-10, "snes_rtol": 1e-10})
    its_tw, conv_tw = prob_tw.solve()
    assert conv_tw
    T_twin = np.asarray(T.data)

    # identical Newton iteration counts (BASELINE.md target) and solution parity
    assert its_ext == its_tw
    assert np.abs(T_ext - T_twin).max() < 1e-10
