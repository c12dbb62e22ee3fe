"""Tests for the reference-parity ``petsc`` shim.

The reference exposes ``petsc.assemble_residual_with_callback``
(``src/dolfinx_external_operator/petsc/petsc.py:11-68``) as a SNES residual
callback: constitutive update BEFORE assembly, then assemble + lifting +
set_bc.  Our shim has two branches:

* install branch — given a ``NonlinearProblem``, installs the callback and
  returns the problem (how a ported reference demo uses it);
* direct branch — given forms, runs the callback and returns the
  BC-adjusted residual vector (the literal reference semantics).

Both are covered here; the direct branch's output is checked against a
hand-composed assemble -> apply_lifting -> set_bc pipeline.
"""
import numpy as np

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu import (
    FEMExternalOperator,
    evaluate_external_operators,
    evaluate_operands,
    petsc,
    replace_external_operators,
)
from dolfinx_external_operator_tpu.assembly import (
    DirichletBC,
    apply_lifting,
    assemble_vector,
    set_bc,
)

A_, B_ = 1.0, 1.0


def _heat_problem(n=6):
    mesh = fem.create_unit_square(n, n)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    T = fem.Function(V)
    T.interpolate(lambda x: 0.5 + x[0] * x[1])
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), degree=2))
    dx = fem.Measure("dx", metadata={"quadrature_scheme": "default", "quadrature_degree": 2})

    k = FEMExternalOperator(T, function_space=Q)

    def k_impl(Tv):
        return (1.0 / (A_ + B_ * np.asarray(Tv))).reshape(-1)

    def dkdT_impl(Tv):
        return -B_ * k_impl(Tv) ** 2

    k.external_function = lambda d: {(0,): k_impl, (1,): dkdT_impl}[d]

    T_tilde, T_hat = fem.TestFunction(V), fem.TrialFunction(V)
    F = fem.inner(k * fem.grad(T), fem.grad(T_tilde)) * dx
    J = fem.expand_derivatives(fem.derivative(F, T, T_hat))
    F_replaced, F_ops = replace_external_operators(F)
    J_replaced, J_ops = replace_external_operators(J)

    left = fem.locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 0.0))
    bc = DirichletBC(left, np.full(left.size, 0.3))

    calls = []

    def constitutive_update():
        calls.append(1)
        operands = evaluate_operands(F_ops)
        evaluate_external_operators(F_ops, operands)
        evaluate_external_operators(J_ops, operands)

    return dict(mesh=mesh, V=V, T=T, F=F_replaced, J=J_replaced, bc=bc,
                callback=constitutive_update, calls=calls)


def test_direct_branch_matches_manual_pipeline():
    """Direct invocation (no problem object): callback runs, and the result
    equals assemble -> apply_lifting -> set_bc by hand."""
    P = _heat_problem()
    T, bc = P["T"], P["bc"]

    b = petsc.assemble_residual_with_callback(
        T, P["F"], P["J"], [bc], P["callback"], ())
    assert len(P["calls"]) == 1  # constitutive update ran exactly once

    # manual twin: the callback already refreshed the operator coefficients
    x0 = T.data
    b_ex = assemble_vector(P["F"])
    b_ex = apply_lifting(b_ex, P["J"], [bc], x0, scale=-1.0)
    b_ex = set_bc(b_ex, [bc], x0, scale=-1.0)
    assert np.allclose(np.asarray(b), np.asarray(b_ex), atol=1e-14)

    # BC rows carry -(g - x0): the SNES Newton convention (scale -1)
    assert np.allclose(np.asarray(b)[bc.dofs],
                       -(bc.values - np.asarray(x0)[bc.dofs]), atol=1e-14)


def test_direct_branch_no_bcs_is_plain_residual():
    P = _heat_problem()
    b = petsc.assemble_residual_with_callback(
        P["T"], P["F"], P["J"], [], P["callback"], ())
    b_ex = assemble_vector(P["F"])
    assert np.allclose(np.asarray(b), np.asarray(b_ex), atol=1e-14)


def test_install_branch_returns_problem_with_hook():
    P = _heat_problem()
    problem = petsc.NonlinearProblem(P["F"], P["T"], P["J"], bcs=[P["bc"]])
    out = petsc.assemble_residual_with_callback(
        P["T"], P["F"], P["J"], [P["bc"]], P["callback"], (), solver=problem)
    assert out is problem
    assert problem.external_callback is P["callback"]
    assert len(P["calls"]) == 0  # install only; no eager evaluation
