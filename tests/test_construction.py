"""Construction & differentiation bookkeeping.

Mirror of reference ``test/test_external_operators_construction.py``:
- the derivative shape law shape(dN) = shape(N) + shape(operand)
  (reference ``:45-87``)
- replacement counts after form differentiation for form combinations
  (reference ``:104-142``)
- empty pipeline no-ops (reference ``:202-213``)
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


@pytest.fixture
def setup():
    mesh = fem.create_unit_square(4, 4)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    u = fem.Function(V)
    u.interpolate(lambda x: x[0])
    qd = 2
    dx = fem.Measure("dx", metadata={"quadrature_degree": qd})
    return mesh, V, u, qd, dx


@pytest.mark.parametrize("op_shape", [(), (2,), (2, 2)])
@pytest.mark.parametrize("out_shape", [(), (2,), (2, 2)])
def test_derivative_shape_law(setup, op_shape, out_shape):
    """shape(dN/do) == shape(N) + shape(o)  (reference :45-87)."""
    mesh, V, u, qd, dx = setup
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), qd, value_shape=out_shape))
    # operand of requested shape built from grad-towers of u
    if op_shape == ():
        operand = u
    elif op_shape == (2,):
        operand = fem.grad(u)
    else:
        operand = fem.grad(fem.grad(u)) if False else fem.outer(fem.grad(u), fem.grad(u))
    N = FEMExternalOperator(operand, function_space=Q)
    dN = N._derivative_node(0)
    assert dN.shape == tuple(out_shape) + tuple(op_shape)
    # second derivative stacks again
    d2N = dN._derivative_node(0)
    assert d2N.shape == tuple(out_shape) + tuple(op_shape) + tuple(op_shape)


def test_replacement_counts(setup):
    """Number of operators found in F and its expansion of J (reference :104-142)."""
    mesh, V, u, qd, dx = setup
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), qd))
    v = fem.TestFunction(V)
    N1 = FEMExternalOperator(u, function_space=Q)
    N2 = FEMExternalOperator(u, fem.grad(u), function_space=Q)

    F = N1 * v * dx
    _, ops = replace_external_operators(F)
    assert len(ops) == 1

    F2 = N1 * v * dx + N2 * v * dx
    _, ops2 = replace_external_operators(F2)
    assert len(ops2) == 2

    # product of operators in one integrand
    F3 = N1 * N2 * v * dx
    _, ops3 = replace_external_operators(F3)
    assert len(ops3) == 2

    # derivative of F w.r.t. u: chain rule creates dN1/du and keeps N-free terms
    J = fem.derivative(F, u, fem.TrialFunction(V))
    _, opsJ = replace_external_operators(J)
    assert {op.derivatives for op in opsJ} == {(1,)}

    J2 = fem.derivative(F2, u, fem.TrialFunction(V))
    _, opsJ2 = replace_external_operators(J2)
    # dN1/du, dN2/du (1,0) and dN2/dgrad(u) (0,1)
    assert len(opsJ2) == 3
    assert {op.derivatives for op in opsJ2} == {(1,), (1, 0), (0, 1)}


def test_same_operator_found_once(setup):
    mesh, V, u, qd, dx = setup
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), qd))
    v = fem.TestFunction(V)
    N = FEMExternalOperator(u, function_space=Q)
    F = N * v * dx + N * u * v * dx
    _, ops = replace_external_operators(F)
    assert len(ops) == 1


def test_empty_pipeline_no_op(setup):
    """Pure-UFL form passes through unchanged (reference :202-213)."""
    mesh, V, u, qd, dx = setup
    v = fem.TestFunction(V)
    F = fem.inner(fem.grad(u), fem.grad(v)) * dx
    F_replaced, ops = replace_external_operators(F)
    assert ops == []
    assert np.allclose(
        np.asarray(fem.assemble_vector(F_replaced)), np.asarray(fem.assemble_vector(F))
    )
    assert evaluate_operands([]) == {}
    assert evaluate_external_operators([], {}) == []


def test_derivative_coefficient_reuse(setup):
    """Derivative nodes cache their coefficient (improvement over the
    reference, which reallocates on every expand_derivatives)."""
    mesh, V, u, qd, dx = setup
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), qd))
    v = fem.TestFunction(V)
    N = FEMExternalOperator(u, function_space=Q)
    F = N * v * dx
    J1 = fem.derivative(F, u, fem.TrialFunction(V))
    J2 = fem.derivative(F, u, fem.TrialFunction(V))
    _, ops1 = replace_external_operators(J1)
    _, ops2 = replace_external_operators(J2)
    d1 = [op for op in ops1 if op.derivatives == (1,)][0]
    d2 = [op for op in ops2 if op.derivatives == (1,)][0]
    assert d1 is d2
    assert d1.ref_coefficient is d2.ref_coefficient


def test_mixed_coefficient_operand_rejected(setup):
    mesh, V, u, qd, dx = setup
    me = fem.mixed_element([fem.element("Lagrange", "triangle", 1)] * 2)
    W = fem.functionspace(mesh, me)
    w = fem.Function(W)
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), qd))
    with pytest.raises(TypeError):
        FEMExternalOperator(w, function_space=Q)
