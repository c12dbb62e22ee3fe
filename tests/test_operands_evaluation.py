"""Operand interpolation parity: evaluate_operands vs direct Expression.eval.

Mirror of reference ``test/test_operands_evaluation.py``: operand arrays
produced by the pipeline equal a direct Expression evaluation at the
quadrature points of ``make_quadrature``; covers a hyperelastic invariant
I1 = tr(F^T F) operand and a constant-field operand (reference ``:48-66``).
"""
import numpy as np
import pytest

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu import (
    Expression,
    FEMExternalOperator,
    evaluate_operands,
)
from dolfinx_external_operator_tpu.sym import Identity, dot, grad, tr, transpose


@pytest.mark.parametrize("quadrature_degree", [1, 2, 4])
def test_operands_match_direct_expression_eval(quadrature_degree):
    mesh = fem.create_unit_square(6, 6)
    V = fem.functionspace(mesh, ("Lagrange", 1, (2,)))
    u = fem.Function(V)
    u.interpolate(lambda x: (x[0] ** 2 + x[1], 0.5 * x[0] * x[1]))

    F_def = Identity(2) + grad(u)
    I1 = tr(dot(transpose(F_def), F_def))  # hyperelastic invariant
    const_op = fem.Constant(3.5) * (u[0] - u[0] + 1.0)  # constant field

    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), degree=quadrature_degree))
    N = FEMExternalOperator(I1, const_op, function_space=Q,
                            external_function=lambda d: (lambda a, b: np.asarray(a).reshape(-1)))

    evaluated = evaluate_operands([N])
    got_I1 = np.asarray(evaluated[list(evaluated)[0]])

    qpts, _ = fem.make_quadrature(mesh.cell_name(), quadrature_degree)
    direct = np.asarray(Expression(I1, qpts).eval(mesh))
    assert np.allclose(got_I1, direct, atol=1e-14)

    # the constant operand evaluates to its constant value everywhere
    vals = [np.asarray(v) for k, v in evaluated.items()]
    const_arr = [v for v in vals if np.allclose(v, 3.5)]
    assert const_arr, "constant operand missing or wrong"


def test_unique_operands_evaluated_once():
    """Two operators sharing an operand -> one entry in the map (reference
    evaluate_operands dedup, external_operator.py:374-404)."""
    mesh = fem.create_unit_square(3, 3)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    u = fem.Function(V)
    u.interpolate(lambda x: x[0])
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), degree=2))
    ident = lambda d: (lambda a: np.asarray(a).reshape(-1))
    N1 = FEMExternalOperator(u, function_space=Q, external_function=ident)
    N2 = FEMExternalOperator(u, function_space=Q, external_function=ident)
    evaluated = evaluate_operands([N1, N2])
    assert len(evaluated) == 1