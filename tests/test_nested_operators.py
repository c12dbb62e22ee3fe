"""Nested external operators Z(N, P(N)) across all 5 cell types.

Mirror of reference ``test/test_nested_ex_op.py``: a 3-deep composition of
external operators (with SpatialCoordinate and a DG1 vector coefficient as
leaf operands) assembled through the pipeline and compared against the same
functions written symbolically.  Also exercises the intended user-facing
wrappers ``compile_external_operator_form`` / ``pack_external_operator_data``
(reference ``:17-47``) and ``action`` on a form with a trial function.
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
from dolfinx_external_operator_tpu import sym as S


def compile_external_operator_form(form):
    """Reference test_nested_ex_op.py:17-31."""
    form_replaced, ex_ops = replace_external_operators(form)
    compiled = fem.create_form(form_replaced)
    compiled._ex_ops = ex_ops
    return compiled


def pack_external_operator_data(form):
    """Reference test_nested_ex_op.py:34-47."""
    forms = form if isinstance(form, list) else [form]
    for f in forms:
        ex_ops = f._ex_ops
        if len(ex_ops) == 0:
            continue
        operands = evaluate_operands(ex_ops)
        evaluate_external_operators(ex_ops, operands)


def _mesh(cell_type, n):
    if cell_type == "interval":
        return fem.create_unit_interval(n)
    if cell_type in ("triangle", "quadrilateral"):
        return fem.create_unit_square(n, n, cell_type)
    return fem.create_unit_cube(n, n, n, cell_type)


def _u_NN(mod, gdim, x, theta):
    if gdim == 1:
        return mod.sin(theta[0] * x[0])
    return mod.sin(theta[0] * x[0]) * mod.sin(theta[1] * x[1])


@pytest.mark.parametrize("q_deg", [1, 4, 8])
@pytest.mark.parametrize(
    "cell_type,n",
    [("interval", 8), ("triangle", 2), ("triangle", 4), ("triangle", 8),
     ("quadrilateral", 4), ("tetrahedron", 2), ("tetrahedron", 3),
     ("hexahedron", 2), ("hexahedron", 3)],
)
def test_nested_replacement_operator(cell_type, n, q_deg):
    mesh = _mesh(cell_type, n)
    gdim = mesh.gdim

    R = fem.functionspace(mesh, ("DG", 1, (4,)))
    theta = fem.Function(R)
    theta.x.array[:] = np.full(R.num_dofs, 0.32)
    x = fem.SpatialCoordinate(mesh)

    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), degree=q_deg))

    def u_NN_impl(x_, theta_):
        x_vec = np.asarray(x_).reshape(-1, gdim)
        theta_vec = np.asarray(theta_).reshape(-1, 4)
        return _u_NN(np, gdim, x_vec.T, theta_vec.T).ravel()

    N = FEMExternalOperator(
        x, theta, function_space=Q, name="exop",
        external_function=lambda d: {(0, 0): u_NN_impl}[d],
    )
    P = FEMExternalOperator(
        N, function_space=Q, name="second_op",
        external_function=lambda d: {(0,): lambda nn: np.sin(np.asarray(nn)).ravel()}[d],
    )
    Z = FEMExternalOperator(
        N, P, function_space=Q, name="third_op",
        external_function=lambda d: {(0, 0): lambda nn, pp: (np.cos(np.asarray(nn)) + np.asarray(pp) ** 2).ravel()}[d],
    )

    V = fem.functionspace(mesh, ("Lagrange", 1))
    phi = fem.TrialFunction(V)
    v = fem.TestFunction(V)
    dx = fem.Measure("dx", domain=mesh, metadata={"quadrature_degree": q_deg})

    def F_of(Pe, Ne, Ze, phi_h):
        a = fem.inner(fem.grad(phi), fem.grad(v)) * dx
        L = (Ze**2 * Pe * Ne) * v * dx
        return fem.action(a - L, phi_h)

    phih = fem.Function(V, name="phih")
    phih.interpolate(lambda X: np.sin(np.pi * X[0]))

    F_ex = F_of(P, N, Z, phih)
    F_compiled = compile_external_operator_form(F_ex)
    # dependency order: operands before parents
    names = [op.name for op in F_compiled._ex_ops]
    assert names.index("exop") < names.index("second_op") < names.index("third_op")

    pack_external_operator_data(F_compiled)
    vec = np.asarray(F_compiled.vector())

    # symbolic twin
    N_sym = _u_NN(S, gdim, x, theta)
    P_sym = S.sin(N_sym)
    Z_sym = S.cos(N_sym) + P_sym**2
    F_ref = F_of(P_sym, N_sym, Z_sym, phih)
    vec_ref = np.asarray(fem.assemble_vector(F_ref))
    np.testing.assert_allclose(vec, vec_ref, atol=1e-13)
