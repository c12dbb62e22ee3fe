"""grad() of composite expressions: product/chain rules evaluated in-place.

UFL lets reference demos write ``grad(u*u)``, ``grad(inner(a, b))``, etc.
freely (``apply_derivatives`` expands them symbolically); our compiler
evaluates the rules directly in ``_eval_grad_of``.  Oracle: assemble the
composite form and a hand-expanded twin, compare.
"""
import numpy as np

import dolfinx_external_operator_tpu as fem


def _setup(n=4):
    mesh = fem.create_unit_square(n, n)
    V = fem.functionspace(mesh, ("Lagrange", 2))
    W = fem.functionspace(mesh, ("Lagrange", 2, (2,)))
    u = fem.Function(V, name="u")
    w = fem.Function(W, name="w")
    u.interpolate(lambda x: 1.0 + x[0] ** 2 + 0.5 * x[1])
    w.interpolate(lambda x: (x[0] * x[1], x[0] - x[1] ** 2))
    v = fem.TestFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 6, "quadrature_scheme": "default"})
    return mesh, u, w, v, dx


def _check(F, F_twin):
    b = np.asarray(fem.assemble_vector(F))
    b_tw = np.asarray(fem.assemble_vector(F_twin))
    np.testing.assert_allclose(b, b_tw, rtol=0, atol=1e-12)


def test_grad_product():
    mesh, u, w, v, dx = _setup()
    F = fem.inner(fem.grad(u * u), fem.grad(v)) * dx
    F_tw = fem.inner(2.0 * u * fem.grad(u), fem.grad(v)) * dx
    _check(F, F_tw)


def test_grad_division():
    mesh, u, w, v, dx = _setup()
    F = fem.inner(fem.grad(1.0 / u), fem.grad(v)) * dx
    F_tw = fem.inner(-1.0 / (u * u) * fem.grad(u), fem.grad(v)) * dx
    _check(F, F_tw)


def test_grad_power():
    mesh, u, w, v, dx = _setup()
    F = fem.inner(fem.grad(u**3), fem.grad(v)) * dx
    F_tw = fem.inner(3.0 * u * u * fem.grad(u), fem.grad(v)) * dx
    _check(F, F_tw)


def test_grad_inner_and_dot():
    mesh, u, w, v, dx = _setup()
    F = fem.inner(fem.grad(fem.inner(w, w)), fem.grad(v)) * dx
    # grad(w.w) = 2 grad(w)^T w  with grad(w)_ij = dw_i/dx_j
    F_tw = fem.inner(2.0 * fem.dot(fem.transpose(fem.grad(w)), w), fem.grad(v)) * dx
    _check(F, F_tw)


def test_grad_unary_chain():
    mesh, u, w, v, dx = _setup()
    F = fem.inner(fem.grad(fem.exp(u)), fem.grad(v)) * dx
    F_tw = fem.inner(fem.exp(u) * fem.grad(u), fem.grad(v)) * dx
    _check(F, F_tw)
    F2 = fem.inner(fem.grad(fem.sqrt(u)), fem.grad(v)) * dx
    F2_tw = fem.inner(0.5 / fem.sqrt(u) * fem.grad(u), fem.grad(v)) * dx
    _check(F2, F2_tw)


def test_grad_product_of_functions():
    mesh, u, w, v, dx = _setup()
    u2 = fem.Function(u.function_space, name="u2")
    u2.interpolate(lambda x: x[0] - 2.0 * x[1])
    F = fem.inner(fem.grad(u * u2), fem.grad(v)) * dx
    F_tw = fem.inner(u2 * fem.grad(u) + u * fem.grad(u2), fem.grad(v)) * dx
    _check(F, F_tw)
