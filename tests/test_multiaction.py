"""Adjoint-gradient path: action(adjoint(derivative(action(F, uh), theta)), lmbda).

Mirror of reference ``test/test_multiaction.py``: the dF/dtheta vector used
for adjoint gradients in inverse problems, compared against an analytic
``diff`` twin.  Exercises ``action``, ``adjoint``, the DualSpace shim, and
derivative contraction against a trial function on the parameter space.

Dtype coverage: float64 and float32 with ``50 * eps``-scaled tolerances
(reference ``test_multiaction.py:15-23,124-125``), plus complex128 on the
CPU backend (on TPU it stays a documented exclusion — XLA:TPU f64
emulation does not extend to c128 — and ``scalar_type_context`` raises).
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


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("q_deg", [1, 3, 5])
def test_nested_action(q_deg, dtype):
    from dolfinx_external_operator_tpu.dtypes import scalar_type_context

    with scalar_type_context(dtype):
        _run_nested_action(q_deg, dtype)


def _run_nested_action(q_deg, dtype):
    mesh = fem.create_unit_square(4, 4)

    T = fem.functionspace(mesh, ("DG", 0, (3,)))
    theta = fem.Function(T, name="theta")
    theta.interpolate(lambda x: (0.1 * x[0], 0.2 * x[1] + 0.3 * x[1], x[0] * x[1]))

    def f_mod(mod, th, x):
        return mod.sin(np.pi * th[0] * x[0]) * mod.cos(np.pi * th[2] * x[1]) + 3.11 * th[1]

    def f(th, x):
        th = np.asarray(th).reshape(-1, 3).T
        x = np.asarray(x).reshape(-1, 2).T
        return f_mod(np, th, x).ravel()

    def df_dtheta(th, x):
        th = np.asarray(th).reshape(-1, 3).T
        x = np.asarray(x).reshape(-1, 2).T
        d0 = np.pi * x[0] * np.cos(np.pi * th[0] * x[0]) * np.cos(np.pi * th[2] * x[1])
        d1 = np.full(th.shape[1], 3.11)
        d2 = -np.pi * x[1] * np.sin(np.pi * th[0] * x[0]) * np.sin(np.pi * th[2] * x[1])
        return np.array([d0, d1, d2]).T.ravel()

    def df_dx(th, x):
        th = np.asarray(th).reshape(-1, 3).T
        x = np.asarray(x).reshape(-1, 2).T
        d0 = np.pi * th[0] * np.cos(np.pi * th[0] * x[0]) * np.cos(np.pi * th[2] * x[1])
        d1 = -np.pi * th[2] * np.sin(np.pi * th[0] * x[0]) * np.sin(np.pi * th[2] * x[1])
        return np.array([d0, d1]).T.ravel()

    f_ext = lambda d: {(0, 0): f, (1, 0): df_dtheta, (0, 1): df_dx}[d]

    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), degree=q_deg))
    x = fem.SpatialCoordinate(mesh)
    N = FEMExternalOperator(theta, x, function_space=Q, external_function=f_ext)

    V = fem.functionspace(mesh, ("Lagrange", 1))
    u = fem.TrialFunction(V)
    v = fem.TestFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_degree": q_deg})
    F = fem.inner(u, v) * dx - fem.inner(N, v) * dx

    uh = fem.Function(V, name="uh")
    uh.interpolate(lambda X: np.sin(np.pi * X[0]))
    lmbda = fem.Function(V, name="lmbda")
    lmbda.interpolate(lambda X: np.cos(X[1]))

    F_app = fem.action(F, uh)
    dFdtheta = fem.action(fem.adjoint(fem.derivative(F_app, theta)), lmbda)

    replaced_form, ex_ops = replace_external_operators(dFdtheta)
    assert len(ex_ops) == 1
    assert ex_ops[0].derivatives == (1, 0)

    operands = evaluate_operands(ex_ops)
    evaluate_external_operators(ex_ops, operands)
    vec = np.asarray(fem.assemble_vector(replaced_form))

    # analytic twin (reference :116-123)
    f_ref = f_mod(S, S.as_vector([theta[0], theta[1], theta[2]]), x)
    dfdtheta = S.diff(f_ref, theta)
    ref_form = -1.0 * fem.inner(dfdtheta, fem.TestFunction(T)) * lmbda * dx
    vec_ref = np.asarray(fem.assemble_vector(ref_form))

    assert vec.dtype == dtype
    tol = 50 * float(np.finfo(dtype).eps)
    np.testing.assert_allclose(vec, vec_ref, rtol=tol, atol=tol)


def test_complex128_on_cpu_backend():
    """complex128 adjoint-path parity on the CPU backend (the reference
    parametrizes this oracle over c128, ``test_multiaction.py:15-23``;
    XLA:TPU's f64 emulation cannot — the context raises there, see
    ``dtypes.scalar_type_context``).  The test suite runs on the CPU
    backend (conftest), so this exercises the supported path."""
    import jax

    from dolfinx_external_operator_tpu.dtypes import scalar_type_context

    assert jax.default_backend() == "cpu"
    with scalar_type_context(np.complex128):
        _run_nested_action(3, np.complex128)


def test_dual_space_shim():
    """DualSpace round-trip (reference fem.py:20-56 parity)."""
    mesh = fem.create_unit_square(2, 2)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    Vd = V.dual()
    assert Vd.dual() is V
    assert isinstance(Vd, fem.DualSpace)
