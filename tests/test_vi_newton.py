"""Bound-constrained Newton (``snes_type="vinewtonrsls"``).

The reference requests PETSc's SNESVINEWTONRSLS in every plasticity demo
(``/root/reference/doc/demo/demo_plasticity_von_mises.py:423``,
``demo_plasticity_mohr_coulomb.py:663``) — always WITHOUT variable bounds,
where it reduces to plain Newton.  This file proves both halves of that
story for our solver:

1. with no bounds installed, ``vinewtonrsls`` is bit-identical to
   ``newtonls`` (the reduction the survey documents, SURVEY §7 hard-part 5);
2. with bounds installed, the reduced-space active-set iteration solves an
   obstacle problem to its KKT conditions — the capability the reference
   gets from PETSc but never exercises.

The obstacle-problem oracle is the KKT system itself: for the convex
energy the KKT conditions uniquely determine the solution, so feasibility
+ complementarity + reduced-residual checks ARE the exact oracle (no twin
needed).
"""
import numpy as np
import pytest

import jax.numpy as jnp

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu import solvers


def _membrane_problem(n=12, f_mag=-10.0, nonlinear=False, **opts):
    """Poisson/membrane residual F(u; v) = (1 + c u^2) grad(u).grad(v) - f v
    on the unit square, u = 0 on the boundary."""
    mesh = fem.create_unit_square(n, n)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    u = fem.Function(V)
    v, du = fem.TestFunction(V), fem.TrialFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_scheme": "default",
                                     "quadrature_degree": 3})
    c = 1.0 if nonlinear else 0.0
    F = fem.inner((1.0 + c * u * u) * fem.grad(u), fem.grad(v)) * dx \
        - f_mag * v * dx
    J = fem.derivative(F, u, du)
    bdofs = fem.locate_dofs_geometrical(
        V, lambda X: np.isclose(X[0], 0) | np.isclose(X[0], 1)
        | np.isclose(X[1], 0) | np.isclose(X[1], 1))
    bc = fem.DirichletBC(bdofs, np.zeros(len(bdofs)))
    prob = solvers.NonlinearProblem(
        F, u, J, bcs=[bc],
        petsc_options={"snes_atol": 1e-10, "snes_rtol": 1e-10, **opts})
    return prob, u, bdofs


def _kkt_check(prob, u, bdofs, lb, ub, tol=5e-9):
    """Feasibility + complementarity + reduced stationarity of the iterate."""
    x = np.asarray(u.data)
    r = np.asarray(prob.F.vector())
    free = np.ones(len(x), bool)
    free[bdofs] = False
    assert x.min() >= lb - 1e-12 and x.max() <= ub + 1e-12
    on_lb = free & (x <= lb + 1e-12)
    on_ub = free & (x >= ub - 1e-12)
    inactive = free & ~on_lb & ~on_ub
    # stationarity off the contact set
    assert np.abs(r[inactive]).max() < tol
    # complementarity sign on the contact set
    if on_lb.any():
        assert r[on_lb].min() > -tol
    if on_ub.any():
        assert r[on_ub].max() < tol
    return on_lb, on_ub


@pytest.mark.parametrize("ksp_type", ["preonly", "cg"])
def test_lower_obstacle_kkt(ksp_type):
    """Membrane pushed down onto a floor: the unconstrained minimum
    (~-0.74) violates lb = -0.05, so a genuine contact set develops."""
    lb, ub = -0.05, np.inf
    prob, u, bdofs = _membrane_problem(ksp_type=ksp_type,
                                       snes_type="vinewtonrsls")
    prob.solver.set_variable_bounds(lb, ub)
    its, converged = prob.solver.solve(prob)
    assert converged
    on_lb, on_ub = _kkt_check(prob, u, bdofs, lb, ub)
    assert on_lb.sum() > 0, "obstacle never engaged — test is vacuous"
    assert on_ub.sum() == 0


def test_upper_obstacle_kkt():
    """Mirror image: upward load against a ceiling ub = +0.05."""
    lb, ub = -np.inf, 0.05
    prob, u, bdofs = _membrane_problem(f_mag=10.0, snes_type="vinewtonrsls")
    prob.solver.set_variable_bounds(lb, ub)
    its, converged = prob.solver.solve(prob)
    assert converged
    on_lb, on_ub = _kkt_check(prob, u, bdofs, lb, ub)
    assert on_ub.sum() > 0
    assert on_lb.sum() == 0


def test_nonlinear_obstacle_kkt():
    """Nonlinear diffusion coefficient: the active set and the Newton
    linearization interact across iterations."""
    lb, ub = -0.04, np.inf
    prob, u, bdofs = _membrane_problem(nonlinear=True,
                                       snes_type="vinewtonrsls")
    prob.solver.set_variable_bounds(lb, ub)
    its, converged = prob.solver.solve(prob)
    assert converged
    on_lb, _ = _kkt_check(prob, u, bdofs, lb, ub)
    assert on_lb.sum() > 0


def test_obstacle_matches_projected_gauss_seidel():
    """Independent oracle: projected Gauss-Seidel on the assembled system
    converges to the unique solution of the (convex, linear) obstacle
    problem."""
    lb = -0.05
    prob, u, bdofs = _membrane_problem(n=8, snes_type="vinewtonrsls")
    prob.solver.set_variable_bounds(lb, np.inf)
    its, converged = prob.solver.solve(prob)
    assert converged

    # assemble A x = b with BC rows/cols eliminated, then PGS
    A = np.asarray(prob.J.matrix())
    u0 = fem.Function(u.function_space)
    u.function_space  # (same space)
    x0 = np.zeros(A.shape[0])
    # b = -F(0): residual at zero iterate
    u_save = np.asarray(u.data).copy()
    u._data = jnp.zeros_like(u.data)
    if prob.external_callback is not None:
        prob.external_callback(*prob.callback_args)
    b = -np.asarray(prob.F.vector())
    u._data = jnp.asarray(u_save)
    mask = np.zeros(A.shape[0], bool)
    mask[bdofs] = True
    keep = ~mask
    A = A * keep[:, None] * keep[None, :] + np.diag(mask.astype(float))
    b = np.where(mask, 0.0, b)
    x = x0
    for _ in range(4000):
        for i in range(len(x)):
            x[i] = max((b[i] - A[i] @ x + A[i, i] * x[i]) / A[i, i], lb)
        x[mask] = 0.0
    assert np.abs(np.asarray(u.data) - x).max() < 1e-7


def test_no_bounds_identical_to_newtonls():
    """vinewtonrsls without bounds IS newtonls (the mode every reference
    demo actually runs in)."""
    prob_a, u_a, _ = _membrane_problem(nonlinear=True, snes_type="newtonls")
    its_a, conv_a = prob_a.solver.solve(prob_a)
    prob_b, u_b, _ = _membrane_problem(nonlinear=True,
                                       snes_type="vinewtonrsls")
    its_b, conv_b = prob_b.solver.solve(prob_b)
    assert conv_a and conv_b
    assert its_a == its_b
    np.testing.assert_array_equal(np.asarray(u_a.data), np.asarray(u_b.data))


def test_bad_snes_type_raises():
    with pytest.raises(ValueError, match="snes_type"):
        solvers.NewtonSolver(snes_type="vinewtonssls")


def _elastic_block_problem(n=10, **opts):
    """2D linear-elastic block (bs=2, the mg-capable case) pulled down by a
    body force, clamped on the bottom edge."""
    mesh = fem.create_unit_square(n, n)
    V = fem.functionspace(mesh, ("Lagrange", 1, (2,)))
    u = fem.Function(V)
    v, du = fem.TestFunction(V), fem.TrialFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_scheme": "default",
                                     "quadrature_degree": 2})
    e = lambda w: fem.symmetric(fem.grad(w))
    body = fem.as_vector([0.0, -1.0])
    F = (2.0 * fem.inner(e(u), e(v)) + 0.5 * fem.tr(e(u)) * fem.tr(e(v))
         - fem.inner(body, v)) * dx
    J = fem.derivative(F, u, du)
    bdofs_s = fem.locate_dofs_geometrical(V, lambda X: np.isclose(X[1], 0))
    bdofs = np.concatenate([bdofs_s * 2, bdofs_s * 2 + 1])
    bc = fem.DirichletBC(bdofs, np.zeros(len(bdofs)))
    prob = solvers.NonlinearProblem(
        F, u, J, bcs=[bc],
        petsc_options={"snes_atol": 1e-10, "snes_rtol": 1e-10, **opts})
    return prob, u, bdofs


def test_mg_with_bounds():
    """vinewtonrsls + pc_type='mg' (the per-iteration active set rides the
    traced elimination mask; the AMG hierarchy stays frozen on the
    Dirichlet-only mask): identical iterates vs the jacobi-CG VI path on an
    elastic block pressed onto a displacement floor."""
    lb, ub = -0.04, np.inf
    prob_j, u_j, bdofs = _elastic_block_problem(
        ksp_type="cg", snes_type="vinewtonrsls")
    prob_j.solver.set_variable_bounds(lb, ub)
    its_j, conv_j = prob_j.solver.solve(prob_j)
    assert conv_j
    # the floor must actually bind somewhere off the clamped edge
    x = np.asarray(u_j.data)
    free = np.ones(len(x), bool)
    free[bdofs] = False
    assert (x[free] <= lb + 1e-12).any(), "no active set developed"

    prob_m, u_m, _ = _elastic_block_problem(
        ksp_type="cg", pc_type="mg", snes_type="vinewtonrsls")
    prob_m.solver.set_variable_bounds(lb, ub)
    its_m, conv_m = prob_m.solver.solve(prob_m)
    assert conv_m
    assert its_m == its_j
    np.testing.assert_allclose(np.asarray(u_m.data), x, rtol=0, atol=1e-8)
