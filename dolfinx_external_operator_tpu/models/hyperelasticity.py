"""ICNN hyperelasticity: square with elliptic holes under tension.

TPU-native rebuild of the reference ``doc/demo/demo_hyperelasticity.py``:
a pretrained Input-Convex NN energy W(F) provides the first Piola-Kirchhoff
stress P = dW/dF + F H (stress-corrected) as an external operator on a
tensor-valued quadrature space; the tangent dP/dF comes from forward-mode AD
(the reference uses torch.func.vmap(jacfwd(...)), ``:448``; here plain
jax.vmap/jacfwd).  Verification twin: the analytic Isihara model written
symbolically with ``variable``/``diff`` (reference ``:686-705``), reported
as relative L-infinity and L2 displacement errors (``:806,817``).
"""

from __future__ import annotations

import numpy as np

from .. import (
    DirichletBC,
    FEMExternalOperator,
    Function,
    Identity,
    Measure,
    TestFunction,
    TrialFunction,
    assemble_scalar,
    build_square_with_elliptic_holes,
    derivative,
    evaluate_external_operators,
    evaluate_operands,
    functionspace,
    grad,
    inner,
    locate_dofs_topological,
    quadrature_element,
    replace_external_operators,
    solvers,
    tr,
)
from ..sym import det, diff, variable
from .icnn import ICNN

__all__ = ["solve_hyperelasticity_nn", "solve_hyperelasticity_isihara", "run_comparison"]

QUADRATURE_DEGREE = 2


def _setup(lc=0.1, L=1.0, W=1.0):
    mesh, facet_tags, labels = build_square_with_elliptic_holes(L=L, lc=lc)
    V = functionspace(mesh, ("Lagrange", 2, (2,)))
    bottom_dofs = locate_dofs_topological(V, 1, facet_tags["bottom"])
    top_uy = locate_dofs_topological(V.sub(1), 1, facet_tags["top"])
    top_ux = locate_dofs_topological(V.sub(0), 1, facet_tags["top"])
    # bcs: bottom fully fixed; top ux = 0; top uy = prescribed (per step)
    bc_bottom = DirichletBC(
        np.concatenate([bottom_dofs * 2, bottom_dofs * 2 + 1]),
        np.zeros(2 * bottom_dofs.size),
    )
    bc_top_ux = DirichletBC(top_ux, np.zeros(top_ux.size))
    bc_top_uy = DirichletBC(top_uy, np.zeros(top_uy.size))
    dx = Measure("dx", domain=mesh, metadata={"quadrature_degree": QUADRATURE_DEGREE})
    return mesh, V, dx, [bc_top_uy, bc_top_ux, bc_bottom], bc_top_uy


def solve_hyperelasticity_nn(lc=0.1, n_steps=10, max_displacement=0.5, verbose=False,
                             icnn: ICNN | None = None, mesh_data=None):
    """External-operator (ICNN) solve. Returns dict with u, mesh, iterations."""
    mesh, V, dx, bcs, bc_top = mesh_data or _setup(lc)
    icnn = icnn or ICNN()

    u = Function(V, name="displacement")
    v = TestFunction(V)
    u_hat = TrialFunction(V)
    gradU = Identity(2) + grad(u)  # deformation gradient F

    Qe = quadrature_element(mesh.cell_name(), degree=QUADRATURE_DEGREE, value_shape=(2, 2))
    Q = functionspace(mesh, Qe)

    def dP_dF_impl(Fvals):
        import jax.numpy as jnp

        return icnn.stress_and_tangent(jnp.asarray(Fvals).reshape(-1, 4))

    def P_external(derivatives):
        if derivatives == (1,):
            return dP_dF_impl
        raise NotImplementedError(derivatives)

    P = FEMExternalOperator(gradU, function_space=Q, external_function=P_external, name="P")

    F_res = inner(grad(v), P) * dx
    J = derivative(F_res, u, u_hat)
    F_replaced, F_ops = replace_external_operators(F_res)
    J_replaced, J_ops = replace_external_operators(J)

    def constitutive_update():
        evaluated = evaluate_operands(F_ops)
        ((_, P_new),) = evaluate_external_operators(J_ops, evaluated)
        P.ref_coefficient.x.array[:] = P_new

    problem = solvers.NonlinearProblem(
        F_replaced, u, J_replaced, bcs=bcs,
        petsc_options={"snes_atol": 1e-7, "snes_rtol": 1e-7, "snes_max_it": 50},
        external_callback=constitutive_update,
    )

    iterations = []
    for step in range(1, n_steps + 1):
        bc_top.set(np.full(bc_top.dofs.shape, step * max_displacement / n_steps))
        its, converged = problem.solve()
        assert converged, f"Newton did not converge at step {step}"
        iterations.append(its)
        if verbose:
            print(f"Step {step}: disp {step * max_displacement / n_steps:.3f}, Newton its: {its}")
    return {"u": u, "mesh": mesh, "V": V, "dx": dx, "iterations": iterations,
            "mesh_data": (mesh, V, dx, bcs, bc_top)}


def solve_hyperelasticity_isihara(lc=0.1, n_steps=10, max_displacement=0.5, verbose=False,
                                  mesh_data=None):
    """Pure-form Isihara twin (reference :686-705), via variable/diff."""
    mesh, V, dx, bcs, bc_top = mesh_data or _setup(lc)
    u = Function(V, name="UFL_displacement")
    v = TestFunction(V)
    u_hat = TrialFunction(V)

    F_ = variable(Identity(2) + grad(u))
    C = F_.T @ F_
    J_ = det(F_)
    I1 = tr(C) + 1.0
    I2 = I1 + J_**2 - 1.0
    I1_bar = (J_ ** (-2.0 / 3.0)) * I1
    I2_bar = (J_ ** (-4.0 / 3.0)) * I2
    W_isihara = 0.5 * (I1_bar - 3.0) + (I2_bar - 3.0) + (I1_bar - 3.0) ** 2 + 1.5 * (J_ - 1.0) ** 2
    P = diff(W_isihara, F_)

    F_res = inner(grad(v), P) * dx
    J_form = derivative(F_res, u, u_hat)
    problem = solvers.NonlinearProblem(
        F_res, u, J_form, bcs=bcs,
        petsc_options={"snes_atol": 1e-7, "snes_rtol": 1e-7, "snes_max_it": 50},
    )
    iterations = []
    for step in range(1, n_steps + 1):
        bc_top.set(np.full(bc_top.dofs.shape, step * max_displacement / n_steps))
        its, converged = problem.solve()
        assert converged, f"Isihara twin did not converge at step {step}"
        iterations.append(its)
        if verbose:
            print(f"Step {step}: Newton its: {its}")
    return {"u": u, "mesh": mesh, "V": V, "dx": dx, "iterations": iterations,
            "mesh_data": (mesh, V, dx, bcs, bc_top)}


def run_comparison(lc=0.1, n_steps=10, max_displacement=0.5, verbose=False):
    """NN vs Isihara error metrics (reference :806,817)."""
    nn = solve_hyperelasticity_nn(lc=lc, n_steps=n_steps, max_displacement=max_displacement, verbose=verbose)
    tw = solve_hyperelasticity_isihara(n_steps=n_steps, max_displacement=max_displacement,
                                       verbose=verbose, mesh_data=nn["mesh_data"])
    u, u_tw, dx = nn["u"], tw["u"], nn["dx"]
    du = np.asarray(u.data) - np.asarray(tw.data if hasattr(tw, "data") else tw["u"].data)
    rel_linf = np.abs(du).max() / np.abs(np.asarray(tw["u"].data)).max()
    diff_fun = Function(nn["V"])
    diff_fun.x.array = du
    l2 = float(np.sqrt(assemble_scalar(inner(diff_fun, diff_fun) * dx)))
    return {"rel_linf": float(rel_linf), "l2": l2, "nn": nn, "isihara": tw}
