"""Taylor-remainder consistency test with Riesz-dual norms.

Framework port of the verification harness in the reference Mohr-Coulomb
demo (``demo_plasticity_mohr_coulomb.py:1092-1235``): for a residual form
F(u) and its Jacobian J(u),

    r0(k) = F(u0 + k du) - F(u0)                  -> O(k)
    r1(k) = F(u0 + k du) - F(u0) - k J(u0) du     -> O(k^2)

with norms measured in the dual space via the Riesz map of the vector
Laplacian (LU-factorized once).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..assembly import assemble_matrix, bc_arrays, create_form
from ..function import Function
from ..solvers import solve_dense
from ..sym import Measure, TestFunction, TrialFunction, grad, inner

__all__ = ["taylor_test", "convergence_rates"]


def taylor_test(Du: Function, F_form, J_form, refresh, bcs=(),
                k_list=None, du0=None):
    """Return (k_list, r0_norms, r1_norms).

    ``refresh()`` must re-evaluate any external operators at the current Du
    (the constitutive-update callback).  ``du0`` is the perturbation
    direction (defaults to Du's current value, as in the reference)."""
    if k_list is None:
        k_list = np.logspace(-2.0, -6.0, 5)[::-1]
    V = Du.function_space
    mesh = V.mesh
    deg = V.element.degree
    dxm = Measure("dx", domain=mesh, metadata={"quadrature_degree": 2 * deg})
    u_hat, v = TrialFunction(V), TestFunction(V)
    L = assemble_matrix(inner(grad(u_hat), grad(v)) * dxm, bcs=bcs)

    n = V.num_dofs
    mask, _ = bc_arrays(bcs, n)

    F_c = create_form(F_form)
    J_c = create_form(J_form)

    Du0 = jnp.array(Du.data)
    delta_u = Du0 if du0 is None else jnp.asarray(du0)

    refresh()
    F0 = F_c.vector()
    F0 = jnp.where(mask, 0.0, F0)
    J0 = J_c.matrix()
    keep = (~mask).astype(J0.dtype)
    J0 = J0 * keep[:, None] * keep[None, :] + jnp.diag(mask.astype(J0.dtype))

    r0_norms = np.zeros(len(k_list))
    r1_norms = np.zeros(len(k_list))
    for i, k in enumerate(k_list):
        Du.x.array = Du0 + k * delta_u
        refresh()
        Fk = F_c.vector()
        Fk = jnp.where(mask, 0.0, Fk)
        r0 = Fk - F0
        r1 = r0 - k * (J0 @ delta_u)
        y0 = solve_dense(L, r0)
        y1 = solve_dense(L, r1)
        r0_norms[i] = float(jnp.sqrt(jnp.abs(jnp.vdot(r0, y0))))
        r1_norms[i] = float(jnp.sqrt(jnp.abs(jnp.vdot(r1, y1))))

    Du.x.array = Du0
    refresh()
    return np.asarray(k_list), r0_norms, r1_norms


def convergence_rates(k_list, norms, skip=0):
    """Least-squares slope of log(norm) vs log(k)."""
    k = np.asarray(k_list)[skip:]
    v = np.asarray(norms)[skip:]
    return float(np.polyfit(np.log(k), np.log(np.maximum(v, 1e-300)), 1)[0])
