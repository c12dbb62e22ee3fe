"""Von Mises J2 plasticity with isotropic hardening: cylinder expansion.

TPU-native rebuild of the reference demos
``doc/demo/demo_plasticity_von_mises.py`` (external-operator version; the
Numba per-Gauss-point loop ``:298-332`` becomes a vmapped, jitted JAX kernel)
and ``doc/demo/demo_plasticity_von_mises_pure_ufl.py`` (analytic pure-form
twin, the verification oracle).

Problem: plane-strain expansion of a quarter cylinder under internal
pressure, 20 load steps up to 1.1x the analytic collapse load
``q_lim = 2/sqrt(3) ln(Re/Ri) sigma_0`` (reference ``:542-544``).
State (sigma_n, p) lives in HBM across load steps.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import (
    Constant,
    DirichletBC,
    FacetNormal,
    FEMExternalOperator,
    Function,
    Measure,
    TestFunction,
    TrialFunction,
    as_tensor,
    as_vector,
    build_cylinder_quarter,
    derivative,
    dev,
    evaluate_external_operators,
    evaluate_operands,
    functionspace,
    grad,
    inner,
    locate_dofs_topological,
    quadrature_element,
    replace_external_operators,
    solvers,
    sqrt,
    tr,
    Identity,
    symmetric,
)
from ..utils.probes import find_cell_by_point, interpolate_quadrature

__all__ = ["VonMisesMaterial", "solve_von_mises", "solve_von_mises_pure_form"]

# Geometry / material constants of the reference demo (:183-204)
R_E, R_I = 1.3, 1.0
E_MOD, NU = 70e3, 0.3
E_TANGENT = E_MOD / 100.0
H_MOD = E_MOD * E_TANGENT / (E_MOD - E_TANGENT)
SIGMA_0 = 250.0
LAMBDA = E_MOD * NU / (1.0 + NU) / (1.0 - 2.0 * NU)
MU = E_MOD / 2.0 / (1.0 + NU)

C_ELAS = np.array(
    [
        [LAMBDA + 2 * MU, LAMBDA, LAMBDA, 0.0],
        [LAMBDA, LAMBDA + 2 * MU, LAMBDA, 0.0],
        [LAMBDA, LAMBDA, LAMBDA + 2 * MU, 0.0],
        [0.0, 0.0, 0.0, 2 * MU],
    ]
)
DEV4 = np.eye(4)
DEV4[:3, :3] -= 1.0 / 3.0

Q_LIM = float(2.0 / np.sqrt(3.0) * np.log(R_E / R_I) * SIGMA_0)


def epsilon(v):
    """Mandel-Voigt strain 4-vector (reference :225-227)."""
    g = grad(v)
    return as_vector([g[0, 0], g[1, 1], 0.0, np.sqrt(2.0) * 0.5 * (g[0, 1] + g[1, 0])])


def _return_mapping_kernel():
    """Per-Gauss-point analytic return mapping (reference Numba ``_kernel``,
    ``demo_plasticity_von_mises.py:307-326``), as a pure JAX function."""
    C = jnp.asarray(C_ELAS)
    D = jnp.asarray(DEV4)

    def kernel(deps, sigma_n, p):
        sig_el = sigma_n + C @ deps
        s = D @ sig_el
        sig_eq = jnp.sqrt(1.5 * jnp.vdot(s, s))
        f_el = sig_eq - SIGMA_0 - H_MOD * p
        f_plus = (f_el + jnp.sqrt(f_el * f_el)) / 2.0
        dp = f_plus / (3.0 * MU + H_MOD)
        # guarded divisions: when f_el <= 0 (elastic) the plastic terms vanish
        # identically, so substituting a safe denominator changes nothing.
        # (The reference kernel divides unguarded and relies on float noise
        # keeping sig_eq != 0, demo_plasticity_von_mises.py:318-319; on exact
        # zero strain that yields NaN.)
        plastic = f_el > 0.0
        sig_eq_safe = jnp.where(sig_eq > 0.0, sig_eq, 1.0)
        n_elas = jnp.where(plastic, s / sig_eq_safe * f_plus / jnp.where(plastic, f_el, 1.0), 0.0)
        beta = jnp.where(plastic, 3.0 * MU * dp / sig_eq_safe, 0.0)
        sig = sig_el - beta * s
        C_tang = (
            C
            - 3.0 * MU * (3.0 * MU / (3.0 * MU + H_MOD) - beta) * jnp.outer(n_elas, n_elas)
            - 2.0 * MU * beta * D
        )
        return C_tang, sig, dp

    return kernel


def pallas_batched_kernel(tile=512):
    """Pallas-backed SoA constitutive kernel for ``FusedPlasticityStep``
    (``batched_kernel=`` option): the von Mises return map + consistent
    tangent in a single f32 VMEM pass (``ops/vonmises_pallas.py``), batch
    padded to the lane tile.  f32 execution — an opt-in fast path for
    serving-style workloads; the default f64 vmapped kernel remains the
    1e-10-parity path.

    Signature matches the fused step's SoA contract:
    ``(deps (4, n), sigma_n (4, n)) -> (C_tang (4, 4, n), sig (4, n))``."""
    from ..ops.vonmises_pallas import vonmises_return_map_pallas

    params = [LAMBDA, MU, H_MOD, SIGMA_0]

    def batched(deps_soa, sn_soa):
        n = deps_soa.shape[1]
        n_pad = ((n + tile - 1) // tile) * tile
        pad = n_pad - n
        d32 = jnp.pad(deps_soa.astype(jnp.float32), ((0, 0), (0, pad)))
        s32 = jnp.pad(sn_soa.astype(jnp.float32), ((0, 0), (0, pad)))
        p32 = jnp.zeros((n_pad,), jnp.float32)
        C, sig, dp = vonmises_return_map_pallas(d32, s32, p32, params, tile=tile)
        C = C[:, :n].reshape(4, 4, n).astype(deps_soa.dtype)
        sig = sig[:, :n].astype(deps_soa.dtype)
        return C, sig

    return batched


class VonMisesMaterial:
    """Batched return-mapping with consistent tangent, jitted once.

    Vmapped with the batch axis LAST (structure-of-arrays): batch-first
    leaves the TPU vector lanes ~97% idle on these tiny per-point tensors."""

    def __init__(self):
        k = _return_mapping_kernel()
        self._vmapped = jax.jit(jax.vmap(k, in_axes=(-1, -1, -1), out_axes=(-1, -1, -1)))

    def __call__(self, deps_flat, sigma_n_flat, p_flat):
        deps = deps_flat.reshape(-1, 4).T
        sn = sigma_n_flat.reshape(-1, 4).T
        p = p_flat.reshape(-1)
        C_tang, sig, dp = self._vmapped(deps, sn, p)
        return jnp.moveaxis(C_tang, -1, 0).reshape(-1), sig.T.reshape(-1), dp.reshape(-1)


def _setup_common(lc):
    mesh, facet_tags, labels = build_cylinder_quarter(lc=lc)
    k_u = 2
    V = functionspace(mesh, ("Lagrange", k_u, (2,)))
    bottom = facet_tags["Lx"]
    left = facet_tags["Ly"]
    bottom_dofs_y = locate_dofs_topological(V.sub(1), mesh.tdim - 1, bottom)
    left_dofs_x = locate_dofs_topological(V.sub(0), mesh.tdim - 1, left)
    bcs = [DirichletBC(bottom_dofs_y, 0.0), DirichletBC(left_dofs_x, 0.0)]

    k_stress = 2 * (k_u - 1)
    ds = Measure("ds", domain=mesh, subdomain_data=facet_tags,
                 metadata={"quadrature_degree": k_stress, "quadrature_scheme": "default"})
    dx = Measure("dx", domain=mesh,
                 metadata={"quadrature_degree": k_stress, "quadrature_scheme": "default"})
    return mesh, facet_tags, V, bcs, ds, dx, k_stress


def solve_von_mises(lc=0.3, num_increments=20, verbose=False, snes_opts=None):
    """External-operator implementation (reference demo_plasticity_von_mises.py)."""
    mesh, facet_tags, V, bcs, ds, dx, k_stress = _setup_common(lc)

    Du = Function(V, name="displacement_increment")
    u = Function(V, name="displacement")

    S = functionspace(mesh, quadrature_element(mesh.cell_name(), degree=k_stress, value_shape=(4,)))
    P = functionspace(mesh, quadrature_element(mesh.cell_name(), degree=k_stress))
    p = Function(P, name="cumulative_plastic_strain")
    dp = Function(P, name="incremental_plastic_strain")
    sigma_n = Function(S, name="stress_n")

    material = VonMisesMaterial()
    sigma = FEMExternalOperator(epsilon(Du), function_space=S,
                                hidden_operands=[sigma_n, p], name="sigma")

    def sigma_external(derivatives):
        if derivatives == (1,):
            return material
        raise NotImplementedError(f"No external function for derivative {derivatives}")

    sigma.external_function = sigma_external

    n = FacetNormal(mesh)
    loading = Constant(0.0)
    v = TestFunction(V)
    u_hat = TrialFunction(V)

    F = inner(sigma, epsilon(v)) * dx - inner(-1.0 * loading * n, v) * ds("inner")
    J = derivative(F, Du, u_hat)

    F_replaced, F_ops = replace_external_operators(F)
    J_replaced, J_ops = replace_external_operators(J)

    def constitutive_update():
        evaluated = evaluate_operands(F_ops)
        ((_, sigma_new, dp_new),) = evaluate_external_operators(J_ops, evaluated)
        sigma.ref_coefficient.x.array[:] = sigma_new
        dp.x.array[:] = dp_new

    opts = {"snes_atol": 1e-8, "snes_rtol": 1e-8, "snes_max_it": 100}
    opts.update(snes_opts or {})
    problem = solvers.NonlinearProblem(F_replaced, Du, J_replaced, bcs=bcs,
                                       petsc_options=opts, external_callback=constitutive_update)

    x_point = np.array([[R_I, 0, 0]])
    cells, points = find_cell_by_point(mesh, x_point)

    load_steps = np.linspace(0, 1.1, num_increments, endpoint=True) ** 0.5
    loadings = Q_LIM * load_steps
    results = np.zeros((num_increments, 2))
    iterations = []

    eps_tiny = np.finfo(np.float64).eps
    for i, load in enumerate(loadings):
        if verbose:
            print(f"Load increment #{i}, load: {load:.3f}")
        loading.value = load
        Du.x.array[:] = np.full(V.num_dofs, eps_tiny)
        its, _ = problem.solve()
        iterations.append(its)
        if verbose:
            print(f"\tNewton iterations: {its}")
        u.x.axpy(1.0, Du.x)
        p.x.axpy(1.0, dp.x)
        sigma_n.x.array[:] = sigma.ref_coefficient.data
        if points:
            results[i, :] = (float(u.eval(points, cells)[0, 0]), load / Q_LIM)

    return {"results": results, "iterations": iterations, "u": u, "p": p,
            "sigma": sigma, "mesh": mesh, "q_lim": Q_LIM}


def solve_von_mises_pure_form(lc=0.3, num_increments=20, verbose=False):
    """Analytic pure-form twin (reference demo_plasticity_von_mises_pure_ufl.py:18-177)."""
    mesh, facet_tags, V, bcs, ds, dx, k_stress = _setup_common(lc)

    W = functionspace(mesh, quadrature_element(mesh.cell_name(), degree=k_stress, value_shape=(4,)))
    W0 = functionspace(mesh, quadrature_element(mesh.cell_name(), degree=k_stress))

    sig = Function(W, name="stress_vector")
    dp = Function(W0, name="dp")
    p = Function(W0, name="p")
    u = Function(V, name="displacement")
    Du = Function(V, name="increment")
    v = TestFunction(V)
    v_hat = TrialFunction(V)

    n = FacetNormal(mesh)
    loading = Constant(0.0)

    def eps3(w):
        e = symmetric(grad(w))
        return as_tensor([[e[0, 0], e[0, 1], 0.0], [e[0, 1], e[1, 1], 0.0], [0.0, 0.0, 0.0]])

    def sigma3(eps_el):
        return LAMBDA * tr(eps_el) * Identity(3) + 2.0 * MU * eps_el

    def as_3d(X):
        return as_tensor([[X[0], X[3], 0.0], [X[3], X[1], 0.0], [0.0, 0.0, X[2]]])

    def ppos(x):
        return (x + sqrt(x**2)) / 2.0

    sig_n3 = as_3d(sig)
    sig_elas = sig_n3 + sigma3(eps3(Du))
    s = dev(sig_elas)
    sig_eq = sqrt(3.0 / 2.0 * inner(s, s))
    f_elas = sig_eq - SIGMA_0 - H_MOD * p
    dp_expr = ppos(f_elas) / (3.0 * MU + H_MOD)
    beta = 3.0 * MU * dp_expr / sig_eq
    new_sig = sig_elas - beta * s
    deps_p = 3.0 / 2.0 * (dp_expr / sig_eq) * s
    sig_expr = as_vector([new_sig[0, 0], new_sig[1, 1], new_sig[2, 2], new_sig[0, 1]])

    residual = inner(as_3d(sig) + sigma3(eps3(Du) - deps_p), eps3(v)) * dx \
        - inner(-1.0 * loading * n, v) * ds("inner")
    J = derivative(inner(sigma3(eps3(Du) - deps_p), eps3(v)) * dx, Du, v_hat)

    problem = solvers.NonlinearProblem(residual, Du, J, bcs=bcs,
                                       petsc_options={"snes_atol": 1e-8, "snes_rtol": 1e-8, "snes_max_it": 100})

    x_point = np.array([[R_I, 0, 0]])
    cells, points = find_cell_by_point(mesh, x_point)

    tpv = np.finfo(np.float64).eps
    sig.x.array[:] = np.full(W.num_dofs, tpv)

    load_steps = np.linspace(0, 1.1, num_increments, endpoint=True) ** 0.5
    results = np.zeros((num_increments, 2))
    iterations = []
    for i, t in enumerate(load_steps):
        loading.value = t * Q_LIM
        if verbose:
            print(f"Load increment #{i}, load: {t * Q_LIM:.3f}")
        its, _ = problem.solve()
        iterations.append(its)
        # NOTE ordering: dp BEFORE sig.  The reference twin interpolates sig
        # first (demo_plasticity_von_mises_pure_ufl.py:168-169) although
        # dp_expr reads the sig coefficient — computing dp from the
        # already-updated stress.  We commit dp from the consistent old state
        # (matching the external-operator kernel's semantics exactly).
        interpolate_quadrature(dp_expr, dp)
        interpolate_quadrature(sig_expr, sig)
        u.x.axpy(1.0, Du.x)
        p.x.array[:] = np.asarray(p.x.array) + np.asarray(dp.x.array)
        if points:
            results[i, :] = (float(u.eval(points, cells)[0, 0]), t)

    return {"results": results, "iterations": iterations, "u": u, "mesh": mesh, "q_lim": Q_LIM}
