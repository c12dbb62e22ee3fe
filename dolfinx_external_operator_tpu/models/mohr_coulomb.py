"""Mohr-Coulomb plasticity with apex smoothing: slope stability.

TPU-native rebuild of the reference ``doc/demo/demo_plasticity_mohr_coulomb.py``:
a non-associative (here phi == psi, associative) perfectly-plastic soil model
with the Abbo-Sloan hyperbolic apex smoothing, solved by a per-Gauss-point
Newton return-mapping (``jax.lax.while_loop``) whose consistent tangent is
obtained by forward-mode AD through the whole algorithm
(``jax.jacfwd(return_mapping, has_aux=True)``), vmapped over all Gauss
points and jitted (reference ``:282-593``).

TPU-specific deviations from the reference kernel:
- the 5x5 inner-Newton solve uses an unrolled partially-pivoted Gaussian
  elimination (``solve_small``) because XLA:TPU implements LuDecomposition
  only in f32 while the parity target needs f64;
- telemetry (iteration counts, max yield, max residual) is returned as a
  device array instead of being printed inside the kernel.

Headline benchmark (BASELINE.json): return-map Gauss-points/sec and
per-load-step wall time on the 52-step slope-stability schedule; slope
stability factor ~= 6.69 (Chen 1990; reference ``:751,764``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import (
    Constant,
    DirichletBC,
    FEMExternalOperator,
    Function,
    Measure,
    TestFunction,
    TrialFunction,
    as_vector,
    derivative,
    dot,
    evaluate_external_operators,
    evaluate_operands,
    functionspace,
    grad,
    inner,
    locate_dofs_geometrical,
    quadrature_element,
    replace_external_operators,
    solvers,
    create_rectangle,
)
from ..utils.probes import find_cell_by_point

__all__ = ["MohrCoulombMaterial", "solve_slope_stability", "solve_small"]

STRESS_DIM = 4


def solve_small(A, b):
    """Unrolled partially-pivoted Gaussian elimination for small static n.

    f64-safe on TPU (no LuDecomposition); differentiable (forward-mode flows
    through the arithmetic; pivot choice is treated as locally constant).
    ``b`` may be a vector (n,) or a block of right-hand sides (n, m)."""
    n = A.shape[0]
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    m = B.shape[1]
    aug = jnp.concatenate([A, B], axis=1)
    idx = jnp.arange(n)
    for k in range(n):
        col = jnp.abs(aug[:, k])
        col = jnp.where(idx < k, -jnp.inf, col)
        piv = jnp.argmax(col)
        # one-hot row swap: no dynamic gather/scatter (those vectorize
        # terribly under wide vmap on TPU and blow up compile time)
        onehot_p = (idx == piv).astype(aug.dtype)
        rowp = onehot_p @ aug  # == aug[piv]
        rowk = aug[k]
        is_k = (idx == k)[:, None]
        is_p = (idx == piv)[:, None]
        aug = jnp.where(is_k, rowp[None, :], jnp.where(is_p, rowk[None, :], aug))
        factor = aug[:, k] / aug[k, k]
        factor = jnp.where(idx <= k, 0.0, factor)
        aug = aug - factor[:, None] * aug[k][None, :]
    x = jnp.zeros((n, m), dtype=aug.dtype)
    for i in range(n - 1, -1, -1):
        x = x.at[i].set((aug[i, n:] - aug[i, i + 1 : n] @ x[i + 1 : n]) / aug[i, i])
    return x[:, 0] if vec else x


class MohrCoulombMaterial:
    """Mohr-Coulomb return mapping with AD consistent tangent.

    Parameters follow the reference demo (``:110-116``):
    E [MPa], nu, cohesion c [MPa], friction angle phi [rad], dilatancy angle
    psi [rad], transition angle theta_T [rad], apex parameter a [MPa]."""

    def __init__(self, E=6778.0, nu=0.25, c=3.45, phi=30 * np.pi / 180,
                 psi=30 * np.pi / 180, theta_T=26 * np.pi / 180, a=None,
                 tol=1e-8, max_iter=200):
        self.E, self.nu, self.c = E, nu, c
        self.phi, self.psi, self.theta_T = phi, psi, theta_T
        self.a = 0.26 * c / np.tan(phi) if a is None else a
        self.tol, self.max_iter = tol, max_iter

        lmbda = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
        mu = E / (2.0 * (1.0 + nu))
        self.C_elas = np.array(
            [
                [lmbda + 2 * mu, lmbda, lmbda, 0.0],
                [lmbda, lmbda + 2 * mu, lmbda, 0.0],
                [lmbda, lmbda, lmbda + 2 * mu, 0.0],
                [0.0, 0.0, 0.0, 2 * mu],
            ]
        )
        self._build()

    # -- yield surface with Abbo-Sloan smoothing (reference :282-374) ----
    def _build(self):
        c, phi, psi, theta_T, a = self.c, self.phi, self.psi, self.theta_T, self.a
        C_elas = jnp.asarray(self.C_elas)
        DEV = jnp.asarray(
            [
                [2 / 3, -1 / 3, -1 / 3, 0.0],
                [-1 / 3, 2 / 3, -1 / 3, 0.0],
                [-1 / 3, -1 / 3, 2 / 3, 0.0],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
        TR = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        tol, max_iter = self.tol, self.max_iter

        def J2(s):
            return 0.5 * jnp.vdot(s, s)

        def J3(s):
            # det of the deviatoric stress in Mandel notation
            return s[2] * (s[0] * s[1] - s[3] * s[3] / 2.0)

        def lode_theta(s):
            # guarded at s == 0 (J2 = 0): the reference divides unguarded
            # (:292) and relies on float noise; exact zero would NaN through
            # jnp.where-evaluated branches under vmap.
            J2_ = J2(s)
            safe = J2_ > 0.0
            J2s = jnp.where(safe, J2_, 1.0)
            arg = -(3.0 * np.sqrt(3.0) * J3(s)) / (2.0 * jnp.sqrt(J2s**3))
            arg = jnp.where(safe, arg, 0.0)
            return jnp.arcsin(jnp.clip(arg, -1.0, 1.0)) / 3.0

        cos3T, sin3T = np.cos(3 * theta_T), np.sin(3 * theta_T)
        cos6T, sin6T = np.cos(6 * theta_T), np.sin(6 * theta_T)
        denom = 18.0 * cos3T**3

        def K_smooth(theta, angle):
            sgn = jnp.where(theta < 0.0, -1.0, 1.0)
            sin_a = np.sin(angle)
            c1 = np.cos(theta_T) - sin_a * np.sin(theta_T) / np.sqrt(3.0)
            c2 = sgn * np.sin(theta_T) + sin_a * np.cos(theta_T) / np.sqrt(3.0)
            Cc = (-cos3T * c1 - 3.0 * sgn * sin3T * c2) / denom
            Bc = (sgn * sin6T * c1 - 6.0 * cos6T * c2) / denom
            Ac = (
                -(sin_a / np.sqrt(3.0)) * sgn * np.sin(theta_T)
                - Bc * sgn * sin3T
                - Cc * sin3T**2
                + np.cos(theta_T)
            )
            K_in = jnp.cos(theta) - sin_a * jnp.sin(theta) / np.sqrt(3.0)
            K_out = Ac + Bc * jnp.sin(3.0 * theta) + Cc * jnp.sin(3.0 * theta) ** 2
            return jnp.where(jnp.abs(theta) > theta_T, K_out, K_in)

        def surface(sigma_local, angle, a_coef):
            s = DEV @ sigma_local
            I1 = TR @ sigma_local
            th = lode_theta(s)
            K = K_smooth(th, angle)
            sin_a = np.sin(angle)
            return (
                I1 / 3.0 * sin_a
                + jnp.sqrt(J2(s) * K * K + (a_coef * sin_a) ** 2)
                - c * np.cos(angle)
            )

        a_f = a
        a_g = a * np.tan(phi) / np.tan(psi)

        def f_yield(sig):
            return surface(sig, phi, a_f)

        def g_pot(sig):
            return surface(sig, psi, a_g)

        dgdsigma = jax.jacfwd(g_pot)
        ZEROV = jnp.zeros(STRESS_DIM)

        def deps_p(sigma_local, dlambda, deps_local, sigma_n_local):
            yielding = f_yield(sigma_n_local + C_elas @ deps_local)
            return jnp.where(yielding <= 0.0, ZEROV, dlambda * dgdsigma(sigma_local))

        def r_g(sigma_local, dlambda, deps_local, sigma_n_local):
            return sigma_local - sigma_n_local - C_elas @ (
                deps_local - deps_p(sigma_local, dlambda, deps_local, sigma_n_local)
            )

        def r_f(sigma_local, dlambda, deps_local, sigma_n_local):
            yielding = f_yield(sigma_n_local + C_elas @ deps_local)
            return jnp.where(yielding <= 0.0, dlambda, f_yield(sigma_local))

        def r(y, deps_local, sigma_n_local):
            sig, dl = y[:STRESS_DIM], y[-1]
            return jnp.concatenate(
                [r_g(sig, dl, deps_local, sigma_n_local), jnp.array([r_f(sig, dl, deps_local, sigma_n_local)])]
            )

        drdy = jax.jacfwd(r)

        def return_mapping(deps_local, sigma_n_local):
            """Newton solve of r(y)=0 at one Gauss point (reference :474-533).

            Returns sigma twice so jacfwd(has_aux=True) yields both the
            consistent tangent and the stress in one sweep."""
            y0 = jnp.concatenate([sigma_n_local, jnp.zeros(1)])
            res0 = r(y0, deps_local, sigma_n_local)
            norm0 = jnp.linalg.norm(res0)
            # always run >= 1 iteration: jacfwd through a 0-iteration loop
            # would return a ZERO tangent (y never touches deps).  The
            # reference avoids this only by float noise keeping res0 != 0;
            # one guaranteed iteration yields the correct implicit tangent
            # even at exactly-converged states.
            norm0_safe = jnp.maximum(norm0, 1e-300)

            def cond_fun(state):
                norm_res, niter, _ = state
                return jnp.logical_or(
                    niter == 0,
                    jnp.logical_and(norm_res / norm0_safe > tol, niter < max_iter),
                )

            def body_fun(state):
                norm_res, niter, carry = state
                y, res = carry
                j = drdy(y, deps_local, sigma_n_local)
                dy = solve_small(j, -res)
                # Backtracking damping (improvement over the reference's
                # undamped Newton, :507-522): the full step is accepted
                # whenever it reduces ||r|| — identical iterates on nominal
                # paths — while oscillating apex-region states get halved
                # steps instead of diverging.
                res_full = r(y + dy, deps_local, sigma_n_local)

                def bt_cond(s):
                    alpha, rn, _ = s
                    return jnp.logical_and(rn >= norm_res, alpha > 2**-10)

                def bt_body(s):
                    alpha, _, _ = s
                    alpha = alpha * 0.5
                    rt = r(y + alpha * dy, deps_local, sigma_n_local)
                    return (alpha, jnp.linalg.norm(rt), rt)

                alpha, rn, res_new = jax.lax.while_loop(
                    bt_cond, bt_body, (1.0, jnp.linalg.norm(res_full), res_full)
                )
                y = y + alpha * dy
                return (rn, niter + 1, (y, res_new))

            norm_res, niter, (y, _) = jax.lax.while_loop(cond_fun, body_fun, (norm0, 0, (y0, res0)))
            sig = y[:STRESS_DIM]
            dlambda = y[-1]
            yielding = f_yield(sigma_n_local + C_elas @ deps_local)
            return sig, (sig, niter, yielding, norm_res, dlambda)

        def tangent_stress_point(deps_local, sigma_n_local):
            """Consistent tangent via the implicit function theorem.

            TPU-first replacement for the reference's
            ``jacfwd(return_mapping, has_aux=True)`` (``:555``): the primal
            while_loop converges y* with r(y*) = 0, then
            dy*/deps = -j^{-1} dr/deps gives the EXACT consistent tangent at
            the converged point with one extra 5x(4) solve — no AD through
            the iteration (which on TPU compiles a far larger program and
            carries O(iters) tangent temporaries)."""
            sig, aux = return_mapping(deps_local, sigma_n_local)
            (_, niter, yielding, norm_res, dlambda) = aux
            y = jnp.concatenate([sig, jnp.array([dlambda])])
            j = drdy(y, deps_local, sigma_n_local)
            drde = jax.jacfwd(r, argnums=1)(y, deps_local, sigma_n_local)  # (5, 4)
            dy_ddeps = solve_small(j, -drde)
            C_tang = dy_ddeps[:STRESS_DIM, :]
            return C_tang, aux

        self.f_yield = f_yield
        self.g_pot = g_pot
        self.return_mapping = return_mapping
        self.dsigma_ddeps = jax.jacfwd(return_mapping, has_aux=True)  # reference-style path
        self.tangent_stress_point = tangent_stress_point  # implicit path (default)
        self._vmapped = jax.jit(jax.vmap(tangent_stress_point, in_axes=(0, 0)))
        self._vmapped_adloop = jax.jit(jax.vmap(self.dsigma_ddeps, in_axes=(0, 0)))
        self._vmapped_rm = jax.jit(jax.vmap(self.return_mapping, in_axes=(0, 0)))

    def tangent_and_stress(self, deps_flat, sigma_n_flat):
        """Batched consistent tangent + stress (the external-function body)."""
        deps = deps_flat.reshape(-1, STRESS_DIM)
        sn = sigma_n_flat.reshape(-1, STRESS_DIM)
        C_tang, state = self._vmapped(deps, sn)
        sig, niter, yielding, norm_res, dlambda = state
        stats = {
            "niter": niter,
            "max_f": jnp.max(yielding),
            "max_res": jnp.max(norm_res),
        }
        return C_tang.reshape(-1), sig.reshape(-1), stats

    def stress_only(self, deps_flat, sigma_n_flat):
        deps = deps_flat.reshape(-1, STRESS_DIM)
        sn = sigma_n_flat.reshape(-1, STRESS_DIM)
        sig, state = self._vmapped_rm(deps, sn)
        return sig.reshape(-1)


def epsilon(v):
    g = grad(v)
    return as_vector([g[0, 0], g[1, 1], 0.0, np.sqrt(2.0) * 0.5 * (g[0, 1] + g[1, 0])])


def build_slope_problem(Nx=25, Ny=25, L=1.2, H=1.0, gamma=1.0, material=None,
                        snes_opts=None, verbose_inner=False):
    """Assemble the slope-stability problem (reference :119-700).

    Returns a dict of handles; ``problem.solve()`` runs one load step after
    setting ``q.value``."""
    material = material or MohrCoulombMaterial()
    mesh = create_rectangle((0.0, 0.0), (L, H), (Nx, Ny), "triangle")
    k_u = 2
    V = functionspace(mesh, ("Lagrange", k_u, (2,)))

    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], L))
    bcs = []
    for sdofs in (bottom, right):
        unrolled = np.concatenate([sdofs * 2, sdofs * 2 + 1])
        bcs.append(DirichletBC(unrolled, np.zeros(unrolled.size)))

    k_stress = 2 * (k_u - 1)
    dx = Measure("dx", domain=mesh, metadata={"quadrature_degree": k_stress, "quadrature_scheme": "default"})
    S = functionspace(mesh, quadrature_element(mesh.cell_name(), degree=k_stress, value_shape=(STRESS_DIM,)))

    Du = Function(V, name="Du")
    u = Function(V, name="total_displacement")
    v = TestFunction(V)
    u_hat = TrialFunction(V)

    sigma_n = Function(S, name="sigma_n")
    sigma = FEMExternalOperator(epsilon(Du), function_space=S,
                                hidden_operands=[sigma_n], name="sigma")
    stats_box = {}

    def C_tang_impl(deps, sigma_n_arr):
        C_tang, sig, stats = material.tangent_and_stress(deps, sigma_n_arr)
        stats_box.update(stats)
        if verbose_inner:
            uniq, counts = np.unique(np.asarray(stats["niter"]), return_counts=True)
            print(f"\tInner Newton: iters {uniq.tolist()} counts {counts.tolist()} "
                  f"max_f {float(stats['max_f']):.3e} max_res {float(stats['max_res']):.3e}")
        return C_tang, sig

    def sigma_external(derivatives):
        if derivatives == (1,):
            return C_tang_impl
        raise NotImplementedError(derivatives)

    sigma.external_function = sigma_external

    q = Constant(np.array([0.0, -gamma]))
    F = inner(epsilon(v), sigma) * dx - dot(q, v) * dx
    J = derivative(F, Du, u_hat)
    F_replaced, F_ops = replace_external_operators(F)
    J_replaced, J_ops = replace_external_operators(J)

    def constitutive_update():
        evaluated = evaluate_operands(F_ops)
        ((_, sigma_new),) = evaluate_external_operators(J_ops, evaluated)
        sigma.ref_coefficient.x.array[:] = sigma_new

    opts = {"snes_atol": 1e-8, "snes_rtol": 1e-8, "snes_max_it": 100}
    opts.update(snes_opts or {})
    problem = solvers.NonlinearProblem(F_replaced, Du, J_replaced, bcs=bcs,
                                       petsc_options=opts, external_callback=constitutive_update)
    return {
        "mesh": mesh, "V": V, "S": S, "Du": Du, "u": u, "sigma": sigma,
        "sigma_n": sigma_n, "q": q, "problem": problem, "material": material,
        "bcs": bcs, "F_replaced": F_replaced, "J_replaced": J_replaced,
        "F_ops": F_ops, "J_ops": J_ops, "stats": stats_box, "gamma": gamma,
        "H": H, "constitutive_update": constitutive_update,
    }


def solve_slope_stability(Nx=25, Ny=25, load_steps=None, verbose=False, **kw):
    """Run the slope-stability load schedule (reference :708-733).

    Default schedule: 50 steps gamma in [2, 22.9] plus [22.96, 22.99]."""
    P = build_slope_problem(Nx=Nx, Ny=Ny, **kw)
    mesh, u, Du, sigma, sigma_n, q = P["mesh"], P["u"], P["Du"], P["sigma"], P["sigma_n"], P["q"]
    gamma, H = P["gamma"], P["H"]
    if load_steps is None:
        load_steps = np.concatenate([np.linspace(2, 22.9, 50), np.array([22.96, 22.99])])

    x_point = np.array([[0, H, 0]])
    cells, points = find_cell_by_point(mesh, x_point)
    num = len(load_steps)
    results = np.zeros((num + 1, 2))
    iterations = []

    # initialize the tangent with elastic moduli (reference :645-649)
    Du.x.array[:] = np.ones(P["V"].num_dofs)
    sigma_n.x.array[:] = np.zeros(P["S"].num_dofs)
    P["constitutive_update"]()

    for i, load in enumerate(load_steps):
        q.value = load * np.array([0.0, -gamma])
        if verbose:
            print(f"Load increment #{i}, load: {load}")
        its, _ = P["problem"].solve()
        iterations.append(its)
        u.x.axpy(1.0, Du.x)
        sigma_n.x.array[:] = sigma.ref_coefficient.data
        if points:
            results[i + 1, :] = (-float(u.eval(points, cells)[0, 0]), load)

    slope_factor = float(load_steps[-1]) * H / P["material"].c
    return {"results": results, "iterations": iterations, "slope_factor": slope_factor, **P}
