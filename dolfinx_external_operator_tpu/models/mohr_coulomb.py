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
                 tol=1e-8, max_iter=200, n_polish=2):
        self.E, self.nu, self.c = E, nu, c
        self.phi, self.psi, self.theta_T = phi, psi, theta_T
        self.a = 0.26 * c / np.tan(phi) if a is None else a
        self.tol, self.max_iter = tol, max_iter
        self.n_polish = n_polish

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

        def _trig_fns(dtype):
            """Native trig for both dtypes.  (A polynomial-trig f64 variant
            was tried — ops/poly_trig.py — but its Taylor chains blow up
            under the double jacfwd of the return-map Jacobian: measured 3x
            SLOWER than XLA's emulated f64 trig.  Kept for reference.)

            The arcsin argument is clipped to the strict interior: at the
            triaxial corners (Lode angle +-pi/6, arg -> +-1) arcsin' is
            infinite and the surface Jacobian NaNs — the reference's own
            formulation (jnp.clip to [-1, 1], :293) NaNs there when rounding
            lands exactly on the corner.  The 1e-12 margin perturbs theta by
            ~1.4e-6 but enters f only through sin(3 theta) (error ~1e-12)."""
            eps = 1e-12 if dtype == jnp.float64 else 1e-6
            return (lambda x: jnp.arcsin(jnp.clip(x, -1.0 + eps, 1.0 - eps)) / 3.0,
                    jnp.sin, jnp.cos)

        def make_lode_theta(arcsin3_fn):
            def lode_theta(s):
                # guarded at s == 0 (J2 = 0): the reference divides unguarded
                # (:292) and relies on float noise; exact zero would NaN
                # through jnp.where-evaluated branches under vmap.
                J2_ = J2(s)
                safe = J2_ > 0.0
                J2s = jnp.where(safe, J2_, 1.0)
                arg = -(float(3.0 * np.sqrt(3.0)) * J3(s)) / (2.0 * jnp.sqrt(J2s**3))
                arg = jnp.where(safe, arg, 0.0)
                return arcsin3_fn(jnp.clip(arg, -1.0, 1.0))

            return lode_theta

        # NOTE: all precomputed scalars as PYTHON floats (weak-typed) — numpy
        # float64 scalars are strong-typed in JAX and would silently upcast
        # the f32 inner-Newton path back to emulated f64.
        cos3T, sin3T = float(np.cos(3 * theta_T)), float(np.sin(3 * theta_T))
        cos6T, sin6T = float(np.cos(6 * theta_T)), float(np.sin(6 * theta_T))
        denom = float(18.0 * cos3T**3)
        cosT, sinT = float(np.cos(theta_T)), float(np.sin(theta_T))
        inv_sqrt3 = float(1.0 / np.sqrt(3.0))

        def make_K_smooth(sin_fn, cos_fn):
            def K_smooth(theta, angle):
                sgn = jnp.where(theta < 0.0, -1.0, 1.0)
                sin_a = float(np.sin(angle))
                c1 = cosT - sin_a * sinT * inv_sqrt3
                c2 = sgn * sinT + sin_a * cosT * inv_sqrt3
                Cc = (-cos3T * c1 - 3.0 * sgn * sin3T * c2) / denom
                Bc = (sgn * sin6T * c1 - 6.0 * cos6T * c2) / denom
                Ac = (
                    -(sin_a * inv_sqrt3) * sgn * sinT
                    - Bc * sgn * sin3T
                    - Cc * sin3T**2
                    + cosT
                )
                s3t = sin_fn(3.0 * theta)
                K_in = cos_fn(theta) - sin_a * sin_fn(theta) * inv_sqrt3
                K_out = Ac + Bc * s3t + Cc * s3t * s3t
                return jnp.where(jnp.abs(theta) > theta_T, K_out, K_in)

            return K_smooth

        def _make_surface(dtype):
            DEVd = DEV.astype(dtype)
            TRd = TR.astype(dtype)
            arcsin3_fn, sin_fn, cos_fn = _trig_fns(dtype)
            lode_theta = make_lode_theta(arcsin3_fn)
            K_smooth = make_K_smooth(sin_fn, cos_fn)

            def surface(sigma_local, angle, a_coef):
                s = DEVd @ sigma_local
                I1 = TRd @ sigma_local
                th = lode_theta(s)
                K = K_smooth(th, angle)
                sin_a = float(np.sin(angle))
                return (
                    I1 / 3.0 * sin_a
                    + jnp.sqrt(J2(s) * K * K + float((a_coef * sin_a) ** 2))
                    - float(c * np.cos(angle))
                )

            return surface

        surface = _make_surface(jnp.float64)

        a_f = float(a)
        a_g = float(a * np.tan(phi) / np.tan(psi))

        def f_yield(sig):
            return surface(sig, phi, a_f)

        def g_pot(sig):
            return surface(sig, psi, a_g)

        def _make_residual(dtype):
            """Dtype-specialized residual/Jacobian (f32 inner loop, f64 polish).

            The elastic/plastic branch flag is an ARGUMENT: the trial-state
            yield value is constant during the local Newton solve, and
            evaluating the (transcendental-heavy) surface at the predictor
            inside every residual/Jacobian evaluation roughly doubles the
            kernel's dominant cost (f64 transcendental emulation)."""
            C = C_elas.astype(dtype)
            zerov = jnp.zeros(STRESS_DIM, dtype)
            surf_d = _make_surface(dtype)

            def f_y(sig):
                return surf_d(sig, phi, a_f)

            def g_p(sig):
                return surf_d(sig, psi, a_g)

            dg = jax.jacfwd(g_p)

            def r(y, deps_local, sigma_n_local, plastic):
                sig, dl = y[:STRESS_DIM], y[-1]
                dep_p = jnp.where(plastic, dl * dg(sig), zerov)
                rg = sig - sigma_n_local - C @ (deps_local - dep_p)
                rf = jnp.where(plastic, f_y(sig), dl)
                return jnp.concatenate([rg, jnp.array([rf], dtype)])

            return r, jax.jacfwd(r), f_y

        r64_, drdy64_, fy64 = _make_residual(jnp.float64)
        r32_, drdy32_, _ = _make_residual(jnp.float32)
        f32, f64 = jnp.float32, jnp.float64
        n_polish_max = max(self.n_polish, 20)
        tol32 = max(tol, 1e-5)

        def return_mapping(deps_local, sigma_n_local):
            """Mixed-precision Newton return map (reference algorithm :474-533,
            TPU-first precision split).

            The iteration runs in f32 — native on the TPU VPU, an order of
            magnitude cheaper than software-emulated f64 trig — to a relative
            tolerance of ~1e-5, then a fixed number of straight-line f64
            Newton polish steps restores full double-precision accuracy
            (quadratic convergence: each polish step squares the error, so
            two steps from 1e-5 reach 1e-10..machine).  Backtracking damping
            in the f32 loop keeps apex-region states convergent where the
            reference's undamped Newton oscillates."""
            # the trial-state branch, decided ONCE in f64 and shared by both
            # precision phases (also removes f32/f64 branch-flip risk)
            yielding = fy64(sigma_n_local + C_elas @ deps_local)
            plastic = yielding > 0.0

            def r32(y, d, s):
                return r32_(y, d, s, plastic)

            def drdy32(y, d, s):
                return drdy32_(y, d, s, plastic)

            def r64(y, d, s):
                return r64_(y, d, s, plastic)

            def drdy64(y, d, s):
                return drdy64_(y, d, s, plastic)

            d32 = deps_local.astype(f32)
            s32 = sigma_n_local.astype(f32)
            y0 = jnp.concatenate([s32, jnp.zeros(1, f32)])
            res0 = r32(y0, d32, s32)
            norm0 = jnp.maximum(jnp.linalg.norm(res0), jnp.asarray(1e-30, f32))

            def cond_fun(state):
                norm_res, niter, stalled, _ = state
                return jnp.logical_and(
                    jnp.logical_not(stalled),
                    jnp.logical_and(norm_res / norm0 > tol32, niter < max_iter),
                )

            def body_fun(state):
                norm_res, niter, _, carry = state
                y, res = carry
                j = drdy32(y, d32, s32)
                dy = solve_small(j, -res)
                res_full = r32(y + dy, d32, s32)

                def bt_cond(s):
                    alpha, rn, _ = s
                    return jnp.logical_and(rn >= norm_res, alpha > 2**-10)

                def bt_body(s):
                    alpha, _, _ = s
                    alpha = alpha * 0.5
                    rt = r32(y + alpha * dy, d32, s32)
                    return (alpha, jnp.linalg.norm(rt), rt)

                alpha, rn, res_new = jax.lax.while_loop(
                    bt_cond, bt_body, (jnp.asarray(1.0, f32), jnp.linalg.norm(res_full), res_full)
                )
                # STAGNATION EXIT: require a relative decrease per
                # iteration.  At the f32 rounding floor Newton crawls by
                # O(eps) per step and would otherwise spin to the
                # 200-iteration cap (profiled: dominant kernel cost).
                stalled = rn >= norm_res * (1.0 - 1e-3)
                return (rn, niter + 1, stalled, (y + alpha * dy, res_new))

            # initial stalled flag derived from data so its sharding
            # "varying" type matches the body output under shard_map
            norm_res32, niter, _, (y32, _) = jax.lax.while_loop(
                cond_fun, body_fun, (norm0, 0, norm0 < -1.0, (y0, res0))
            )

            # f64 polish: damped Newton to the reference tolerance
            # ||r||/||r(y0)|| <= tol in FULL precision (:469).  Typically 1-2
            # iterations from the f32 iterate; also guarantees the implicit
            # tangent sees deps-dependence even where the f32 loop exits
            # immediately (at least one iteration is forced).
            y = y32.astype(f64)
            y0_64 = jnp.concatenate([sigma_n_local, jnp.zeros(1, f64)])
            norm0_64 = jnp.maximum(jnp.linalg.norm(r64(y0_64, deps_local, sigma_n_local)), 1e-300)
            res = r64(y, deps_local, sigma_n_local)

            def p_cond(state):
                norm_res, it, stalled, _ = state
                return jnp.logical_or(
                    it == 0,
                    jnp.logical_and(
                        jnp.logical_not(stalled),
                        jnp.logical_and(norm_res / norm0_64 > tol, it < n_polish_max),
                    ),
                )

            def p_body(state):
                norm_cur, it, _, carry = state
                y, res = carry
                dy = solve_small(drdy64(y, deps_local, sigma_n_local), -res)
                res_full = r64(y + dy, deps_local, sigma_n_local)

                def bt_cond(s):
                    alpha, rn, _ = s
                    return jnp.logical_and(rn >= norm_cur, alpha > 2**-10)

                def bt_body(s):
                    alpha, _, _ = s
                    alpha = alpha * 0.5
                    rt = r64(y + alpha * dy, deps_local, sigma_n_local)
                    return (alpha, jnp.linalg.norm(rt), rt)

                alpha, rn, res_new = jax.lax.while_loop(
                    bt_cond, bt_body, (jnp.asarray(1.0, f64), jnp.linalg.norm(res_full), res_full)
                )
                stalled = rn >= norm_cur * (1.0 - 1e-3)  # f64 floor crawl
                return (rn, it + 1, stalled, (y + alpha * dy, res_new))

            norm_start = jnp.linalg.norm(res)
            norm_res, niter64, _, (y, _) = jax.lax.while_loop(
                p_cond, p_body, (norm_start, 0, norm_start < -1.0, (y, res))
            )

            sig = y[:STRESS_DIM]
            dlambda = y[-1]
            return sig, (sig, niter + niter64, yielding, norm_res, dlambda)

        # combined Jacobian over (y, deps) in ONE forward sweep (9 tangents,
        # shared primal) for the implicit tangent
        drdy_and_deps = jax.jacfwd(r64_, argnums=(0, 1))

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
            plastic = yielding > 0.0
            y = jnp.concatenate([sig, jnp.array([dlambda])])
            j, drde = drdy_and_deps(y, deps_local, sigma_n_local, plastic)
            dy_ddeps = solve_small(j, -drde)
            C_tang = dy_ddeps[:STRESS_DIM, :]
            return C_tang, aux

        self.f_yield = f_yield
        self.g_pot = g_pot
        self.return_mapping = return_mapping
        self.dsigma_ddeps = jax.jacfwd(return_mapping, has_aux=True)  # reference-style path
        self.tangent_stress_point = tangent_stress_point  # implicit path (default)
        # Batch-last (SoA) variants keep the Gauss-point axis in the vector
        # lanes; measured perf-neutral vs batch-first on v5e (NOTES.md
        # "Failed experiments") — both layouts kept for callers that already
        # hold data one way or the other.
        self._vmapped_soa = jax.jit(
            jax.vmap(tangent_stress_point, in_axes=(-1, -1), out_axes=(-1, (-1, -1, -1, -1, -1)))
        )
        self._vmapped = jax.jit(jax.vmap(tangent_stress_point, in_axes=(0, 0)))
        self._vmapped_adloop = jax.jit(jax.vmap(self.dsigma_ddeps, in_axes=(0, 0)))
        self._vmapped_rm = jax.jit(jax.vmap(self.return_mapping, in_axes=(0, 0)))
        self._vmapped_rm_soa = jax.jit(
            jax.vmap(self.return_mapping, in_axes=(-1, -1), out_axes=(-1, (-1, -1, -1, -1, -1)))
        )

    def tangent_and_stress(self, deps_flat, sigma_n_flat):
        """Batched consistent tangent + stress (the external-function body).

        Transposes to batch-last (SoA) around the vmapped kernel — the
        boundary transposes are bandwidth-trivial next to the kernel."""
        deps = deps_flat.reshape(-1, STRESS_DIM).T
        sn = sigma_n_flat.reshape(-1, STRESS_DIM).T
        C_tang, state = self._vmapped_soa(deps, sn)  # (4,4,n), per-point aux (...,n)
        sig, niter, yielding, norm_res, dlambda = state
        stats = {
            "niter": niter,
            "max_f": jnp.max(yielding),
            "max_res": jnp.max(norm_res),
        }
        # back to AoS row-major (n, 4, 4) / (n, 4) flattened
        return (
            jnp.moveaxis(C_tang, -1, 0).reshape(-1),
            sig.T.reshape(-1),
            stats,
        )

    def stress_only(self, deps_flat, sigma_n_flat):
        deps = deps_flat.reshape(-1, STRESS_DIM).T
        sn = sigma_n_flat.reshape(-1, STRESS_DIM).T
        sig, state = self._vmapped_rm_soa(deps, sn)
        return sig.T.reshape(-1)


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
