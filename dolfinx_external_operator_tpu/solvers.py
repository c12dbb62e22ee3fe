"""Nonlinear and linear solvers: the PETSc SNES/KSP replacement.

The reference drives every demo with PETSc SNES (``vinewtonrsls`` with
"basic" line search — plain full-step Newton when no variational bounds are
active, which is the case in all demos) and a direct LU/MUMPS linear solve
(``demo_plasticity_von_mises.py:422-431``, ``demo_plasticity_mohr_coulomb.py:662-672``).

TPU-native equivalents here:

* ``NewtonSolver`` — full-step Newton with the
  constitutive-update-BEFORE-assembly callback ordering of the reference
  SNES residual shim (``petsc/petsc.py:55-68``) and SNES-style
  atol/rtol convergence on the BC-adjusted residual norm.
* ``solve_dense`` — direct solve. TPU XLA implements LU only in f32
  (f64 LuDecomposition is unavailable), so the f64 path runs a Jacobi-
  equilibrated f32 LU factorization + f64 iterative refinement, which
  recovers ~1e-14 relative accuracy for the well-conditioned equilibrated
  systems arising here while keeping the factorization on the MXU.
* ``cg`` — matrix-free Jacobi-preconditioned conjugate gradients in f64
  (allreduce appears only in its dot products, per the BASELINE north star).
"""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp

from .assembly import bc_arrays, create_form

__all__ = ["solve_dense", "cg", "NewtonSolver", "NonlinearProblem"]

_F64 = jnp.float64
_F32 = jnp.float32


# ----------------------------------------------------------------------
# Linear solvers
# ----------------------------------------------------------------------

@jax.jit
def _lu_ir(A, b, n_refine: int = 4):
    """f32 LU + f64 iterative refinement with Jacobi equilibration."""
    d = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(jnp.diagonal(A)), 1e-300, None))
    As = A * d[:, None] * d[None, :]
    bs = b * d
    lu, piv = jax.scipy.linalg.lu_factor(As.astype(_F32))

    def solve32(r):
        return jax.scipy.linalg.lu_solve((lu, piv), r.astype(_F32)).astype(_F64)

    y = solve32(bs)

    def body(_, y):
        r = bs - As @ y
        return y + solve32(r)

    y = jax.lax.fori_loop(0, n_refine, body, y)
    return y * d


def solve_dense(A, b):
    """Direct dense solve in f64 on TPU (see module docstring)."""
    return _lu_ir(A, b)


def cg(matvec, b, x0=None, M=None, tol=1e-12, atol=0.0, maxiter=None):
    """Preconditioned conjugate gradients (f64, matrix-free).

    ``matvec``: x -> A@x; ``M``: r -> approx A^{-1} r (default identity).
    Under shard_map, the only collectives live in the dot products here."""
    n = b.shape[0]
    if maxiter is None:
        maxiter = 10 * n
    if M is None:
        M = lambda r: r
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.linalg.norm(b)
    target = jnp.maximum(tol * bnorm, atol)

    # safeguarded: breakdown guard + best-iterate divergence exit (see
    # _ebe_pcg for rationale — CG past its floating-point floor diverges)
    n_best0 = jnp.linalg.norm(r)

    def cond(state):
        x, r, z, p, rz, k, ok, x_best, n_best, n_cur = state
        return ok & (n_cur > target) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k, ok, x_best, n_best, n_cur = state
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap)
        ok = jnp.isfinite(pAp) & (pAp > 0.0) & jnp.isfinite(rz) & (rz > 0.0)
        alpha = jnp.where(ok, rz / jnp.where(pAp > 0.0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz > 0.0, rz_new / jnp.where(rz > 0.0, rz, 1.0), 0.0)
        p = z + beta * p
        n_new = jnp.linalg.norm(r)
        better = n_new < n_best
        x_best = jnp.where(better, x, x_best)
        n_best = jnp.where(better, n_new, n_best)
        ok = ok & jnp.isfinite(n_new) & (n_new < 100.0 * n_best)
        return (x, r, z, p, rz_new, k + 1, ok, x_best, n_best, n_new)

    state = (x, r, z, p, rz, 0, jnp.asarray(True), x, n_best0, n_best0)
    out = jax.lax.while_loop(cond, body, state)
    return out[7], out[5]


# ----------------------------------------------------------------------
# Element-by-element (EBE) Krylov solve: the large-dof path.
#
# The reference's PETSc sparse LU has no f64 TPU analog; the scalable
# TPU-native equivalent keeps the element tensors blocked in HBM (the
# natural output of assembly) and runs Jacobi-preconditioned CG whose
# matvec is gather -> batched (nc, nt, nu) einsum (MXU) -> segment_sum.
# BC elimination is folded into the operator: rows/cols zeroed, identity
# on constrained dofs.
# ----------------------------------------------------------------------

@jax.jit
def _ebe_pcg(elems, tdofs_l, udofs_l, mask, diag, b, rtol, atol, maxiter):
    n = b.shape[0]
    free = ~mask

    def matvec(x):
        xz = jnp.where(free, x, 0.0)
        out = jnp.zeros((n,), _F64)
        for e, td, ud in zip(elems, tdofs_l, udofs_l):
            y = jnp.einsum("cij,cj->ci", e, xz[ud])
            out = out + jax.ops.segment_sum(y.ravel(), td.ravel(), num_segments=n)
        return jnp.where(free, out, 0.0) + jnp.where(mask, x, 0.0)

    dsafe = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
    M = lambda r: r / dsafe
    target = jnp.maximum(rtol * jnp.linalg.norm(b), atol)
    x = jnp.zeros_like(b)
    r = b - matvec(x)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)

    # Safeguarded CG: breakdown guard (`ok`, SPD invariants) + best-iterate
    # tracking with a divergence exit.  Under TPU f64 emulation the
    # attainable floor sits above the host's; CG iterated past its floor
    # does not stagnate, it DIVERGES (residual grows back by orders of
    # magnitude and eventually NaNs), so exit when the residual exceeds
    # 100x the best seen and return the best iterate.
    n_best0 = jnp.linalg.norm(r)

    def cond(state):
        x, r, z, p, rz, k, ok, x_best, n_best, n_cur = state
        return ok & (n_cur > target) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k, ok, x_best, n_best, n_cur = state
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap)
        ok = jnp.isfinite(pAp) & (pAp > 0.0) & jnp.isfinite(rz) & (rz > 0.0)
        alpha = jnp.where(ok, rz / jnp.where(pAp > 0.0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz > 0.0, rz_new / jnp.where(rz > 0.0, rz, 1.0), 0.0)
        n_new = jnp.linalg.norm(r)
        better = n_new < n_best
        x_best = jnp.where(better, x, x_best)
        n_best = jnp.where(better, n_new, n_best)
        ok = ok & jnp.isfinite(n_new) & (n_new < 100.0 * n_best)
        return (x, r, z, p * beta + z, rz_new, k + 1, ok, x_best, n_best, n_new)

    state = (x, r, z, p, rz, 0, jnp.asarray(True), x, n_best0, n_best0)
    out = jax.lax.while_loop(cond, body, state)
    return out[7], out[5]


# ----------------------------------------------------------------------
# Newton
# ----------------------------------------------------------------------

class NewtonSolver:
    """Full-step Newton with SNES-compatible semantics.

    Per iteration (matching the reference's SNES + residual-shim flow,
    stack 3.3 of the survey):
      1. call ``external_callback`` (constitutive update) at the current
         iterate — BEFORE any assembly (``petsc/petsc.py:58-61``);
      2. assemble residual; apply BC lifting and ``set_bc`` rows;
      3. check ||r|| against atol/rtol (SNES default norm);
      4. assemble Jacobian, eliminate BC rows/cols symmetrically;
      5. solve J delta = -r and take the full step
         (``snes_linesearch_type: basic``).  Linear solvers by
         ``ksp_type``: "preonly"/"lu" = dense direct (f32 LU + f64
         refinement); "cg"/"gmres"/"bicgstab" = matrix-free
         element-by-element Krylov with Jacobi preconditioning.
    """

    def __init__(self, atol=1e-8, rtol=1e-8, max_it=100, monitor=False,
                 ksp_type="preonly", ksp_rtol=1e-12, ksp_atol=0.0, ksp_max_it=None,
                 pc_type="jacobi", snes_type="newtonls"):
        self.atol = atol
        self.rtol = rtol
        self.max_it = max_it
        self.monitor = monitor
        self.ksp_type = ksp_type  # "preonly"/"lu" -> dense direct; "cg"/"gmres"/"bicgstab" -> EBE matrix-free
        self.ksp_rtol = ksp_rtol
        self.ksp_atol = ksp_atol
        self.ksp_max_it = ksp_max_it
        # "jacobi" (default) or "mg" (aggregation-AMG V-cycle, cg only —
        # the scalable option; the reference's {"pc_type": "lu"} maps to
        # ksp_type "preonly")
        self.pc_type = pc_type
        # "newtonls" (plain line-searched Newton) or "vinewtonrsls"
        # (reduced-space active-set Newton for bound constraints
        # lb <= x <= ub, PETSc's SNESVINEWTONRSLS — the snes_type every
        # reference plasticity demo requests,
        # ``demo_plasticity_von_mises.py:423``).  Without bounds installed
        # (``set_variable_bounds``) the two are identical, which is how the
        # reference demos actually run it.
        if snes_type not in ("newtonls", "vinewtonrsls"):
            raise ValueError(f"unknown snes_type {snes_type!r}")
        self.snes_type = snes_type
        self._bounds = None
        self.iterations = 0
        self.ksp_iterations = 0
        self.history = []        # residual norms of the last solve ([norm0, ...])
        self.backtrack_count = 0  # times divergence backtracking fired (0 = SNES-"basic" trajectory)
        self._mg = None  # lazily-built (statics, jitted solver) pair

    def set_variable_bounds(self, lb, ub):
        """``SNES.setVariableBounds`` equivalent: install per-dof bounds
        ``lb <= x <= ub`` (scalars broadcast) for ``snes_type=
        'vinewtonrsls'``.  At each iteration the active set
        ``{i : (x_i <= lb_i and F_i > 0) or (x_i >= ub_i and F_i < 0)}``
        is frozen (delta_i = 0, row/col eliminated like a Dirichlet row),
        the Newton system is solved on the inactive set, and the iterate is
        projected back into the box; convergence is tested on the reduced
        residual (F_i on the inactive set), matching PETSc's RSLS
        semantics."""
        self._bounds = (lb, ub)

    def _mg_solve(self, problem, elems, mask, b, maxiter):
        """AMG-preconditioned CG on the element-blocked Jacobian (general
        forms path; see ``parallel.mg`` for the fused-plasticity variant).

        The hierarchy STRUCTURE is built once per problem from the Jacobian
        at the first call (u = initial guess => the elastic operator for the
        usual zero start); per-Newton VALUES flow through the fixed maps.

        Multi-batch Jacobians (several cell integrals over the same space,
        e.g. split measures or mixed quadrature degrees) are supported: the
        hierarchy and the smoother values come from the DOMINANT batch (the
        full-domain integral whose dofmap is the space's own) — a
        preconditioner-quality choice only — while the exact f64 CG operator
        and the f32 iteration operator include EVERY batch, so iterates and
        Newton counts are those of the true Jacobian.  All batches need
        test dofs == trial dofs (the symmetric displacement-block case).

        ``mask`` is the per-call ELIMINATION mask — Dirichlet dofs plus,
        under ``vinewtonrsls``, the current active bound set.  It is a
        traced argument of the compiled solve: the hierarchy STRUCTURE
        (aggregation, transfers, bc-zeroed interpolation) is frozen on the
        Dirichlet-only mask, while the exact CG operator, the f32
        iteration operator and the smoother values honor the full
        elimination mask every call.  Active dofs therefore see an
        identity preconditioner row (the V-cycle output is overwritten on
        masked rows) — a preconditioner-quality approximation only; CG
        still converges to the exact reduced-system solution."""
        from .parallel import mg as mgmod

        if self._mg is None:
            V = problem.J.test_space
            dm_V = jnp.asarray(V.unrolled_dofmap)
            dom = None
            for i, (K_cell, tdofs, udofs) in enumerate(elems):
                if not bool(jnp.all(tdofs == udofs)):
                    raise NotImplementedError(
                        "pc_type='mg' needs test dofs == trial dofs (the "
                        "symmetric displacement-block case); this Jacobian's "
                        f"cell batch {i} maps different spaces — use "
                        "pc_type='jacobi'")
                if (dom is None and tdofs.shape == dm_V.shape
                        and bool(jnp.all(tdofs == dm_V))):
                    dom = i
            if dom is None:
                raise NotImplementedError(
                    "pc_type='mg' needs one full-domain cell-integral batch "
                    "over the whole space (the aggregation/smoothing proxy); "
                    f"none of the {len(elems)} batches covers it — use "
                    "pc_type='jacobi'")
            tdofs_all = tuple(td for _, td, _ in elems)
            # hierarchy structure frozen on the Dirichlet-only mask (the
            # per-call mask may carry a changing VI active set)
            bc_only, _ = bc_arrays(problem.bcs, V.num_dofs)
            # gmres targets nonsymmetric Jacobians: build the hierarchy
            # (aggregation, prolongator smoothing, Chebyshev bounds) and the
            # smoother VALUES on the SYMMETRIZED operator — a
            # preconditioner-quality choice only; the Krylov iteration runs
            # on the true operator, so iterates are exact.  For a symmetric
            # Jacobian the symmetrization is the identity.
            gmres = self.ksp_type == "gmres"
            K_dom0 = np.asarray(elems[dom][0])
            if gmres:
                K_dom0 = 0.5 * (K_dom0 + np.swapaxes(K_dom0, 1, 2))
            statics_np = mgmod.build_mg_statics(
                problem.J.mesh, V, np.asarray(bc_only), K_dom0,
                # same large-mesh default as FusedPlasticityStep._setup_mg:
                # freeze aggregation-level values to their elastic Galerkin
                # projection (the full per-Newton maps are ~GB-scale at
                # 200x200-class meshes)
                galerkin_levels=None if V.num_dofs <= 30_000 else 1)
            cheb_degree = statics_np.pop("cheb_degree")
            statics = jax.tree.map(jnp.asarray, statics_np)
            n = V.num_dofs

            @jax.jit
            def mg_pcg(K_cells, mask, b, rtol, atol, maxiter):
                Kbs = []
                for K_cell, tdofs in zip(K_cells, tdofs_all):
                    km = jnp.where(mask, 0.0, 1.0)[tdofs]
                    Kbs.append(K_cell * km[:, :, None] * km[:, None, :])
                K_dom = Kbs[dom]
                if gmres:  # smoother values track the symmetric part
                    K_dom = 0.5 * (K_dom + jnp.swapaxes(K_dom, 1, 2))
                rt = mgmod.mg_setup(statics, K_dom.astype(_F32),
                                    tdofs_all[dom], mask, n)

                # exact operators via the one shared element-blocked matvec
                # (identity-bc-row invariant lives in ebe_matvec); each call
                # contributes identity on bc rows, so summing k batches
                # subtracts the k-1 duplicated bc identities
                mvs64 = [mgmod.ebe_matvec(Kb, td, mask, n)
                         for Kb, td in zip(Kbs, tdofs_all)]
                sec32 = [mgmod.ebe_matvec(Kb.astype(_F32), td, mask, n)
                         for i, (Kb, td) in enumerate(zip(Kbs, tdofs_all))
                         if i != dom]

                def mv(x):
                    out = mvs64[0](x)
                    for m in mvs64[1:]:
                        out = out + m(x) - jnp.where(mask, x, 0.0)
                    return out

                def mv32(x):
                    out = rt["mv0"](x)
                    for m in sec32:
                        out = out + m(x) - jnp.where(mask, x, 0.0).astype(_F32)
                    return out

                def M32(r):
                    z = mgmod.vcycle(statics, rt,
                                     jnp.where(mask, 0.0, r.astype(_F32)),
                                     cheb_degree=cheb_degree)
                    return jnp.where(mask, r, z)

                if gmres:
                    # nonsymmetric path: f64 GMRES on the TRUE operator,
                    # V-cycle (symmetrized values) as the preconditioner.
                    # No iteration count from jax.scipy's gmres — report 0.
                    from jax.scipy.sparse import linalg as jsla

                    def M(r):
                        z = mgmod.vcycle(statics, rt,
                                         jnp.where(mask, 0.0, r.astype(_F32)),
                                         cheb_degree=cheb_degree)
                        return jnp.where(mask, r, z.astype(r.dtype))

                    delta, _ = jsla.gmres(mv, b, M=M, tol=rtol, atol=atol,
                                          maxiter=maxiter,
                                          restart=min(n, 50),
                                          solve_method="batched")
                    return delta, jnp.asarray(0)

                # mixed-precision IR-PCG (f32 iteration, f64 refinement;
                # see mg.ir_pcg) with the shared safeguard structure;
                # atol keeps KSP-convergence parity with the jacobi path
                return mgmod.ir_pcg(mv, mv32, M32, b, rtol, maxiter,
                                    atol=atol)

            self._mg = mg_pcg
        return self._mg(tuple(K for K, _, _ in elems), mask, b,
                        self.ksp_rtol, self.ksp_atol, maxiter)

    def solve(self, problem) -> tuple[int, bool]:
        u = problem.u
        n = u.function_space.num_dofs
        mask, g = bc_arrays(problem.bcs, n)
        matrix_free = self.ksp_type in ("cg", "gmres", "bicgstab")
        vi = self.snes_type == "vinewtonrsls" and self._bounds is not None
        if vi:
            dt = u.data.dtype
            lb = jnp.broadcast_to(jnp.asarray(self._bounds[0], dt), (n,))
            ub = jnp.broadcast_to(jnp.asarray(self._bounds[1], dt), (n,))
        if self.pc_type == "mg" and self.ksp_type not in ("cg", "gmres"):
            # must fire for preonly (the default) too — falling through to
            # the dense direct path would silently LU-factorize an (n, n)
            # matrix at exactly the mesh sizes mg exists for
            raise NotImplementedError(
                "pc_type='mg' is implemented for ksp_type='cg' (SPD "
                "Jacobians) and ksp_type='gmres' (nonsymmetric Jacobians, "
                "V-cycle built on the symmetrized operator); bicgstab uses "
                "pc_type='jacobi', and the default ksp_type='preonly' is "
                "the dense direct solver")

        def residual():
            """BC-adjusted residual WITHOUT assembling the Jacobian: the
            lifting term ``A @ (g - x)`` goes through the matrix-free
            ``CompiledForm.action`` and is skipped entirely once the BC dofs
            sit exactly on their values (every iterate after the first)."""
            if problem.external_callback is not None:
                problem.external_callback(*problem.callback_args)
            r = problem.F.vector()
            x = u.data
            dx_bc = jnp.where(mask, g - x, 0.0)
            if bool(jnp.any(dx_bc != 0.0)):
                r = r + problem.J.action(dx_bc)
            return jnp.where(mask, x - g, r)

        def newton_step(r, emask):
            """delta solving  J_elim @ delta = -r  (rows/cols of ``emask``
            — BC dofs plus, under vinewtonrsls, the active bound set —
            eliminated)."""
            if matrix_free:
                elems = problem.J.element_tensors()
                diag = jnp.where(emask, 1.0, problem.J.diagonal())
                # PETSc KSP default maxits parity (10000); the breakdown
                # guard in _ebe_pcg exits earlier at the rounding floor
                maxiter = self.ksp_max_it if self.ksp_max_it is not None else min(10 * n, 10000)
                if self.ksp_type in ("cg", "gmres") and self.pc_type == "mg":
                    delta, k = self._mg_solve(problem, elems, emask, -r, maxiter)
                    self.ksp_iterations += int(k)
                    return delta
                if self.ksp_type == "cg":
                    delta, k = _ebe_pcg(
                        tuple(e for e, _, _ in elems),
                        tuple(td for _, td, _ in elems),
                        tuple(ud for _, _, ud in elems),
                        emask, diag, -r, self.ksp_rtol, self.ksp_atol, maxiter)
                    self.ksp_iterations += int(k)
                    return delta
                # gmres / bicgstab for non-symmetric Jacobians, over the
                # same EBE matvec with Jacobi preconditioning
                from jax.scipy.sparse import linalg as jsla

                free = ~emask

                def matvec(x):
                    xz = jnp.where(free, x, 0.0)
                    out = jnp.zeros((n,), _F64)
                    for e, td, ud in elems:
                        y = jnp.einsum("cij,cj->ci", e, xz[ud])
                        out = out + jax.ops.segment_sum(y.ravel(), td.ravel(), num_segments=n)
                    return jnp.where(free, out, 0.0) + jnp.where(emask, x, 0.0)

                # same zero-diagonal guard as _ebe_pcg: gmres/bicgstab target
                # non-symmetric/indefinite systems where a zero diagonal entry
                # is plausible
                dsafe = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
                M = lambda x: x / dsafe
                if self.ksp_type == "gmres":
                    delta, _ = jsla.gmres(matvec, -r, M=M, tol=self.ksp_rtol,
                                          atol=self.ksp_atol, maxiter=maxiter,
                                          restart=min(n, 50), solve_method="batched")
                elif self.ksp_type == "bicgstab":
                    delta, _ = jsla.bicgstab(matvec, -r, M=M, tol=self.ksp_rtol,
                                             atol=self.ksp_atol, maxiter=maxiter)
                else:
                    raise ValueError(f"unknown ksp_type {self.ksp_type!r}")
                return delta
            A = problem.J.matrix()
            keep = (~emask).astype(A.dtype)
            A_t = A * keep[:, None] * keep[None, :] + jnp.diag(emask.astype(A.dtype))
            return solve_dense(A_t, -r)

        def vi_active(r):
            """RSLS active set: dofs pinned on a bound whose residual pushes
            them FURTHER out of the box (complementarity sign convention:
            at x = lb feasibility requires F >= 0, at x = ub it requires
            F <= 0).  The iterate is kept inside the box by projection, so
            the bound comparisons are exact."""
            x = u.data
            return (~mask) & (((x <= lb) & (r > 0.0)) | ((x >= ub) & (r < 0.0)))

        def rnorm(r):
            """Convergence norm: PETSc RSLS tests the REDUCED residual —
            active-set components are feasible by complementarity, not
            zero."""
            if not vi:
                return float(jnp.linalg.norm(r))
            return float(jnp.linalg.norm(jnp.where(vi_active(r), 0.0, r)))

        if vi:
            u._data = jnp.clip(u.data, lb, ub)
        r = residual()
        norm0 = rnorm(r)
        norm = norm0
        it = 0
        # per-solve stats: residual-norm history + backtracking counter.
        # backtrack_count makes the Newton-parity claims self-auditing: the
        # divergence-only backtracking below deviates from SNES "basic"
        # (which takes full steps unconditionally), so any solve where it
        # FIRED is not trajectory-comparable to the reference.
        self.history = [norm0]
        self.backtrack_count = 0
        if self.monitor:
            print(f"  0 SNES Function norm {norm0:.12e}")
        converged = norm0 < self.atol
        while not converged and it < self.max_it:
            if vi:
                active = vi_active(r)
                delta = newton_step(jnp.where(active, 0.0, r), mask | active)
                delta = jnp.where(active, 0.0, delta)
                u._data = jnp.clip(u._data + delta, lb, ub)
            else:
                delta = newton_step(r, mask)
                u._data = u._data + delta
            it += 1
            r = residual()
            new_norm = rnorm(r)
            # divergence-only backtracking: full steps on nominal paths (the
            # reference's "basic" line search), halved steps only when the
            # residual grows strongly (robustness; the reference would fail)
            alpha = 1.0
            while new_norm > 2.0 * norm and alpha > 2**-8:
                self.backtrack_count += 1
                u._data = u._data - alpha * 0.5 * delta  # retract to alpha/2
                if vi:
                    u._data = jnp.clip(u._data, lb, ub)
                alpha *= 0.5
                r = residual()
                new_norm = rnorm(r)
            norm = new_norm
            self.history.append(norm)
            if self.monitor:
                print(f"  {it} SNES Function norm {norm:.12e}")
            converged = norm < self.atol or norm < self.rtol * max(norm0, 1e-300)
        self.iterations = it
        return it, converged


class NonlinearProblem:
    """High-level nonlinear problem mirroring
    ``dolfinx.fem.petsc.NonlinearProblem`` usage in the demos
    (``demo_plasticity_von_mises.py:433-435``).

    ``external_callback(*callback_args)`` is invoked before each residual/
    Jacobian assembly (the constitutive update hook)."""

    def __init__(self, F, u, J, bcs=(), petsc_options=None, petsc_options_prefix="",
                 external_callback=None, callback_args=()):
        self.F = create_form(F)
        self.J = create_form(J)
        self.u = u
        self.bcs = list(bcs)
        opts = dict(petsc_options or {})
        self.solver = NewtonSolver(
            atol=float(opts.get("snes_atol", 1e-8)),
            rtol=float(opts.get("snes_rtol", 1e-8)),
            max_it=int(opts.get("snes_max_it", 100)),
            monitor="snes_monitor" in opts,
            ksp_type=str(opts.get("ksp_type", "preonly")),
            ksp_rtol=float(opts.get("ksp_rtol", 1e-12)),
            ksp_atol=float(opts.get("ksp_atol", 0.0)),
            ksp_max_it=(int(opts["ksp_max_it"]) if "ksp_max_it" in opts else None),
            pc_type=str(opts.get("pc_type", "jacobi")),
            # the reference demos all pass {"snes_type": "vinewtonrsls"}
            # (with no bounds installed — identical to plain Newton there);
            # bounds go in via solver.set_variable_bounds
            snes_type=str(opts.get("snes_type", "newtonls")),
        )
        self.external_callback = external_callback
        self.callback_args = tuple(callback_args)

    def set_external_callback(self, fn, args=()):
        """Install the constitutive-update hook (plays the role of
        ``problem.solver.setFunction(assemble_residual_with_callback_, b)``
        in the reference demos, ``demo_plasticity_von_mises.py:531``)."""
        self.external_callback = fn
        self.callback_args = tuple(args)

    def solve(self):
        its, converged = self.solver.solve(self)
        if not converged:
            raise RuntimeError(f"Newton failed to converge in {its} iterations")
        return its, converged
