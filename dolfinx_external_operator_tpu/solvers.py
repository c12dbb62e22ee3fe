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

    def cond(state):
        x, r, z, p, rz, k = state
        return jnp.logical_and(jnp.linalg.norm(r) > target, k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, (x, r, z, p, rz, 0))
    return x, k


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
      5. solve J delta = -r (direct, f32 LU + f64 refinement) and take the
         full step (``snes_linesearch_type: basic``).
    """

    def __init__(self, atol=1e-8, rtol=1e-8, max_it=100, monitor=False):
        self.atol = atol
        self.rtol = rtol
        self.max_it = max_it
        self.monitor = monitor
        self.iterations = 0

    def solve(self, problem) -> tuple[int, bool]:
        u = problem.u
        n = u.function_space.num_dofs
        mask, g = bc_arrays(problem.bcs, n)

        def residual():
            if problem.external_callback is not None:
                problem.external_callback(*problem.callback_args)
            r = problem.F.vector()
            A = problem.J.matrix()
            x = u.data
            dx_bc = jnp.where(mask, g - x, 0.0)
            r_lifted = r + A @ dx_bc  # lifting: what the free rows feel
            r_t = jnp.where(mask, x - g, r_lifted)
            keep = (~mask).astype(A.dtype)
            A_t = A * keep[:, None] * keep[None, :] + jnp.diag(mask.astype(A.dtype))
            return r_t, A_t

        r, A = residual()
        norm0 = float(jnp.linalg.norm(r))
        norm = norm0
        it = 0
        if self.monitor:
            print(f"  0 SNES Function norm {norm0:.12e}")
        converged = norm0 < self.atol
        while not converged and it < self.max_it:
            delta = solve_dense(A, -r)
            u._data = u._data + delta
            it += 1
            r, A = residual()
            new_norm = float(jnp.linalg.norm(r))
            # divergence-only backtracking: full steps on nominal paths (the
            # reference's "basic" line search), halved steps only when the
            # residual grows strongly (robustness; the reference would fail)
            alpha = 1.0
            while new_norm > 2.0 * norm and alpha > 2**-8:
                u._data = u._data - alpha * 0.5 * delta  # retract to alpha/2
                alpha *= 0.5
                r, A = residual()
                new_norm = float(jnp.linalg.norm(r))
            norm = new_norm
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
