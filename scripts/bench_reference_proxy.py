#!/usr/bin/env python
"""Reference-ALGORITHM CPU baseline for the Mohr-Coulomb slope problem.

The driver's 50x north star is "per-load-step speedup vs. the CPU
*reference*" (BASELINE.md).  The reference stack (dolfinx+PETSc/MUMPS) is
not installed here, so `bench.py`'s primary CPU baseline runs the SAME
tuned pipeline on host CPU — a pure hardware ratio.  That is conservative:
the tuned pipeline gives the CPU every TPU-oriented algorithmic win (the
closed-form Abbo-Sloan surface derivatives, mixed-precision f32 inner
Newton, difficulty-sorted chunking, f32 factorization + refinement), none
of which the reference uses.

This script times the reference's OWN algorithm on this host, faithful to
the published demo (cited, not copied):

- constitutive kernel: f64 return mapping with the residual of
  ``demo_plasticity_mohr_coulomb.py:474-533`` — yield surface / plastic
  potential derivatives via nested forward AD (``jax.jacfwd``), inner
  Newton as a ``lax.while_loop`` at tol 1e-8 / Nitermax 200 (``:469``),
  consistent tangent via ``jax.jacfwd(return_mapping, has_aux=True)``
  (``:555``), ``jax.vmap`` over Gauss points + ``jax.jit`` (``:574``);
- linear solve: sparse direct factorization of the assembled f64 tangent
  at EVERY Newton iteration (scipy SuperLU standing in for the reference's
  MUMPS LU, ``:662-672``);
- global Newton: same atol/rtol = 1e-8 and the identical 52-step load
  schedule.

Global Newton iteration counts are recorded in the JSON output;
``bench.py`` compares them against the tuned pipeline's live run (the two
implement the same mathematics), making the per-step wall-clock ratio an
apples-to-apples "vs the reference algorithm on this CPU" number.

Usage: python scripts/bench_reference_proxy.py [NX] [N_STEPS]
                [--out PATH] [--budget SECONDS]
                [--warm-start STATE.npz --start-step K]
Prints one JSON line with per-step timings and Newton counts.

``--warm-start``/``--start-step`` resume the load schedule at step K from
a saved ``(Du, sigma_n)`` state (``scripts/bench_scaling_full.py
--dump-state`` writes one).  This answers the round-4 collapse question
directly: does the reference's OWN algorithm converge the 100x100 step 49
(load 22.9) that both tuned legs report as collapse — without paying the
~35 s/step x 49 steps it would take to get there from scratch.  The
warm-start state comes from the tuned pipeline, whose Newton trajectory
matches the proxy's (identical mathematics, parity-checked at 25x25), so
the handoff state is the proxy's own up to solver roundoff.

``--out`` writes the record INCREMENTALLY after every converged step (a
multi-hour 100x100 run that hits the budget or is killed still leaves a
committed-quality prefix record).  ``--budget`` stops cleanly after the
first step that ends past the wall-clock budget, recording the converged
prefix with a ``budget_exhausted`` disclosure.  Round-5 field note: at
100x100 the reference algorithm's own inner Newton (plain undamped steps,
Nitermax 200, exactly as the demo :469) entered a >1h grind at step 21 —
per-update telemetry (max/mean inner iterations, kernel/factor seconds)
is printed so that behavior is documented rather than silent.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

# the shell pins JAX_PLATFORMS=axon and a sitecustomize imports jax before
# user code, so the env var alone is too late (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def make_reference_kernel(mat):
    """The reference demo's kernel, built from its published algorithm.

    Residual, AD strategy and tolerances follow
    ``demo_plasticity_mohr_coulomb.py`` as documented in SURVEY.md §2d:
    everything derivative-shaped comes from ``jax.jacfwd`` — no
    closed-form gradients/Hessians, no f32 phase, no sorting."""
    C_elas = jnp.asarray(mat.C_elas)
    f = mat.f_yield   # Abbo-Sloan smoothed yield surface value
    g = mat.g_pot     # plastic potential value (dilatancy angle psi)
    dgdsigma = jax.jacfwd(g)
    tol, n_iter_max = 1e-8, 200

    def deps_p(sigma, dlambda, deps_local, sigma_n_local):
        sigma_tr = sigma_n_local + C_elas @ deps_local
        yielding = f(sigma_tr) > 0.0
        return jnp.where(yielding, dlambda * dgdsigma(sigma), 0.0 * sigma)

    def r_g(sigma, dlambda, deps_local, sigma_n_local):
        return (sigma - sigma_n_local
                - C_elas @ (deps_local - deps_p(sigma, dlambda, deps_local,
                                                sigma_n_local)))

    def r_f(sigma, dlambda, deps_local, sigma_n_local):
        sigma_tr = sigma_n_local + C_elas @ deps_local
        yielding = f(sigma_tr) > 0.0
        return jnp.where(yielding, f(sigma), dlambda)

    def r(y, deps_local, sigma_n_local):
        sigma, dlambda = y[:4], y[4]
        return jnp.concatenate([
            r_g(sigma, dlambda, deps_local, sigma_n_local),
            r_f(sigma, dlambda, deps_local, sigma_n_local)[None],
        ])

    drdy = jax.jacfwd(r)

    def return_mapping(deps_local, sigma_n_local):
        # init at sigma_n (NOT the elastic trial state), matching the
        # reference demo's return_mapping (:496 `sigma_local = sigma_n_local`)
        # so elastic Gauss points do >=1 inner iteration exactly as the
        # reference does; the max(norm_res0, eps) guard below covers the
        # zero-residual corner the reference leaves implicit
        niter = 0
        y = jnp.concatenate([sigma_n_local, jnp.zeros(1)])
        res0 = r(y, deps_local, sigma_n_local)
        norm_res0 = jnp.linalg.norm(res0)

        def cond_fun(state):
            norm_res, niter, _ = state
            return jnp.logical_and(norm_res / jnp.maximum(norm_res0, 1e-30) > tol,
                                   niter < n_iter_max)

        def body_fun(state):
            norm_res, niter, history = state
            y, res = history
            j = drdy(y, deps_local, sigma_n_local)
            y_new = y + jnp.linalg.solve(j, -res)
            res_new = r(y_new, deps_local, sigma_n_local)
            return jnp.linalg.norm(res_new), niter + 1, (y_new, res_new)

        norm_res, niter, (y, res) = jax.lax.while_loop(
            cond_fun, body_fun, (norm_res0, niter, (y, res0)))
        return y[:4], (y[:4], niter)

    dsigma_ddeps = jax.jacfwd(return_mapping, has_aux=True)
    return jax.jit(jax.vmap(dsigma_ddeps, in_axes=(0, 0)))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nx = int(args[0]) if len(args) > 0 else 25
    n_steps = int(args[1]) if len(args) > 1 else 52
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    budget_s = None
    if "--budget" in sys.argv:
        budget_s = float(sys.argv[sys.argv.index("--budget") + 1])
    warm_path = None
    start_step = 0
    if "--warm-start" in sys.argv:
        warm_path = sys.argv[sys.argv.index("--warm-start") + 1]
        start_step = int(sys.argv[sys.argv.index("--start-step") + 1])

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    mat = MohrCoulombMaterial()
    P = build_slope_problem(Nx=nx, Ny=nx)
    mesh, V, S = P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc = np.concatenate([np.concatenate([s * 2, s * 2 + 1])
                         for s in (bottom, right)])

    # reuse the framework's host-precomputed B-matrices/dofmap; the solver
    # below never touches the tuned step
    fp = FusedPlasticityStep(mesh, V, S, lambda d, s: (None, None), bc,
                             linear_solver="cg")
    st = fp.statics
    B = np.asarray(st["B"])[: fp.nc]          # (nc, nq, 4, nk)
    wdet = np.asarray(st["wdet"])[: fp.nc]
    dof = np.asarray(st["dofmap"])[: fp.nc]   # (nc, nk)
    f_cell = np.asarray(st["f_cell"])[: fp.nc]
    n = fp.n_dofs
    nc, nq, _, nk = B.shape
    bc_mask = np.asarray(st["bc_mask"])
    atol = rtol = 1e-8

    kernel = make_reference_kernel(mat)

    rows = np.repeat(dof, nk, axis=1).ravel()
    cols = np.tile(dof, (1, nk)).ravel()
    keep = ~bc_mask

    f_vec = np.zeros(n)
    np.add.at(f_vec, dof.ravel(), f_cell.ravel())

    full_schedule = np.concatenate([np.linspace(2, 22.9, 50),
                                    np.array([22.96, 22.99])])[:n_steps]

    # Du init = 1.0, matching the reference demo (:645 ``Du.x.array[:] = 1.0``).
    # This is load-bearing: the strain of a constant-1 FE field is roundoff-
    # level (~1e-16) but NONZERO, so every Gauss point's inner Newton does
    # exactly one iteration and lands on the elastic tangent.  An exactly-zero
    # Du gives exactly-zero strain -> zero inner residual -> zero iterations ->
    # zero tangent -> singular first Jacobian (verified: SuperLU "Factor is
    # exactly singular").  The reference demo relies on the same effect.
    Du = np.ones(n)
    sigma_n = np.zeros((nc * nq, 4))
    if warm_path is not None:
        st_in = np.load(warm_path)
        assert st_in["Du"].shape == (n,) and int(st_in["step"]) == start_step
        Du = np.asarray(st_in["Du"], np.float64)
        # tuned-pipeline sig is (nc_pad, nq, 4); drop padding cells
        sigma_n = np.asarray(st_in["sig"], np.float64)[:nc].reshape(nc * nq, 4)
        full_schedule = full_schedule[start_step:]
    newton_per_step = []
    converged_per_step = []
    collapse = None
    kernel_s = 0.0
    factor_s = 0.0

    # warm the jit before timing (compile excluded, as in bench.py)
    _ = jax.block_until_ready(kernel(jnp.zeros((nc * nq, 4)),
                                     jnp.asarray(sigma_n)))

    step_wall = []
    budget_hit = False
    t0 = time.perf_counter()
    for load in full_schedule:
        t_step = time.perf_counter()
        b_ext = load * f_vec
        its = 0
        norm0 = None
        sigma_flat = None
        step_converged = False
        for _ in range(100):
            deps = np.einsum("cqik,ck->cqi", B,
                             np.concatenate([Du, [0.0]])[dof]).reshape(-1, 4)
            tk = time.perf_counter()
            C_tang, (sigma_flat, niter_pt) = jax.block_until_ready(
                kernel(jnp.asarray(deps), jnp.asarray(sigma_n)))
            tk_done = time.perf_counter()
            kernel_s += tk_done - tk
            ni = np.asarray(niter_pt)
            print(f"    update {its}: kernel {tk_done - tk:6.1f}s "
                  f"inner_its max={int(ni.max())} mean={float(ni.mean()):.1f}",
                  file=sys.stderr, flush=True)
            C_tang = np.asarray(C_tang).reshape(nc, nq, 4, 4)
            sig = np.asarray(sigma_flat).reshape(nc, nq, 4)
            r_int = np.zeros(n)
            np.add.at(r_int, dof.ravel(),
                      np.einsum("cqik,cqi,cq->ck", B, sig, wdet).ravel())
            r = r_int - b_ext
            r[bc_mask] = Du[bc_mask]
            norm = float(np.linalg.norm(r))
            if norm0 is None:
                norm0 = norm
            if norm < atol or norm < rtol * norm0:
                step_converged = True
                break
            K_cell = np.einsum("cqik,cqij,cqjl,cq->ckl", B, C_tang, B, wdet)
            tk = time.perf_counter()
            K = sp.coo_matrix((K_cell.ravel(), (rows, cols)),
                              shape=(n, n)).tocsr()
            # Dirichlet elimination: identity rows/cols (reference set_bc)
            D = sp.diags(keep.astype(float))
            K = D @ K @ D + sp.diags(bc_mask.astype(float))
            dx = spla.splu(K.tocsc()).solve(-r)
            factor_s += time.perf_counter() - tk
            Du = Du + dx
            its += 1
            if budget_s is not None and time.perf_counter() - t0 > budget_s:
                budget_hit = True
                print(f"    budget {budget_s:.0f}s exhausted MID-step after "
                      f"update {its}; abandoning this step",
                      file=sys.stderr, flush=True)
                break
        if budget_hit and not step_converged:
            # the abandoned step contributes neither a converged step nor
            # a collapse verdict — record the prefix and stop
            break
        newton_per_step.append(its)
        converged_per_step.append(step_converged)
        step_wall.append(time.perf_counter() - t_step)
        sigma_n = np.asarray(sigma_flat)
        print(f"  proxy step {len(newton_per_step) - 1}: load={load:.2f} "
              f"newton={its} converged={step_converged} "
              f"|r|={norm:.3e} t={time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        if out_path:  # incremental prefix record (kill/budget-safe)
            rec_i = _build_rec(
                nx, n, nc, nq, full_schedule, newton_per_step,
                converged_per_step, step_wall, kernel_s, factor_s,
                collapse, budget_hit, time.perf_counter() - t0)
            if warm_path is not None:
                rec_i["metric"] += "_warmstart"
                rec_i["warm_start"] = {"path": warm_path,
                                       "start_step": start_step}
            _write(out_path, rec_i)
        if budget_s is not None and time.perf_counter() - t0 > budget_s:
            budget_hit = True
            print(f"  proxy: wall budget {budget_s:.0f}s exhausted after "
                  f"step {len(newton_per_step) - 1}; recording prefix",
                  file=sys.stderr, flush=True)
            break
        if not step_converged:
            # stop exactly as scripts/bench_scaling_full.py does: a
            # non-converged step near the limit load is the collapse
            # signature; committing its state would poison later steps
            collapse = {"step": len(newton_per_step) - 1, "load": float(load),
                        "detail": f"proxy Newton failed to converge within "
                                  f"100 updates; last |r| = {norm:.3e}, "
                                  f"target {max(atol, rtol * norm0):.3e}"}
            break
    wall = time.perf_counter() - t0
    rec = _build_rec(nx, n, nc, nq, full_schedule, newton_per_step,
                     converged_per_step, step_wall, kernel_s, factor_s,
                     collapse, budget_hit, wall)
    if warm_path is not None:
        rec["metric"] += "_warmstart"
        rec["warm_start"] = {"path": warm_path, "start_step": start_step}
    line = json.dumps(rec)
    print(line)
    if out_path:
        _write(out_path, rec)


def _build_rec(nx, n, nc, nq, full_schedule, newton_per_step,
               converged_per_step, step_wall, kernel_s, factor_s,
               collapse, budget_hit, wall):
    # per-step wall over CONVERGED steps only: a collapse step burns its
    # full 100-update budget and would inflate the 50x-ratio denominator
    conv = np.asarray(converged_per_step, dtype=bool)
    n_conv = int(conv.sum())
    conv_wall = float(np.asarray(step_wall)[conv].sum())
    rec = {
        "metric": "reference_algorithm_cpu_proxy",
        "mesh": f"{nx}x{nx}", "n_dofs": n, "gauss_points": nc * nq,
        "steps": n_conv,
        "steps_scheduled": len(full_schedule),
        "wall_s": round(conv_wall, 2),
        "wall_s_incl_collapse": round(wall, 2),
        "per_step_s": round(conv_wall / max(n_conv, 1), 4),
        "newton_total": int(np.sum(newton_per_step)) if newton_per_step else 0,
        "newton_per_step": [int(x) for x in newton_per_step],
        "step_s": [round(float(x), 2) for x in step_wall],
        "kernel_share_s": round(kernel_s, 2),
        "factor_solve_share_s": round(factor_s, 2),
        "algorithm": ("f64 jacfwd return-mapping kernel + per-Newton sparse "
                      "SuperLU (MUMPS stand-in), reference demo :469-672"),
    }
    if budget_hit:
        rec["budget_exhausted"] = True
    if collapse is not None:
        rec["collapse"] = collapse
    return rec


def _write(path, rec):
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(json.dumps(rec) + "\n")
    os.replace(tmp, path)


if __name__ == "__main__":
    main()
