#!/usr/bin/env python
"""Full-schedule slope-stability run at an arbitrary mesh size, with
Eisenstat-Walker forcing OFF — the Newton-parity protocol (verdict r3 #3).

Runs the complete 52-step load schedule of the reference demo
(``/root/reference/doc/demo/demo_plasticity_mohr_coulomb.py:708-733``) at
NX x NX through the fused mg (AMG-preconditioned CG) pipeline, driving one
Newton update per device execution (``run_step_host(forcing=False)``) so
(a) each execution stays under the TPU tunnel's ~60 s kill limit and
(b) every CG solve runs to the SAME tight ``cg_rtol`` — no inexact-Newton
forcing — so global Newton iteration counts are comparable across
backends (the identical-iteration-counts clause of BASELINE.json).

Usage:
  python scripts/bench_scaling_full.py [NX] [N_STEPS] [--cpu] [--out PATH]
                                       [--solver mg|bcr|dense]
                                       [--driver host|fused|schedule]
                                       [--chunk N]

``--driver fused`` runs the WHOLE Newton loop of each load step as one
device execution (``run_step``) instead of one Newton per execution —
viable when per-step device time stays under the TPU tunnel's ~60 s
execution kill (BCR/dense solves; NOT the mg path at 100x100+, whose
per-step CG work exceeds it).  Newton trajectories are identical by
construction (same compiled body, ``max_it`` budget instead of 1).

``--driver schedule`` goes one further: ``--chunk N`` load steps per
device execution (``run_schedule``'s ``lax.scan``).  This is the only
driver whose per-step cost is not floored by the TPU tunnel's ~80 ms
per-execution round trip (the measured 25x25 floor, round 5) — at small
meshes the whole 52-step schedule is a handful of executions.  Only for
sizes where EVERY scheduled step converges: the scan cannot stop at a
collapse step, so the record is rejected if any step exhausts its Newton
budget (use fused/host at sizes with a collapse step).

Prints one JSON line (per-step times, per-step Newton counts, totals);
``--out`` additionally writes it to PATH for committing under
``docs/records/``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nx = int(args[0]) if len(args) > 0 else 100
    n_steps = int(args[1]) if len(args) > 1 else 52
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    solver = "mg"
    if "--solver" in sys.argv:
        solver = sys.argv[sys.argv.index("--solver") + 1]
    driver = "host"
    if "--driver" in sys.argv:
        driver = sys.argv[sys.argv.index("--driver") + 1]
        assert driver in ("host", "fused", "schedule")
    chunk = 13  # 52 = 4 x 13: equal chunks -> one compiled program
    if "--chunk" in sys.argv:
        chunk = int(sys.argv[sys.argv.index("--chunk") + 1])
    # --dump-state PATH --dump-after-step K: save (Du, sig) right after
    # step index K converges, as the warm-start handoff for
    # bench_reference_proxy.py --warm-start (the collapse question)
    dump_path = None
    dump_after = -1
    if "--dump-state" in sys.argv:
        dump_path = sys.argv[sys.argv.index("--dump-state") + 1]
        dump_after = int(sys.argv[sys.argv.index("--dump-after-step") + 1])

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    device = jax.devices()[0]
    print(f"device: {device}, {nx}x{nx}, {n_steps} steps, forcing=OFF",
          file=sys.stderr, flush=True)
    mat = MohrCoulombMaterial()
    P = build_slope_problem(Nx=nx, Ny=nx)
    mesh, V, S = P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc = np.concatenate([np.concatenate([s * 2, s * 2 + 1])
                         for s in (bottom, right)])

    def kernel(deps, sn):
        C, st = mat.tangent_stress_point(deps, sn)
        return C, st[0]

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc, linear_solver=solver,
                             batched_kernel=mat.batched_kernel_sorted(8192))
    full_schedule = np.concatenate([np.linspace(2, 22.9, 50),
                                    np.array([22.96, 22.99])])[:n_steps]

    if driver == "fused":
        def step(Du, sig, load):
            Du, sig, norm, its, cg = fp.run_step(Du, sig, load)
            its = int(its)
            if its >= fp.newton_max_it:
                # the fused loop exhausted its update budget without the
                # convergence flag — same stagnation condition the host
                # driver reports
                raise RuntimeError(
                    f"fused Newton failed to converge within "
                    f"{fp.newton_max_it} updates (|r| = {float(norm):.3e})")
            return Du, sig, norm, its, cg
    else:
        def step(Du, sig, load):
            return fp.run_step_host(Du, sig, load, forcing=False)

    if driver == "schedule":
        chunks = [full_schedule[i:i + chunk]
                  for i in range(0, len(full_schedule), chunk)]
        Du, sig = fp.zero_state()
        w = fp.run_schedule(chunks[0], Du, sig)  # warmup/compile
        jax.block_until_ready(w[:2])

        Du, sig = fp.zero_state()
        norms_all, its_all, cgs_all = [], [], []
        t0 = time.perf_counter()
        for loads in chunks:
            Du, sig, norms, its, cgs = fp.run_schedule(loads, Du, sig)
            norms_all.append(norms)
            its_all.append(its)
            cgs_all.append(cgs)
        jax.block_until_ready((Du, sig))
        wall = time.perf_counter() - t0
        its_np = np.concatenate([np.asarray(x) for x in its_all])
        cgs_np = np.concatenate([np.asarray(x) for x in cgs_all])
        norms_np = np.concatenate([np.asarray(x) for x in norms_all])
        bad = np.nonzero(its_np >= fp.newton_max_it)[0]
        if bad.size:
            # the scan ran straight through a non-converged step, so every
            # iterate after it is off-trajectory — refuse to record
            raise SystemExit(
                f"schedule driver: step {int(bad[0])} exhausted the Newton "
                f"budget ({fp.newton_max_it}); state past it is invalid. "
                f"Use --driver fused/host at this size.")
        rec = {
            "metric": "slope_stability_full_schedule_parity",
            "mesh": f"{nx}x{nx}", "n_dofs": fp.n_dofs,
            "gauss_points": fp.nc * fp.nq,
            "steps": len(full_schedule),
            "steps_scheduled": len(full_schedule),
            "backend": "cpu" if "--cpu" in sys.argv else str(device),
            "solver": solver,
            "driver": (f"schedule ({chunk} load steps/execution via "
                       f"lax.scan), EW forcing OFF, cg_rtol=%g" % fp.cg_rtol),
            "wall_s": round(wall, 2),
            "per_step_s": round(wall / len(full_schedule), 4),
            "newton_total": int(its_np.sum()),
            "cg_total": int(cgs_np.sum()),
            "cg_per_step": round(float(cgs_np.sum()) / len(full_schedule), 1),
            "newton_per_step": [int(x) for x in its_np],
            "final_residual": float(norms_np[-1]),
            "Du_norm": float(np.linalg.norm(np.asarray(Du))),
        }
        line = json.dumps(rec)
        print(line)
        if out_path:
            with open(out_path, "w") as fh:
                fh.write(line + "\n")
        return

    Du, sig = fp.zero_state()
    w = step(Du, sig, float(full_schedule[0]))  # warmup/compile
    jax.block_until_ready(w[:2])

    Du, sig = fp.zero_state()
    newton_per_step = []
    cg_per_step = []
    step_s = []
    collapse = None
    norm = float("nan")  # stays NaN if step 0 collapses (ADVICE r4)
    t0 = time.perf_counter()
    for i, load in enumerate(full_schedule):
        ts = time.perf_counter()
        try:
            Du, sig, norm, its, cg = step(Du, sig, float(load))
        except RuntimeError as e:
            # Newton stagnation at a near-limit load = collapse detection.
            # The schedule's bracket steps (22.9, 22.96, 22.99) were tuned
            # to the reference's coarse mesh; the numerical limit load
            # DECREASES with refinement (sharper shear-band localization),
            # so on finer meshes the last steps can sit beyond the limit —
            # there is no equilibrium solution to converge to.  Both
            # backends must detect collapse at the SAME step (asserted by
            # bench.py's newton_parity field over the converged prefix).
            collapse = {"step": i, "load": float(load),
                        "detail": str(e)[:200]}
            print(f"  step {i:2d}: load={load:6.2f} COLLAPSE "
                  f"(numerical limit load of this mesh): {e}",
                  file=sys.stderr, flush=True)
            break
        jax.block_until_ready((Du, sig))
        step_s.append(time.perf_counter() - ts)
        newton_per_step.append(int(its))
        cg_per_step.append(int(cg))
        print(f"  step {i:2d}: load={load:6.2f} newton={int(its)} "
              f"cg={int(cg)} norm={float(norm):.2e} t={step_s[-1]:.2f}s",
              file=sys.stderr, flush=True)
        if dump_path is not None and i == dump_after:
            np.savez(dump_path, Du=np.asarray(Du, np.float64),
                     sig=np.asarray(sig, np.float64), step=i + 1)
            print(f"  state after step {i} -> {dump_path}",
                  file=sys.stderr, flush=True)
    wall = time.perf_counter() - t0

    n_conv = len(newton_per_step)
    rec = {
        "metric": "slope_stability_full_schedule_parity",
        "mesh": f"{nx}x{nx}", "n_dofs": fp.n_dofs,
        "gauss_points": fp.nc * fp.nq,
        "steps": n_conv,
        "steps_scheduled": len(full_schedule),
        "backend": "cpu" if "--cpu" in sys.argv else str(device),
        "solver": solver,
        "driver": ("fused (1 load step/execution), EW forcing OFF, cg_rtol=%g"
                   if driver == "fused" else
                   "host (1 Newton/execution), EW forcing OFF, cg_rtol=%g")
                  % fp.cg_rtol,
        "wall_s": round(wall, 2),
        "per_step_s": round(wall / max(n_conv, 1), 4),
        "newton_total": int(np.sum(newton_per_step)),
        "cg_total": int(np.sum(cg_per_step)),
        "cg_per_step": round(float(np.sum(cg_per_step)) / max(n_conv, 1), 1),
        "newton_per_step": newton_per_step,
        "step_s": [round(float(x), 3) for x in step_s],
        "final_residual": float(norm),
        "Du_norm": float(np.linalg.norm(np.asarray(Du))),
    }
    if collapse is not None:
        rec["collapse"] = collapse
    line = json.dumps(rec)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
