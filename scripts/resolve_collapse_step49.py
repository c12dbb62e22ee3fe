#!/usr/bin/env python
"""Round-5 collapse question (VERDICT r4 #4): is the 49/52 stop at
100x100 a solver-robustness gap or the mesh's numerical limit load?

Both tuned legs (TPU and CPU, identical 239-Newton trajectories) stop at
step 49 (gamma*H/c = 22.9) with "failed to converge within 100 updates".
The reference demo's own global Newton budget is 200
(``/root/reference/doc/demo/demo_plasticity_mohr_coulomb.py:662-672``
loops to ``Nitermax`` with plain undamped updates), i.e. our cap is HALF
the reference's.  This script retries steps 49-51 from the committed
step-48 state with a raised budget through ``run_step_host`` (one Newton
update per device execution -- same compiled program as the fused driver,
``max_it`` is traced, so the retry costs no recompile and each execution
stays far under the TPU tunnel's ~60 s kill) and EW forcing OFF (exact
solves, Newton-parity protocol).

Outcome A (converges within the raised budget): the 49/52 stop was a cap
artifact; the remaining steps complete and a 52/52 record is written.
Outcome B (residual stagnates/diverges): the mesh's numerical limit load
sits below 22.9 -- document as mesh physics, matching whatever
``bench_reference_proxy.py --warm-start`` reports for the reference's own
algorithm at the same state.

Usage: python scripts/resolve_collapse_step49.py [NX] [--state PATH]
             [--max-it N] [--out PATH]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nx = int(args[0]) if len(args) > 0 else 100
    state_path = "/tmp/state_100_s48.npz"
    if "--state" in sys.argv:
        state_path = sys.argv[sys.argv.index("--state") + 1]
    max_it = 500
    if "--max-it" in sys.argv:
        max_it = int(sys.argv[sys.argv.index("--max-it") + 1])
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

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

    def kernel(deps, sn):
        C, st = mat.tangent_stress_point(deps, sn)
        return C, st[0]

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc, linear_solver="bcr",
                             batched_kernel=mat.batched_kernel_sorted(8192))
    fp.newton_max_it = max_it

    st_in = np.load(state_path)
    Du = jnp.asarray(st_in["Du"])
    sig = jnp.asarray(st_in["sig"])
    start = int(st_in["step"])
    print(f"device: {jax.devices()[0]}, {nx}x{nx}, resume at step {start}, "
          f"newton budget {max_it}", file=sys.stderr, flush=True)

    full_schedule = np.concatenate([np.linspace(2, 22.9, 50),
                                    np.array([22.96, 22.99])])
    rec = {"metric": "collapse_step_retry", "mesh": f"{nx}x{nx}",
           "resume_step": start, "newton_budget": max_it,
           "driver": "host (1 Newton/execution), EW forcing OFF",
           "steps": []}
    for i in range(start, len(full_schedule)):
        load = float(full_schedule[i])
        t0 = time.perf_counter()
        try:
            Du, sig, norm, its, cg = fp.run_step_host(
                Du, sig, load, forcing=False)
        except RuntimeError as e:
            rec["steps"].append({"step": i, "load": load,
                                 "converged": False,
                                 "detail": str(e)[:300]})
            print(f"  step {i}: load={load} FAILED with budget {max_it}: {e}",
                  file=sys.stderr, flush=True)
            break
        dt = time.perf_counter() - t0
        rec["steps"].append({"step": i, "load": load, "converged": True,
                             "newton": int(its), "cg": int(cg),
                             "residual": float(norm), "wall_s": round(dt, 2)})
        print(f"  step {i}: load={load} newton={int(its)} cg={int(cg)} "
              f"norm={float(norm):.2e} t={dt:.1f}s",
              file=sys.stderr, flush=True)
    rec["completed_schedule"] = all(s.get("converged") for s in rec["steps"]) \
        and rec["steps"] and rec["steps"][-1]["step"] == len(full_schedule) - 1
    rec["Du_norm"] = float(np.linalg.norm(np.asarray(Du)))
    line = json.dumps(rec)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
