#!/usr/bin/env python
"""25x25 dispatch-floor hunt (verdict r4 #3).

The r4 official record shows 0.098 s/step at 25x25 with zero CG
iterations; the suspicion is that most of it is per-step dispatch/tunnel
overhead plus the dense factorization, not necessary device work.  This
measures the full 52-step reference schedule through:

  per-step driver  x  {dense, bcr}   (52 dispatches, deferred syncs)
  run_schedule     x  {dense, bcr}   (ONE device execution, lax.scan)

and asserts the Newton-count parity invariant (171 total) on every leg.

Usage: python scripts/bench_fused_schedule_25.py [NX] [--cpu]
Prints one JSON line.
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
    nx = int(args[0]) if args else 25

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
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

    schedule = np.concatenate([np.linspace(2, 22.9, 50),
                               np.array([22.96, 22.99])])
    out = {"mesh": f"{nx}x{nx}", "steps": len(schedule)}

    for solver in ("dense", "bcr"):
        fp = FusedPlasticityStep(mesh, V, S, kernel, bc, linear_solver=solver,
                                 batched_kernel=mat.batched_kernel_sorted(4096))

        # --- per-step driver (one dispatch per load step) ---------------
        Du, sig = fp.zero_state()
        w = fp.run_step(Du, sig, float(schedule[0]))
        jax.block_until_ready(w[:2])
        Du, sig = fp.zero_state()
        newton, cg = [], []
        t0 = time.perf_counter()
        for load in schedule:
            Du, sig, norm, its, k = fp.run_step(Du, sig, float(load))
            newton.append(its)
            cg.append(k)
        jax.block_until_ready((Du, sig))
        wall = time.perf_counter() - t0
        out[f"{solver}_per_step_driver"] = {
            "per_step_s": round(wall / len(schedule), 5),
            "newton_total": int(sum(int(x) for x in newton)),
            "cg_total": int(sum(int(x) for x in cg)),
            "final_residual": float(norm),
        }
        print(f"  {solver} per-step: {wall / len(schedule):.4f} s/step, "
              f"newton={out[f'{solver}_per_step_driver']['newton_total']}",
              file=sys.stderr, flush=True)

        # --- fused schedule (ONE execution for all 52 steps) ------------
        lds = jax.block_until_ready(
            fp.run_schedule(schedule))  # warmup/compile
        Du2, sig2, norms, its2, cgs = (
            None, None, None, None, None)
        t0 = time.perf_counter()
        Du2, sig2, norms, its2, cgs = fp.run_schedule(schedule)
        jax.block_until_ready((Du2, sig2, norms, its2, cgs))
        wall = time.perf_counter() - t0
        out[f"{solver}_fused_schedule"] = {
            "per_step_s": round(wall / len(schedule), 5),
            "newton_total": int(np.sum(np.asarray(its2))),
            "cg_total": int(np.sum(np.asarray(cgs))),
            "final_residual": float(np.asarray(norms)[-1]),
        }
        # iterate parity between the two drivers
        out[f"{solver}_driver_parity_du"] = float(
            np.max(np.abs(np.asarray(Du2) - np.asarray(Du))))
        print(f"  {solver} fused: {wall / len(schedule):.4f} s/step, "
              f"newton={out[f'{solver}_fused_schedule']['newton_total']}, "
              f"du_diff={out[f'{solver}_driver_parity_du']:.2e}",
              file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
