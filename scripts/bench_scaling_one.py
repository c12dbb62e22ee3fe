#!/usr/bin/env python
"""One scaling-curve point with bench.py's exact protocol (fused AMG-CG,
sorted kernel, host driver at >=100).  For before/after comparisons of
solver changes without paying for the full bench.

Usage: python scripts/bench_scaling_one.py [NX] [N_STEPS]   (default 100 3)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_enable_x64", True)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    print(f"device: {jax.devices()[0]}, {nx}x{nx}, {n_steps} steps", flush=True)
    mat = MohrCoulombMaterial()
    P = build_slope_problem(Nx=nx, Ny=nx)
    mesh, V, S = P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C, st = mat.tangent_stress_point(deps, sn)
        return C, st[0]

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc, linear_solver="mg",
                             batched_kernel=mat.batched_kernel_sorted(8192))
    loads = np.linspace(2, 22.9, 50)[:n_steps]
    host = nx >= 100
    step = fp.run_step_host if host else fp.run_step

    Du, sig = fp.zero_state()
    w = step(Du, sig, float(loads[0]))
    jax.block_until_ready(w[:2])

    Du, sig = fp.zero_state()
    t0 = time.perf_counter()
    newts = cgs = 0
    for load in loads:
        Du, sig, norm, its, cg = step(Du, sig, float(load))
        newts += int(its)
        cgs += int(cg)
    jax.block_until_ready((Du, sig))
    wall = time.perf_counter() - t0
    print(json.dumps({
        "size": f"{nx}x{nx}", "per_step_s": round(wall / n_steps, 4),
        "newton_total": newts, "cg_total": cgs,
        "driver": "host" if host else "fused",
        "Du_norm": float(np.linalg.norm(np.asarray(Du))),
        "final_residual": float(norm)}), flush=True)


if __name__ == "__main__":
    main()
