#!/usr/bin/env python
"""Wall-clock comparison of fused-mg cycle configurations on-device.

Candidates from the CPU iteration-count sweep (NOTES.md "Cycle-tuning
sweep"; all configs produce identical Newton counts and bitwise-equal Du):

  base   : cheb_degree=3, inner_floor=1e-6, mv0_mode=scalar  (defaults)
  node   : + mv0_mode=node      (half the level-0 indexed elements)
  tuned  : + cheb_degree=2, inner_floor=1e-5  (-21%% level-0 matvec work
           at +5%% CG its on the cost proxy)

Runs a short prefix of the reference load schedule at the given size with
each config (same compiled-program protocol as bench.py: warmup step, then
timed steps with one final block) and prints s/step.  Use on the TPU to
pick defaults; on CPU the ranking is meaningless (different op-cost model).

Usage: python scripts/bench_mg_configs.py [NX] [N_STEPS]   (default 50 4)
"""
import functools
import os
import sys
import time

import numpy as np

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)


CONFIGS = {
    "base": {},
    "node": {"mv0_mode": "node"},
    "dia": {"mv0_mode": "dia"},
    "tuned": {"mv0_mode": "dia", "cheb_degree": 2, "inner_floor": 1e-5},
}


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel import mg as mgmod
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

    loads = np.linspace(2, 22.9, 50)[:n_steps]
    base_ir = mgmod.ir_pcg
    results = {}
    for name, cfg in CONFIGS.items():
        cfg = dict(cfg)
        floor = cfg.pop("inner_floor", None)
        mgmod.ir_pcg = (functools.partial(base_ir, inner_floor=floor)
                        if floor else base_ir)
        try:
            fp = FusedPlasticityStep(mesh, V, S, kernel, bc,
                                     linear_solver="mg", mg_opts=cfg,
                                     batched_kernel=mat.batched_kernel_sorted(8192))
            host = nx >= 100  # tunnel per-execution kill limit (NOTES.md)
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
            dt = (time.perf_counter() - t0) / n_steps
            results[name] = dt
            print(f"  {name:6s}: {dt:.3f} s/step  newton={newts} cg={cgs} "
                  f"|Du|={float(np.linalg.norm(np.asarray(Du))):.9e}", flush=True)
        finally:
            mgmod.ir_pcg = base_ir
    base = results.get("base")
    for name, dt in results.items():
        print(f"  {name}: {dt / base:.2f}x of base", flush=True)


if __name__ == "__main__":
    main()
