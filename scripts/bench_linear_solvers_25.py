#!/usr/bin/env python
"""Head-to-head of the fused-step linear-solver modes on the headline
25x25 x 52-step slope-stability schedule (the bench.py e2e config).

Usage: python scripts/bench_linear_solvers_25.py [mode ...]
Defaults to: dense elastic mg

Each mode runs the FULL schedule twice (first pass warms compiles); the
second pass is timed with the deferred-sync protocol of bench.py.  Newton
totals must agree across modes (the parity bar).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    modes = sys.argv[1:] or ["dense", "elastic", "mg"]

    import jax

    jax.config.update("jax_enable_x64", True)

    from dolfinx_external_operator_tpu.models.mohr_coulomb import MohrCoulombMaterial

    from bench import _build_fused, _run_schedule

    mat = MohrCoulombMaterial()
    sched = np.concatenate([np.linspace(2, 22.9, 50), np.array([22.96, 22.99])])

    for mode in modes:
        fp = _build_fused(mat, 25, 25, mode, sorted_chunk=4096)
        r = _run_schedule(fp, sched, f"25x25-{mode}")
        print(f"{mode}: per_step_s={r['per_step_s']} newton={r['newton_total']} "
              f"cg={r['cg_total']} final={r['final_residual']:.2e}", flush=True)


if __name__ == "__main__":
    main()
