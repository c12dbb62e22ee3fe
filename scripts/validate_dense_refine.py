#!/usr/bin/env python
"""Newton-iterate parity of the dense path's f64 refinement-round count.

Runs the full 52-step 25x25 slope schedule on host CPU with 1 vs 2
refinement rounds and compares per-step Newton counts and the final
iterates.  Supports the `_dense_refine = 1` default (spmd.py): one
equilibrated-f32-solve refinement round reaches ~1e-10 relative solve
accuracy, two orders below the 1e-8 Newton tolerance.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np


def run(refine):
    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    mat = MohrCoulombMaterial()
    P = build_slope_problem(Nx=25, Ny=25)
    mesh, V, S = P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc = np.concatenate([np.concatenate([s * 2, s * 2 + 1])
                         for s in (bottom, right)])

    def kernel(deps, sn):
        C, st = mat.tangent_stress_point(deps, sn)
        return C, st[0]

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc, linear_solver="dense",
                             batched_kernel=mat.batched_kernel_sorted(4096))
    fp._dense_refine = refine  # before first call: the step traces lazily
    # force the Cholesky branch: on CPU dense_solve would default to LU,
    # but TPU production runs the Chol/blocked-tri-inv factorization — the
    # reduced-refinement margin must be validated on THAT path (ADVICE r3)
    fp._dense_fact = "chol"
    loads = np.concatenate([np.linspace(2, 22.9, 50), [22.96, 22.99]])
    Du, sig = fp.zero_state()
    its = []
    norms = []
    for load in loads:
        Du, sig, norm, it, _ = fp.run_step(Du, sig, float(load))
        its.append(int(it))
        norms.append(float(norm))
    return np.asarray(its), np.asarray(Du), np.asarray(sig), norms


def main():
    its1, Du1, sig1, n1 = run(1)
    its2, Du2, sig2, n2 = run(2)
    print(f"newton counts refine=1: total={its1.sum()}  refine=2: total={its2.sum()}")
    same = np.array_equal(its1, its2)
    print(f"per-step counts identical: {same}")
    if not same:
        diff = np.nonzero(its1 != its2)[0]
        print(f"  differing steps: {diff}: {its1[diff]} vs {its2[diff]}")
    print(f"max|Du1-Du2| = {np.abs(Du1 - Du2).max():.3e}  "
          f"(scale {np.abs(Du2).max():.3e})")
    print(f"max|sig1-sig2| = {np.abs(sig1 - sig2).max():.3e}  "
          f"(scale {np.abs(sig2).max():.3e})")
    print(f"final residuals: {n1[-1]:.3e} vs {n2[-1]:.3e}")
    assert same, "refine=1 changed Newton counts"


if __name__ == "__main__":
    main()
