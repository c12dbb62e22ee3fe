#!/usr/bin/env python
"""Measure constitutive-kernel throughput INSIDE the fused e2e step.

VERDICT round-2 weak item 4: standalone kernel throughput (898k pts/s at
262k points) was not demonstrably sustained inside the e2e step.  This
script times, at a given mesh size, with the honest varying-input protocol
(distinct pre-staged inputs, one blocking wait over the output list):

1. the constitutive stage exactly as the fused step runs it — the same
   ``FusedPlasticityStep._vkernel`` (difficulty-sorted chunked kernel), on
   the same SoA ``(4, n_pts)`` layout, at the REAL strain state of a
   mid-schedule plastic iterate (not a synthetic mix);
2. one full fused Newton update at that state;

and reports pts/s for (1) plus the share of (2) it accounts for.

Usage: python scripts/profile_e2e_kernel_share.py [NX] [CHUNK]
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    mat = MohrCoulombMaterial()
    P = build_slope_problem(Nx=nx, Ny=nx)
    mesh, V, S = P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc_dofs = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C_tang, state = mat.tangent_stress_point(deps, sn)
        return C_tang, state[0]

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver="mg",
                             batched_kernel=mat.batched_kernel_sorted(chunk))
    n_pts = fp.nc_pad * fp.nq  # the kernel processes the PADDED batch
    print(f"mesh {nx}x{nx}: {fp.nc} cells, {n_pts} Gauss points "
          f"(incl. padding)", flush=True)

    # representative plastic state: two load steps into the slope schedule
    # (host-driven at >=100: a fused multi-Newton execution exceeds the
    # TPU tunnel's ~60 s per-execution kill)
    step = fp.run_step_host if nx >= 100 else fp.run_step
    Du, sig = fp.zero_state()
    for load in (2.0, 14.0):
        Du, sig, norm, its, cg = step(Du, sig, load)
    jax.block_until_ready((Du, sig))
    print(f"state after 2 steps: newton={int(its)} cg={int(cg)} "
          f"norm={float(norm):.2e}", flush=True)

    # --- 1. constitutive stage exactly as the step runs it --------------
    st = fp.statics

    @jax.jit
    def real_deps(Du):
        keep = jnp.concatenate([Du, jnp.zeros(1, Du.dtype)])
        u_cell = keep[st["dofmap"]]
        return jnp.einsum("cqik,ck->cqi", st["B"], u_cell)

    deps = np.asarray(real_deps(jnp.asarray(Du)))          # (nc_pad, nq, 4)
    sn_soa = jnp.asarray(np.asarray(sig).reshape(-1, 4).T)  # (4, n)
    kfun = jax.jit(lambda d, s: fp._vkernel(d, s))

    reps = 8
    inputs = [jnp.asarray((deps * (1.0 + 1e-9 * i)).reshape(-1, 4).T)
              for i in range(reps)]
    jax.block_until_ready(inputs)
    out = kfun(inputs[0], sn_soa)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [kfun(x, sn_soa) for x in inputs]
    jax.block_until_ready(outs)
    k_dt = (time.perf_counter() - t0) / reps
    print(f"in-step constitutive stage: {k_dt*1e3:.1f} ms "
          f"= {n_pts/k_dt:,.0f} pts/s", flush=True)

    # --- 2. one full Newton update at that state ------------------------
    Du_w, sig_w, norm2, its2, cg2 = fp.run_step_host(Du, sig, 16.0)
    jax.block_until_ready((Du_w, sig_w))
    t0 = time.perf_counter()
    Du2, sig2, norm2, its2, cg2 = fp.run_step_host(Du, sig, 16.0)
    jax.block_until_ready((Du2, sig2))
    s_dt = time.perf_counter() - t0
    n_newton = max(int(its2), 1)
    print(f"newton update(s): {s_dt*1e3:.1f} ms total (newton={int(its2)}, "
          f"cg={int(cg2)})", flush=True)
    print(f"kernel share of one Newton update: "
          f"{100.0 * k_dt / (s_dt / n_newton):.1f}%", flush=True)


if __name__ == "__main__":
    main()
