#!/usr/bin/env python
"""Microbench of the mg level-0 matvec layouts on the current backend.

The level-0 EBE matvec dominates a V-cycle application (2*cheb+2 of them
per CG iteration; NOTES.md op-cost table: 4.1 ms at 100x100 in f32,
~15 ns per indexed gather/scatter element).  ``mg_setup(mv0_mode=...)``
offers two index layouts:

- ``scalar``: per-dof gather/scatter (nc*nk elements each way)
- ``node``:   per-node bs-wide rows   (nc*nk/bs elements each way)

This script times both at the requested mesh sizes with the honest
varying-input protocol (distinct pre-staged inputs, one blocking wait over
the outputs) and prints ms/application.  Run on the TPU to pick the
default; layouts are verified identical by
``tests/test_mg.py::test_mv0_node_mode_matches_scalar``.

Usage: python scripts/bench_mv0_modes.py [NX ...]   (default: 50 100 200)
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)


def bench_size(nx, reps=30):
    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel import mg as mgmod
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    mat = MohrCoulombMaterial()
    P = build_slope_problem(Nx=nx, Ny=nx)
    mesh, V, S = P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C, st = mat.tangent_stress_point(deps, sn)
        return C, st[0]

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc, linear_solver="mg")
    n = V.num_dofs
    dof = fp.statics["dofmap"]
    mask = fp.statics["bc_mask"]

    C_el = np.asarray(kernel(jnp.zeros(4), jnp.zeros(4))[0])
    B_np = np.asarray(fp.statics["B"])[: fp.nc]
    K_cell = np.einsum("cqik,ij,cqjl,cq->ckl", B_np, C_el, B_np, fp._wdet,
                       optimize=True)
    keep = ~fp.bc_mask_np
    km = np.concatenate([keep, [False]])[np.asarray(dof)].astype(np.float32)
    K_pad = np.zeros((dof.shape[0],) + K_cell.shape[1:], np.float32)
    K_pad[: fp.nc] = K_cell
    K_bc = jnp.asarray(K_pad * km[:, :, None] * km[:, None, :])

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=n), jnp.float32) for _ in range(reps)]
    jax.block_until_ready(xs)

    fp_d = FusedPlasticityStep(mesh, V, S, kernel, bc, linear_solver="mg",
                               mg_opts={"mv0_mode": "dia"})
    out = {}
    for mode in ("scalar", "node", "dia"):
        if mode == "dia":
            if fp_d._mg_mv0_mode != "dia":
                print(f"  {nx}x{nx}: dia unavailable (no lattice)", flush=True)
                continue
            mg_d = fp_d.statics["mg"]
            rt = mgmod.mg_setup(mg_d, K_bc, fp_d.statics["dofmap"],
                                fp_d.statics["bc_mask"], n,
                                dia={"dst": mg_d["dia0_dst"],
                                     "offsets": fp_d._mg_dia_offsets,
                                     "mask_lat": mg_d["mask0_lat"]})
            # time in the lattice layout (how the inner iteration runs it)
        else:
            rt = mgmod.mg_setup(fp.statics["mg"], K_bc, dof, mask, n,
                                mv0_mode=mode, bs=V.bs)
        mv = jax.jit(rt["mv0"])
        jax.block_until_ready(mv(xs[0]))
        t0 = time.perf_counter()
        ys = [mv(x) for x in xs]
        jax.block_until_ready(ys)
        ms = (time.perf_counter() - t0) / reps * 1e3
        out[mode] = ms
        print(f"  {nx}x{nx} (n={n}): mv0[{mode}] = {ms:.3f} ms", flush=True)
    for m in ("node", "dia"):
        if m in out:
            print(f"  {nx}x{nx}: {m}/scalar = {out[m] / out['scalar']:.2f}",
                  flush=True)
    return out


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [50, 100, 200]
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    for nx in sizes:
        bench_size(nx)


if __name__ == "__main__":
    main()
