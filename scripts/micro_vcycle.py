#!/usr/bin/env python
"""Micro-benchmark: V-cycle internals (the 73 ms/CG-iteration term at
200x200 named by profile_mg_breakdown).

Reports level sizes/ELL widths, per-level smoothing matvec cost, and the
whole preconditioner application under gamma_coarse in {1, 2} and
cheb_degree in {2, 3} — the time x CG-iterations tradeoff data.

Usage: python scripts/micro_vcycle.py [NX]
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


def _time(fn, inputs, chain=20):
    base = fn

    def chained(x):
        return jax.lax.fori_loop(0, chain, lambda i, v: base(v), x)

    f = jax.jit(chained)
    for x in inputs[:2]:
        jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    outs = [f(x) for x in inputs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(inputs) / chain


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 100
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
    bc = np.concatenate([np.concatenate([s * 2, s * 2 + 1])
                         for s in (bottom, right)])

    def kernel(deps, sn):
        C, st = mat.tangent_stress_point(deps, sn)
        return C, st[0]

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc, linear_solver="mg",
                             batched_kernel=mat.batched_kernel_sorted(8192))
    st = fp.statics
    n = fp.n_dofs
    rng = np.random.default_rng(0)

    rec = {"mesh": f"{nx}x{nx}", "n_dofs": n}
    levels = st["mg"]["levels"]
    rec["levels"] = [{"n": int(l["cols"].shape[0]), "m": int(l["cols"].shape[1])}
                     for l in levels]
    rec["dia1"] = fp._mg_dia1_offsets is not None

    # per-Newton runtime values
    keep_ext = jnp.concatenate([~st["bc_mask"], jnp.zeros(1, bool)])
    km = keep_ext[st["dofmap"]].astype(jnp.float64)
    C_t = jnp.asarray(rng.normal(size=(st["B"].shape[0], fp.nq, 4, 4)))
    K_cell = jnp.einsum("cqik,cqij,cqjl,cq->ckl", st["B"], C_t, st["B"],
                        st["wdet"])
    K_cell = K_cell * km[:, :, None] * km[:, None, :]
    dia = {"dst": st["mg"]["dia0_dst"], "offsets": fp._mg_dia_offsets,
           "mask_lat": st["mg"]["mask0_lat"]}
    if fp._mg_dia1_offsets is not None:
        dia.update({"dst1": st["mg"]["dia1_dst"],
                    "offsets1": fp._mg_dia1_offsets})
    rt = mgmod.mg_setup(st["mg"], K_cell.astype(jnp.float32), st["dofmap"],
                        st["bc_mask"], n, mv0_mode=fp._mg_mv0_mode, bs=V.bs,
                        dia=dia)

    # per-level smoothing matvec cost
    xs = {}
    for k, lvl in enumerate(levels):
        nk = int(lvl["cols"].shape[0])
        ins = [jnp.asarray(rng.normal(size=nk).astype(np.float32))
               for _ in range(3)]
        t = _time(rt["mvs"][k], ins, chain=50)
        rec[f"level{k + 1}_mv_ms"] = round(t * 1e3, 3)
    ins0 = [jnp.asarray(rng.normal(size=n).astype(np.float32))
            for _ in range(3)]
    rec["level0_mv_ms"] = round(_time(rt["mv0"], ins0, chain=50) * 1e3, 3)

    # transfer costs per inter-level pair: restrict∘prolong round trip is
    # shape-preserving on the fine side, so it chains inside one dispatch
    for k in range(1, len(levels)):
        t = st["mg"]["transfers"][k]
        n_f = int(levels[k - 1]["cols"].shape[0])
        n_c = int(levels[k]["cols"].shape[0])
        rec[f"transfer{k}_width"] = int(t["P_idx"].shape[1])
        ins_f = [jnp.asarray(rng.normal(size=n_f).astype(np.float32))
                 for _ in range(3)]
        rec[f"transfer{k}_pair_ms"] = round(_time(
            lambda r, t=t, n_c=n_c: mgmod._prolong(
                t, mgmod._restrict(t, r, n_c)),
            ins_f, chain=20) * 1e3, 3)

    # whole preconditioner under config variants
    mask_lat = st["mg"]["mask0_lat"]
    t0s = None
    if fp._mg_t0_stencil is not None:
        shape0, shape1 = fp._mg_lat_shapes
        t0s = (fp._mg_t0_stencil, shape0, shape1, V.bs, ~mask_lat)
    for gamma in (1, 2):
        for deg in (2, 3):
            def M32(r, gamma=gamma, deg=deg):
                z = mgmod.vcycle(st["mg"], rt,
                                 jnp.where(mask_lat, 0.0, r),
                                 cheb_degree=deg, gamma_coarse=gamma,
                                 t0s=t0s)
                return jnp.where(mask_lat, r, z)

            rec[f"vcycle_g{gamma}_d{deg}_ms"] = round(
                _time(M32, ins0, chain=20) * 1e3, 3)

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
