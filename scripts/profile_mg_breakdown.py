#!/usr/bin/env python
"""Per-Newton cost breakdown of the fused AMG-CG load step at a given mesh
size (verdict r3 #6: name the superlinear term between 100x100 and 200x200).

Times each constituent of the mg/dia solve path on the live operator:
  kernel        difficulty-sorted return map over all Gauss points
  K_cell        element-stiffness einsum (B^T C B w) + bc masking
  mg_setup      per-Newton hierarchy values (bands, level-1 triple product,
                power iterations, coarse dense inverse)
  vals64        f64 band segment-sum (the refinement operator's values)
  mv32_dia      one f32 lattice-banded matvec (per CG iteration)
  vcycle        one V-cycle preconditioner application (per CG iteration)
  mv64_dia      one f64 banded matvec (per refinement round)

Honest protocol: distinct pre-staged inputs, chained applications inside one
dispatch where the op is sub-ms (matvecs, vcycle), one blocking wait over a
list otherwise (tunnel-dispatch artifacts; see bench.py/_kernel_throughput).

Usage: python scripts/profile_mg_breakdown.py [NX] [--out PATH]
Prints one JSON line with per-op seconds and a composed per-step model
against a measured step.
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


def _time(fn, inputs, chain=None):
    """Mean seconds per application over distinct inputs (chained inside
    one dispatch when ``chain`` is given)."""
    if chain:
        base = fn

        def fn(x):
            return jax.lax.fori_loop(0, chain, lambda i, v: base(v), x)
        fn = jax.jit(fn)
    else:
        fn = jax.jit(fn)
    for x in inputs[:2]:
        jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(inputs)
    return dt / chain if chain else dt


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nx = int(args[0]) if args else 100
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel import mg as mgmod
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    dev = jax.devices()[0]
    print(f"profile_mg_breakdown: {nx}x{nx} on {dev}", file=sys.stderr,
          flush=True)
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
    npts = fp.nc * fp.nq
    rng = np.random.default_rng(0)
    rec = {"metric": "mg_step_breakdown", "mesh": f"{nx}x{nx}",
           "n_dofs": n, "gauss_points": npts, "device": str(dev)}

    # ---- kernel (SoA batch-last layout, as FusedPlasticityStep feeds it) ----
    bk = mat.batched_kernel_sorted(8192)
    eps_in = [jnp.asarray(rng.normal(size=(4, npts)) * 1e-3)
              for _ in range(3)]
    sig_in = jnp.zeros((4, npts), jnp.float64)
    rec["kernel_s"] = _time(lambda e: bk(e, sig_in)[0], eps_in)

    # ---- K_cell einsum -----------------------------------------------------
    mask = st["bc_mask"]
    dof = st["dofmap"]
    keep_ext = jnp.concatenate([~mask, jnp.zeros(1, bool)])
    km = keep_ext[dof].astype(jnp.float64)
    nc_pad = st["B"].shape[0]

    def kcell(C):
        K = jnp.einsum("cqik,cqij,cqjl,cq->ckl", st["B"], C, st["B"],
                       st["wdet"])
        return K * km[:, :, None] * km[:, None, :]

    C_in = [jnp.asarray(rng.normal(size=(nc_pad, fp.nq, 4, 4)))
            for _ in range(3)]
    rec["kcell_s"] = _time(kcell, C_in)
    K_cell = jax.jit(kcell)(C_in[0])

    # ---- mg_setup ----------------------------------------------------------
    dia_mode = fp._mg_mv0_mode == "dia"
    rec["mv0_mode"] = fp._mg_mv0_mode
    dia = None
    if dia_mode:
        dia = {"dst": st["mg"]["dia0_dst"], "offsets": fp._mg_dia_offsets,
               "mask_lat": st["mg"]["mask0_lat"]}
        if fp._mg_dia1_offsets is not None:
            dia.update({"dst1": st["mg"]["dia1_dst"],
                        "offsets1": fp._mg_dia1_offsets})

    def setup(K):
        return mgmod.mg_setup(st["mg"], K.astype(jnp.float32), dof, mask, n,
                              mv0_mode=fp._mg_mv0_mode, bs=V.bs, dia=dia)

    def setup_arrays(K):
        # rt holds matvec CLOSURES (not jittable return values); the compute
        # is entirely in these array leaves
        rt = setup(K)
        return {k: rt[k] for k in ("vals", "d0", "diags", "lmaxs", "lmax0",
                                   "coarse_inv")}

    K_in = [jax.jit(kcell)(c) for c in C_in]
    rec["mg_setup_s"] = _time(setup_arrays, K_in)
    rt = setup(K_cell)  # eager, for the closure-based timings below

    # ---- f64 refinement operator (element-blocked, node-row layout) ---------
    if dia_mode:
        mv64 = mgmod.ebe_matvec(K_cell, dof, mask, n, mode="node", bs=V.bs)
        xs64 = [jnp.asarray(rng.normal(size=n)) for _ in range(5)]
        rec["mv64_ebe_s"] = _time(mv64, xs64, chain=10)

        xs32 = [jnp.asarray(rng.normal(size=n).astype(np.float32))
                for _ in range(5)]
        rec["mv32_dia_s"] = _time(lambda x: rt["mv0"](x), xs32, chain=100)

        mask_lat = st["mg"]["mask0_lat"]
        t0s = None
        if fp._mg_t0_stencil is not None:
            shape0, shape1 = fp._mg_lat_shapes
            t0s = (fp._mg_t0_stencil, shape0, shape1, V.bs, ~mask_lat)

        def M32(r):
            z = mgmod.vcycle(st["mg"], rt, jnp.where(mask_lat, 0.0, r),
                             cheb_degree=fp._mg_cheb_degree,
                             gamma_coarse=fp._mg_gamma, t0s=t0s)
            return jnp.where(mask_lat, r, z)

        rec["vcycle_s"] = _time(M32, xs32, chain=50)

    # ---- one full linear solve + one full step -------------------------------
    b64 = jnp.asarray(rng.normal(size=n)).at[np.asarray(fp.bc_mask_np)].set(0.0)
    # measured whole step (1 Newton/execution, forcing OFF) for the model check
    Du, sig = fp.zero_state()
    w = fp.run_step_host(Du, sig, 2.0, forcing=False)
    jax.block_until_ready(w[:2])
    Du, sig = fp.zero_state()
    t0 = time.perf_counter()
    Du, sig, norm, its, cg = fp.run_step_host(Du, sig, 2.0, forcing=False)
    jax.block_until_ready((Du, sig))
    rec["step_s"] = time.perf_counter() - t0
    rec["step_newton"] = int(its)
    rec["step_cg"] = int(cg)

    # composed model: per-Newton fixed work + per-CG-iteration work
    if dia_mode:
        per_newton = (rec["kernel_s"] + rec["kcell_s"] + rec["mg_setup_s"]
                      + 4 * rec["mv64_ebe_s"])
        per_cg = rec["mv32_dia_s"] + rec["vcycle_s"]
        rec["model_step_s"] = round(
            rec["step_newton"] * per_newton + rec["step_cg"] * per_cg, 4)
        rec["model_per_newton_fixed_s"] = round(per_newton, 4)
        rec["model_per_cg_iter_s"] = round(per_cg * 1e3, 4)  # ms
    for k, v in list(rec.items()):
        if isinstance(v, float):
            rec[k] = round(v, 6)
    line = json.dumps(rec)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
