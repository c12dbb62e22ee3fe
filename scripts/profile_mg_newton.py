#!/usr/bin/env python
"""Per-stage wall-cost breakdown of one mg-path Newton update (default
100x100).  Stages, timed with the varying-input protocol:

  kernel      : constitutive tangent+stress (sorted chunked, random state)
  K_cell64    : f64 element-stiffness einsum B^T C B w  + bc mask multiply
  mg_setup    : per-Newton hierarchy values (f32 band/ELL scatters, power
                iterations for Chebyshev bounds, coarse dense inverse)
  vals64      : f64 DIA band values segment-sum (refinement operator build)
  mv64_dia    : one f64 banded refinement matvec
  vcycle      : one W-cycle preconditioner application (f32, lattice)
  mv0         : one f32 level-0 stencil matvec
  dot64/dot32 : one vdot each (CG per-iteration fixed cost)
  solve       : one full ir_pcg solve at the fused path's rtol

Use it to rank where a 100x100 Newton update's ~600 ms goes.
Usage: python scripts/profile_mg_newton.py [NX] [REPS] [RTOL]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def timeit(name, fn, inputs, n_warm=2):
    for x in inputs[:n_warm]:
        jax.block_until_ready(fn(*x))
    t0 = time.perf_counter()
    outs = [fn(*x) for x in inputs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(inputs) * 1e3
    print(f"  {name:12s}: {dt:8.3f} ms", flush=True)
    return dt


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rtol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-13

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel import mg as _mg
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
    nc, nq, nc_pad = fp.nc, fp.nq, fp.nc_pad
    print(f"device={jax.devices()[0]}  {nx}x{nx}: n={n} dofs, "
          f"{nc} cells x {nq} pts, mv0_mode={fp._mg_mv0_mode}, reps={reps}",
          flush=True)

    rng = np.random.default_rng(0)
    _F = jnp.float64

    Dus = [jnp.asarray(rng.normal(scale=1e-3, size=n)) for _ in range(reps)]
    sn = jnp.zeros((nc_pad, nq, 4))
    B, dof, wdet, mask = st["B"], st["dofmap"], st["wdet"], st["bc_mask"]
    vkernel = fp._vkernel

    @jax.jit
    def kern(du):
        ext = jnp.concatenate([du, jnp.zeros(1, du.dtype)])
        ue = ext[dof]
        deps = jnp.einsum("cqik,ck->cqi", B, ue)
        C_t, sig_t = vkernel(deps.reshape(-1, 4).T, sn.reshape(-1, 4).T)
        return (jnp.moveaxis(C_t, -1, 0).reshape(nc_pad, nq, 4, 4),
                sig_t.T.reshape(nc_pad, nq, 4))

    t_k = timeit("kernel", kern, [(x,) for x in Dus])
    Cs = [jax.block_until_ready(kern(x)[0]) for x in Dus]

    keep_ext = jnp.concatenate([~mask, jnp.zeros(1, bool)])
    km = keep_ext[dof].astype(_F)

    @jax.jit
    def kcell64(C):
        K_cell = jnp.einsum("cqik,cqij,cqjl,cq->ckl", B, C, B, wdet)
        return K_cell * km[:, :, None] * km[:, None, :]
    t_kc = timeit("K_cell64", kcell64, [(C,) for C in Cs])
    Kcs = [jax.block_until_ready(kcell64(C)) for C in Cs]

    dia_mode = fp._mg_mv0_mode == "dia"
    dia_arg = None
    if dia_mode:
        dia_arg = {"dst": st["mg"]["dia0_dst"], "offsets": fp._mg_dia_offsets,
                   "mask_lat": st["mg"]["mask0_lat"]}
        if fp._mg_dia1_offsets is not None:
            dia_arg.update({"dst1": st["mg"]["dia1_dst"],
                            "offsets1": fp._mg_dia1_offsets})

    def setup(Kc):
        return _mg.mg_setup(st["mg"], Kc.astype(jnp.float32), dof, mask, n,
                            None, mv0_mode=fp._mg_mv0_mode, bs=V.bs,
                            dia=dia_arg)
    # mg_setup returns closures; time a jitted wrapper that returns only the
    # array pytree (the closures capture the same computed arrays)
    @jax.jit
    def setup_arrays(Kc):
        rt = setup(Kc)
        return {"d0": rt["d0"], "lmax0": rt["lmax0"], "vals": rt["vals"],
                "diags": rt["diags"], "lmaxs": rt["lmaxs"],
                "coarse_inv": rt["coarse_inv"]}
    t_su = timeit("mg_setup", setup_arrays, [(K,) for K in Kcs])

    if dia_mode:
        offsets = fp._mg_dia_offsets
        nb = len(offsets)
        dst = st["mg"]["dia0_dst"]

        @jax.jit
        def vals64(Kc):
            return jax.ops.segment_sum(
                Kc.reshape(Kc.shape[0], -1).ravel(), dst.ravel(),
                num_segments=nb * n + 1)[:-1].reshape(nb, n)
        t_v64 = timeit("vals64", vals64, [(K,) for K in Kcs])
        v64 = jax.block_until_ready(vals64(Kcs[0]))
        free_lat = ~st["mg"]["mask0_lat"]
        l2o = st["mg"]["perm0_l2o"]

        @jax.jit
        def mv64(x):
            return _mg._dia_matvec(v64, offsets, free_lat, x[l2o])
        timeit("mv64_dia", mv64, [(x,) for x in Dus])

    rt = setup(Kcs[0])
    mask_lat = st["mg"]["mask0_lat"] if dia_mode else mask
    t0s = None
    if dia_mode and fp._mg_t0_stencil is not None:
        shape0, shape1 = fp._mg_lat_shapes
        t0s = (fp._mg_t0_stencil, shape0, shape1, V.bs, ~mask_lat)

    rs32 = [jnp.asarray(rng.normal(size=n), jnp.float32) for _ in range(reps)]

    @jax.jit
    def vcyc(r):
        return _mg.vcycle(st["mg"], rt, jnp.where(mask_lat, 0.0, r),
                          cheb_degree=fp._mg_cheb_degree,
                          gamma_coarse=fp._mg_gamma, t0s=t0s)
    t_vc = timeit("vcycle", vcyc, [(r,) for r in rs32])

    timeit("mv0", jax.jit(rt["mv0"]), [(r,) for r in rs32])
    timeit("dot32", jax.jit(lambda x: jnp.vdot(x, x)), [(r,) for r in rs32])
    timeit("dot64", jax.jit(lambda x: jnp.vdot(x, x)), [(x,) for x in Dus])

    # full solve at the requested rtol (counts its own iterations)
    bs_in = [jnp.asarray(rng.normal(size=n)) for _ in range(reps)]
    if dia_mode:
        o2l = st["mg"]["perm0_o2l"]

        def M32(r):
            z = _mg.vcycle(st["mg"], rt, jnp.where(mask_lat, 0.0, r),
                           cheb_degree=fp._mg_cheb_degree,
                           gamma_coarse=fp._mg_gamma, t0s=t0s)
            return jnp.where(mask_lat, r, z)

        free_lat64 = ~st["mg"]["mask0_lat"]

        def mv(x):
            yl = _mg._dia_matvec(v64, offsets, free_lat64, x[l2o])
            return yl[o2l]

        @jax.jit
        def solve(b):
            return _mg.ir_pcg(mv, rt["mv0"], M32, b, rtol, 10000,
                              to_inner=lambda v: v[l2o],
                              from_inner=lambda v: v[o2l])
    else:
        mvk = _mg.ebe_matvec(Kcs[0], dof, mask, n, None,
                             mode=fp._mg_mv0_mode, bs=V.bs)

        def M32(r):
            z = _mg.vcycle(st["mg"], rt, jnp.where(mask, 0.0, r.astype(jnp.float32)),
                           cheb_degree=fp._mg_cheb_degree, gamma_coarse=fp._mg_gamma)
            return jnp.where(mask, r, z)

        @jax.jit
        def solve(b):
            return _mg.ir_pcg(mvk, rt["mv0"], M32, b, rtol, 10000)

    for x in bs_in[:2]:
        jax.block_until_ready(solve(x))
    t0 = time.perf_counter()
    outs = [solve(b) for b in bs_in]
    jax.block_until_ready(outs)
    t_s = (time.perf_counter() - t0) / reps * 1e3
    its = int(outs[0][1])
    print(f"  solve(rtol={rtol:g}): {t_s:8.3f} ms   ({its} inner CG its)",
          flush=True)
    print(f"\n  update ~ kernel {t_k:.0f} + K_cell64 {t_kc:.0f} + setup "
          f"{t_su:.0f} + solve {t_s:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
