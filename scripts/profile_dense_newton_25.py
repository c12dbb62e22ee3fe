#!/usr/bin/env python
"""Per-stage wall-cost breakdown of one dense-path Newton update at 25x25.

Times, on the current default device with the varying-input protocol
(distinct pre-staged inputs per rep, one blocking wait at the end):

  kernel     : constitutive tangent+stress over the full point set
  asm_einsum : f32 element-stiffness einsum B^T C B w
  asm_scatter: dedup dense scatter of the element blocks
  chol       : f32 Cholesky of the equilibrated tangent
  tri_inv    : blocked triangular inversion of the factor
  apply      : two triangular matvecs (one K^-1 application)
  mv64       : exact f64 element-by-element operator action (refinement)
  norm       : one f64 vdot + sqrt (convergence test cost)

Use it to rank where a 25x25 Newton update's ~30 ms goes before touching
the dense path.  Usage: python scripts/profile_dense_newton_25.py [NX] [REPS]
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
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel import spmd

    mat = MohrCoulombMaterial()
    P = build_slope_problem(Nx=nx, Ny=nx)
    mesh, V, S = P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C, st = mat.tangent_stress_point(deps, sn)
        return C, st[0]

    fp = spmd.FusedPlasticityStep(
        mesh, V, S, kernel, bc, linear_solver="dense",
        batched_kernel=mat.batched_kernel_sorted(8192))
    st = fp.statics
    n = fp.n_dofs
    nc, nq = fp.nc, fp.nq
    print(f"device={jax.devices()[0]}  {nx}x{nx}: n={n} dofs, "
          f"{nc} cells x {nq} pts = {nc*nq} Gauss pts, reps={reps}", flush=True)

    rng = np.random.default_rng(0)
    f32, f64 = jnp.float32, jnp.float64

    def stage(shape, dtype=f64, scale=1e-3):
        return [jnp.asarray(rng.normal(scale=scale, size=shape), dtype)
                for _ in range(reps)]

    # --- kernel (the exact fused-body path: gather -> deps -> _vkernel) ---
    Dus = stage((n,))
    sn = jnp.zeros((fp.nc_pad, nq, 4))
    B = st["B"]
    dofmap = st["dofmap"]
    wdet = st["wdet"]
    vkernel = fp._vkernel

    @jax.jit
    def kern(du):
        ext = jnp.concatenate([du, jnp.zeros(1, du.dtype)])
        ue = ext[dofmap]                       # (nc, nb)
        deps = jnp.einsum("cqik,ck->cqi", B, ue)
        C_t, sig_t = vkernel(deps.reshape(-1, 4).T, sn.reshape(-1, 4).T)
        return (jnp.moveaxis(C_t, -1, 0).reshape(fp.nc_pad, nq, 4, 4),
                sig_t.T.reshape(fp.nc_pad, nq, 4))

    t_k = timeit("kernel", kern, [(x,) for x in Dus])

    C0, _ = jax.block_until_ready(kern(Dus[0]))
    Cs = [jax.block_until_ready(kern(x)[0]) for x in Dus]

    # --- assembly einsum ---
    @jax.jit
    def asm_e(C):
        return jnp.einsum("cqik,cqij,cqjl,cq->ckl", B.astype(f32),
                          C.astype(f32), B.astype(f32), wdet.astype(f32))
    t_e = timeit("asm_einsum", asm_e, [(C,) for C in Cs])
    Kc = [jax.block_until_ready(asm_e(C)) for C in Cs]

    # --- scatter ---
    scat = jax.jit(lambda kc: fp._assemble_dense_f32(kc, dofmap, lambda x: x))
    t_s = timeit("asm_scatter", scat, [(k,) for k in Kc])
    mask = st["bc_mask"]
    keep32 = (~mask).astype(f32)

    @jax.jit
    def equi(kc):
        K = fp._assemble_dense_f32(kc, dofmap, lambda x: x)
        K = K * keep32[:, None] * keep32[None, :] + jnp.diag(mask.astype(f32))
        d = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(jnp.diagonal(K)), 1e-30, None).astype(f64))
        return K * (d[:, None] * d[None, :]).astype(f32), d
    Ks = [jax.block_until_ready(equi(k))[0] for k in Kc]

    # --- factorization stages ---
    t_c = timeit("chol", jax.jit(jnp.linalg.cholesky), [(K,) for K in Ks])
    Ls = [jax.block_until_ready(jnp.linalg.cholesky(K)) for K in Ks]
    t_t = timeit("tri_inv", jax.jit(spmd._blocked_tri_inv), [(L,) for L in Ls])
    Li = jax.block_until_ready(spmd._blocked_tri_inv(Ls[0]))
    rs32 = stage((n,), f32, 1.0)
    t_a = timeit("apply", jax.jit(lambda r: Li.T @ (Li @ r)), [(r,) for r in rs32])

    # --- f64 EBE matvec (refinement residual) ---
    @jax.jit
    def mv64(x):
        ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        ue = ext[dofmap]
        eq = jnp.einsum("cqik,ck->cqi", B, ue)
        sq = jnp.einsum("cqij,cqj->cqi", C0, eq)
        fc = jnp.einsum("cqik,cqi,cq->ck", B, sq, wdet)
        return jax.ops.segment_sum(fc.reshape(-1), dofmap.reshape(-1), n + 1)[:-1]
    t_m = timeit("mv64", mv64, [(x,) for x in Dus])

    t_n = timeit("norm", jax.jit(lambda x: jnp.sqrt(jnp.vdot(x, x))),
                 [(x,) for x in Dus])

    upd = t_k + t_e + t_s + t_c + t_t
    print(f"\n  one Newton update ~ kernel+asm+fact + refine*(mv64+apply) + norms")
    print(f"  fact total (chol+tri_inv): {t_c + t_t:.2f} ms")
    print(f"  refine round (mv64+apply): {t_m + t_a:.2f} ms x {fp._dense_refine}")
    print(f"  est update: {upd + fp._dense_refine * (t_m + t_a) + 2 * t_n:.2f} ms")


if __name__ == "__main__":
    main()
