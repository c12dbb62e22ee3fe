#!/usr/bin/env python
"""Component-level timing of one fused-BCR Newton body pass.

Round-5 finding: fusing the whole 52-step schedule into ONE device
execution left 25x25 at ~0.084 s/step (scripts/bench_fused_schedule_25.py)
— within noise of the per-step driver — so the r4 hypothesis that the
25x25 floor is per-step dispatch/tunnel overhead is WRONG: it is device
time inside the Newton body.  This script times each component of a BCR
Newton body pass (honest varying-input protocol: distinct pre-staged
inputs, one blocking wait at the end) so the op-count surgery targets the
real costs.

Usage: python scripts/profile_bcr_newton.py [NX] [REPS]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def timeit(fn, inputs, n=20):
    """Median-free honest timing: run over n distinct inputs, one sync."""
    outs = [fn(*inp) for inp in inputs[:2]]  # warm
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*inp) for inp in inputs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(inputs)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
    from dolfinx_external_operator_tpu.parallel import bcr as _bcr
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

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc, linear_solver="bcr",
                             batched_kernel=mat.batched_kernel_sorted(4096))
    print(f"device: {jax.devices()[0]}, {fp.nc} cells, n_dofs {fp.n_dofs}",
          file=sys.stderr, flush=True)

    # representative plastic state: a few steps into the schedule
    Du, sig = fp.zero_state()
    for load in (2.0, 6.0, 10.0, 14.0):
        Du, sig, norm, its, k = fp.run_step(Du, sig, load)
    jax.block_until_ready((Du, sig))
    st = fp.statics
    psum = lambda x: x
    (constitutive, residual, tangent_matvec, tangent_diag,
     assemble_f) = fp._local_ops()
    fvec = jax.jit(lambda: assemble_f(st, psum))()

    rng = np.random.default_rng(0)
    n = fp.n_dofs
    nc_pad, nq = fp.nc_pad, fp.nq

    # distinct inputs: converged Du plus small perturbations
    Dus = [jnp.asarray(np.asarray(Du) * (1.0 + 1e-6 * i)) for i in range(reps)]
    out = {"mesh": f"{nx}x{nx}", "n_dofs": int(n)}

    # 1. constitutive (gather + B einsum + sorted kernel)
    f_con = jax.jit(lambda du: constitutive(st, du, sig, psum))
    out["constitutive_ms"] = 1e3 * timeit(f_con, [(d,) for d in Dus], reps)

    C_tang, sigma = jax.block_until_ready(f_con(Du))
    sigmas = [sigma * (1.0 + 1e-6 * i) for i in range(reps)]

    # 2. residual (sigma einsum + r scatter + f scatter + bc + norm)
    def f_res(sg, du):
        r = residual(st, sg, 14.0, psum, fvec)
        r = jnp.where(st["bc_mask"], du, r)
        return jnp.sqrt(jnp.vdot(r, r))
    f_res = jax.jit(f_res)
    out["residual_ms"] = 1e3 * timeit(
        f_res, [(s, d) for s, d in zip(sigmas, Dus)], reps)

    r0 = jax.block_until_ready(jax.jit(
        lambda sg, du: jnp.where(st["bc_mask"], du,
                                 residual(st, sg, 14.0, psum, fvec)))(sigma, Du))

    Cs = [C_tang * (1.0 + 1e-6 * i) for i in range(reps)]

    # 3. K_cell einsum + bc mask
    mask = st["bc_mask"]
    dof = st["dofmap"]

    def f_kcell(C):
        keep_ext = jnp.concatenate([~mask, jnp.zeros(1, bool)])
        km = keep_ext[dof].astype(jnp.float64)
        K_cell = jnp.einsum("cqik,cqij,cqjl,cq->ckl",
                            st["B"], C, st["B"], st["wdet"])
        return K_cell * km[:, :, None] * km[:, None, :]
    f_kcell = jax.jit(f_kcell)
    out["kcell_ms"] = 1e3 * timeit(f_kcell, [(c,) for c in Cs], reps)
    K_cell = jax.block_until_ready(f_kcell(C_tang))
    Ks = [K_cell * (1.0 + 1e-6 * i) for i in range(reps)]

    m, Bb, n_lat, sentinel = fp._bcr_plan
    bcst = st["bcr"]
    out["bcr_m_B"] = [int(m), int(Bb)]

    # 4. T assembly (f32 segment_sum into the band layout) + equilibrate
    def f_tasm(K):
        Tflat = jax.ops.segment_sum(
            K.astype(jnp.float32).reshape(K.shape[0], -1).ravel(),
            bcst["dst"].ravel(), num_segments=sentinel + 1)[:-1]
        Tflat = Tflat.at[bcst["diag_fix"]].add(1.0)
        return _bcr.equilibrate(Tflat, bcst["diag_slot"], m, Bb)
    f_tasm = jax.jit(f_tasm)
    out["t_assemble_ms"] = 1e3 * timeit(f_tasm, [(k,) for k in Ks], reps)
    T, d = jax.block_until_ready(f_tasm(K_cell))
    Ts = [T * (1.0 + 1e-7 * i) for i in range(reps)]

    # 5. bcr_factor
    f_fact = jax.jit(lambda t: _bcr.bcr_factor(t, m, Bb))
    out["bcr_factor_ms"] = 1e3 * timeit(f_fact, [(t,) for t in Ts], reps)
    fact = jax.block_until_ready(f_fact(T))

    # 6. bcr_apply (one f32 application)
    rs32 = [jnp.asarray(rng.standard_normal(m * Bb), jnp.float32)
            for _ in range(reps)]
    f_app = jax.jit(lambda r: _bcr.bcr_apply(fact, r))
    out["bcr_apply_ms"] = 1e3 * timeit(f_app, [(r,) for r in rs32], reps)

    # 7. f64 EBE matvec (the refinement operator)
    mv64 = jax.jit(_mg.ebe_matvec(K_cell, dof, mask, n, psum,
                                  mode="node", bs=V.bs))
    rs64 = [jnp.asarray(rng.standard_normal(n)) for _ in range(reps)]
    out["mv64_ms"] = 1e3 * timeit(mv64, [(r,) for r in rs64], reps)

    # 8. full bcr_solve (ir_direct, rtol 1e-13) at the real residual
    solveC = fp._build_step()  # not used; keep program identical

    def f_solve(C, rr):
        keep_ext = jnp.concatenate([~mask, jnp.zeros(1, bool)])
        km = keep_ext[dof].astype(jnp.float64)
        K = jnp.einsum("cqik,cqij,cqjl,cq->ckl",
                       st["B"], C, st["B"], st["wdet"])
        K = K * km[:, :, None] * km[:, None, :]
        mv = _mg.ebe_matvec(K, dof, mask, n, psum, mode="node", bs=V.bs)
        Tf = jax.ops.segment_sum(
            K.astype(jnp.float32).reshape(K.shape[0], -1).ravel(),
            bcst["dst"].ravel(), num_segments=sentinel + 1)[:-1]
        Tf = Tf.at[bcst["diag_fix"]].add(1.0)
        T2, d2 = _bcr.equilibrate(Tf, bcst["diag_slot"], m, Bb)
        fact2 = _bcr.bcr_factor(T2, m, Bb)
        d64 = d2.astype(jnp.float64)
        l2o, o2l = bcst["perm_l2o"], bcst["perm_o2l"]
        pad = m * Bb - n_lat

        def solve32(rrr):
            r_lat = jnp.concatenate([rrr[l2o], jnp.zeros(pad, jnp.float64)])
            x_lat = _bcr.bcr_apply(fact2, (d2 * r_lat.astype(jnp.float32)))
            return (d64 * x_lat.astype(jnp.float64))[:n_lat][o2l]

        return _bcr.ir_direct(mv, solve32, rr, 1e-13)
    f_solve = jax.jit(f_solve)
    x, k = jax.block_until_ready(f_solve(C_tang, -r0))
    out["ir_rounds"] = int(k)
    out["bcr_solve_ms"] = 1e3 * timeit(
        f_solve, [(c, -r0 * (1.0 + 1e-6 * i)) for i, c in enumerate(Cs)], reps)

    body_est = (out["constitutive_ms"] + out["residual_ms"]
                + out["bcr_solve_ms"])
    out["body_estimate_ms"] = body_est
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
