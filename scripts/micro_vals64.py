#!/usr/bin/env python
"""Micro-benchmark: f64 DIA band-value assembly strategies (the 353 ms/Newton
``vals64`` term named by profile_mg_breakdown at 100x100).

Variants on the LIVE dia0_dst map of an NX x NX slope problem:
  a. segment_sum, cell-major (current production path)
  b. host-sorted contributions + indices_are_sorted=True
  c. padded gather matrix: vals = K_ext[gidx].sum(1) (no scatter at all)
  d. variant b in f32 (reference point: how much is f64 emulation)

All variants are validated against (a) to 1e-15 relative.

Usage: python scripts/micro_vals64.py [NX]
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


def _time(fn, inputs):
    for x in inputs[:2]:
        jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(inputs)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial, build_slope_problem)
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
    offsets = fp._mg_dia_offsets
    nb = len(offsets)
    dst = np.asarray(st["mg"]["dia0_dst"])  # (nc_pad, nk*nk)
    nc_pad, nkk = dst.shape
    nseg = nb * n

    rng = np.random.default_rng(0)
    K_in = [jnp.asarray(rng.normal(size=(nc_pad, nkk))) for _ in range(4)]
    dst_dev = jnp.asarray(dst)

    rec = {"mesh": f"{nx}x{nx}", "n_dofs": n, "bands": nb,
           "contribs": int(nc_pad * nkk)}

    # a: current
    def va(K):
        return jax.ops.segment_sum(K.ravel(), dst_dev.ravel(),
                                   num_segments=nseg + 1)[:-1]

    rec["a_segsum_f64_ms"] = round(_time(jax.jit(va), K_in) * 1e3, 2)
    ref = np.asarray(jax.jit(va)(K_in[0]))

    # b: host-sorted
    perm = np.argsort(dst.ravel(), kind="stable")
    perm_dev = jnp.asarray(perm.astype(np.int32))
    dst_sorted = jnp.asarray(dst.ravel()[perm])

    def vb(K):
        return jax.ops.segment_sum(K.ravel()[perm_dev], dst_sorted,
                                   num_segments=nseg + 1,
                                   indices_are_sorted=True)[:-1]

    rec["b_sorted_f64_ms"] = round(_time(jax.jit(vb), K_in) * 1e3, 2)
    vb0 = np.asarray(jax.jit(vb)(K_in[0]))
    err_b = np.abs(vb0 - ref).max() / max(np.abs(ref).max(), 1e-30)
    rec["b_rel_err"] = float(err_b)

    # c: padded gather matrix
    flat_dst = dst.ravel()
    order = perm
    sdst = flat_dst[order]
    # contributions per slot
    counts = np.bincount(sdst, minlength=nseg + 1)
    cmax = int(counts[:nseg].max())
    rec["cmax"] = cmax
    gidx = np.full((nseg, cmax), nc_pad * nkk, dtype=np.int64)
    pos = np.zeros(len(counts) + 1, dtype=np.int64)
    pos[1:] = np.cumsum(counts)
    for k in range(cmax):
        seg_ids = sdst  # sorted slot per contribution
        # contribution j is the (j - pos[slot])-th of its slot
        rank = np.arange(len(sdst)) - pos[seg_ids]
        sel = (rank == k) & (seg_ids < nseg)
        gidx[seg_ids[sel], k] = order[sel]
    gidx_dev = jnp.asarray(gidx if nc_pad * nkk > 2**31 - 1
                           else gidx.astype(np.int32))

    def vc(K):
        K_ext = jnp.concatenate([K.ravel(), jnp.zeros(1, K.dtype)])
        return K_ext[gidx_dev].sum(axis=1)

    rec["c_gather_f64_ms"] = round(_time(jax.jit(vc), K_in) * 1e3, 2)
    vc0 = np.asarray(jax.jit(vc)(K_in[0]))
    rec["c_rel_err"] = float(np.abs(vc0 - ref).max()
                             / max(np.abs(ref).max(), 1e-30))

    # d: sorted, f32 (emulation share)
    K32 = [k.astype(jnp.float32) for k in K_in]
    rec["d_sorted_f32_ms"] = round(_time(jax.jit(vb), K32) * 1e3, 2)
    # e: current, f32
    rec["e_segsum_f32_ms"] = round(_time(jax.jit(va), K32) * 1e3, 2)

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
