"""MFU / roofline accounting for the two hot kernels (verdict r3 #4).

Ties the measured throughputs to v5e hardware peaks so "fast" claims carry
an absolute yardstick:

- **Mohr-Coulomb return map** (``models/mohr_coulomb.py``): elementwise
  transcendentals + 4x4/5x5 linear algebra per Gauss point — VPU work
  (the MXU needs >=128-wide contractions; these are rank-4/5).  Achieved
  FLOP/s = pts/s x FLOPs/pt (XLA cost analysis), compared against the VPU
  f32 peak.
- **DIA (stencil-banded) level-0 matvec** (``parallel/mg.py:_dia_matvec``):
  shifted slices + FMAs, one multiply-add per band element — HBM-bandwidth
  work.  Bytes/matvec = bands + in/out vectors; achieved GB/s compared
  against HBM peak.  The per-dispatch floor (tunnel latency + XLA launch)
  is separated from the device limit by chaining many dependent matvecs
  inside ONE dispatch (``lax.fori_loop``), which leaves no host round
  trips between iterations.

v5e public peaks (Google Cloud TPU docs / jax-ml.github.io/scaling-book):
197 bf16 TFLOP/s MXU, ~3.95 f32 TFLOP/s VPU (8x128 lanes x 4 ALUs x
~0.94 GHz), 819 GB/s HBM, 16 GB HBM.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

V5E_HBM_GBPS = 819.0
V5E_VPU_F32_GFLOPS = 3950.0
V5E_MXU_BF16_GFLOPS = 197_000.0


def return_map_flops_per_pt(mat, n_points=8192, sorted_chunk=None):
    """XLA cost-analysis FLOPs per Gauss point of the consistent-tangent
    return map (the compiled program's own flop count, not a hand model).

    Run offline to derive the constant embedded in bench.py's ``mfu``
    entry; also exercised by tests to keep the constant honest."""
    if sorted_chunk:
        fn = jax.jit(lambda a, b: mat.tangent_and_stress_sorted(
            a.reshape(-1), b.reshape(-1), chunk=sorted_chunk)[:2])
    else:
        fn = jax.jit(lambda a, b: mat.tangent_and_stress(
            a.reshape(-1), b.reshape(-1))[:2])
    a = jnp.zeros((n_points, 4), jnp.float64)
    cost = fn.lower(a, a).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", 0.0)) / n_points


def _time_reps(fn, inputs):
    for x in inputs[:2]:
        jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(inputs)


def dia_roofline_from_fp(fp, reps=10, chain=100):
    """Roofline entry for the level-0 DIA matvec of an already-built
    ``FusedPlasticityStep`` with ``linear_solver='mg'`` on a lattice mesh.

    Times (a) one matvec per dispatch — the r3 NOTES "~1 ms fixed-cost
    floor" — and (b) ``chain`` dependent matvecs inside one dispatch, so
    the difference attributes the floor to dispatch/tunnel latency vs the
    device.  Band VALUES are synthetic (scaled random); the matvec cost
    depends only on the band structure."""
    from ..parallel.mg import _dia_matvec

    offsets = fp._mg_dia_offsets
    if offsets is None:
        return {"error": "mesh not lattice-structured; no DIA operator"}
    n0 = fp.n_dofs
    nb = len(offsets)
    rng = np.random.default_rng(0)
    # scale so a chained application neither overflows nor denormalizes
    bands = jnp.asarray(
        rng.normal(size=(nb, n0)).astype(np.float32) / (2.0 * nb))
    free_lat = jnp.asarray(~np.asarray(fp.statics["mg"]["mask0_lat"]))

    mv = jax.jit(lambda x: _dia_matvec(bands, offsets, free_lat, x))

    @jax.jit
    def mv_chain(x):
        return jax.lax.fori_loop(
            0, chain, lambda i, v: _dia_matvec(bands, offsets, free_lat, v), x)

    xs = [jnp.asarray(rng.normal(size=n0).astype(np.float32))
          for _ in range(reps)]
    t_single = _time_reps(mv, xs)
    t_chain = _time_reps(mv_chain, xs) / chain

    flops = 2.0 * nb * n0
    mbytes = 4.0 * (nb * n0 + 2 * n0)  # bands read + x read + y write
    return {
        "n_rows": int(n0), "n_bands": int(nb),
        "single_dispatch_ms": round(t_single * 1e3, 3),
        "chained_per_matvec_us": round(t_chain * 1e6, 1),
        "dispatch_overhead_ms": round((t_single - t_chain) * 1e3, 3),
        "bytes_per_matvec": int(mbytes),
        "achieved_gbps_chained": round(mbytes / t_chain / 1e9, 1),
        "hbm_peak_gbps": V5E_HBM_GBPS,
        "pct_hbm_peak_chained": round(100 * mbytes / t_chain / 1e9
                                      / V5E_HBM_GBPS, 1),
        "achieved_gflops_chained": round(flops / t_chain / 1e9, 1),
    }


def return_map_mfu(pts_per_s, flops_lo, flops_hi):
    """MFU entry for the return map against the VPU f32 peak.

    Executed FLOPs per point are data-dependent (the inner Newton is a
    ``lax.while_loop``), so XLA's static cost analysis brackets the truth:
    XLA:CPU counts the loop body ONCE (``flops_lo`` — every point elastic,
    one iteration) while XLA:TPU counts it at the static trip bound
    (``flops_hi`` — every point at max inner iterations).  Real runs sit
    near the low end (most Gauss points stay elastic; plastic ones take
    ~3-8 damped iterations).  NOTE the f32 FMA peak overstates the bound
    for this kernel — it is transcendental-heavy (sin/cos/sqrt/exp count
    as 1 flop each in cost analysis but cost ~8-20 VPU ops), so pct_vpu_peak
    is a conservative floor on hardware utilization."""
    lo = pts_per_s * flops_lo / 1e9
    hi = pts_per_s * flops_hi / 1e9
    return {
        "pts_per_s": round(pts_per_s, 1),
        "flops_per_pt_xla_lo_hi": [round(flops_lo, 1), round(flops_hi, 1)],
        "achieved_gflops_lo_hi": [round(lo, 1), round(hi, 1)],
        "vpu_f32_peak_gflops": V5E_VPU_F32_GFLOPS,
        "pct_vpu_peak_lo_hi": [round(100 * lo / V5E_VPU_F32_GFLOPS, 2),
                               round(100 * hi / V5E_VPU_F32_GFLOPS, 2)],
        "note": ("lo = XLA:CPU cost analysis (while_loop body counted once); "
                 "hi = XLA:TPU (body at static trip bound); transcendentals "
                 "counted as 1 flop each, so %peak is a floor"),
    }
