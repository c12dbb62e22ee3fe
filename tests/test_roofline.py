"""MFU / roofline accounting (utils/roofline.py, verdict r3 #4).

Keeps the FLOPs-per-point constant embedded in bench.py honest (re-derives
it via XLA cost analysis on this host) and smoke-tests the DIA-matvec
roofline entry on a live lattice operator.
"""
import numpy as np

import jax

import bench
from dolfinx_external_operator_tpu.models.mohr_coulomb import (
    MohrCoulombMaterial, build_slope_problem)
from dolfinx_external_operator_tpu.utils import roofline


def test_return_map_flops_constant_is_honest():
    """bench.RM_FLOPS_PER_PT_LO is the XLA:CPU cost analysis (while_loop
    body counted once); re-derive it on this host and require agreement
    to well within 2x (observed: ~1.0x; chunk-size effects are <1%)."""
    mat = MohrCoulombMaterial()
    f = roofline.return_map_flops_per_pt(mat, n_points=2048, sorted_chunk=2048)
    assert f > 0
    assert bench.RM_FLOPS_PER_PT_LO / 2 < f < bench.RM_FLOPS_PER_PT_LO * 2, (
        f"cost-analysis FLOPs/pt {f:.0f} vs embedded constant "
        f"{bench.RM_FLOPS_PER_PT_LO:.0f} — re-measure with "
        "utils/roofline.py::return_map_flops_per_pt and update bench.py")
    assert bench.RM_FLOPS_PER_PT_HI > bench.RM_FLOPS_PER_PT_LO


def test_return_map_mfu_entry():
    e = roofline.return_map_mfu(1.0e6, bench.RM_FLOPS_PER_PT_LO,
                                bench.RM_FLOPS_PER_PT_HI)
    lo, hi = e["achieved_gflops_lo_hi"]
    assert 0 < lo < hi
    plo, phi = e["pct_vpu_peak_lo_hi"]
    assert 0 < plo < phi < 100


def test_dia_roofline_from_fp_smoke():
    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    mat = MohrCoulombMaterial()
    P = build_slope_problem(Nx=12, Ny=12)
    V, S = P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc = np.concatenate([np.concatenate([s * 2, s * 2 + 1])
                         for s in (bottom, right)])

    def kernel(deps, sn):
        C, st = mat.tangent_stress_point(deps, sn)
        return C, st[0]

    fp = FusedPlasticityStep(P["mesh"], V, S, kernel, bc, linear_solver="mg")
    e = roofline.dia_roofline_from_fp(fp, reps=3, chain=20)
    assert "error" not in e, e
    assert e["n_rows"] == fp.n_dofs
    assert e["chained_per_matvec_us"] > 0
    assert e["achieved_gbps_chained"] > 0
    # chaining must not be SLOWER than dispatch-per-matvec
    assert e["chained_per_matvec_us"] <= e["single_dispatch_ms"] * 1e3 * 1.5
