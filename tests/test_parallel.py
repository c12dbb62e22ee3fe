"""Multi-device (shard_map) execution: the mpirun-CI analog.

The reference CI validates every test serially and under ``mpirun -n 3``
(.github/workflows/build-and-test.yml:44-46).  Here the cell axis is sharded
over a virtual 8-device CPU mesh (conftest.py) and results must match the
single-device run to machine precision with identical Newton counts.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dolfinx_external_operator_tpu import locate_dofs_geometrical
from dolfinx_external_operator_tpu.models.mohr_coulomb import (
    build_slope_problem,
    solve_slope_stability,
)
from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep, make_device_mesh


def _fused(device_mesh=None, Nx=4, Ny=4):
    P = build_slope_problem(Nx=Nx, Ny=Ny)
    mat, mesh, V, S = P["material"], P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc_dofs = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C_tang, state = mat.tangent_stress_point(deps, sn)
        return C_tang, state[0]

    return FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, device_mesh=device_mesh), P


@pytest.fixture(scope="module")
def single_run():
    fp, P = _fused(None)
    Du, sig = fp.zero_state()
    u = jnp.zeros(fp.n_dofs)
    its = []
    for load in np.linspace(2, 14, 3):
        Du, sig, norm, it, cg = fp.run_step(Du, sig, load)
        u = u + Du
        its.append(int(it))
    return u, sig, its, P


def test_fused_matches_general_path(single_run):
    u_fused, sig, its_fused, _ = single_run
    gen = solve_slope_stability(Nx=4, Ny=4, load_steps=np.linspace(2, 14, 3))
    u_gen = np.asarray(gen["u"].data)
    assert np.abs(np.asarray(u_fused) - u_gen).max() < 1e-12
    assert its_fused == gen["iterations"]


@pytest.mark.parametrize("n_dev", [3, 8])
def test_sharded_matches_single_device(single_run, n_dev):
    u1, sig1, its1, _ = single_run
    assert len(jax.devices()) >= n_dev, "conftest must force 8 virtual cpu devices"
    dm = make_device_mesh(n_dev)
    fp, _ = _fused(dm)
    Du, sig = fp.zero_state()
    u = jnp.zeros(fp.n_dofs)
    its = []
    for load in np.linspace(2, 14, 3):
        Du, sig, norm, it, cg = fp.run_step(Du, sig, load)
        u = u + Du
        its.append(int(it))
    assert np.abs(np.asarray(u) - np.asarray(u1)).max() < 1e-12
    assert its == its1
    assert "cells" in str(sig.sharding.spec)


def test_dryrun_entry_points():
    import sys

    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(out[3]) >= 1
    ge.dryrun_multichip(8)


def test_host_driven_newton_matches_fused():
    """run_step_host (one Newton iteration per device execution, E-W CG
    forcing) reaches the same converged state as the fused driver."""
    import jax.numpy as jnp

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import build_slope_problem
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    P = build_slope_problem(Nx=4, Ny=4)
    mat, mesh, V, S = P["material"], P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc_dofs = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C_tang, state = mat.tangent_stress_point(deps, sn)
        return C_tang, state[0]

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver="cg")
    results = {}
    for name, step in (("fused", fp.run_step), ("host", fp.run_step_host)):
        Du, sig = fp.zero_state()
        for load in (2.0, 8.0):
            Du, sig, norm, its, cg = step(Du, sig, load)
        results[name] = (np.asarray(Du), float(norm))
        assert float(norm) < 1e-7, (name, float(norm))

    du_f, du_h = results["fused"][0], results["host"][0]
    err = np.abs(du_f - du_h).max() / max(np.abs(du_f).max(), 1e-30)
    assert err < 1e-6, err


@pytest.mark.parametrize("solver", ["cg", "elastic"])
def test_run_schedule_matches_run_step(solver):
    """run_schedule (whole load schedule as one lax.scan execution) commits
    state between steps exactly like the per-step run_step driver: identical
    iterates, Newton counts, and history."""
    from dolfinx_external_operator_tpu.models.mohr_coulomb import build_slope_problem

    P = build_slope_problem(Nx=4, Ny=4)
    mat, mesh, V, S = P["material"], P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc_dofs = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C_tang, state = mat.tangent_stress_point(deps, sn)
        return C_tang, state[0]

    loads = np.linspace(2, 14, 3)

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver=solver)
    Du, sig = fp.zero_state()
    its_ref, cg_ref = [], []
    for load in loads:
        Du, sig, norm, it, cg = fp.run_step(Du, sig, load)
        its_ref.append(int(it))
        cg_ref.append(int(cg))

    fp2 = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver=solver)
    Du_s, sig_s, norms, its, cgs = fp2.run_schedule(loads)

    # cg path is bitwise-identical; the elastic carry's scan body fuses
    # slightly differently, producing ULP-level (~1e-19) differences.
    assert np.abs(np.asarray(Du_s) - np.asarray(Du)).max() < 1e-16
    assert np.abs(np.asarray(sig_s) - np.asarray(sig)).max() < 1e-14
    assert [int(x) for x in its] == its_ref
    if solver == "cg":
        assert [int(x) for x in cgs] == cg_ref
    else:  # ULP-level iterate shifts can move a CG exit by a few iterations
        # (observed: 3 on the CPU backend after the round-5 closed-form trig
        # change shifted iterates at the last ULP; Newton counts and iterates
        # above remain the real parity claim)
        assert all(abs(int(a) - b) <= 4 for a, b in zip(cgs, cg_ref))
    assert abs(float(norms[-1]) - float(norm)) <= 1e-12 * max(1.0, float(norm))
