"""Taylor consistency test for the Mohr-Coulomb external operator.

Reference oracle (demo_plasticity_mohr_coulomb.py:1202-1235): zeroth
remainder converges at order ~1 and first remainder at order ~2 in the
plastic phase; in the elastic phase the first remainder sits at machine
precision (constant Jacobian).
"""
import numpy as np
import pytest

from dolfinx_external_operator_tpu import evaluate_external_operators, evaluate_operands
from dolfinx_external_operator_tpu.models.mohr_coulomb import build_slope_problem
from dolfinx_external_operator_tpu.utils.taylor import convergence_rates, taylor_test


@pytest.fixture(scope="module")
def problem_state():
    P = build_slope_problem(Nx=4, Ny=4)
    Du, sigma, sigma_n, q = P["Du"], P["sigma"], P["sigma_n"], P["q"]
    V = P["V"]

    def refresh():
        evaluated = evaluate_operands(P["F_ops"])
        ((_, sigma_new),) = evaluate_external_operators(P["J_ops"], evaluated)
        sigma.ref_coefficient.x.array[:] = sigma_new

    # load progressively into the plastic regime (yield starts ~ load 8 on
    # this coarse mesh; the reference reaches its plastic state analogously,
    # :1122-1138)
    Du.x.array[:] = np.full(V.num_dofs, 1e-8)
    refresh()
    Du0_elastic = None
    for load in (2.0, 8.0, 14.0):
        q.value = np.array([0.0, -load])
        P["problem"].solve()
        P["u"].x.axpy(1.0, Du.x)
        P["sigma_n"].x.array[:] = sigma.ref_coefficient.data
        if Du0_elastic is None:
            Du0_elastic = np.asarray(Du.data).copy()  # small increment, f < 0
    assert float(P["stats"]["max_f"]) > 1.0  # genuinely yielded final state
    sigma_n0 = np.asarray(P["sigma_n"].data).copy()
    Du0_plastic = np.asarray(Du.data).copy()
    return P, refresh, Du0_elastic, Du0_plastic, sigma_n0


def test_taylor_elastic(problem_state):
    P, refresh, Du0_e, Du0_p, sigma_n0 = problem_state
    Du, sigma_n = P["Du"], P["sigma_n"]
    Du.x.array = Du0_e
    sigma_n.x.array[:] = np.zeros_like(np.asarray(sigma_n.data))
    k, r0, r1 = taylor_test(Du, P["F_replaced"], P["J_replaced"], refresh, P["bcs"])
    rate0 = convergence_rates(k, r0)
    assert 0.9 < rate0 < 1.1, (rate0, r0)
    # elastic: Jacobian is exact and constant -> r1 at machine precision
    assert r1.max() < 1e-10 * max(r0.max(), 1.0), (r0, r1)


def test_taylor_plastic(problem_state):
    P, refresh, Du0_e, Du0_p, sigma_n0 = problem_state
    Du, sigma_n = P["Du"], P["sigma_n"]
    Du.x.array = Du0_p
    sigma_n.x.array[:] = sigma_n0  # committed plastic stress state
    k, r0, r1 = taylor_test(Du, P["F_replaced"], P["J_replaced"], refresh, P["bcs"])
    rate0 = convergence_rates(k, r0)
    rate1 = convergence_rates(k, r1, skip=1)
    assert 0.9 < rate0 < 1.1, (rate0, r0)
    assert rate1 > 1.8, (rate1, r1)
