"""Von Mises plasticity: external-operator vs analytic pure-form twin.

Reference oracle: demo_plasticity_von_mises.py:580-597 (load-displacement
curves overlay with the pure twin demo_plasticity_von_mises_pure_ufl.py)
and the analytic collapse load q_lim = 2/sqrt(3) ln(Re/Ri) sigma_0 ~= 75.7
MPa (demo_plasticity_von_mises.py:542-544).  We tighten the oracle to the
BASELINE.md target: pointwise parity <= 1e-10 at every load step.
"""
import numpy as np
import pytest

from dolfinx_external_operator_tpu.models.von_mises import (
    Q_LIM,
    solve_von_mises,
    solve_von_mises_pure_form,
)

N_STEPS = 10


@pytest.fixture(scope="module")
def solutions():
    ext = solve_von_mises(lc=0.3, num_increments=N_STEPS)
    pure = solve_von_mises_pure_form(lc=0.3, num_increments=N_STEPS)
    return ext, pure


def test_collapse_load_value():
    assert abs(Q_LIM - 2.0 / np.sqrt(3.0) * np.log(1.3) * 250.0) < 1e-12
    assert abs(Q_LIM - 75.738) < 1e-2


def test_external_vs_pure_parity(solutions):
    ext, pure = solutions
    diff = np.abs(ext["results"][:, 0] - pure["results"][:, 0]).max()
    assert diff < 1e-10, f"load-displacement curves differ by {diff}"


def test_newton_iteration_counts(solutions):
    ext, pure = solutions
    # elastic steps take exactly 1 iteration in both implementations
    assert ext["iterations"][1:5] == [1, 1, 1, 1]
    assert pure["iterations"][1:5] == [1, 1, 1, 1]
    # plastic steps converge (quadratically) in a handful of iterations
    assert max(ext["iterations"]) <= 10


def test_plastic_collapse_signature(solutions):
    ext, _ = solutions
    r = ext["results"]
    du = np.diff(r[:, 0])
    dl = np.diff(r[:, 1])
    # compliance grows by >5x from the elastic phase to near collapse
    assert du[-1] / dl[-1] > 5 * du[0] / dl[0]
    # displacement is monotonically increasing
    assert np.all(du > 0)


def test_plastic_strain_accumulates(solutions):
    ext, _ = solutions
    p = np.asarray(ext["p"].data)
    assert p.min() >= 0.0
    assert p.max() > 1e-4  # plasticity actually happened
