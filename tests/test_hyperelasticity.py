"""ICNN hyperelasticity vs analytic Isihara twin.

Reference oracle: demo_hyperelasticity.py — every displacement step must
converge (``assert converged``, :597-603) and the NN-vs-UFL displacement
errors are small (:806-820; the ICNN was trained on noisy Isihara data, so
~1e-3 relative error is the expected fidelity, not machine precision).
"""
import numpy as np
import pytest

from dolfinx_external_operator_tpu.models.hyperelasticity import run_comparison
from dolfinx_external_operator_tpu.models.icnn import ICNN


def test_icnn_stress_free_reference():
    import jax.numpy as jnp

    nn = ICNN()
    dP, P = nn.stress_and_tangent(jnp.array([1.0, 0.0, 0.0, 1.0]))
    assert np.abs(np.asarray(P)).max() < 1e-12
    # tangent at identity is symmetric positive SEMI-definite: the
    # antisymmetric (rotation) mode has zero stiffness at the stress-free
    # state — frame indifference
    C = np.asarray(dP).reshape(4, 4)
    assert np.abs(C - C.T).max() < 1e-8
    assert np.linalg.eigvalsh(0.5 * (C + C.T)).min() > -1e-10


def test_icnn_tangent_matches_fd():
    import jax.numpy as jnp

    nn = ICNN()
    F0 = np.array([1.08, 0.03, -0.02, 0.95])
    dP, P0 = nn.stress_and_tangent(jnp.asarray(F0))
    dP = np.asarray(dP).reshape(4, 4)
    eps = 1e-6
    fd = np.zeros((4, 4))
    for j in range(4):
        fp = F0.copy(); fp[j] += eps
        fm = F0.copy(); fm[j] -= eps
        _, Pp = nn.stress_and_tangent(jnp.asarray(fp))
        _, Pm = nn.stress_and_tangent(jnp.asarray(fm))
        fd[:, j] = (np.asarray(Pp) - np.asarray(Pm)) / (2 * eps)
    assert np.abs(dP - fd).max() / np.abs(fd).max() < 1e-7


@pytest.mark.slow
def test_nn_vs_isihara_displacement_error():
    out = run_comparison(lc=0.12, n_steps=5, max_displacement=0.25)
    # all steps converged (asserted inside); errors at the trained-model level
    assert out["rel_linf"] < 0.02
    assert out["l2"] < 2e-3
    assert all(i <= 10 for i in out["nn"]["iterations"])
