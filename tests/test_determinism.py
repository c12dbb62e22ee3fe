"""Deterministic-assembly invariants (the SURVEY §5 "race detection" analog).

The reference relies on MPI-rank-deterministic PETSc assembly; the TPU-native
analog is that scatter-adds (``segment_sum`` / ``.at[].add``) are
deterministic by construction on XLA.  These tests pin that down as an
invariant: bit-identical results across (a) repeated evaluations, (b)
freshly rebuilt mesh/space/form objects, and (c) the fused SPMD step.
"""
import numpy as np

import dolfinx_external_operator_tpu as fem


def _build_heat(n=6):
    mesh = fem.create_unit_square(n, n)
    V = fem.functionspace(mesh, ("Lagrange", 2))
    u = fem.Function(V)
    u.interpolate(lambda x: 1.0 + x[0] * x[1] + np.sin(x[0]))
    v, uh = fem.TestFunction(V), fem.TrialFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 4, "quadrature_scheme": "default"})
    F = fem.inner((1.0 + u * u) * fem.grad(u), fem.grad(v)) * dx
    J = fem.derivative(F, u, uh)
    return F, J


def test_vector_matrix_bitwise_repeatable():
    F, J = _build_heat()
    b1 = np.asarray(fem.assemble_vector(F))
    b2 = np.asarray(fem.assemble_vector(F))
    assert np.array_equal(b1, b2), "vector assembly must be bitwise deterministic"
    A1 = np.asarray(fem.assemble_matrix(J))
    A2 = np.asarray(fem.assemble_matrix(J))
    assert np.array_equal(A1, A2), "matrix assembly must be bitwise deterministic"


def test_bitwise_across_rebuilt_objects():
    """Fresh mesh/space/form objects (fresh compiled kernels) produce the
    bit-identical global vector: no dependence on object identity, dict
    ordering, or scatter scheduling."""
    b1 = np.asarray(fem.assemble_vector(_build_heat()[0]))
    b2 = np.asarray(fem.assemble_vector(_build_heat()[0]))
    assert np.array_equal(b1, b2)


def test_ebe_action_bitwise_repeatable():
    F, J = _build_heat()
    Jc = fem.create_form(J)
    n = Jc.test_space.num_dofs
    x = np.random.default_rng(7).normal(size=n)
    y1 = np.asarray(Jc.action(x))
    y2 = np.asarray(Jc.action(x))
    assert np.array_equal(y1, y2)


def test_fused_step_bitwise_repeatable():
    """The fused SPMD plasticity step (residual + CG + Newton while_loop)
    is run-to-run deterministic."""
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

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver="dense")
    outs = []
    for _ in range(2):
        Du, sig = fp.zero_state()
        Du, sig, norm, its, cg = fp.run_step(Du, sig, 8.0)
        outs.append((np.asarray(Du), np.asarray(sig)))
    assert np.array_equal(outs[0][0], outs[1][0])
    assert np.array_equal(outs[0][1], outs[1][1])
