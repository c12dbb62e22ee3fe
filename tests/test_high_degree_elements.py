"""Arbitrary-degree Lagrange elements + Q2 hexahedra.

The reference gets degree-n elements from Basix (its mixed oracle uses P4,
``test_external_operators_evaluation.py:230-306``; nested tests run
quadrature degree 8, ``test_nested_ex_op.py:96-103``).  These tests verify
the TPU-native nodal construction: interpolation exactness, edge-dof
orientation across shared edges (via Laplace exactness for polynomial
solutions — a wrong orientation breaks cross-cell coupling), face dofs
(tet P3 / hex Q2), and topological BC location at high degree.
"""
import numpy as np
import pytest

import jax

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu import solvers


def _dof_x3(V):
    coords = fem.assembly._dof_coordinates(V)
    x3 = np.zeros((3, coords.shape[0]))
    x3[: coords.shape[1]] = coords.T
    return x3


@pytest.mark.parametrize("cell", ["triangle", "quadrilateral"])
@pytest.mark.parametrize("deg", [3, 4, 5])
def test_interpolation_exactness_2d(cell, deg):
    mesh = fem.create_unit_square(3, 3, cell)
    V = fem.functionspace(mesh, ("Lagrange", deg))
    u = fem.Function(V)
    f = lambda x: x[0] ** 3 + 2 * x[1] ** 3 + x[0] * x[1] ** 2
    u.interpolate(f)
    assert np.abs(np.asarray(u.data) - f(_dof_x3(V))).max() < 1e-12


@pytest.mark.parametrize("cell,deg", [("tetrahedron", 3), ("hexahedron", 2),
                                      ("tetrahedron", 4), ("hexahedron", 3),
                                      ("tetrahedron", 5)])
def test_interpolation_exactness_3d(cell, deg):
    """Degrees >= 4 (tet) / >= 3 (hex) exercise multi-dof face-interior
    lattices with the canonical orientation permutations."""
    mesh = fem.create_unit_cube(2, 2, 2, cell)
    V = fem.functionspace(mesh, ("Lagrange", deg))
    u = fem.Function(V)
    f = lambda x: x[0] * x[1] + x[2] ** 2
    u.interpolate(f)
    assert np.abs(np.asarray(u.data) - f(_dof_x3(V))).max() < 1e-12


@pytest.mark.parametrize("cell,deg", [("tetrahedron", 4), ("hexahedron", 3)])
def test_face_dof_count_and_sharing(cell, deg):
    """Shared-face dofs are counted once: total dofs follow the Euler
    entity sum (a wrong face permutation cannot break this, but duplicated
    or missing face dofs would)."""
    mesh = fem.create_unit_cube(2, 2, 2, cell)
    V = fem.functionspace(mesh, ("Lagrange", deg))
    counts = V.element.entity_counts
    expected = (mesh.num_vertices + mesh.num_edges * counts["edge"]
                + mesh.num_facets * counts["face"] + mesh.num_cells * counts["cell"])
    assert V.num_dofs == expected
    # each global face dof is referenced by exactly the face's incident cells
    dm = V.dofmap
    base = V._entity_offsets["face"]
    nfd = counts["face"]
    face_dofs = dm[(dm >= base) & (dm < base + mesh.num_facets * nfd)]
    counts_per_dof = np.bincount(face_dofs - base, minlength=mesh.num_facets * nfd)
    per_face = counts_per_dof.reshape(mesh.num_facets, nfd)
    # interior faces are seen by 2 cells, boundary faces by 1 — uniformly
    # across each face's lattice (a permutation bug would skew this)
    assert set(np.unique(per_face).tolist()) <= {1, 2}
    assert (per_face == per_face[:, :1]).all()


@pytest.mark.parametrize("cell", ["triangle", "quadrilateral"])
@pytest.mark.parametrize("deg", [3, 4])
def test_laplace_exactness_2d(cell, deg):
    """Harmonic cubic solved to machine precision: requires consistent
    edge-dof orientation between neighboring cells."""
    mesh = fem.create_unit_square(3, 3, cell)
    V = fem.functionspace(mesh, ("Lagrange", deg))
    u = fem.Function(V)
    ex = lambda x: x[0] ** 3 - 3 * x[0] * x[1] ** 2
    v, uh = fem.TestFunction(V), fem.TrialFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 2 * deg, "quadrature_scheme": "default"})
    F = fem.inner(fem.grad(u), fem.grad(v)) * dx
    J = fem.derivative(F, u, uh)
    bdofs = fem.locate_dofs_geometrical(
        V, lambda X: np.isclose(X[0], 0) | np.isclose(X[0], 1) | np.isclose(X[1], 0) | np.isclose(X[1], 1))
    x3 = _dof_x3(V)
    bc = fem.DirichletBC(bdofs, ex(x3)[bdofs])
    its, conv = solvers.NonlinearProblem(F, u, J, bcs=[bc]).solve()
    assert conv
    assert np.abs(np.asarray(u.data) - ex(x3)).max() < 1e-8


@pytest.mark.parametrize("cell,deg", [("tetrahedron", 3), ("hexahedron", 2),
                                      ("tetrahedron", 4), ("hexahedron", 3)])
def test_laplace_exactness_3d(cell, deg):
    """Face-dof assembly correctness.  The degree >= 4 / >= 3 cases solve a
    polynomial-exact Laplace problem whose accuracy REQUIRES consistent
    face-interior dof orientation between the two incident cells (the
    Basix-permutation capability the reference relies on,
    ``external_operator.py:33-45``)."""
    mesh = fem.create_unit_cube(2, 2, 2, cell)
    V = fem.functionspace(mesh, ("Lagrange", deg))
    u = fem.Function(V)
    ex = lambda x: x[0] ** 2 - x[2] ** 2 + x[0] * x[1]
    v, uh = fem.TestFunction(V), fem.TrialFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 2 * deg, "quadrature_scheme": "default"})
    F = fem.inner(fem.grad(u), fem.grad(v)) * dx
    J = fem.derivative(F, u, uh)
    x3 = _dof_x3(V)
    bdofs = fem.locate_dofs_geometrical(
        V, lambda X: np.isclose(X[0], 0) | np.isclose(X[0], 1) | np.isclose(X[1], 0)
        | np.isclose(X[1], 1) | np.isclose(X[2], 0) | np.isclose(X[2], 1))
    bc = fem.DirichletBC(bdofs, ex(x3)[bdofs])
    its, conv = solvers.NonlinearProblem(F, u, J, bcs=[bc]).solve()
    assert conv
    assert np.abs(np.asarray(u.data) - ex(x3)).max() < 1e-8


def test_locate_dofs_topological_high_degree():
    mesh = fem.create_unit_square(3, 3)
    V = fem.functionspace(mesh, ("Lagrange", 4))
    bfacets = fem.locate_entities_boundary(mesh, lambda X: np.isclose(X[0], 0.0))
    d_top = fem.locate_dofs_topological(V, 1, bfacets)
    d_geo = fem.locate_dofs_geometrical(V, lambda X: np.isclose(X[0], 0.0))
    assert set(d_top.tolist()) == set(d_geo.tolist())
    # 3 facets x P4: 4 vertices + 3 edges x 3 interior dofs = 13
    assert len(d_top) == 13


def test_locate_dofs_topological_hex_q2_face():
    mesh = fem.create_unit_cube(2, 2, 2, "hexahedron")
    V = fem.functionspace(mesh, ("Lagrange", 2))
    bfacets = fem.locate_entities_boundary(mesh, lambda X: np.isclose(X[2], 0.0))
    d_top = fem.locate_dofs_topological(V, 2, bfacets)
    d_geo = fem.locate_dofs_geometrical(V, lambda X: np.isclose(X[2], 0.0))
    assert set(d_top.tolist()) == set(d_geo.tolist())
    assert len(d_top) == 25  # 5x5 Q2 trace grid


def test_external_operator_on_p4_operand():
    """External operator whose operand lives in a P4 space: the operand
    interpolation path (Expression eval) at high degree."""
    import jax.numpy as jnp

    from dolfinx_external_operator_tpu import (
        FEMExternalOperator, evaluate_external_operators, evaluate_operands,
        replace_external_operators)

    mesh = fem.create_unit_square(3, 3)
    V = fem.functionspace(mesh, ("Lagrange", 4))
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), degree=8))
    T = fem.Function(V)
    T.interpolate(lambda x: x[0] ** 4 + x[1] ** 3)
    N = FEMExternalOperator(T, function_space=Q)
    N.external_function = lambda d: {
        (0,): lambda t: (jnp.asarray(t) ** 2).reshape(-1),
        (1,): lambda t: (2.0 * jnp.asarray(t)).reshape(-1),
    }[d]
    v = fem.TestFunction(V)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 8, "quadrature_scheme": "default"})
    F = N * v * dx
    F_r, ops = replace_external_operators(F)
    operands = evaluate_operands(ops)
    evaluate_external_operators(ops, operands)
    b = fem.assemble_vector(F_r)
    F_tw = T**2 * v * dx
    b_tw = fem.assemble_vector(F_tw)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_tw), rtol=0, atol=1e-12)


def test_high_order_3d_face_elements_construct():
    """tet P4+ / hex Q3+ (multi-dof faces) construct with the expected
    entity layout — the former NotImplementedError gap is closed."""
    e = fem.element("Lagrange", "tetrahedron", 4)
    assert e.entity_counts["face"] == 3 and e.num_scalar_dofs == 35
    e = fem.element("Lagrange", "hexahedron", 3)
    assert e.entity_counts["face"] == 4 and e.num_scalar_dofs == 64
