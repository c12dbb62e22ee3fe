"""Foundation tests: quadrature, elements, mesh, interpolation, assembly, solve.

These cover the substrate the reference delegates to Basix/DOLFINx/PETSc
(SURVEY.md section 2b); oracle style follows the reference test suite:
analytic twins asserted with np.allclose.
"""
import math

import numpy as np
import pytest

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu import solvers
from dolfinx_external_operator_tpu.assembly import DirichletBC, _dof_coordinates
from dolfinx_external_operator_tpu.elements import element


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 6, 8])
def test_quadrature_triangle_exactness(degree):
    p, w = fem.make_quadrature("triangle", degree)
    for a in range(degree + 1):
        for b in range(degree + 1 - a):
            exact = math.factorial(a) * math.factorial(b) / math.factorial(a + b + 2)
            got = float((w * p[:, 0] ** a * p[:, 1] ** b).sum())
            assert abs(got - exact) < 1e-13


@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_quadrature_tet_exactness(degree):
    p, w = fem.make_quadrature("tetrahedron", degree)
    for a in range(degree + 1):
        for b in range(degree + 1 - a):
            for c in range(degree + 1 - a - b):
                exact = (
                    math.factorial(a) * math.factorial(b) * math.factorial(c)
                    / math.factorial(a + b + c + 3)
                )
                got = float((w * p[:, 0] ** a * p[:, 1] ** b * p[:, 2] ** c).sum())
                assert abs(got - exact) < 1e-13


@pytest.mark.parametrize("cell", ["interval", "triangle", "quadrilateral", "tetrahedron"])
@pytest.mark.parametrize("degree", [1, 2])
def test_partition_of_unity(cell, degree):
    el = element("Lagrange", cell, degree)
    pts, _ = fem.make_quadrature(cell, 3)
    phi, dphi = el.tabulate(pts)
    assert np.allclose(phi.sum(1), 1.0)
    assert np.allclose(dphi.sum(1), 0.0, atol=1e-12)


def test_nodal_property():
    for cell in ["interval", "triangle", "quadrilateral", "tetrahedron"]:
        for degree in [1, 2]:
            el = element("Lagrange", cell, degree)
            phi, _ = el.tabulate(el.interpolation_points)
            assert np.allclose(phi, np.eye(el.num_scalar_dofs), atol=1e-12)


def test_mesh_topology_counts():
    mesh = fem.create_unit_square(4, 4)
    assert mesh.num_cells == 32
    assert mesh.num_vertices == 25
    # Euler: V - E + F = 1 for a disk
    assert mesh.num_vertices - mesh.num_edges + mesh.num_cells == 1
    assert len(mesh.exterior_facets) == 16


def test_spatial_integrals_exact():
    mesh = fem.create_unit_square(5, 5)
    dx = fem.Measure("dx", metadata={"quadrature_degree": 3})
    x = fem.SpatialCoordinate(mesh)
    val = float(fem.assemble_scalar((x[0] ** 2 + x[1]) * dx))
    assert abs(val - (1 / 3 + 1 / 2)) < 1e-13

    ds = fem.Measure("ds", domain=mesh, metadata={"quadrature_degree": 3})
    per = float(fem.assemble_scalar(fem.sym.as_expr(1.0) * ds))
    assert abs(per - 4.0) < 1e-13
    # int over boundary of x^2: bottom 1/3 + top 1/3 + left 0 + right 1 = 5/3
    vb = float(fem.assemble_scalar(x[0] ** 2 * ds))
    assert abs(vb - 5 / 3) < 1e-13


def test_facet_normal_divergence_theorem():
    # int_dOmega u . n ds == int_Omega div u dx for u = (x^2, x*y)
    mesh = fem.create_unit_square(4, 4)
    x = fem.SpatialCoordinate(mesh)
    n = fem.FacetNormal(mesh)
    u = fem.as_vector([x[0] ** 2, x[0] * x[1]])
    ds = fem.Measure("ds", metadata={"quadrature_degree": 4})
    dx = fem.Measure("dx", metadata={"quadrature_degree": 4})
    lhs = float(fem.assemble_scalar(fem.dot(u, n) * ds))
    # div u = 2x + x = 3x -> integral = 3/2
    assert abs(lhs - 1.5) < 1e-12


@pytest.mark.parametrize("cell_type", ["triangle", "quadrilateral"])
@pytest.mark.parametrize("degree", [1, 2])
def test_poisson_manufactured(cell_type, degree):
    """P1/P2 Poisson with quadratic manufactured solution: nodal-exact."""
    mesh = fem.create_unit_square(6, 6, cell_type)
    V = fem.functionspace(mesh, ("Lagrange", degree))
    dx = fem.Measure("dx", metadata={"quadrature_degree": 2 * degree + 1})
    v, du = fem.TestFunction(V), fem.TrialFunction(V)
    g = lambda x: x[0] ** 2 + x[1] ** 2
    uh = fem.Function(V)
    f = fem.Constant(-4.0)
    F = fem.inner(fem.grad(uh), fem.grad(v)) * dx - f * v * dx
    J = fem.derivative(F, uh, du)
    bdofs = fem.locate_dofs_geometrical(
        V,
        lambda x: np.isclose(x[0], 0) | np.isclose(x[0], 1) | np.isclose(x[1], 0) | np.isclose(x[1], 1),
    )
    coords = _dof_coordinates(V)
    bc = DirichletBC(bdofs, g(coords[bdofs].T))
    prob = solvers.NonlinearProblem(F, uh, J, bcs=[bc], petsc_options={"snes_atol": 1e-12, "snes_rtol": 1e-12})
    its, conv = prob.solve()
    assert conv and its == 1  # linear problem
    err = np.abs(np.asarray(uh.data) - g(coords.T))
    if degree == 2:
        assert err.max() < 1e-9
    elif cell_type == "triangle":
        assert err.max() < 1e-9  # uniform-mesh superconvergence
    else:
        assert err.max() < 1e-9  # Q1 nodal exactness on rectangles


def test_vector_space_elasticity_patch():
    """Linear elasticity patch test: linear displacement reproduced exactly."""
    mesh = fem.create_unit_square(3, 3)
    V = fem.functionspace(mesh, ("Lagrange", 1, (2,)))
    dx = fem.Measure("dx", metadata={"quadrature_degree": 2})
    v, du = fem.TestFunction(V), fem.TrialFunction(V)
    uh = fem.Function(V)
    eps = lambda w: fem.symmetric(fem.grad(w))
    sigma = lambda w: 2.0 * eps(w) + fem.tr(eps(w)) * fem.Identity(2)
    F = fem.inner(sigma(uh), eps(v)) * dx
    J = fem.derivative(F, uh, du)
    # exact linear field u = (x + 2y, 3x - y) imposed on whole boundary
    g = lambda x: np.stack([x[0] + 2 * x[1], 3 * x[0] - x[1]])
    bdofs_scalar = fem.locate_dofs_geometrical(
        V,
        lambda x: np.isclose(x[0], 0) | np.isclose(x[0], 1) | np.isclose(x[1], 0) | np.isclose(x[1], 1),
    )
    coords = _dof_coordinates(V)
    gv = g(coords[bdofs_scalar].T)  # (2, nb)
    unrolled = np.concatenate([bdofs_scalar * 2, bdofs_scalar * 2 + 1])
    vals = np.concatenate([gv[0], gv[1]])
    bc = DirichletBC(unrolled, vals)
    prob = solvers.NonlinearProblem(F, uh, J, bcs=[bc], petsc_options={"snes_atol": 1e-12, "snes_rtol": 1e-12})
    prob.solve()
    exact = np.zeros(V.num_dofs)
    exact[0::2] = coords[:, 0] + 2 * coords[:, 1]
    exact[1::2] = 3 * coords[:, 0] - coords[:, 1]
    assert np.abs(np.asarray(uh.data) - exact).max() < 1e-10


def test_interpolation_and_probe():
    mesh = fem.create_unit_square(5, 5)
    V = fem.functionspace(mesh, ("Lagrange", 2))
    f = fem.Function(V)
    f.interpolate(lambda x: x[0] ** 2 + 3 * x[1])
    from dolfinx_external_operator_tpu.utils.probes import find_cell_by_point

    pt = np.array([[0.33, 0.47, 0.0]])
    cells, pts = find_cell_by_point(mesh, pt)
    val = f.eval(pts, cells)
    assert abs(float(val[0]) - (0.33**2 + 3 * 0.47)) < 1e-11


def test_facet_normal_divergence_theorem_quads():
    """Same divergence-theorem check on a quadrilateral mesh (bilinear
    geometry, tensor quadrature)."""
    mesh = fem.create_unit_square(4, 4, "quadrilateral")
    x = fem.SpatialCoordinate(mesh)
    n = fem.FacetNormal(mesh)
    u = fem.as_vector([x[0] ** 2, x[0] * x[1]])
    ds = fem.Measure("ds", domain=mesh, metadata={"quadrature_degree": 4})
    lhs = float(fem.assemble_scalar(fem.dot(u, n) * ds))
    assert abs(lhs - 1.5) < 1e-12


def test_unique_external_operators():
    from dolfinx_external_operator_tpu import FEMExternalOperator, unique_external_operators

    mesh = fem.create_unit_square(2, 2)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    u = fem.Function(V)
    Q = fem.functionspace(mesh, fem.quadrature_element(mesh.cell_name(), 1))
    N1 = FEMExternalOperator(u, function_space=Q)
    N2 = FEMExternalOperator(u, function_space=Q)
    uniq = unique_external_operators([N1, N2, N1])
    assert len(uniq) == 1  # same operands/space/derivatives -> one representative
