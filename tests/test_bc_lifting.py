"""Round-2 regression tests.

1. ``apply_lifting``/``set_bc`` sign parity with DOLFINx semantics
   (reference shim ``petsc/petsc.py:64-68``): solving J*delta = -b with the
   documented pattern must produce the correct nonzero-Dirichlet solution.
2. ``Expression.eval`` cell-subset cache keys must be content-based: two
   subsets with equal (first, length, sum) must not share compiled statics.
"""
import numpy as np

import jax.numpy as jnp

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu.assembly import (
    DirichletBC,
    _apply_bc_matrix,
    apply_lifting,
    create_form,
    set_bc,
)
from dolfinx_external_operator_tpu.expression import Expression


def _laplace_setup():
    mesh = fem.create_unit_square(8, 8)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    dx = fem.Measure("dx", metadata={"quadrature_degree": 2})
    v, du = fem.TestFunction(V), fem.TrialFunction(V)
    uh = fem.Function(V)
    F = fem.inner(fem.grad(uh), fem.grad(v)) * dx
    J = fem.derivative(F, uh, du)
    bdofs = fem.locate_dofs_geometrical(
        V,
        lambda x: np.isclose(x[0], 0) | np.isclose(x[0], 1) | np.isclose(x[1], 0) | np.isclose(x[1], 1),
    )
    return mesh, V, uh, F, J, bdofs


def test_apply_lifting_sign_nonzero_dirichlet():
    """Laplace with u = 1 on all walls through the exported
    apply_lifting/set_bc pattern (scale=-1, solve J*delta = -b): every
    interior value must be +1 (the ADVICE r1 regression: the old sign gave -1).
    """
    mesh, V, uh, F, J, bdofs = _laplace_setup()
    bc = DirichletBC(bdofs, np.ones(len(bdofs)))

    b = create_form(F).vector()  # residual at u = 0
    x0 = jnp.asarray(uh.data)
    b = apply_lifting(b, J, [bc], x0, scale=-1.0)
    b = set_bc(b, [bc], x0, scale=-1.0)

    A = _apply_bc_matrix(create_form(J).matrix(), [bc])
    delta = np.linalg.solve(np.asarray(A), -np.asarray(b))
    u = np.asarray(uh.data) + delta
    assert np.abs(u - 1.0).max() < 1e-10


def test_apply_lifting_sign_linear_profile():
    """u = x on walls: lifted solve must reproduce the linear harmonic
    profile u(x, y) = x, nodally exact for P1 on this mesh."""
    mesh, V, uh, F, J, bdofs = _laplace_setup()
    from dolfinx_external_operator_tpu.assembly import _dof_coordinates

    coords = _dof_coordinates(V)
    bc = DirichletBC(bdofs, coords[bdofs, 0])

    b = create_form(F).vector()
    x0 = jnp.asarray(uh.data)
    b = apply_lifting(b, J, [bc], x0, scale=-1.0)
    b = set_bc(b, [bc], x0, scale=-1.0)
    A = _apply_bc_matrix(create_form(J).matrix(), [bc])
    u = np.asarray(uh.data) + np.linalg.solve(np.asarray(A), -np.asarray(b))
    assert np.abs(u - coords[:, 0]).max() < 1e-10


def test_direct_residual_shim_applies_bcs():
    """petsc.assemble_residual_with_callback's direct path must return the
    BC-adjusted residual it documents (ADVICE r1, low)."""
    from dolfinx_external_operator_tpu import petsc

    mesh, V, uh, F, J, bdofs = _laplace_setup()
    bc = DirichletBC(bdofs, np.ones(len(bdofs)))
    calls = []
    b = petsc.assemble_residual_with_callback(uh, F, J, [bc], lambda: calls.append(1), ())
    assert calls == [1]
    b = np.asarray(b)
    # BC rows must carry -(g - x0) = -1, not the raw (zero) residual
    assert np.allclose(b[bdofs], -1.0)


def test_expression_cell_cache_no_collision():
    """Two cell subsets with identical (first, len, sum) must evaluate
    independently (r1 VERDICT weak #5: tuple key collided)."""
    mesh = fem.create_unit_square(4, 4)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    f = fem.Function(V)
    from dolfinx_external_operator_tpu.assembly import _dof_coordinates

    coords = _dof_coordinates(V)
    f.x.array[:] = coords[:, 0] + 10.0 * coords[:, 1]
    pts = np.array([[1.0 / 3.0, 1.0 / 3.0]])
    expr = Expression(f, pts)

    cells_a = np.array([0, 5, 7], dtype=np.int32)
    cells_b = np.array([0, 4, 8], dtype=np.int32)  # same first/len/sum
    va = np.asarray(expr.eval(mesh, cells_a))
    vb = np.asarray(expr.eval(mesh, cells_b))
    ref_a = np.asarray(Expression(f, pts).eval(mesh))[cells_a]
    ref_b = np.asarray(Expression(f, pts).eval(mesh))[cells_b]
    assert np.allclose(va, ref_a, atol=1e-13)
    assert np.allclose(vb, ref_b, atol=1e-13)
    assert not np.allclose(va, vb)


def test_quadrature_cache_immutable():
    """Cached quadrature arrays are read-only (ADVICE r1, low)."""
    import pytest

    p, w = fem.make_quadrature("triangle", 2)
    with pytest.raises(ValueError):
        p[0, 0] = 99.0
    with pytest.raises(ValueError):
        w[0] = 99.0
    p2, w2 = fem.make_quadrature("triangle", 2)
    assert np.allclose(w2.sum(), 0.5)
