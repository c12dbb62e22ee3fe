"""Codim-0/1 submesh external operators.

Mirror of reference ``test/test_codim_external_operator.py``:
- codim-1: an operator on a facet-submesh quadrature space used in a ``ds``
  boundary functional; operand evaluation driven by a caller-built
  (parent_cell, local_facet) entity array (reference ``:57-124``)
- codim-0: subdomain restriction via EntityMap (reference ``:127-183``)
Oracle: scalar-functional parity with symbolic twins.
"""
import numpy as np
import pytest

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu import (
    FEMExternalOperator,
    evaluate_external_operators,
    evaluate_operands,
    replace_external_operators,
)
from dolfinx_external_operator_tpu import sym as S
from dolfinx_external_operator_tpu.mesh import create_submesh, locate_entities


def g_external(derivatives):
    if derivatives == (0,):
        return lambda u: np.cos(np.asarray(u)).reshape(-1)
    if derivatives == (1,):
        return lambda u: np.sin(np.asarray(u)).reshape(-1)
    raise NotImplementedError


def f_external(derivatives):
    if derivatives == (0,):
        return lambda u2: (np.asarray(u2) * np.sqrt(np.asarray(u2))).reshape(-1)
    if derivatives == (1,):
        return lambda u2: (3 * np.asarray(u2)).reshape(-1)
    raise NotImplementedError


@pytest.mark.parametrize("quadrature_degree", range(1, 5))
def test_external_operator_codim_1(quadrature_degree):
    mesh = fem.create_unit_square(5, 5)
    ext_facets = mesh.exterior_facets

    V = fem.functionspace(mesh, ("Lagrange", 1))
    u = fem.Function(V)
    u.interpolate(lambda x: x[0] + x[1])

    submesh, entity_map, _, _ = create_submesh(mesh, mesh.tdim - 1, ext_facets)
    parent_to_sub = np.stack(
        [mesh.facet_cells[ext_facets, 0], mesh.facet_local_index[ext_facets, 0]], axis=1
    ).astype(np.int32)

    Qe = fem.quadrature_element(submesh.cell_name(), degree=quadrature_degree)
    Q = fem.functionspace(submesh, Qe)
    g = FEMExternalOperator(u, function_space=Q, external_function=g_external)

    ds = fem.Measure("ds", domain=mesh, subdomain_data={1: ext_facets}, subdomain_id=1,
                     metadata={"quadrature_degree": quadrature_degree})

    for derivative in (0, 1):
        if derivative == 0:
            J = g * ds
        else:
            # scalar-operand chain rule with direction 1 (ufl.derivative(g, u))
            J = fem.expand_derivatives(fem.derivative(g * ds, u, S.as_expr(1.0)))

        J_replaced, J_ops = replace_external_operators(J)
        operands = evaluate_operands(J_ops, entities=parent_to_sub)
        evaluate_external_operators(J_ops, operands)
        Jh = float(fem.assemble_scalar(J_replaced))

        J_exact = S.cos(u) * ds if derivative == 0 else S.sin(u) * ds
        J_ref = float(fem.assemble_scalar(J_exact))
        np.testing.assert_allclose(Jh, J_ref, rtol=1e-13, atol=1e-14)


@pytest.mark.parametrize("quadrature_degree", range(1, 5))
def test_external_operator_codim_0(quadrature_degree):
    mesh = fem.create_unit_square(5, 5)
    V = fem.functionspace(mesh, ("Lagrange", 1))
    u = fem.Function(V)
    u.interpolate(lambda x: x[0] + x[1])

    cells = locate_entities(mesh, mesh.tdim, lambda x: x[0] <= 0.2 + 1e-10)
    submesh, entity_map, _, _ = create_submesh(mesh, mesh.tdim, cells)

    Qe = fem.quadrature_element(submesh.cell_name(), degree=quadrature_degree)
    Q = fem.functionspace(submesh, Qe)
    f = FEMExternalOperator(u * u, function_space=Q, external_function=f_external)

    dx = fem.Measure("dx", domain=mesh, subdomain_data={1: cells}, subdomain_id=1,
                     metadata={"quadrature_degree": quadrature_degree})

    sub_cells = np.arange(submesh.num_cells, dtype=np.int32)
    submesh_cells_to_parent = entity_map.sub_topology_to_topology(sub_cells, inverse=False)

    for derivative in (0, 1):
        if derivative == 0:
            J = f * dx
        else:
            J = fem.expand_derivatives(fem.derivative(f * dx, u, S.as_expr(1.0)))

        J_replaced, J_ops = replace_external_operators(J)
        operands = evaluate_operands(J_ops, entities=submesh_cells_to_parent)
        evaluate_external_operators(J_ops, operands)
        Jh = float(fem.assemble_scalar(J_replaced))

        # twin: f(u^2) = u^3; df/du via chain rule = 3 u^2 * 2u ... note the
        # reference twin compares ufl.derivative(f, u) (the operator-level
        # derivative contracted with direction 1): dN/d(u^2) * d(u^2)/du|_1
        J_exact = u**3 * dx if derivative == 0 else (3 * u**2) * (2 * u) * dx
        J_ref = float(fem.assemble_scalar(J_exact))
        np.testing.assert_allclose(Jh, J_ref, rtol=1e-13, atol=1e-14)


def test_codim1_mlp_constitutive():
    """BASELINE.json stretch config: a codim-1 boundary external operator
    whose constitutive model is a neural network (1->16->16->1 tanh MLP in
    pure JAX), used in a ``ds`` boundary energy functional with its
    AD-derived derivative operator.

    Oracles (no symbolic twin exists for an MLP):
    1. value parity against a fully INDEPENDENT hand quadrature — exterior
       facet endpoints + 1D Gauss rule + the same MLP applied to the P1
       trace of u (no framework machinery involved);
    2. derivative-functional consistency: the assembled dJ/du[1] functional
       matches a central finite difference of J to O(k^2).
    """
    import jax
    import jax.numpy as jnp

    from dolfinx_external_operator_tpu.quadrature import make_quadrature

    # -- fixed-weight MLP energy density W(u) and its derivative ----------
    rng = np.random.default_rng(42)
    W1 = jnp.asarray(rng.normal(size=(1, 16)) / 4)
    b1 = jnp.asarray(rng.normal(size=16) / 4)
    W2 = jnp.asarray(rng.normal(size=(16, 16)) / 4)
    b2 = jnp.asarray(rng.normal(size=16) / 4)
    W3 = jnp.asarray(rng.normal(size=(16, 1)) / 4)

    def mlp(u):  # scalar -> scalar
        h = jnp.tanh(u[None] @ W1 + b1)
        h = jnp.tanh(h @ W2 + b2)
        return (h @ W3)[0]

    mlp_v = jax.jit(jax.vmap(mlp))
    dmlp_v = jax.jit(jax.vmap(jax.grad(mlp)))

    def w_external(derivatives):
        if derivatives == (0,):
            return lambda u: np.asarray(mlp_v(jnp.asarray(u).reshape(-1))).reshape(-1)
        if derivatives == (1,):
            return lambda u: np.asarray(dmlp_v(jnp.asarray(u).reshape(-1))).reshape(-1)
        raise NotImplementedError

    qdeg = 3
    mesh = fem.create_unit_square(6, 6)
    ext_facets = mesh.exterior_facets
    V = fem.functionspace(mesh, ("Lagrange", 1))
    u = fem.Function(V)
    u.interpolate(lambda x: 0.3 * x[0] + 0.2 * x[1] ** 2)

    submesh, entity_map, _, _ = create_submesh(mesh, mesh.tdim - 1, ext_facets)
    parent_to_sub = np.stack(
        [mesh.facet_cells[ext_facets, 0], mesh.facet_local_index[ext_facets, 0]],
        axis=1).astype(np.int32)
    Q = fem.functionspace(submesh, fem.quadrature_element(submesh.cell_name(), degree=qdeg))
    w_op = FEMExternalOperator(u, function_space=Q, external_function=w_external)
    ds = fem.Measure("ds", domain=mesh, subdomain_data={1: ext_facets},
                     subdomain_id=1, metadata={"quadrature_degree": qdeg})

    def assemble_J(form):
        J_replaced, J_ops = replace_external_operators(form)
        operands = evaluate_operands(J_ops, entities=parent_to_sub)
        evaluate_external_operators(J_ops, operands)
        return float(fem.assemble_scalar(J_replaced))

    Jh = assemble_J(w_op * ds)

    # oracle 1: independent hand quadrature on the facet segments
    qp, qw = make_quadrature("interval", qdeg)   # reference [0, 1]
    verts = mesh.points[:, :2]
    uv = np.asarray(u.data)
    J_hand = 0.0
    for f_idx in ext_facets:
        a, b = mesh.facets[f_idx]
        length = np.linalg.norm(verts[b] - verts[a])
        u_q = uv[a] + (uv[b] - uv[a]) * qp[:, 0]
        J_hand += length * float(np.sum(np.asarray(qw) * np.asarray(
            mlp_v(jnp.asarray(u_q)))))
    np.testing.assert_allclose(Jh, J_hand, rtol=1e-12, atol=1e-13)

    # oracle 2: derivative functional == central FD of J to O(k^2)
    dJ = fem.expand_derivatives(fem.derivative(w_op * ds, u, S.as_expr(1.0)))
    dJh = assemble_J(dJ)
    u0 = np.asarray(u.data).copy()
    fd = []
    for k in (1e-4, 1e-5):
        u.x.array[:] = u0 + k    # direction = constant 1
        Jp = assemble_J(w_op * ds)
        u.x.array[:] = u0 - k
        Jm = assemble_J(w_op * ds)
        u.x.array[:] = u0
        fd.append((Jp - Jm) / (2 * k))
    np.testing.assert_allclose(dJh, fd[1], rtol=1e-8)
    # central-difference error shrinks ~k^2 between the two k values
    assert abs(fd[0] - dJh) > 0.5 * abs(fd[1] - dJh)
