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
