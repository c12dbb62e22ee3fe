"""Expression evaluation at reference points on cells.

TPU-native replacement for ``dolfinx.fem.Expression`` + its C++ ``eval``
(the operand->quadrature interpolation engine of the reference,
``external_operator.py:393-402``): a batched, jitted gather + einsum of
precomputed basis tabulations against cell dof arrays, with per-cell
geometry (inverse Jacobians) for gradients.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import sym
from .compile import CellBatch, Ctx, analyze, coefficient_inputs, eval_expr, geometry_factors
from .mesh import Mesh

__all__ = ["Expression"]

_F = jnp.float64


def _prod(shape):
    n = 1
    for s in shape:
        n *= s
    return n


class Expression:
    """Evaluate a symbolic expression at fixed reference points on cells.

    ``eval(mesh, cells)`` returns an array of shape (n_cells, n_points) for
    scalar expressions or (n_cells, n_points, value_size) otherwise —
    matching the layout the reference demos unpack
    (``C_tang_impl``: ``deps.shape == (num_cells, num_q, 4)``,
    ``demo_plasticity_von_mises.py:343-348``)."""

    def __init__(self, expr: sym.Expr, points: np.ndarray, dtype=None):
        self.expr = sym.as_expr(expr)
        self.points = np.asarray(points, dtype=np.float64)
        self.dtype = dtype or _F
        self.info = analyze(self.expr)
        assert not self.info["arguments"], "Expression cannot contain test/trial functions"
        self.functions = list(self.info["coeff_vals"])
        self.constants = list(self.info["constants"])
        self._cache = {}

    def _compile(self, mesh: Mesh, cells_key, cells):
        batch = CellBatch(mesh, self.points, cells)
        plan = coefficient_inputs(self.info, batch)
        expr = self.expr
        nq = batch.nq
        dphi_g = np.asarray(batch.dphi_g, dtype=_F)
        phi_g = np.asarray(batch.phi_g, dtype=_F)
        needs_x = self.info["needs_x"]
        constants = self.constants
        vshape = expr.shape
        from .assembly import _coeff_values_at_qps  # shared helper

        def elem_fn(coords, coeff_cell_data, const_vals):
            J, Jinv, detJ = geometry_factors(coords, dphi_g)
            cvals = _coeff_values_at_qps(plan, coeff_cell_data, Jinv)
            consts = {c: v for c, v in zip(constants, const_vals)}
            xq = jnp.einsum("qv,vg->qg", phi_g, coords) if needs_x else None
            outs = []
            for q in range(nq):
                ctx = Ctx(
                    coeff_val={f: v[0][q] for f, v in cvals.items()},
                    coeff_grad={f: v[1][q] for f, v in cvals.items() if v[1] is not None},
                    x=None if xq is None else xq[q],
                    const=consts,
                )
                outs.append(eval_expr(expr, ctx))
            return jnp.stack(outs)  # (nq, *shape)

        vmapped = jax.vmap(elem_fn, in_axes=(0, 0, None))
        kinds = [p[1] for p in plan]
        bss = [f.function_space.bs for f in self.functions]
        from .parallel import pad_shard_cells, padded_cell_count

        # cell axis padded + sharded over the default device mesh when
        # installed (operand interpolation then runs SPMD over cells);
        # padded rows repeat cell 0 and are sliced off the output
        nc_b = batch.cells.shape[0]
        nc_pad = padded_cell_count(nc_b)
        static = {
            "coords": pad_shard_cells(jnp.asarray(batch.coords, _F), nc_pad),
            "cells": pad_shard_cells(jnp.asarray(batch.cells), nc_pad),
            "gathers": [
                None if p[1] == "qp" else pad_shard_cells(
                    jnp.asarray(f.function_space.unrolled_dofmap[batch.cells]), nc_pad)
                for f, p in zip(self.functions, plan)
            ],
        }

        def run(static, coeff_datas, const_vals):
            cell_data = []
            for kind, bs, gather, full in zip(kinds, bss, static["gathers"], coeff_datas):
                if kind == "qp":
                    cell_data.append(full.reshape(-1, nq * bs)[static["cells"]])
                else:
                    cell_data.append(full[gather])
            vals = vmapped(static["coords"], cell_data, list(const_vals))  # (nc, nq, *shape)
            vals = vals[:nc_b]
            if vshape == ():
                return vals
            return vals.reshape(vals.shape[0], nq, _prod(vshape))

        return jax.jit(run), static

    def eval(self, mesh: Mesh, cells: np.ndarray | None = None):
        """Evaluate on cells (``cells`` = indices or None for all), or on
        facets when ``cells`` is an (n, 2) array of (parent_cell,
        local_facet) pairs — the codim-1 operand path (reference
        ``test_codim_external_operator.py:75-124``; dolfinx
        ``Expression.eval`` entity convention)."""
        if cells is not None and np.asarray(cells).ndim == 2:
            return self._eval_facets(mesh, np.asarray(cells, dtype=np.int32))
        # content-hash the cell subset: two different subsets must never
        # share a compiled kernel (the statics bake in the gathered cells)
        key = None if cells is None else np.asarray(cells, dtype=np.int64).tobytes()
        hit = self._cache.get(key)
        if hit is None:
            hit = self._compile(mesh, key, cells)
            self._cache[key] = hit
        fn, static = hit
        coeffs = [f.data for f in self.functions]
        consts = [jnp.asarray(c.value, _F) for c in self.constants]
        return fn(static, coeffs, consts)

    def _eval_facets(self, mesh: Mesh, entities: np.ndarray):
        """Facet-point evaluation: self.points live on the FACET reference
        cell; map them into each parent cell via the local-facet geometry."""
        from .elements import Element
        from .mesh import CELL_FACETS, FACET_CELL, REFERENCE_VERTICES

        key = ("facets", entities.tobytes())
        plans = self._cache.get(key)
        if plans is None:
            fcell = FACET_CELL[mesh.cell_type]
            ref_verts = REFERENCE_VERTICES[mesh.cell_type]
            fgeo = Element("Lagrange", fcell, 1)
            phi_f, _ = fgeo.tabulate(self.points)
            plans = []
            for lf in range(len(CELL_FACETS[mesh.cell_type])):
                sel = np.where(entities[:, 1] == lf)[0]
                if sel.size == 0:
                    continue
                V = ref_verts[np.asarray(CELL_FACETS[mesh.cell_type][lf])]
                pts = phi_f @ V  # facet qps in parent ref coords
                sub_expr = Expression(self.expr, pts, dtype=self.dtype)
                plans.append((sel, sub_expr, entities[sel, 0]))
            self._cache[key] = plans
        nq = self.points.shape[0]
        vsize = _prod(self.expr.shape)
        n = entities.shape[0]
        shape = (n, nq) if self.expr.shape == () else (n, nq, vsize)
        out = jnp.zeros(shape, self.dtype)
        for sel, sub_expr, cells in plans:
            vals = sub_expr.eval(mesh, cells)
            out = out.at[jnp.asarray(sel)].set(vals)
        return out
