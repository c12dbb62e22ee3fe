"""Form assembly: jitted quadrature-loop kernels + global scatter-add.

TPU-native replacement for the DOLFINx C++ assemblers
(``assemble_vector/assemble_matrix/assemble_scalar``, consumed by the
reference at ``petsc/petsc.py:64-68`` and in every demo/test).  Each integral
is traced once into a jitted JAX function: per-cell element tensors are
computed with unrolled quadrature loops (static shapes -> XLA fuses the whole
chain), then scattered into the global vector with ``segment_sum`` or into a
dense matrix with ``.at[].add`` (sparse/Pallas paths live in ``ops/``).

Dirichlet BCs use symmetric elimination with lifting, reproducing the
``apply_lifting`` + ``set_bc`` semantics of the reference SNES shim
(``petsc/petsc.py:55-68``): residual rows at constrained dofs become
``x - g`` and Jacobian rows/cols become identity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import sym
from .compile import (
    CellBatch,
    Ctx,
    analyze,
    coefficient_inputs,
    eval_expr,
    geometry_factors,
)
from .elements import Element
from .mesh import CELL_FACETS, FACET_CELL, REFERENCE_VERTICES, Mesh
from .quadrature import make_quadrature

__all__ = [
    "assemble_scalar", "assemble_vector", "assemble_matrix",
    "DirichletBC", "dirichletbc", "locate_dofs_topological", "locate_dofs_geometrical",
    "apply_lifting", "set_bc", "create_form", "form",
]

_F = jnp.float64


def _prod(shape):
    n = 1
    for s in shape:
        n *= s
    return n


# ----------------------------------------------------------------------
# Kernel construction for one integral on one cell batch
# ----------------------------------------------------------------------

def _basis_arrays(space, tab, Jinv):
    """Blocked basis values/gradients for all element dofs of one cell.

    tab = (phi (nq, nb), dphi (nq, nb, tdim)) — or a list of per-sub tabs
    for mixed spaces.  Jinv (nq, tdim, gdim).
    Returns tv (nk, nq, *vs), tg (nk, nq, *vs, gdim) with k = i*bs + comp
    (mixed: sub-space blocks concatenated along k, values embedded in the
    flattened mixed vector shape)."""
    if space.num_sub_spaces > 0:
        vs_total = space.value_shape[0]
        g = Jinv.shape[-1]
        tvs, tgs = [], []
        off = 0
        for i in range(space.num_sub_spaces):
            sub = space.sub(i)
            tv_s, tg_s = _basis_arrays(sub, tab[i], Jinv)
            nk, nq = tv_s.shape[0], tv_s.shape[1]
            bs_s = sub.bs
            tv_flat = tv_s.reshape(nk, nq, bs_s)
            tg_flat = tg_s.reshape(nk, nq, bs_s, g)
            tv_pad = jnp.zeros((nk, nq, vs_total), _F).at[:, :, off: off + bs_s].set(tv_flat)
            tg_pad = jnp.zeros((nk, nq, vs_total, g), _F).at[:, :, off: off + bs_s, :].set(tg_flat)
            tvs.append(tv_pad)
            tgs.append(tg_pad)
            off += bs_s
        return jnp.concatenate(tvs, axis=0), jnp.concatenate(tgs, axis=0)
    phi, dphi = tab
    phi = jnp.asarray(phi, _F)
    dphi = jnp.asarray(dphi, _F)
    bs = space.bs
    vshape = tuple(space.value_shape)
    nq, nb = phi.shape
    gphys = jnp.einsum("qbd,qdg->qbg", dphi, Jinv)  # (nq, nb, g)
    eye = jnp.eye(bs, dtype=_F)
    tv = jnp.einsum("qb,ck->bcqk", phi, eye)  # (nb, bs, nq, bs)
    tg = jnp.einsum("qbg,ck->bcqkg", gphys, eye)
    g = gphys.shape[-1]
    tv = tv.reshape(nb * bs, nq, *vshape) if vshape else tv.reshape(nb * bs, nq)
    tg = tg.reshape(nb * bs, nq, *(vshape + (g,)))
    return tv, tg


def _coeff_values_at_qps(plan, coeff_cell_data, Jinv):
    """Evaluate coefficients at all qps of one cell.

    Returns dict f -> (vals (nq, *shape), grads (nq, *shape, g) | None)."""
    out = {}
    for (f, kind, static), data in zip(plan, coeff_cell_data):
        vshape = tuple(f.function_space.value_shape)
        if kind == "tab_mixed":
            tabs, subs, needs_grad = static
            g = Jinv.shape[-1]
            off = 0
            vals_parts, grads_parts = [], []
            for (phi, dphi), (nb, bs) in zip(tabs, subs):
                d2 = data[off: off + nb * bs].reshape(nb, bs)
                off += nb * bs
                vals_parts.append(jnp.einsum("qb,bk->qk", jnp.asarray(phi, _F), d2))
                if needs_grad:
                    gp = jnp.einsum("qbd,qdg->qbg", jnp.asarray(dphi, _F), Jinv)
                    grads_parts.append(jnp.einsum("qbg,bk->qkg", gp, d2))
            vals = jnp.concatenate(vals_parts, axis=1)  # (nq, vs_total)
            grads = jnp.concatenate(grads_parts, axis=1) if needs_grad else None
            out[f] = (vals, grads)
            continue
        if kind == "qp":
            nq_bs = data.shape[0]
            bs = f.function_space.bs
            nq = nq_bs // bs
            vals = data.reshape(nq, *vshape) if vshape else data.reshape(nq)
            out[f] = (vals, None)
        else:
            phi, dphi, needs_grad = static
            bs = f.function_space.bs
            nb = phi.shape[1]
            d2 = data.reshape(nb, bs)
            vals = jnp.einsum("qb,bk->qk", jnp.asarray(phi, _F), d2)
            nq = phi.shape[0]
            vals = vals.reshape(nq, *vshape) if vshape else vals.reshape(nq)
            grads = None
            if needs_grad:
                gphys = jnp.einsum("qbd,qdg->qbg", jnp.asarray(dphi, _F), Jinv)
                grads = jnp.einsum("qbg,bk->qkg", gphys, d2)
                g = Jinv.shape[-1]
                grads = grads.reshape(nq, *(vshape + (g,)))
            out[f] = (vals, grads)
    return out


class _IntegralKernel:
    """A compiled integral: evaluates global contribution on a cell batch."""

    def __init__(self, integral: sym.Integral, rank: int, mesh: Mesh):
        self.integrand = integral.integrand
        self.measure = integral.measure
        self.rank = rank
        self.mesh = mesh
        self.info = analyze(self.integrand)
        self.functions = list(self.info["coeff_vals"])
        self.constants = list(self.info["constants"])
        self.test_space = self.info["arguments"].get(0)
        self.trial_space = self.info["arguments"].get(1)
        assert rank == len(self.info["arguments"]), (
            f"form rank mismatch: expected {rank} arguments, found {sorted(self.info['arguments'])}"
        )

        qd = self.measure.quadrature_degree
        if qd is None:
            degs = [2]
            for f in self.functions:
                degs.append(2 * max(1, f.function_space.element.degree))
            for sp in self.info["arguments"].values():
                degs.append(2 * max(1, sp.element.degree))
            qd = max(degs)
        self.quadrature_degree = int(qd)

        if self.measure.kind == "dx":
            self._setup_cell()
        else:
            self._setup_facet()

    # -- cell integrals ------------------------------------------------
    def _setup_cell(self):
        mesh = self.mesh
        qpts, qwts = make_quadrature(mesh.cell_type, self.quadrature_degree)
        sub_id = self.measure.subdomain_id
        if sub_id is None:
            cells = None
            positions = None
        else:
            if self.measure.subdomain_data is not None and not isinstance(sub_id, np.ndarray):
                cells = np.asarray(self.measure.subdomain_data[sub_id], dtype=np.int32)
            else:
                cells = np.asarray(sub_id, dtype=np.int32)
            positions = np.arange(cells.shape[0], dtype=np.int32)
        batch = CellBatch(mesh, qpts, cells)
        self.batches = [self._make_batch_fn(batch, qwts, facet_dir=None, normal_sign=None,
                                            subset_positions=positions)]

    # -- exterior facet integrals ---------------------------------------
    def _setup_facet(self):
        mesh = self.mesh
        sub_id = self.measure.subdomain_id
        if sub_id is None:
            facets = mesh.exterior_facets
        elif isinstance(sub_id, (str, int)) and self.measure.subdomain_data is not None:
            facets = np.asarray(self.measure.subdomain_data[sub_id], dtype=np.int32)
        else:
            facets = np.asarray(sub_id, dtype=np.int32)  # direct facet-index array

        fcell = FACET_CELL[mesh.cell_type]
        fq, fw = make_quadrature(fcell, self.quadrature_degree)
        ref_verts = REFERENCE_VERTICES[mesh.cell_type]
        self.batches = []
        cells_of = mesh.facet_cells[facets, 0]
        local_of = mesh.facet_local_index[facets, 0]
        # host-side outward orientation sign per facet
        signs = _facet_orientation_signs(mesh, facets)
        for lf in range(len(CELL_FACETS[mesh.cell_type])):
            sel = np.where(local_of == lf)[0]
            if sel.size == 0:
                continue
            fverts_local = np.asarray(CELL_FACETS[mesh.cell_type][lf])
            V = ref_verts[fverts_local]  # (nvf, tdim)
            if fcell == "point":
                pts = V  # (1, tdim)
                D = np.zeros((mesh.tdim, 0))
            else:
                fgeo = Element("Lagrange", fcell, 1)
                phi_f, dphi_f = fgeo.tabulate(fq)
                pts = phi_f @ V  # (nqf, tdim) facet qps in parent ref coords
                # facet direction matrix dX/dt (tdim, tdim_f); constant because
                # the facet geometry map is P1/Q1 evaluated at a fixed point
                # (exact for the affine facets of all supported cells)
                D = V.T @ dphi_f[0]  # (tdim, nvf) @ (nvf, tdim_f)
            batch = CellBatch(mesh, pts, cells=cells_of[sel])
            self.batches.append(
                self._make_batch_fn(batch, fw, facet_dir=D, normal_sign=signs[sel],
                                    subset_positions=sel.astype(np.int32))
            )

    # -- the jitted per-batch assembly function --------------------------
    def _make_batch_fn(self, batch: CellBatch, qwts, facet_dir, normal_sign, subset_positions=None):
        integrand = self.integrand
        info = self.info
        plan = coefficient_inputs(info, batch, self.quadrature_degree if self.measure.kind == "dx" else None)
        nq = batch.nq
        rank = self.rank
        test_space, trial_space = self.test_space, self.trial_space
        # small tabulation tables stay as numpy closure constants; the big
        # per-cell arrays (coords, dofmaps, signs) are passed as jit ARGUMENTS
        # so they are never baked into the HLO (critical for compile time and
        # for sharding the cell axis later).
        phi_g = np.asarray(batch.phi_g, dtype=_F)
        dphi_g = np.asarray(batch.dphi_g, dtype=_F)
        wts = np.asarray(qwts, dtype=_F)
        needs_x = info["needs_x"]
        needs_normal = info["needs_normal"]

        def _tab(space):
            if space.num_sub_spaces > 0:
                return [space.sub(i).tabulate(batch.points) for i in range(space.num_sub_spaces)]
            return tuple(np.asarray(a) for a in space.tabulate(batch.points))

        tabs = {}
        if test_space is not None:
            tabs[0] = _tab(test_space)
        if trial_space is not None:
            tabs[1] = _tab(trial_space)

        D = None if facet_dir is None else np.asarray(facet_dir)

        def elem_fn(coords, nsign, coeff_cell_data, const_vals):
            J, Jinv, detJ = geometry_factors(coords, dphi_g)
            if D is None:
                scale = jnp.abs(detJ)  # (nq,)
                normal = None
            else:
                T = jnp.einsum("qgd,df->qgf", J, D)  # physical tangents
                if T.shape[-1] == 0:  # point facet (1D mesh)
                    scale = jnp.ones((nq,), _F)
                    normal = None
                elif T.shape[-1] == 1:
                    tau = T[:, :, 0]
                    scale = jnp.linalg.norm(tau, axis=-1)
                    nrm = jnp.stack([tau[:, 1], -tau[:, 0]], axis=-1) / scale[:, None]
                    normal = nrm * nsign
                else:
                    cr = jnp.cross(T[:, :, 0], T[:, :, 1])
                    scale = jnp.linalg.norm(cr, axis=-1)
                    normal = cr / scale[:, None] * nsign

            cvals = _coeff_values_at_qps(plan, coeff_cell_data, Jinv)
            consts = {c: v for c, v in zip(self.constants, const_vals)}
            xq = jnp.einsum("qv,vg->qg", phi_g, coords) if needs_x else None

            def point_ctx(q, targ=None, uarg=None):
                cv = {f: v[0][q] for f, v in cvals.items()}
                cg = {f: v[1][q] for f, v in cvals.items() if v[1] is not None}
                arg = {}
                if targ is not None:
                    arg[0] = (targ[0][q], targ[1][q])
                if uarg is not None:
                    arg[1] = (uarg[0][q], uarg[1][q])
                return Ctx(
                    coeff_val=cv, coeff_grad=cg, arg=arg,
                    x=None if xq is None else xq[q],
                    normal=None if normal is None else normal[q],
                    const=consts,
                )

            if rank == 0:
                acc = 0.0
                for q in range(nq):
                    acc += eval_expr(integrand, point_ctx(q)) * wts[q] * scale[q]
                return acc

            tv, tg = _basis_arrays(test_space, tabs[0], Jinv)
            if rank == 1:
                def for_test(tvk, tgk):
                    acc = 0.0
                    for q in range(nq):
                        acc += eval_expr(integrand, point_ctx(q, targ=(tvk, tgk))) * wts[q] * scale[q]
                    return acc

                return jax.vmap(for_test)(tv, tg)

            uv, ug = _basis_arrays(trial_space, tabs[1], Jinv)

            def for_pair(tvk, tgk, uvj, ugj):
                acc = 0.0
                for q in range(nq):
                    acc += eval_expr(integrand, point_ctx(q, targ=(tvk, tgk), uarg=(uvj, ugj))) * wts[q] * scale[q]
                return acc

            def for_test(tvk, tgk):
                return jax.vmap(lambda uvj, ugj: for_pair(tvk, tgk, uvj, ugj))(uv, ug)

            return jax.vmap(for_test)(tv, tg)

        vmapped = jax.vmap(elem_fn, in_axes=(0, 0, 0, None))

        # runtime-argument arrays (device-resident; cell axis padded to the
        # device count and sharded over the default device mesh when one is
        # installed — GSPMD then auto-partitions the whole assembly, the
        # ``mpirun -n N`` analog).  Padded cells repeat cell 0's geometry
        # and indices; their element contributions are zeroed via "valid".
        from .parallel import pad_shard_cells, padded_cell_count

        from .parallel import shard_cells

        nc_b = batch.cells.shape[0]
        nc_pad = padded_cell_count(nc_b)
        valid = None
        if nc_pad != nc_b:
            valid = shard_cells(jnp.asarray(
                np.concatenate([np.ones(nc_b), np.zeros(nc_pad - nc_b)]), _F))

        static = {
            "coords": pad_shard_cells(jnp.asarray(batch.coords, _F), nc_pad),
            "nsign": pad_shard_cells(
                jnp.ones((nc_b, 1), _F)
                if normal_sign is None
                else jnp.asarray(normal_sign, _F)[:, None],
                nc_pad,
            ),
            "cells": pad_shard_cells(jnp.asarray(batch.cells), nc_pad),
            "valid": valid,
            "gathers": [
                None if p[1] == "qp" else pad_shard_cells(
                    jnp.asarray(f.function_space.unrolled_dofmap[batch.cells]), nc_pad)
                for f, p in zip(self.functions, plan)
            ],
            # qp-coefficient row indices: same-mesh -> cell ids; submesh
            # coefficient -> positions within the entity list (codim paths)
            "qp_rows": [
                None if p[1] != "qp" else pad_shard_cells(jnp.asarray(
                    batch.cells if f.function_space.mesh is self.mesh else subset_positions
                ), nc_pad)
                for f, p in zip(self.functions, plan)
            ],
            "test_dofs": None if test_space is None else pad_shard_cells(
                jnp.asarray(test_space.unrolled_dofmap[batch.cells]), nc_pad),
            "trial_dofs": None if trial_space is None else pad_shard_cells(
                jnp.asarray(trial_space.unrolled_dofmap[batch.cells]), nc_pad),
        }
        kinds = [p[1] for p in plan]
        bss = [f.function_space.bs for f in self.functions]

        def batch_fn(static, coeff_datas, const_vals):
            cell_data = []
            for kind, bs, gather, rows, full in zip(kinds, bss, static["gathers"], static["qp_rows"], coeff_datas):
                if kind == "qp":
                    cell_data.append(full.reshape(-1, nq * bs)[rows])
                else:
                    cell_data.append(full[gather])
            elem = vmapped(static["coords"], static["nsign"], cell_data, list(const_vals))
            if static["valid"] is not None:
                elem = elem * static["valid"].reshape((-1,) + (1,) * (elem.ndim - 1))
            return elem, static["test_dofs"], static["trial_dofs"]

        return batch_fn, static


# ----------------------------------------------------------------------
# Compiled forms
# ----------------------------------------------------------------------

class CompiledForm:
    """A form compiled to jitted assembly kernels.

    Equivalent of ``fem.form(...)`` (FFCx JIT) in the reference
    (e.g. ``demo_plasticity_von_mises.py:396-397``)."""

    def __init__(self, form: sym.Form):
        self.form = form
        args = form.arguments()
        self.rank = len(args)
        self.test_space = args[0].function_space if self.rank >= 1 else None
        self.trial_space = args[1].function_space if self.rank >= 2 else None
        mesh = _form_mesh(form)
        self.mesh = mesh
        self.kernels = [_IntegralKernel(itg, self.rank, mesh) for itg in form.integrals]
        # stable global ordering of runtime inputs
        self.functions = []
        self.constants = []
        for k in self.kernels:
            for f in k.functions:
                if f not in self.functions:
                    self.functions.append(f)
            for c in k.constants:
                if c not in self.constants:
                    self.constants.append(c)
        self._jit_vec = None
        self._jit_mat = None
        self._jit_scal = None
        self._jit_elems = None
        self._jit_act = None
        self._jit_diag = None
        self._bcoo_rowcols = None

    # runtime inputs
    def _inputs(self):
        return [f.data for f in self.functions], [jnp.asarray(c.value, _F) for c in self.constants]

    def _dispatch(self, kernel):
        """Map global input lists to one kernel's expected sublists."""
        fidx = [self.functions.index(f) for f in kernel.functions]
        cidx = [self.constants.index(c) for c in kernel.constants]
        return fidx, cidx

    def _statics(self):
        return [[s for (_, s) in k.batches] for k in self.kernels]

    def _build_scalar(self):
        plans = [(k, self._dispatch(k)) for k in self.kernels]

        def fn(statics, coeffs, consts):
            total = jnp.zeros((), _F)
            for (k, (fidx, cidx)), ks in zip(plans, statics):
                for (b, _), s in zip(k.batches, ks):
                    elem, _, _ = b(s, [coeffs[i] for i in fidx], [consts[i] for i in cidx])
                    total = total + jnp.sum(elem)
            return total

        return jax.jit(fn)

    def _build_vector(self):
        plans = [(k, self._dispatch(k)) for k in self.kernels]
        n = self.test_space.num_dofs

        def fn(statics, coeffs, consts):
            out = jnp.zeros((n,), _F)
            for (k, (fidx, cidx)), ks in zip(plans, statics):
                for (b, _), s in zip(k.batches, ks):
                    elem, tdofs, _ = b(s, [coeffs[i] for i in fidx], [consts[i] for i in cidx])
                    out = out + jax.ops.segment_sum(elem.ravel(), tdofs.ravel(), num_segments=n)
            return out

        return jax.jit(fn)

    def _build_matrix(self):
        plans = [(k, self._dispatch(k)) for k in self.kernels]
        n, m = self.test_space.num_dofs, self.trial_space.num_dofs

        def fn(statics, coeffs, consts):
            out = jnp.zeros((n, m), _F)
            for (k, (fidx, cidx)), ks in zip(plans, statics):
                for (b, _), s in zip(k.batches, ks):
                    elem, tdofs, udofs = b(s, [coeffs[i] for i in fidx], [consts[i] for i in cidx])
                    out = out.at[tdofs[:, :, None], udofs[:, None, :]].add(elem)
            return out

        return jax.jit(fn)

    # -- scalable rank-2 paths: never materialize the dense (n, m) matrix --
    #
    # The reference solves every demo through PETSc *sparse* matrices + LU
    # (``petsc/petsc.py:64-68``, MUMPS options
    # ``demo_plasticity_von_mises.py:422-431``).  The TPU-native equivalents
    # are (a) element-by-element matrix-free action — element tensors stay
    # in HBM in their natural (nc, nt, nu) blocked layout, the global matrix
    # is never formed — feeding Krylov solves, and (b) BCOO sparse assembly
    # for callers that want an explicit sparse operator.

    def _build_elems(self):
        plans = [(k, self._dispatch(k)) for k in self.kernels]

        def fn(statics, coeffs, consts):
            out = []
            for (k, (fidx, cidx)), ks in zip(plans, statics):
                for (b, _), s in zip(k.batches, ks):
                    elem, _, _ = b(s, [coeffs[i] for i in fidx], [consts[i] for i in cidx])
                    out.append(elem)
            return out

        return jax.jit(fn)

    def element_tensors(self):
        """Per-batch element tensors + their dof maps, without forming the
        global matrix: ``[(elem (nc, nt, nu), tdofs (nc, nt), udofs (nc, nu))]``."""
        if self._jit_elems is None:
            self._jit_elems = self._build_elems()
        c, k = self._inputs()
        elems = self._jit_elems(self._statics(), c, k)
        dofs = [(s["test_dofs"], s["trial_dofs"])
                for kern in self.kernels for (_, s) in kern.batches]
        return [(e, td, ud) for e, (td, ud) in zip(elems, dofs)]

    def _build_action(self):
        plans = [(k, self._dispatch(k)) for k in self.kernels]
        n = self.test_space.num_dofs

        def fn(statics, coeffs, consts, x):
            out = jnp.zeros((n,), _F)
            for (k, (fidx, cidx)), ks in zip(plans, statics):
                for (b, _), s in zip(k.batches, ks):
                    elem, tdofs, udofs = b(s, [coeffs[i] for i in fidx], [consts[i] for i in cidx])
                    y = jnp.einsum("cij,cj->ci", elem, x[udofs])
                    out = out + jax.ops.segment_sum(y.ravel(), tdofs.ravel(), num_segments=n)
            return out

        return jax.jit(fn)

    def action(self, x):
        """Matrix-free operator action ``A @ x`` of a rank-2 form: element
        tensors are contracted with the gathered ``x`` and scattered, fused
        in one jitted program — no global matrix."""
        if self._jit_act is None:
            self._jit_act = self._build_action()
        c, k = self._inputs()
        return self._jit_act(self._statics(), c, k, jnp.asarray(x, _F))

    def matrix_bcoo(self):
        """Assembled sparse (BCOO) global matrix with summed duplicates —
        the analog of the reference's PETSc AIJ matrices."""
        from jax.experimental import sparse as jsparse

        elems = self.element_tensors()
        n, m = self.test_space.num_dofs, self.trial_space.num_dofs
        data = jnp.concatenate([e.ravel() for e, _, _ in elems])
        if self._bcoo_rowcols is None:
            rows, cols = [], []
            for e, td, ud in elems:
                nc, nt, nu = e.shape
                rows.append(jnp.broadcast_to(td[:, :, None], (nc, nt, nu)).ravel())
                cols.append(jnp.broadcast_to(ud[:, None, :], (nc, nt, nu)).ravel())
            self._bcoo_rowcols = jnp.stack(
                [jnp.concatenate(rows), jnp.concatenate(cols)], axis=1)
        A = jsparse.BCOO((data, self._bcoo_rowcols), shape=(n, m))
        return A.sum_duplicates()

    def _build_diag(self):
        plans = [(k, self._dispatch(k)) for k in self.kernels]
        n = self.test_space.num_dofs

        def fn(statics, coeffs, consts):
            out = jnp.zeros((n,), _F)
            for (k, (fidx, cidx)), ks in zip(plans, statics):
                for (b, _), s in zip(k.batches, ks):
                    elem, tdofs, udofs = b(s, [coeffs[i] for i in fidx], [consts[i] for i in cidx])
                    hit = (tdofs[:, :, None] == udofs[:, None, :]).astype(elem.dtype)
                    contrib = (elem * hit).sum(axis=2)
                    out = out + jax.ops.segment_sum(contrib.ravel(), tdofs.ravel(), num_segments=n)
            return out

        return jax.jit(fn)

    def diagonal(self):
        """Global matrix diagonal (for Jacobi preconditioning) without
        forming the matrix."""
        if self._jit_diag is None:
            self._jit_diag = self._build_diag()
        c, k = self._inputs()
        return self._jit_diag(self._statics(), c, k)

    def scalar(self):
        if self._jit_scal is None:
            self._jit_scal = self._build_scalar()
        c, k = self._inputs()
        return self._jit_scal(self._statics(), c, k)

    def vector(self):
        if self._jit_vec is None:
            self._jit_vec = self._build_vector()
        c, k = self._inputs()
        return self._jit_vec(self._statics(), c, k)

    def matrix(self):
        if self._jit_mat is None:
            self._jit_mat = self._build_matrix()
        c, k = self._inputs()
        return self._jit_mat(self._statics(), c, k)


def _form_mesh(form: sym.Form) -> Mesh:
    for itg in form.integrals:
        if itg.measure.domain is not None:
            return itg.measure.domain
        for t in sym._terminals(itg.integrand):
            fs = getattr(t, "function_space", None)
            if fs is not None:
                return fs.mesh
            if hasattr(t, "mesh"):
                return t.mesh
    raise ValueError("cannot determine mesh of form")


def create_form(f: sym.Form) -> CompiledForm:
    if isinstance(f, CompiledForm):
        return f
    compiled = getattr(f, "_compiled", None)
    if compiled is None:
        compiled = CompiledForm(f)
        f._compiled = compiled
    return compiled


# dolfinx-parity alias: fem.form(...)
form = create_form


def assemble_scalar(f) -> jnp.ndarray:
    return create_form(f).scalar()


def assemble_vector(f) -> jnp.ndarray:
    return create_form(f).vector()


def assemble_matrix(f, bcs=()) -> jnp.ndarray:
    A = create_form(f).matrix()
    if bcs:
        A = _apply_bc_matrix(A, bcs)
    return A


# ----------------------------------------------------------------------
# Dirichlet boundary conditions
# ----------------------------------------------------------------------

class DirichletBC:
    """dofs: unrolled global dof indices; values: per-dof prescribed values."""

    def __init__(self, dofs: np.ndarray, values: np.ndarray):
        self.dofs = np.asarray(dofs, dtype=np.int64)
        self.values = np.broadcast_to(np.asarray(values, dtype=np.float64), self.dofs.shape).copy()

    def set(self, values):
        self.values = np.broadcast_to(np.asarray(values, dtype=np.float64), self.dofs.shape).copy()


def dirichletbc(value, dofs, V=None) -> DirichletBC:
    """Mirror of ``fem.dirichletbc`` usage in the demos
    (``demo_plasticity_von_mises.py:219-220``,
    ``demo_plasticity_mohr_coulomb.py:142-145``)."""
    from .functionspace import ComponentSubspace

    dofs = np.asarray(dofs)
    value = np.asarray(getattr(value, "value", value), dtype=np.float64)
    if isinstance(V, ComponentSubspace) or value.ndim == 0:
        return DirichletBC(dofs, value.reshape(-1)[0] if value.ndim else value)
    # blocked space with vector value: expand per component
    bs = value.shape[0]
    unrolled = (dofs[:, None] * bs + np.arange(bs)[None, :]).ravel()
    vals = np.tile(value, dofs.shape[0])
    return DirichletBC(unrolled, vals)


def locate_dofs_topological(V, dim, entities) -> np.ndarray:
    """Scalar-block (full space) or unrolled (component subspace) dofs on
    the given facets.  Mirrors ``fem.locate_dofs_topological``
    (``demo_plasticity_von_mises.py:216-217``)."""
    from .functionspace import ComponentSubspace

    comp = None
    if isinstance(V, ComponentSubspace):
        comp = V.component
        V = V.parent
    mesh = V.mesh
    entities = np.asarray(entities, dtype=np.int32)
    counts = V.element.entity_counts
    offs = getattr(V, "_entity_offsets", {"vertex": 0, "edge": mesh.num_vertices})
    sdofs = set()
    fverts = mesh.facets[entities]
    if counts["vertex"]:
        sdofs.update(np.unique(fverts).tolist())
    ne = counts["edge"]
    if ne:
        edge_lookup = {tuple(e): i for i, e in enumerate(np.sort(mesh.edges, axis=1).tolist())}
        base = offs["edge"]
        for fv in fverts:
            vs = sorted(fv.tolist())
            for a in range(len(vs)):
                for b in range(a + 1, len(vs)):
                    e = edge_lookup.get((vs[a], vs[b]))
                    if e is not None:
                        sdofs.update(range(base + e * ne, base + (e + 1) * ne))
    nf = counts.get("face", 0)
    if nf:
        base = offs["face"]
        for f in entities.astype(np.int64).tolist():
            sdofs.update(range(base + f * nf, base + (f + 1) * nf))
    sdofs = np.array(sorted(sdofs), dtype=np.int64)
    if comp is None:
        return sdofs
    return sdofs * V.bs + comp


def locate_dofs_geometrical(V, marker) -> np.ndarray:
    """Scalar-block dofs whose coordinates satisfy ``marker`` (dolfinx
    parity: ``demo_plasticity_mohr_coulomb.py:139-140``)."""
    from .functionspace import ComponentSubspace

    comp = None
    if isinstance(V, ComponentSubspace):
        comp = V.component
        V = V.parent
    coords = _dof_coordinates(V)
    x = np.zeros((3, coords.shape[0]))
    x[: coords.shape[1]] = coords.T
    mask = np.asarray(marker(x), dtype=bool)
    sdofs = np.where(mask)[0].astype(np.int64)
    if comp is None:
        return sdofs
    return sdofs * V.bs + comp


def _dof_coordinates(V) -> np.ndarray:
    mesh = V.mesh
    ip = V.element.interpolation_points
    geo = Element("Lagrange", mesh.cell_type, 1)
    phi, _ = geo.tabulate(ip)
    pts = np.einsum("pv,cvg->cpg", phi, mesh.points[mesh.cells])
    coords = np.zeros((V.num_scalar_dofs, mesh.gdim))
    coords[V.dofmap.ravel()] = pts.reshape(-1, mesh.gdim)
    return coords


def _facet_orientation_signs(mesh: Mesh, facets: np.ndarray) -> np.ndarray:
    """+1 if the batch's normal formula points outward, else -1 (host)."""
    cells = mesh.facet_cells[facets, 0]
    lfs = mesh.facet_local_index[facets, 0]
    signs = np.ones(facets.shape[0])
    cell_mid = mesh.points[mesh.cells[cells]].mean(axis=1)
    facet_mid = mesh.facet_midpoints(facets)
    ref_verts = REFERENCE_VERTICES[mesh.cell_type]
    geo = Element("Lagrange", mesh.cell_type, 1)
    for i, (c, lf) in enumerate(zip(cells, lfs)):
        fverts_local = np.asarray(CELL_FACETS[mesh.cell_type][lf])
        V = ref_verts[fverts_local]
        center = V.mean(axis=0, keepdims=True)
        _, dphi = geo.tabulate(center)
        coords = mesh.points[mesh.cells[c]]
        J = np.einsum("vd,vg->gd", dphi[0], coords)
        if mesh.tdim == 1:
            n_cand = np.array([1.0])
        elif mesh.tdim == 2:
            Df = V.T @ Element("Lagrange", "interval", 1).tabulate(np.array([[0.5]]))[1][0]
            tau = J @ Df[:, 0]
            n_cand = np.array([tau[1], -tau[0]])
        else:
            fcell = FACET_CELL[mesh.cell_type]
            fgeo = Element("Lagrange", fcell, 1)
            fc = np.mean(REFERENCE_VERTICES[fcell], axis=0, keepdims=True)
            Dref = V.T @ fgeo.tabulate(fc)[1][0]
            T = J @ Dref
            n_cand = np.cross(T[:, 0], T[:, 1])
        out_dir = facet_mid[i] - cell_mid[i]
        signs[i] = 1.0 if float(n_cand @ out_dir) >= 0 else -1.0
    return signs


# ----------------------------------------------------------------------
# BC application (lifting / set_bc semantics, cf. petsc/petsc.py:55-68)
# ----------------------------------------------------------------------

def bc_arrays(bcs, n: int):
    """Merge BCs into (mask (n,), values (n,)) device arrays."""
    mask = np.zeros(n, dtype=bool)
    vals = np.zeros(n, dtype=np.float64)
    for bc in bcs:
        mask[bc.dofs] = True
        vals[bc.dofs] = bc.values
    return jnp.asarray(mask), jnp.asarray(vals)


def _apply_bc_matrix(A, bcs):
    n = A.shape[0]
    mask, _ = bc_arrays(bcs, n)
    keep = (~mask).astype(A.dtype)
    A = A * keep[:, None] * keep[None, :]
    A = A + jnp.diag(mask.astype(A.dtype))
    return A


def apply_lifting(b, J_form, bcs, x0, scale=-1.0):
    """b -= scale * A @ (g - x0) on free rows — DOLFINx ``apply_lifting``
    semantics (reference call in ``petsc/petsc.py:66``): with the usual
    ``scale=-1.0`` this ADDS ``A @ (g - x0)`` so that solving
    ``J delta = -b`` yields the correctly lifted Newton update."""
    A = create_form(J_form).matrix()
    n = b.shape[0]
    mask, g = bc_arrays(bcs, n)
    dx = jnp.where(mask, g - x0, 0.0)
    return b - scale * (A @ dx)


def set_bc(b, bcs, x0=None, scale=-1.0):
    """b[bc] = scale * (g - x0[bc]) (reference ``set_bc`` in
    ``petsc/petsc.py:68``)."""
    n = b.shape[0]
    mask, g = bc_arrays(bcs, n)
    tgt = scale * (g - (0.0 if x0 is None else x0))
    return jnp.where(mask, tgt, b)
