"""Lowering of symbolic expressions to JAX: geometry, tabulation, evaluation.

This module plays the role of the FFCx form compiler + the C++
``fem.Expression`` evaluation engine of the reference stack
(``external_operator.py:393-402``): instead of generating C kernels, symbolic
expressions are traced once into jitted JAX functions (batched einsums over
gathered cell dofs x precomputed basis tabulations), which XLA fuses and
tiles for the TPU.  All shapes are static; the cell axis is the batch axis.
"""

from __future__ import annotations

import numpy as np


import jax.numpy as jnp

from . import sym
from .elements import Element
from .function import Constant, Function
from .mesh import Mesh

__all__ = ["eval_expr", "geometry_factors", "CellBatch", "analyze"]

_F = jnp.float64


# ----------------------------------------------------------------------
# Geometry
# ----------------------------------------------------------------------

def geometry_element(mesh: Mesh) -> Element:
    return Element("Lagrange", mesh.cell_type, 1)


def geometry_factors(coords, dphi_g):
    """Per-cell geometry at quadrature points.

    coords: (nv, gdim) vertex coords of ONE cell (vmapped outside).
    dphi_g: (nq, nv, tdim) reference gradients of the geometry basis.
    Returns J (nq, gdim, tdim), Jinv (nq, tdim, gdim), detJ (nq,)."""
    J = jnp.einsum("qvd,vg->qgd", dphi_g, coords)
    gdim, tdim = J.shape[1], J.shape[2]
    assert gdim == tdim, "cell integrals need gdim == tdim"
    detJ = jnp.linalg.det(J)
    Jinv = _inv_small(J)
    return J, Jinv, detJ


def _inv_small(J):
    """Batched inverse of 1x1/2x2/3x3 without LU (f64-safe on TPU)."""
    n = J.shape[-1]
    if n == 1:
        return 1.0 / J
    if n == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, d = J[..., 1, 0], J[..., 1, 1]
        det = a * d - b * c
        return jnp.stack(
            [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
        ) / det[..., None, None]
    if n == 3:
        # adjugate / det
        m = J
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        det = m[..., 0, 0] * c00 + m[..., 0, 1] * c10 + m[..., 0, 2] * c20
        adj = jnp.stack(
            [
                jnp.stack([c00, c01, c02], -1),
                jnp.stack([c10, c11, c12], -1),
                jnp.stack([c20, c21, c22], -1),
            ],
            -2,
        )
        return adj / det[..., None, None]
    raise NotImplementedError(n)


# ----------------------------------------------------------------------
# Expression analysis
# ----------------------------------------------------------------------

def analyze(expr):
    """Collect terminals and their required derivative data.

    Returns dict with: coefficients (vals needed), coeff_grads, constants,
    arguments {number: space}, needs_x, needs_normal."""
    info = {
        "coeff_vals": [],
        "coeff_grads": [],
        "constants": [],
        "arguments": {},
        "needs_x": False,
        "needs_normal": False,
    }

    def visit(e, under_grad=0):
        if isinstance(e, Function):
            tgt = info["coeff_grads"] if under_grad else info["coeff_vals"]
            if e not in tgt:
                tgt.append(e)
            return
        if isinstance(e, Constant):
            if e not in info["constants"]:
                info["constants"].append(e)
            return
        if isinstance(e, sym.Argument):
            prev = info["arguments"].get(e.number)
            assert prev is None or prev is e.function_space, "conflicting argument spaces"
            info["arguments"][e.number] = e.function_space
            return
        if isinstance(e, sym.SpatialCoordinate):
            info["needs_x"] = True
            return
        if isinstance(e, sym.FacetNormal):
            info["needs_normal"] = True
            return
        if isinstance(e, (sym.Grad, sym.DivOp)):
            visit(e.operands[0], under_grad + 1)
            return
        for o in e.operands:
            visit(o, under_grad)

    visit(expr, 0)
    # a coefficient whose grad is needed also needs val only if it appears bare;
    # keep it simple: vals computed for all (cheap).
    for f in info["coeff_grads"]:
        if f not in info["coeff_vals"]:
            info["coeff_vals"].append(f)
    return info


# ----------------------------------------------------------------------
# Point evaluation of an expression
# ----------------------------------------------------------------------

class Ctx:
    """Values of terminals at ONE quadrature point."""

    __slots__ = ("coeff_val", "coeff_grad", "arg", "x", "normal", "const")

    def __init__(self, coeff_val=None, coeff_grad=None, arg=None, x=None, normal=None, const=None):
        self.coeff_val = coeff_val or {}
        self.coeff_grad = coeff_grad or {}
        self.arg = arg or {}
        self.x = x
        self.normal = normal
        self.const = const or {}


_UNARY_JNP = {
    "sqrt": jnp.sqrt,
    "exp": jnp.exp,
    "ln": jnp.log,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "abs": jnp.abs,
    "sign": jnp.sign,
    "arcsin": jnp.arcsin,
    "tan": jnp.tan,
}


def eval_expr(expr, ctx: Ctx, memo=None):
    """Evaluate a symbolic expression to a jnp array of shape ``expr.shape``."""
    if memo is None:
        memo = {}
    key = id(expr)
    if key in memo:
        return memo[key]
    out = _eval(expr, ctx, memo)
    memo[key] = out
    return out


def _eval_grad_of(e, ctx, memo, gdim):
    """Value of the spatial gradient of ``e`` (terminal-level grads)."""
    if isinstance(e, Function):
        g = ctx.coeff_grad.get(e)
        if g is None:
            raise ValueError(f"gradient of coefficient {e.name} unavailable (quadrature-space data is pointwise)")
        return g
    if isinstance(e, sym.Argument):
        return ctx.arg[e.number][1]
    if isinstance(e, sym.SpatialCoordinate):
        return jnp.eye(gdim, dtype=_F)
    if isinstance(e, (Constant, sym.Literal, sym.Zero)):
        return jnp.zeros(e.shape + (gdim,), dtype=_F)
    # linear push-down through shape-manipulating / linear nodes
    if isinstance(e, sym.Sum):
        return _eval_grad_of(e.operands[0], ctx, memo, gdim) + _eval_grad_of(e.operands[1], ctx, memo, gdim)
    if isinstance(e, sym.Variable):
        return _eval_grad_of(e.operands[0], ctx, memo, gdim)
    if isinstance(e, sym.Indexed):
        return _eval_grad_of(e.operands[0], ctx, memo, gdim)[e.idx]
    if isinstance(e, sym.AsTensor):
        grads = [_eval_grad_of(o, ctx, memo, gdim) for o in e.operands]
        return jnp.stack(grads).reshape(e.shape + (gdim,))
    if isinstance(e, sym.Product) and isinstance(e.operands[0], (sym.Literal, Constant)):
        s = eval_expr(e.operands[0], ctx, memo)
        return s * _eval_grad_of(e.operands[1], ctx, memo, gdim)
    if isinstance(e, sym.Transpose):
        g = _eval_grad_of(e.operands[0], ctx, memo, gdim)
        return jnp.swapaxes(g, 0, 1)
    # ---- product/chain rules for composite expressions (UFL computes
    # these symbolically via apply_derivatives; here they evaluate directly) --
    if isinstance(e, sym.Product):  # scalar * anything
        a, b = e.operands
        va, vb = eval_expr(a, ctx, memo), eval_expr(b, ctx, memo)
        ga = _eval_grad_of(a, ctx, memo, gdim)
        gb = _eval_grad_of(b, ctx, memo, gdim)
        return vb[..., None] * ga + va * gb
    if isinstance(e, sym.Division):  # anything / scalar
        a, b = e.operands
        va, vb = eval_expr(a, ctx, memo), eval_expr(b, ctx, memo)
        ga = _eval_grad_of(a, ctx, memo, gdim)
        gb = _eval_grad_of(b, ctx, memo, gdim)
        return ga / vb - va[..., None] * gb / (vb * vb)
    if isinstance(e, sym.Power):
        a, b = e.operands
        va = eval_expr(a, ctx, memo)
        ga = _eval_grad_of(a, ctx, memo, gdim)
        if isinstance(b, (sym.Literal, Constant)):
            p = eval_expr(b, ctx, memo)
            return p * va ** (p - 1.0) * ga
        vb = eval_expr(b, ctx, memo)
        gb = _eval_grad_of(b, ctx, memo, gdim)
        return va**vb * (gb * jnp.log(va) + vb * ga / va)
    if isinstance(e, sym.Inner):
        a, b = e.operands
        va, vb = eval_expr(a, ctx, memo), eval_expr(b, ctx, memo)
        ga = _eval_grad_of(a, ctx, memo, gdim)
        gb = _eval_grad_of(b, ctx, memo, gdim)
        axes = tuple(range(ga.ndim - 1))
        return jnp.sum(ga * vb[..., None], axis=axes) + jnp.sum(va[..., None] * gb, axis=axes)
    if isinstance(e, sym.Dot):  # contract last axis of a with first of b
        a, b = e.operands
        va, vb = eval_expr(a, ctx, memo), eval_expr(b, ctx, memo)
        ga = _eval_grad_of(a, ctx, memo, gdim)
        gb = _eval_grad_of(b, ctx, memo, gdim)
        t2 = jnp.tensordot(va, gb, axes=1)  # a[:-1] + b[1:] + (g,)
        ga_f = jnp.moveaxis(ga, -1, 0)  # (g,) + a.shape
        t1 = jnp.moveaxis(jnp.tensordot(ga_f, vb, axes=1), 0, -1)
        return t1 + t2
    if isinstance(e, sym.Outer):
        a, b = e.operands
        va, vb = eval_expr(a, ctx, memo), eval_expr(b, ctx, memo)
        ga = _eval_grad_of(a, ctx, memo, gdim)
        gb = _eval_grad_of(b, ctx, memo, gdim)
        t1 = jnp.moveaxis(jnp.tensordot(ga, vb, axes=0), va.ndim, -1)
        t2 = jnp.tensordot(va, gb, axes=0)
        return t1 + t2
    if isinstance(e, sym.Trace):
        g = _eval_grad_of(e.operands[0], ctx, memo, gdim)
        return jnp.trace(g, axis1=0, axis2=1)
    if isinstance(e, sym.Unary):
        (a,) = e.operands
        va = eval_expr(a, ctx, memo)
        ga = _eval_grad_of(a, ctx, memo, gdim)
        d = {
            "sqrt": lambda x: 0.5 / jnp.sqrt(x),
            "exp": jnp.exp,
            "ln": lambda x: 1.0 / x,
            "sin": jnp.cos,
            "cos": lambda x: -jnp.sin(x),
            "tan": lambda x: 1.0 / jnp.cos(x) ** 2,
            "arcsin": lambda x: 1.0 / jnp.sqrt(1.0 - x * x),
            "abs": jnp.sign,
            "sign": lambda x: jnp.zeros_like(x),
        }[e.op]
        return d(va) * ga
    if isinstance(e, sym.Conditional):
        cond = eval_expr(e.operands[0], ctx, memo)
        gt = _eval_grad_of(e.operands[1], ctx, memo, gdim)
        gf = _eval_grad_of(e.operands[2], ctx, memo, gdim)
        return jnp.where(cond, gt, gf)
    raise NotImplementedError(
        f"grad() of composite expression {type(e).__name__}; restructure the form so grad applies to terminals"
    )


def _eval(expr, ctx, memo):
    t = type(expr)
    if isinstance(expr, sym.Zero):
        return jnp.zeros(expr.shape, dtype=_F)
    if isinstance(expr, sym.Literal):
        return jnp.asarray(expr.array, dtype=_F)
    if isinstance(expr, Function):
        v = ctx.coeff_val.get(expr)
        if v is None:
            raise KeyError(f"no value bound for coefficient {expr.name}")
        return v
    if isinstance(expr, Constant):
        return ctx.const[expr]
    if isinstance(expr, sym.Argument):
        return ctx.arg[expr.number][0]
    if isinstance(expr, sym.SpatialCoordinate):
        return ctx.x
    if isinstance(expr, sym.FacetNormal):
        return ctx.normal
    if t is sym.Grad:
        return _eval_grad_of(expr.operands[0], ctx, memo, expr.gdim)
    if t is sym.DivOp:
        g = _eval_grad_of(expr.operands[0], ctx, memo, expr.gdim)
        return jnp.trace(g, axis1=-2, axis2=-1)

    if t is sym.Variable:
        return eval_expr(expr.operands[0], ctx, memo)

    ops = [eval_expr(o, ctx, memo) for o in expr.operands]
    if t is sym.Sum:
        return ops[0] + ops[1]
    if t is sym.Product:
        return ops[0] * ops[1]
    if t is sym.Division:
        return ops[0] / ops[1]
    if t is sym.Power:
        return jnp.power(ops[0], ops[1])
    if t is sym.Unary:
        return _UNARY_JNP[expr.op](ops[0])
    if t is sym.Comparison:
        a, b = ops
        return {"le": a <= b, "ge": a >= b, "lt": a < b, "gt": a > b}[expr.op]
    if t is sym.Conditional:
        return jnp.where(ops[0], ops[1], ops[2])
    if t is sym.Inner:
        return jnp.sum(ops[0] * ops[1])
    if t is sym.Dot:
        return jnp.tensordot(ops[0], ops[1], axes=1)
    if t is sym.Outer:
        return jnp.tensordot(ops[0], ops[1], axes=0)
    if t is sym.Transpose:
        return ops[0].T
    if t is sym.Trace:
        return jnp.trace(ops[0])
    if t is sym.Indexed:
        return ops[0][expr.idx]
    if t is sym.AsTensor:
        return jnp.stack(ops).reshape(expr.shape)
    if t is sym.TensorDot:
        return jnp.tensordot(ops[0], ops[1], axes=expr.n)
    raise NotImplementedError(f"eval of {t}")


# ----------------------------------------------------------------------
# Batched per-cell data preparation
# ----------------------------------------------------------------------

class CellBatch:
    """Static (host-prepared) data to evaluate an integrand on a batch of
    cells at fixed reference points.

    For facet integrals, ``cells`` are the parent cells of the facets and
    the reference points are the facet quadrature points mapped into the
    parent reference cell."""

    def __init__(self, mesh: Mesh, points: np.ndarray, cells: np.ndarray | None = None):
        self.mesh = mesh
        self.points = np.asarray(points, dtype=np.float64)
        self.cells = np.arange(mesh.num_cells, dtype=np.int32) if cells is None else np.asarray(cells, np.int32)
        geo = geometry_element(mesh)
        self.phi_g, self.dphi_g = geo.tabulate(self.points)
        self.coords = mesh.points[mesh.cells[self.cells]]  # (nc, nv, g)

    @property
    def nq(self):
        return self.points.shape[0]


def coefficient_inputs(info, batch: CellBatch, quadrature_degree=None):
    """Build the static tabulation plan for each coefficient.

    Returns list of (function, kind, static data) where kind is:
    - "qp": quadrature-space coefficient read directly at the points
    - "tab": standard element, gathered dofs x tabulated basis
    """
    plan = []
    for f in info["coeff_vals"]:
        V = f.function_space
        if V.is_quadrature:
            el = V.element
            same_mesh = V.mesh is batch.mesh
            if same_mesh:
                if quadrature_degree is not None and el.degree != quadrature_degree:
                    raise ValueError(
                        f"quadrature element degree {el.degree} != measure quadrature_degree "
                        f"{quadrature_degree}: the reference requires these to match "
                        "(demo_nonlinear_heat_equation_part1.py:198-204)"
                    )
                if not np.allclose(el.interpolation_points, batch.points, atol=1e-12):
                    raise ValueError("quadrature-space coefficient evaluated at foreign points")
            else:
                # submesh (codim-0/1) coefficient: the batch points live on
                # the parent reference cell; only the point COUNT must agree
                if el.interpolation_points.shape[0] != batch.nq:
                    raise ValueError(
                        "submesh quadrature coefficient point count "
                        f"{el.interpolation_points.shape[0]} != integration rule {batch.nq}"
                    )
            if f in info["coeff_grads"]:
                raise ValueError("cannot take grad() of a quadrature-space coefficient")
            plan.append((f, "qp", None))
        elif V.num_sub_spaces > 0:
            # mixed space: per-sub tabulations; values flattened to the
            # mixed vector shape (sum of sub block sizes)
            needs_grad = f in info["coeff_grads"]
            tabs = [V.sub(i).tabulate(batch.points) for i in range(V.num_sub_spaces)]
            subs = [(V.sub(i).element.num_scalar_dofs, V.sub(i).bs) for i in range(V.num_sub_spaces)]
            plan.append((f, "tab_mixed", (tabs, subs, needs_grad)))
        else:
            phi, dphi = V.tabulate(batch.points)
            needs_grad = f in info["coeff_grads"]
            plan.append((f, "tab", (phi, dphi, needs_grad)))
    return plan


def gather_coefficient(f, plan_entry, batch: CellBatch):
    """Per-cell dof data for one coefficient: (nc, ...) device array."""
    _, kind, _ = plan_entry
    V = f.function_space
    if kind == "qp":
        nq, bs = batch.nq, V.bs
        return f.data.reshape(-1, nq * bs)[batch.cells]
    dm = jnp.asarray(V.unrolled_dofmap[batch.cells])  # (nc, nb*bs)
    return f.data[dm]
