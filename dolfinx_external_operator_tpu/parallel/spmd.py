"""Fused SPMD plasticity step: the TPU production path.

The flexible API (sym/assembly/solvers) mirrors the reference's layering;
this module is the TPU-first hot path that replaces the whole
"SNES residual callback -> Expression.eval -> user kernel -> assemble ->
MUMPS" stack (reference call stack 3.3, SURVEY.md) with ONE jitted,
shard_map-able function per load step:

  deps = B @ u_cell                    (einsum over precomputed B-matrices)
  C_tang, sigma = vmapped return map   (the external operator kernel)
  r = scatter(B^T sigma) - load        (segment_sum; psum over shards)
  K dx = -r                            (matrix-free Jacobi-CG; the ONLY
                                        collectives are the psum of the
                                        matvec scatter — Krylov dots act on
                                        replicated vectors)
  Newton loop via lax.while_loop       (zero host round-trips per step)

Sharding layout (owner-computes, BASELINE.json north star): the cell axis is
sharded over a 1D ``jax.sharding.Mesh``; Gauss-point state (sigma_n) lives
sharded in HBM; global dof vectors are replicated.  The forward ghost
scatter of the reference (``external_operator.py:445``) does not exist here.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..elements import Element
from ..mesh import Mesh
from ..quadrature import make_quadrature

__all__ = ["FusedPlasticityStep", "make_device_mesh"]

_F = jnp.float64


def make_device_mesh(n_devices=None, axis="cells"):
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return JaxMesh(np.array(devs[:n]), (axis,))


def _pad_to(x, n, value=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    padding = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, padding, mode="constant", constant_values=value)


def _blocked_tri_inv(L, base=128):
    """Explicit inverse of a lower-triangular matrix by blocked recursion:
    inv([[L11, 0], [L21, L22]]) = [[inv11, 0], [-inv22 L21 inv11, inv22]].
    All the work above the base case is (m/2)-sized matmuls on the MXU;
    XLA's triangular solves are row-sequential and ~2.4x slower at n~5k.
    Base swept on v5e at n=5202 (scripts/bench_tri_inv_base.py, round 3):
    96-128 -> 7.8 ms, 256 -> 8.5, 512 -> 10.7; flat enough that 128 is
    safe across sizes.

    The base-case inversions are hoisted out of the recursion and done as
    ONE vmapped triangular solve over all diagonal ``base``-blocks (padded
    with an identity diagonal extension — the inverse of ``[[L, 0], [0,
    I]]`` is ``[[inv(L), 0], [0, I]]``): the row-sequential solves run
    batched instead of as ~m/base serial dispatches, leaving only the
    log-depth matmul tree sequential."""
    m = L.shape[0]
    if m <= base:
        return jax.scipy.linalg.solve_triangular(
            L, jnp.eye(m, dtype=L.dtype), lower=True)
    kb = -(-m // base)
    mp = kb * base
    Lp = L
    if mp != m:
        idx = jnp.arange(m, mp)
        Lp = jnp.zeros((mp, mp), L.dtype).at[:m, :m].set(L)
        Lp = Lp.at[idx, idx].set(1.0)
    r = jnp.arange(kb)
    diag = Lp.reshape(kb, base, kb, base)[r, :, r, :]  # (kb, base, base)
    eye = jnp.eye(base, dtype=L.dtype)
    Dinv = jax.vmap(lambda A: jax.scipy.linalg.solve_triangular(
        A, eye, lower=True))(diag)

    def rec(lo, hi):
        if hi - lo == 1:
            return Dinv[lo]
        h = (hi - lo) // 2
        I11 = rec(lo, lo + h)
        I22 = rec(lo + h, hi)
        L21 = Lp[(lo + h) * base:hi * base, lo * base:(lo + h) * base]
        Z = jnp.zeros((h * base, (hi - lo - h) * base), L.dtype)
        return jnp.block([[I11, Z], [-I22 @ (L21 @ I11), I22]])

    return rec(0, kb)[:m, :m]


def _spd_inv_chol(Ks32):
    """Explicit f32 inverse of an SPD matrix: Cholesky + blocked triangular
    inversion + Gram product.  Matmul-rich — measured 18 ms at n=5202 on
    v5e vs 45.6 ms for XLA's LU-based ``inv`` (panel-sequential).  A
    Cholesky breakdown (non-SPD input, e.g. a non-associative consistent
    tangent) propagates NaN to the last diagonal entry; fall back to the
    pivoted-LU inverse in that case."""
    L = jnp.linalg.cholesky(Ks32)

    def chol_path(_):
        Li = _blocked_tri_inv(L)
        return Li.T @ Li

    return jax.lax.cond(jnp.isfinite(L[-1, -1]), chol_path,
                        lambda K: jnp.linalg.inv(K), Ks32)


class FusedPlasticityStep:
    """Fully fused load step for vector-displacement / quadrature-stress
    plasticity (the von Mises & Mohr-Coulomb pattern).

    Parameters
    ----------
    mesh, V, S : the framework mesh, displacement space (blocked vector
        Lagrange), and stress quadrature space.
    kernel : per-Gauss-point ``(deps(4,), sigma_n(4,)) -> (C_tang(4,4),
        sigma(4,))`` consistent-tangent return map (pure JAX).
    bc_dofs, bc_vals : Dirichlet data on the displacement space.
    body_force : callable ``v -> load_vector`` is replaced by a constant
        body-force direction; per-step magnitude scales it.
    device_mesh : optional jax.sharding.Mesh over a "cells" axis.
    """

    def __init__(self, mesh: Mesh, V, S, kernel, bc_dofs, bc_vals=None,
                 body_dir=(0.0, -1.0), device_mesh: JaxMesh | None = None,
                 newton_atol=1e-8, newton_rtol=1e-8, newton_max_it=100,
                 cg_rtol=1e-13, cg_maxiter=10000, linear_solver="cg",
                 batched_kernel=None, mg_opts=None, fused_forcing=False):
        self.mesh = mesh
        self.V = V
        self.S = S
        self.kernel = kernel
        self.device_mesh = device_mesh
        self.newton_atol = newton_atol
        self.newton_rtol = newton_rtol
        self.newton_max_it = newton_max_it
        self.cg_rtol = cg_rtol
        assert linear_solver in ("cg", "dense", "mg", "elastic", "bcr", "auto")
        auto = linear_solver == "auto"
        if auto:
            # measured crossovers on v5e (NOTES.md rounds 3-4): below ~10k
            # dofs the dense f32 inverse + f64 refinement beats everything
            # (per-iteration op-latency floors); up to the BCR memory bound
            # (~130k dofs) the block-cyclic-reduction direct solve wins on
            # single-device lattice meshes (exact solves, zero Krylov its,
            # 1.8x over AMG-CG at 50^2-100^2); above it, off-lattice (the
            # setup below falls back), or sharded (the factorization is
            # replicated work), AMG-CG stays near mesh-independent
            if V.num_dofs <= 10_000:
                linear_solver = "dense"
            elif V.num_dofs <= 130_000 and device_mesh is None:
                linear_solver = "bcr"
            else:
                linear_solver = "mg"
        self.linear_solver = linear_solver
        # dense-path factorization flavor: "chol" = Cholesky + blocked
        # triangular inversion (explicit inverse; applications are single
        # matvecs), "lu" = lu_factor + lu_solve (row-sequential triangular
        # solves per application), "inv" = XLA's LU-based explicit inverse.
        # Default (None) = each backend's fastest, resolved at build time
        # from where the statics landed: "chol" on accelerators (matmul-
        # rich, 18 vs 46 ms at n=5202 on v5e), "lu" on CPU (LAPACK's
        # factor+solve beats forming an explicit inverse there — keeping
        # the CPU-pipeline benchmark baseline its honest best).
        self._dense_fact = None
        # f64 refinement rounds on top of the equilibrated f32 solve: each
        # round multiplies accuracy by ~1e-5..1e-6; round counts 1-3 all
        # measured Newton-iterate-identical on the slope schedule (maxdiff
        # 2.8e-15 at 1, re-validated round 3: identical Newton counts and
        # per-step splits over the full 52-step schedule).  One round
        # reaches ~1e-10 relative — two orders below the 1e-8 Newton
        # tolerance — and each extra round costs an exact f64 element
        # matvec + a factor application (~5 ms/update at 25x25 on v5e,
        # ~17% of the update).
        self._dense_refine = 1
        # Eisenstat-Walker forcing inside the FUSED Newton loop: the CG
        # target each iteration is max(cg_rtol, min(cap, sqrt(norm/norm0)))
        # — traced, so the single-execution path gets inexact Newton too.
        # ``fused_forcing``: False = off; True = cap 1e-4 (measured to keep
        # Newton counts identical to exact solves on the slope problem,
        # where the classic 0.1 cap inflates them); float = explicit cap.
        if fused_forcing is True:
            self.fused_forcing = 1e-4
        else:
            self.fused_forcing = fused_forcing

        qdeg = S.element.degree
        qpts, qwts = make_quadrature(mesh.cell_type, qdeg)
        nq = qpts.shape[0]
        self.nq = nq
        geo = Element("Lagrange", mesh.cell_type, 1)
        phi_g, dphi_g = geo.tabulate(qpts)
        phi_u, dphi_u = V.element.tabulate(qpts)  # scalar basis of V
        nb = phi_u.shape[1]
        bs = V.bs
        assert bs == 2, "fused path currently implements the 2D Mandel pattern"
        self.n_dofs = V.num_dofs
        self.cg_maxiter = cg_maxiter

        # host precompute: per-cell geometry and B-matrices
        coords = mesh.points[mesh.cells]  # (nc, nv, g)
        J = np.einsum("qvd,cvg->cqgd", dphi_g, coords)
        detJ = np.abs(np.linalg.det(J))
        Jinv = np.linalg.inv(J)
        gp = np.einsum("qbd,cqdg->cqbg", dphi_u, Jinv)  # scalar-basis phys grads
        nc = mesh.num_cells
        # B: (nc, nq, 4, nb*bs) strain-displacement in Mandel notation
        B = np.zeros((nc, nq, 4, nb * bs))
        B[:, :, 0, 0::2] = gp[:, :, :, 0]                    # e_xx = du_x/dx
        B[:, :, 1, 1::2] = gp[:, :, :, 1]                    # e_yy = du_y/dy
        s2 = np.sqrt(2.0) * 0.5
        B[:, :, 3, 0::2] = s2 * gp[:, :, :, 1]               # sqrt2 e_xy
        B[:, :, 3, 1::2] = s2 * gp[:, :, :, 0]
        self._wdet = detJ * qwts[None, :]  # (nc, nq)

        # body-force element vector for unit magnitude: f_cell[k] = int N_k b
        Nmat = np.zeros((nq, 2, nb * bs))
        Nmat[:, 0, 0::2] = phi_u
        Nmat[:, 1, 1::2] = phi_u
        bdir = np.asarray(body_dir, dtype=np.float64)
        f_cell = np.einsum("cq,qik,i->ck", self._wdet, Nmat, bdir)

        dofmap = V.unrolled_dofmap  # (nc, nb*bs)

        # padding for even sharding
        ndev = 1 if device_mesh is None else device_mesh.devices.size
        nc_pad = ((nc + ndev - 1) // ndev) * ndev
        self.nc, self.nc_pad = nc, nc_pad
        B = _pad_to(B, nc_pad)
        wdet = _pad_to(self._wdet, nc_pad)
        f_cell = _pad_to(f_cell, nc_pad)
        # padded cells scatter into a dummy dof slot
        dofmap_p = _pad_to(dofmap.astype(np.int64), nc_pad, value=self.n_dofs)

        self.bc_mask_np = np.zeros(self.n_dofs, dtype=bool)
        self.bc_mask_np[np.asarray(bc_dofs, dtype=np.int64)] = True
        bc_vals_np = np.zeros(self.n_dofs)
        if bc_vals is not None:
            bc_vals_np[np.asarray(bc_dofs, dtype=np.int64)] = bc_vals

        self.statics = {
            "B": jnp.asarray(B, _F),
            "wdet": jnp.asarray(wdet, _F),
            "f_cell": jnp.asarray(f_cell, _F),
            "dofmap": jnp.asarray(dofmap_p),
            "bc_mask": jnp.asarray(self.bc_mask_np),
            "bc_vals": jnp.asarray(bc_vals_np, _F),
        }
        # batch-LAST vmap (SoA) so XLA lays the Gauss-point axis along the
        # vector lanes; measured perf-neutral vs batch-first on v5e
        # (NOTES.md "Failed experiments") but kept for layout consistency
        # with the sharded statics below.  A caller-supplied batched_kernel
        # (same SoA signature, e.g. the Pallas f32 fast path
        # ``models.von_mises.pallas_batched_kernel``) replaces the vmap.
        if batched_kernel is not None:
            self._vkernel = batched_kernel
        else:
            self._vkernel = jax.vmap(kernel, in_axes=(-1, -1), out_axes=(-1, -1))

        self._st_spec = {
            "B": P("cells"), "wdet": P("cells"), "f_cell": P("cells"),
            "dofmap": P("cells"), "bc_mask": P(), "bc_vals": P(),
        }

        # dedup dense-assembly map (single-device dense/elastic paths): a
        # straight (n, n) .at.add scatter serializes duplicate (i, j) hits
        # (~35 ns/element, 6.3 ms at 25x25); summing duplicates first with
        # a sorted segment_sum and scattering UNIQUE entries cuts that to
        # the memory-bound floor.  Sharded steps keep the plain scatter
        # (the map would differ per shard).
        self._dense_asm = None
        if device_mesh is None and self.linear_solver in ("dense", "elastic"):
            self._setup_dense_asm(dofmap_p)

        if linear_solver == "bcr":
            try:
                self._setup_bcr(nc_pad)
            except ValueError:
                if not auto:
                    raise
                # auto-selected BCR on a mesh that turned out non-lattice
                self.linear_solver = linear_solver = "mg"
        if linear_solver == "mg":
            self._setup_mg(mg_opts or {}, nc, nc_pad)
        elif linear_solver == "elastic":
            self._setup_elastic_inverse(nc)

        if device_mesh is not None:
            shard = NamedSharding(device_mesh, P("cells"))
            repl = NamedSharding(device_mesh, P())
            for k in ("B", "wdet", "f_cell", "dofmap"):
                self.statics[k] = jax.device_put(self.statics[k], shard)
            for k in ("bc_mask", "bc_vals"):
                self.statics[k] = jax.device_put(self.statics[k], repl)
            if "mg" in self.statics:
                mgs = jax.tree.map(lambda x: jax.device_put(x, repl),
                                   self.statics["mg"])
                t0 = mgs["transfers"][0]
                t0["W"] = jax.device_put(t0["W"], shard)
                t0["blk_dst"] = jax.device_put(t0["blk_dst"], shard)
                self.statics["mg"] = mgs
            if "bcr" in self.statics:
                bcs = jax.tree.map(lambda x: jax.device_put(x, repl),
                                   self.statics["bcr"])
                bcs["dst"] = jax.device_put(bcs["dst"], shard)
                self.statics["bcr"] = bcs

        self._step = self._build_step()

    def _setup_dense_asm(self, dofmap_p):
        """Host precompute of the duplicate-free dense-assembly map: the
        (nc*nk*nk) per-cell contributions are permuted to sorted-unique
        (i, j) segments; at assembly time one sorted ``segment_sum`` + one
        unique-index scatter produce the global (n, n) matrix."""
        nk = dofmap_p.shape[1]
        ii = np.repeat(dofmap_p, nk, axis=1).ravel()
        jj = np.tile(dofmap_p, (1, nk)).ravel()
        key = ii * np.int64(self.n_dofs + 1) + jj
        uniq, inv = np.unique(key, return_inverse=True)
        perm = np.argsort(inv, kind="stable")
        self._dense_asm = {
            "perm": jnp.asarray(perm.astype(np.int32)),
            "seg": jnp.asarray(inv[perm].astype(np.int32)),
            "ui": jnp.asarray((uniq // (self.n_dofs + 1)).astype(np.int32)),
            "uj": jnp.asarray((uniq % (self.n_dofs + 1)).astype(np.int32)),
            "n_uniq": int(uniq.size),
        }

    def _assemble_dense_f32(self, K_cell32, dof, psum):
        """Global (n, n) f32 matrix from per-cell (nk, nk) blocks — dedup
        segment-sum path when the map exists (single device), plain
        duplicate-scatter + psum otherwise.  ``dof`` is the (local) padded
        dofmap as seen inside the (possibly shard_map'd) step."""
        n = self.n_dofs
        asm = self._dense_asm
        if asm is not None:
            vals = jax.ops.segment_sum(
                K_cell32.reshape(-1)[asm["perm"]], asm["seg"],
                num_segments=asm["n_uniq"], indices_are_sorted=True)
            K = jnp.zeros((n + 1, n + 1), jnp.float32)
            K = K.at[asm["ui"], asm["uj"]].set(vals, unique_indices=True)
            return K[:n, :n]
        K = jnp.zeros((n + 1, n + 1), jnp.float32)
        K = K.at[dof[:, :, None], dof[:, None, :]].add(K_cell32)[:n, :n]
        return psum(K)

    def _setup_elastic_inverse(self, nc):
        """Dense f32 inverse of the ELASTIC stiffness — the initial direct
        preconditioner for ``linear_solver="elastic"``.

        The reference refactorizes with MUMPS every Newton iteration; the
        TPU-native small-problem answer is ONE factorization per LOAD STEP:
        each fused step ends by inverting the converged tangent (device,
        f32, Jacobi-equilibrated) and hands it to the next step as the
        preconditioner of the mixed-precision Krylov (``mg.ir_pcg`` with
        M = K_lag^-1 as a single f32 matmul).  The one-step lag costs only
        a few inner iterations (tangent drift between adjacent load steps
        is small); Newton trajectories are those of an exact solve — the
        refinement converges to the same 1e-13 relative target — so
        iteration-count parity holds exactly."""
        C_el = np.asarray(self.kernel(jnp.zeros(4, _F), jnp.zeros(4, _F))[0])
        B_np = np.asarray(self.statics["B"])[:nc]
        K_el = np.einsum("cqik,ij,cqjl,cq->ckl", B_np, C_el, B_np, self._wdet, optimize=True)
        n = self.n_dofs
        dm = self.V.unrolled_dofmap.astype(np.int64)
        K = np.zeros((n, n), np.float64)
        np.add.at(K, (np.repeat(dm, dm.shape[1], 1), np.tile(dm, (1, dm.shape[1]))),
                  K_el.reshape(nc, -1))
        keep = ~self.bc_mask_np
        K = K * keep[:, None] * keep[None, :] + np.diag(self.bc_mask_np.astype(np.float64))
        # Jacobi equilibration for the f32 inversion; the pair is STEP
        # state (refreshed by each fused step), not a static
        d = 1.0 / np.sqrt(np.clip(np.abs(np.diag(K)), 1e-30, None))
        Ks = (K * d[:, None] * d[None, :]).astype(np.float32)
        self._el_precond = (jnp.asarray(np.linalg.inv(Ks)),
                            jnp.asarray(d, jnp.float32))

    def _setup_mg(self, mg_opts, nc, nc_pad):
        """Host-side multigrid hierarchy build (see ``parallel.mg``): the
        elastic tangent (the kernel at zero strain/stress) supplies the
        aggregation/smoothing proxy; cell-axis arrays are padded to the
        shard-even cell count."""
        from . import mg as _mg

        C_el = np.asarray(self.kernel(jnp.zeros(4, _F), jnp.zeros(4, _F))[0])
        B_np = np.asarray(self.statics["B"])[:nc]
        wdet_np = self._wdet
        K_el = np.einsum("cqik,ij,cqjl,cq->ckl", B_np, C_el, B_np, wdet_np, optimize=True)
        mg_opts = dict(mg_opts)
        # default: above ~30k dofs freeze the aggregation levels to their
        # elastic Galerkin values (see mg.build_mg_statics) — the full
        # per-Newton Galerkin maps grow to ~1.2 GB at 200x200 and their
        # transfer/segment-sum cost dwarfs the few extra CG iterations
        mg_opts.setdefault("galerkin_levels",
                           None if self.n_dofs <= 30_000 else 1)
        # level-0 operator layout (mg.mg_setup): "auto" (default) = "dia"
        # where the mesh is lattice-structured, else "scalar".  "dia" =
        # stencil-banded lattice operators + stencil transfers (gather-
        # free; explicit request falls back to "node" with a warning on
        # non-lattice meshes); "node"/"scalar" = EBE gather/scatter
        # (node-row indexing halves the indexed-element count)
        self._mg_mv0_mode = mg_opts.pop("mv0_mode", "auto")
        mgs = _mg.build_mg_statics(self.mesh, self.V, self.bc_mask_np, K_el,
                                   dia=self._mg_mv0_mode in ("dia", "auto"),
                                   **{k: v for k, v in mg_opts.items()
                                      if k != "gamma_coarse"})
        self._mg_cheb_degree = mgs.pop("cheb_degree")
        self._mg_gamma = mg_opts.get("gamma_coarse", (1, 2))
        self._mg_dia_offsets = mgs.pop("dia0_offsets", None)  # STATIC tuple
        self._mg_dia1_offsets = mgs.pop("dia1_offsets", None)
        self._mg_t0_stencil = mgs.pop("t0_stencil", None)   # STATIC tuple
        self._mg_lat_shapes = mgs.pop("lat_shapes", None)
        if self._mg_mv0_mode == "auto":
            self._mg_mv0_mode = ("dia" if self._mg_dia_offsets is not None
                                 else "node")
        elif self._mg_mv0_mode == "dia" and self._mg_dia_offsets is None:
            import warnings

            warnings.warn(
                "mv0_mode='dia' unavailable: the mesh is not "
                "lattice-structured (or its operator exceeds the 128-band "
                "cap in build_mg_statics); falling back to 'node'",
                stacklevel=3)
            self._mg_mv0_mode = "node"
        t0 = mgs["transfers"][0]
        nnz1 = mgs["levels"][0]["cols"].size
        t0["W"] = _pad_to(t0["W"], nc_pad)
        t0["blk_dst"] = _pad_to(t0["blk_dst"], nc_pad, value=nnz1)
        if self._mg_dia_offsets is not None:
            nb = len(self._mg_dia_offsets)
            mgs["dia0_dst"] = _pad_to(mgs["dia0_dst"], nc_pad,
                                      value=nb * self.n_dofs)
        mgs = jax.tree.map(jnp.asarray, mgs)
        self.statics["mg"] = mgs
        mg_spec = jax.tree.map(lambda _: P(), mgs)
        mg_spec["transfers"][0]["W"] = P("cells")
        mg_spec["transfers"][0]["blk_dst"] = P("cells")
        if self._mg_dia_offsets is not None:
            mg_spec["dia0_dst"] = P("cells")
        self._st_spec["mg"] = mg_spec

    def _setup_bcr(self, nc_pad):
        """Host-side build of the block-cyclic-reduction scatter map (see
        ``parallel.bcr``): lattice detection + the static (cell, a, b) ->
        row-band-slot destinations; the per-Newton device work is one
        segment_sum + the batched-matmul factorization."""
        from . import bcr as _bcr

        info = _bcr.build_bcr_statics(self.mesh, self.V, self.bc_mask_np)
        if info is None:
            raise ValueError(
                "linear_solver='bcr' requires a lattice-structured mesh "
                "(structured-rectangle P1/P2; see mg._lattice_node_perm) — "
                "use linear_solver='mg' on unstructured meshes")
        self._bcr_plan = (info.pop("m"), info.pop("B"), info.pop("n"),
                          info.pop("sentinel"))
        info["dst"] = _pad_to(info["dst"], nc_pad, value=self._bcr_plan[3])
        self.statics["bcr"] = jax.tree.map(jnp.asarray, info)
        spec = jax.tree.map(lambda _: P(), self.statics["bcr"])
        spec["dst"] = P("cells")
        self._st_spec["bcr"] = spec

    # ------------------------------------------------------------------
    def _local_ops(self):
        """Core per-shard computations (identical with/without shard_map)."""
        n_dofs = self.n_dofs
        nq = self.nq
        vkernel = self._vkernel

        def gather(dofmap, u):
            u_ext = jnp.concatenate([u, jnp.zeros(1, _F)])
            return u_ext[dofmap]  # (nc_loc, nk)

        def scatter(dofmap, cell_vals, psum):
            out = jax.ops.segment_sum(cell_vals.ravel(), dofmap.ravel(), num_segments=n_dofs + 1)[:-1]
            return psum(out)

        def constitutive(st, Du, sigma_n, psum):
            u_cell = gather(st["dofmap"], Du)
            deps = jnp.einsum("cqik,ck->cqi", st["B"], u_cell)
            nc_loc = deps.shape[0]
            C_t, sig_t = vkernel(deps.reshape(-1, 4).T, sigma_n.reshape(-1, 4).T)
            C_tang = jnp.moveaxis(C_t, -1, 0).reshape(nc_loc, nq, 4, 4)
            sigma = sig_t.T.reshape(nc_loc, nq, 4)
            return C_tang, sigma

        def assemble_f(st, psum):
            # unit body-force vector: load-independent, so the Newton loop
            # hoists this single scatter out of the body (it used to run
            # once per body pass — measurable at small n where the step is
            # op-latency-bound, round-5 dispatch-floor hunt)
            return scatter(st["dofmap"], st["f_cell"], psum)

        def residual(st, sigma, load, psum, fvec):
            r_cell = jnp.einsum("cqik,cqi,cq->ck", st["B"], sigma, st["wdet"])
            r = scatter(st["dofmap"], r_cell, psum)
            return r - fvec * load

        def tangent_matvec(st, C_tang, x, psum):
            x_cell = gather(st["dofmap"], x)
            dde = jnp.einsum("cqik,ck->cqi", st["B"], x_cell)
            dsig = jnp.einsum("cqij,cqj->cqi", C_tang, dde)
            k_cell = jnp.einsum("cqik,cqi,cq->ck", st["B"], dsig, st["wdet"])
            return scatter(st["dofmap"], k_cell, psum)

        def tangent_diag(st, C_tang, psum):
            # diag(K) = sum_cq w B_iq[k] C_ij B_jq[k]
            d_cell = jnp.einsum("cqik,cqij,cqjk,cq->ck", st["B"], C_tang, st["B"], st["wdet"])
            return scatter(st["dofmap"], d_cell, psum)

        return constitutive, residual, tangent_matvec, tangent_diag, assemble_f

    def _build_step(self):
        (constitutive, residual, tangent_matvec, tangent_diag,
         assemble_f) = self._local_ops()
        atol, rtol = self.newton_atol, self.newton_rtol
        cg_maxiter = self.cg_maxiter
        dm = self.device_mesh

        def apply_bc_res(st, r, Du):
            return jnp.where(st["bc_mask"], Du - st["bc_vals"], r)

        def cg_solve(st, C_tang, b, psum, cg_rtol, maxiter=None):
            if maxiter is None:
                maxiter = cg_maxiter
            mask = st["bc_mask"]
            diag = tangent_diag(st, C_tang, psum)
            diag = jnp.where(mask, 1.0, diag)
            Minv = 1.0 / diag

            def mv(x):
                y = tangent_matvec(st, C_tang, jnp.where(mask, 0.0, x), psum)
                return jnp.where(mask, x, y)

            x = jnp.zeros_like(b)
            r = b - mv(x)
            z = Minv * r
            rz = jnp.vdot(r, z)
            p = z
            bnorm = jnp.sqrt(jnp.vdot(b, b))
            target = cg_rtol * bnorm

            # Safeguarded CG.  Under TPU f64 emulation the attainable
            # residual floor sits ABOVE the host's, so tight targets
            # (1e-13 ||b||) are routinely unreachable at scale — and CG
            # iterated past its floor does not stagnate, it DIVERGES
            # (observed: floor 1e-13 at k~1200, |r| back to 1e+3 by
            # k~3000, then NaN; the Newton loop then spun to max_it and
            # the device timed out).  Track the best iterate and exit on
            # (a) SPD-invariant breakdown or (b) residual growth past
            # 100x the best seen; return the best iterate.
            norm0_cg = jnp.sqrt(jnp.vdot(r, r))

            def cond(sta):
                x, r, z, p, rz, k, ok, x_best, n_best, n_cur = sta
                return ok & (n_cur > target) & (k < maxiter)

            def body(sta):
                x, r, z, p, rz, k, ok, x_best, n_best, n_cur = sta
                Ap = mv(p)
                pAp = jnp.vdot(p, Ap)
                ok = jnp.isfinite(pAp) & (pAp > 0.0) & jnp.isfinite(rz) & (rz > 0.0)
                alpha = jnp.where(ok, rz / jnp.where(pAp > 0.0, pAp, 1.0), 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = Minv * r
                rz2 = jnp.vdot(r, z)
                beta = jnp.where(rz > 0.0, rz2 / jnp.where(rz > 0.0, rz, 1.0), 0.0)
                p = z + beta * p
                n_new = jnp.sqrt(jnp.vdot(r, r))
                better = n_new < n_best
                x_best = jnp.where(better, x, x_best)
                n_best = jnp.where(better, n_new, n_best)
                ok = ok & jnp.isfinite(n_new) & (n_new < 100.0 * n_best)
                return (x, r, z, p, rz2, k + 1, ok, x_best, n_best, n_new)

            sta0 = (x, r, z, p, rz, 0, rz >= 0.0, x, norm0_cg, norm0_cg)
            out = jax.lax.while_loop(cond, body, sta0)
            x_best, k = out[7], out[5]
            return x_best, k

        n_dofs = self.n_dofs
        use_dense = self.linear_solver == "dense"
        use_mg = self.linear_solver == "mg"
        use_elastic = self.linear_solver == "elastic"
        use_bcr = self.linear_solver == "bcr"

        def elastic_solve(st, C_tang, b, psum, cg_rtol, maxiter, precond):
            """Lagged-inverse preconditioned mixed-precision solve (see
            ``_setup_elastic_inverse``): no per-Newton factorization at
            all — the Krylov loop is f32 EBE matvecs + one (n, n) f32
            matmul per iteration, with f64 refinement outside."""
            from . import mg as _mg

            mask = st["bc_mask"]
            dof = st["dofmap"]
            keep_ext = jnp.concatenate([~mask, jnp.zeros(1, bool)])
            km = keep_ext[dof].astype(_F)
            K_cell = jnp.einsum("cqik,cqij,cqjl,cq->ckl",
                                st["B"], C_tang, st["B"], st["wdet"])
            K_cell = K_cell * km[:, :, None] * km[:, None, :]
            K32 = K_cell.astype(jnp.float32)

            def _ebe(K, x, xz):
                u = jnp.concatenate([xz, jnp.zeros(1, xz.dtype)])
                y = jnp.einsum("cab,cb->ca", K, u[dof])
                out = psum(jax.ops.segment_sum(
                    y.ravel(), dof.ravel(), num_segments=n_dofs + 1)[:-1])
                return jnp.where(mask, x, out)

            def mv64(x):
                return _ebe(K_cell, x, jnp.where(mask, 0.0, x))

            def mv32(x):
                return _ebe(K32, x, jnp.where(mask, 0.0, x).astype(jnp.float32))

            Minv, d32 = precond

            def M32(r):
                rz = jnp.where(mask, 0.0, r)
                z = d32 * (Minv @ (d32 * rz))
                return jnp.where(mask, r, z)

            return _mg.ir_pcg(mv64, mv32, M32, b, cg_rtol, maxiter)

        def mg_solve(st, C_tang, b, psum, cg_rtol, maxiter):
            """AMG-preconditioned CG (see ``parallel.mg``): per-Newton f32
            hierarchy values from the current tangent, f64 outer CG on the
            exact element-blocked operator.  Replaces the reference's
            MUMPS-LU at every mesh size (near-mesh-independent iteration
            counts vs the Jacobi-CG path's O(sqrt(kappa)) growth)."""
            from . import mg as _mg

            mask = st["bc_mask"]
            dof = st["dofmap"]
            keep_ext = jnp.concatenate([~mask, jnp.zeros(1, bool)])
            km = keep_ext[dof].astype(_F)  # (nc_loc, nk); padded cells -> 0
            K_cell = jnp.einsum("cqik,cqij,cqjl,cq->ckl",
                                st["B"], C_tang, st["B"], st["wdet"])
            K_cell = K_cell * km[:, :, None] * km[:, None, :]
            dia_mode = self._mg_mv0_mode == "dia"
            rt = _mg.mg_setup(
                st["mg"], K_cell.astype(jnp.float32), dof, mask, n_dofs,
                psum, mv0_mode=self._mg_mv0_mode, bs=self.V.bs,
                dia=({"dst": st["mg"]["dia0_dst"],
                      "offsets": self._mg_dia_offsets,
                      "mask_lat": st["mg"]["mask0_lat"],
                      **({"dst1": st["mg"]["dia1_dst"],
                          "offsets1": self._mg_dia1_offsets}
                         if self._mg_dia1_offsets is not None else {})}
                     if dia_mode else None))

            # exact f64 operator, identity rows on bc dofs (node-row
            # layout when available: at 100x100 one f64 EBE matvec is
            # 45 ms — NOTES op-cost table — and runs once per refinement
            # round, a real share of the solve)
            if not dia_mode:
                mv = _mg.ebe_matvec(K_cell, dof, mask, n_dofs, psum,
                                    mode="scalar" if self._mg_mv0_mode == "scalar"
                                    else "node", bs=self.V.bs)

            if dia_mode:
                # f64 refinement operator: element-blocked (node-row
                # layout), NOT banded.  Round-3 assembled f64 DIA band
                # values per Newton on the theory that one segment_sum
                # buys back every refinement round's 45 ms EBE matvec —
                # but the f64 scatter-add is EMULATED and measured at
                # 348 ms/Newton at 100x100 (1.73 s at 200x200,
                # scripts/micro_vals64.py: sorting only shaves 25%, a
                # gather-matrix is worse), vs ~3-4 refinement rounds x
                # 45 ms = 135 ms through the EBE operator.  The banded
                # f64 matvec (0.2 ms) never amortized its own assembly.
                mv = _mg.ebe_matvec(K_cell, dof, mask, n_dofs, psum,
                                    mode="node", bs=self.V.bs)
                # the f32 iteration runs in the private LATTICE numbering
                # (gather-free stencil matvec); permute only at the
                # refinement-round boundary — ~4 gathers per solve
                mask_lat = st["mg"]["mask0_lat"]
                l2o = st["mg"]["perm0_l2o"]
                o2l = st["mg"]["perm0_o2l"]

                t0s = None
                if self._mg_t0_stencil is not None:
                    shape0, shape1 = self._mg_lat_shapes
                    t0s = (self._mg_t0_stencil, shape0, shape1, self.V.bs,
                           ~mask_lat)

                def M32(r):
                    z = _mg.vcycle(st["mg"], rt,
                                   jnp.where(mask_lat, 0.0, r),
                                   cheb_degree=self._mg_cheb_degree,
                                   gamma_coarse=self._mg_gamma, t0s=t0s)
                    return jnp.where(mask_lat, r, z)

                return _mg.ir_pcg(mv, rt["mv0"], M32, b, cg_rtol, maxiter,
                                  to_inner=lambda v: v[l2o],
                                  from_inner=lambda v: v[o2l])

            def M32(r):
                z = _mg.vcycle(st["mg"], rt,
                               jnp.where(mask, 0.0, r.astype(jnp.float32)),
                               cheb_degree=self._mg_cheb_degree,
                               gamma_coarse=self._mg_gamma)
                return jnp.where(mask, r, z)

            # mixed-precision IR-PCG: the iteration runs entirely in f32
            # (f64 ops are emulated ~5-10x slower on TPU); the f64 operator
            # appears once per refinement round (see mg.ir_pcg)
            return _mg.ir_pcg(mv, rt["mv0"], M32, b, cg_rtol, maxiter)

        def bcr_solve(st, C_tang, b, psum, cg_rtol):
            """Block-cyclic-reduction direct solve (see ``parallel.bcr``):
            per-Newton f32 factorization of the lattice block-tridiagonal
            tangent — batched MXU Cholesky inversions + matmuls, zero
            Krylov iterations — inside f64 iterative refinement on the
            exact element-blocked operator.  The TPU-native analog of the
            reference's per-Newton MUMPS-LU."""
            from . import bcr as _bcr

            mask = st["bc_mask"]
            dof = st["dofmap"]
            keep_ext = jnp.concatenate([~mask, jnp.zeros(1, bool)])
            km32 = keep_ext[dof].astype(jnp.float32)
            # element stiffness in PURE f32: it only feeds the f32
            # factorization, so f64 assembly (emulated, ~5-10x per op) was
            # wasted work — the dense path reasons the same way.  The
            # refinement operator below never touches K_cell: it re-applies
            # the tangent CHAIN (B^T C_tang B) in f64, which costs ~8x
            # fewer f64 MACs per solve than building the f64 element
            # blocks once (profiled r5: kcell 3.0 ms of the 18.7 ms
            # 25x25 bcr_solve).
            K_cell32 = jnp.einsum("cqik,cqij,cqjl,cq->ckl",
                                  st["B"].astype(jnp.float32),
                                  C_tang.astype(jnp.float32),
                                  st["B"].astype(jnp.float32),
                                  st["wdet"].astype(jnp.float32))
            K_cell32 = K_cell32 * km32[:, :, None] * km32[:, None, :]

            def mv64(x):
                # exact f64 operator with the identity-bc-row invariant of
                # mg.ebe_matvec (same masking as the cg path's mv)
                y = tangent_matvec(st, C_tang, jnp.where(mask, 0.0, x), psum)
                return jnp.where(mask, x, y)

            m, Bb, n_lat, sentinel = self._bcr_plan
            bc = st["bcr"]
            Tflat = psum(jax.ops.segment_sum(
                K_cell32.reshape(K_cell32.shape[0], -1).ravel(),
                bc["dst"].ravel(), num_segments=sentinel + 1)[:-1])
            Tflat = Tflat.at[bc["diag_fix"]].add(1.0)
            T, d = _bcr.equilibrate(Tflat, bc["diag_slot"], m, Bb)
            fact = _bcr.bcr_factor(T, m, Bb)
            d64 = d.astype(_F)
            l2o, o2l = bc["perm_l2o"], bc["perm_o2l"]
            pad = m * Bb - n_lat

            def solve32(rr):
                r_lat = jnp.concatenate([rr[l2o], jnp.zeros(pad, _F)])
                x_lat = _bcr.bcr_apply(fact, (d * r_lat.astype(jnp.float32)))
                return (d64 * x_lat.astype(_F))[:n_lat][o2l]

            return _bcr.ir_direct(mv64, solve32, b, cg_rtol)

        def dense_solve(st, C_tang, b, psum):
            """Assembled dense tangent + Jacobi-equilibrated f32
            factorization with f64 iterative refinement (XLA:TPU has no f64
            LU).  Preferred below ~10k dofs where the MXU factorizes faster
            than sequential CG.

            The global matrix is assembled entirely in f32 (basis, tangent,
            weights) — the factorization consumes f32 anyway, and both the
            einsum and the scatter are memory-bound, so this halves their
            traffic.  Refinement residuals use the EXACT f64
            element-by-element operator action (no f64 global matrix ever
            materializes); f32 diagonal equilibration is precision-neutral.
            The default factorization keeps the INVERSE CHOLESKY FACTOR
            (``Li = inv(chol(K))``) and applies ``K^-1 = Li^T Li`` as two
            triangular matvecs; see ``_dense_fact``."""
            mask = st["bc_mask"]
            f32 = jnp.float32
            K_cell = jnp.einsum("cqik,cqij,cqjl,cq->ckl",
                                st["B"].astype(f32), C_tang.astype(f32),
                                st["B"].astype(f32), st["wdet"].astype(f32))
            K = self._assemble_dense_f32(K_cell, st["dofmap"], psum)
            keep32 = (~mask).astype(f32)
            K = K * keep32[:, None] * keep32[None, :] + jnp.diag(mask.astype(f32))
            d = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(jnp.diagonal(K)), 1e-30, None).astype(_F))
            Ks32 = K * (d[:, None] * d[None, :]).astype(f32)
            fact = self._dense_fact or (
                "lu" if next(iter(self.statics["B"].devices())).platform == "cpu"
                else "chol")
            if fact == "lu":
                lu, piv = jax.scipy.linalg.lu_factor(Ks32)

                def solve32(rr):
                    return jax.scipy.linalg.lu_solve((lu, piv), (rr * d).astype(f32)).astype(_F) * d
            elif fact == "chol":
                # inverse Cholesky factor, NO Gram product: forming the
                # explicit inverse Li^T @ Li costs an n^3 matmul (~12 ms at
                # n=5.2k on v5e) while the two-triangular-matvec apply costs
                # the same as one dense matvec (1.85 vs 1.90 ms measured) —
                # the Gram product is pure loss at <= 3 applications/Newton.
                # Cholesky breakdown (non-SPD tangent) falls back to the
                # pivoted-LU explicit inverse through the same apply.
                L = jnp.linalg.cholesky(Ks32)
                spd = jnp.isfinite(L[-1, -1])
                Li = jax.lax.cond(spd, _blocked_tri_inv,
                                  lambda _: jnp.linalg.inv(Ks32), L)

                def solve32(rr):
                    y = Li @ (rr * d).astype(f32)
                    return jnp.where(spd, Li.T @ y, y).astype(_F) * d
            else:
                # explicit inverse applied as single matvecs
                Kinv = jnp.linalg.inv(Ks32)

                def solve32(rr):
                    return (Kinv @ (rr * d).astype(f32)).astype(_F) * d

            def mv(x):
                y = tangent_matvec(st, C_tang, jnp.where(mask, 0.0, x), psum)
                return jnp.where(mask, x, y)

            x = solve32(b)
            # each pass gains ~5-6 digits (equilibrated f32 solve starts at
            # ~1e-5 relative); the count is tunable for the accuracy/time
            # trade (default validated for 1e-13-class parity)
            for _ in range(self._dense_refine):
                x = x + solve32(b - mv(x))
            return x, jnp.asarray(0)

        def one_step_core(st, Du, sigma_n, load, max_it, cg_rtol, norm0_ref, psum,
                          precond=None):
            """Full Newton solve of one load step; returns converged state.

            Do-while structure: the constitutive kernel + residual appear
            exactly ONCE in the program (inside the loop body) instead of
            twice (initial residual + body) — the kernel is by far the
            largest HLO block, and halving its instantiation count nearly
            halves the multi-minute TPU compile of this program.  The body
            evaluates the residual at the CURRENT iterate first; if it
            already satisfies the convergence test, the update is masked out
            (and the solve skipped where possible), so iteration counts and
            iterates are identical to the classic check-then-solve loop.
            ``max_it`` bounds the number of Newton UPDATES (``it`` only
            increments on an update); ``run_step_host`` drives one update
            per device execution by passing ``max_it = 1``.

            ``precond`` (elastic/lagged mode only): (Minv (n, n) f32,
            d (n,) f32) equilibrated inverse used as the Krylov
            preconditioner; the step returns a REFRESHED pair built from
            the converged tangent (one factorization per load step)."""
            nan = jnp.asarray(jnp.nan, _F)
            # elastic mode carries the f32 tangent across the loop for the
            # end-of-step preconditioner refresh; the init broadcasts from
            # sigma_n so the carry keeps its varying ("cells") axis under
            # shard_map (a plain zeros constant would be unvarying and the
            # while_loop carry types would mismatch)
            C32_0 = jnp.broadcast_to(
                (sigma_n * 0).astype(jnp.float32)[..., None],
                sigma_n.shape + (4,)) if use_elastic else jnp.zeros((), jnp.float32)

            def cond(state):
                Du, sigma, C32, norm, norm0, it, cg_tot, done = state
                return jnp.logical_and(jnp.logical_not(done), it < max_it)

            fvec = assemble_f(st, psum)

            def body(state):
                Du, sigma, C32, norm, norm0, it, cg_tot, done = state
                C_tang, sigma = constitutive(st, Du, sigma_n, psum)
                if use_elastic:
                    C32 = C_tang.astype(jnp.float32)
                r = residual(st, sigma, load, psum, fvec)
                r = apply_bc_res(st, r, Du)
                norm = jnp.sqrt(jnp.vdot(r, r))
                norm0 = jnp.where(jnp.isnan(norm0), norm, norm0)
                conv = jnp.logical_or(norm < atol, norm < rtol * norm0)
                if self.fused_forcing:
                    # Eisenstat-Walker choice 2 (alpha=2 -> eta ~ sqrt of
                    # the residual ratio), floored at cg_rtol, capped
                    eta = jnp.sqrt(jnp.clip(norm / jnp.maximum(norm0, 1e-300), 0.0, 1.0))
                    rtol_it = jnp.clip(eta, cg_rtol, self.fused_forcing)
                else:
                    rtol_it = cg_rtol
                # a converged iterate (the loop's final convergence-check
                # pass — one per load step) must not pay for a solve; the
                # masked-maxiter trick only skips the Krylov ITERATIONS, so
                # gate the whole solve (tangent assembly, factorization,
                # mg setup) behind a real branch.  ``conv`` derives from
                # psum'd norms, so every shard takes the same side.
                def _solve(_):
                    if use_dense:
                        return dense_solve(st, C_tang, -r, psum)
                    elif use_bcr:
                        return bcr_solve(st, C_tang, -r, psum, rtol_it)
                    elif use_mg:
                        return mg_solve(st, C_tang, -r, psum, rtol_it,
                                        maxiter=cg_maxiter)
                    elif use_elastic:
                        return elastic_solve(st, C_tang, -r, psum, rtol_it,
                                             cg_maxiter, precond)
                    return cg_solve(st, C_tang, -r, psum, rtol_it,
                                    maxiter=cg_maxiter)

                dx, cg_k = jax.lax.cond(
                    conv, lambda _: (jnp.zeros_like(Du), jnp.asarray(0)),
                    _solve, 0)
                Du = jnp.where(conv, Du, Du + dx)
                it = it + jnp.where(conv, 0, 1)
                return (Du, sigma, C32, norm, norm0, it,
                        cg_tot + jnp.where(conv, 0, cg_k), conv)

            zero = jnp.asarray(0)
            # norm0_ref: host-supplied reference norm for the rtol test (the
            # host-driven path calls one update at a time and carries norm0
            # across executions); NaN = self-initialize from the first
            # residual (the fused path).
            state = (Du, jnp.zeros_like(sigma_n), C32_0, nan, norm0_ref,
                     zero, zero, jnp.asarray(False))
            Du, sigma, C32, norm, norm0, it, cg_tot, done = \
                jax.lax.while_loop(cond, body, state)
            if not use_elastic:
                return Du, sigma, norm, it, cg_tot
            # refresh the lagged preconditioner from the converged tangent:
            # one dense f32 assembly + inversion per LOAD STEP (vs the
            # reference's per-Newton-iteration MUMPS refactorization)
            dof = st["dofmap"]
            mask = st["bc_mask"]
            keep_ext = jnp.concatenate([~mask, jnp.zeros(1, bool)])
            km = keep_ext[dof].astype(jnp.float32)
            B32 = st["B"].astype(jnp.float32)
            w32 = st["wdet"].astype(jnp.float32)
            K_cell = jnp.einsum("cqik,cqij,cqjl,cq->ckl", B32, C32, B32, w32)
            K_cell = K_cell * km[:, :, None] * km[:, None, :]
            Kd = self._assemble_dense_f32(K_cell, dof, psum)
            Kd = Kd + jnp.diag(mask.astype(jnp.float32))
            d_new = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(jnp.diagonal(Kd)), 1e-30, None))
            Minv_new = _spd_inv_chol(Kd * d_new[:, None] * d_new[None, :])
            return Du, sigma, norm, it, cg_tot, Minv_new, d_new

        if dm is None:
            if use_elastic:
                def step(st, Du, sigma_n, load, max_it, cg_rtol, norm0_ref, Minv, d):
                    return one_step_core(st, Du, sigma_n, load, max_it, cg_rtol,
                                         norm0_ref, lambda x: x, precond=(Minv, d))
            else:
                def step(st, Du, sigma_n, load, max_it, cg_rtol, norm0_ref):
                    return one_step_core(st, Du, sigma_n, load, max_it, cg_rtol,
                                         norm0_ref, lambda x: x)

            return jax.jit(step)

        st_spec = self._st_spec
        psum = lambda x: jax.lax.psum(x, "cells")

        if use_elastic:
            @partial(
                shard_map, mesh=dm,
                in_specs=(st_spec, P(), P("cells"), P(), P(), P(), P(), P(), P()),
                out_specs=(P(), P("cells"), P(), P(), P(), P(), P()),
            )
            def sharded_step(st, Du, sigma_n, load, max_it, cg_rtol, norm0_ref, Minv, d):
                return one_step_core(st, Du, sigma_n, load, max_it, cg_rtol,
                                     norm0_ref, psum, precond=(Minv, d))
        else:
            @partial(
                shard_map, mesh=dm,
                in_specs=(st_spec, P(), P("cells"), P(), P(), P(), P()),
                out_specs=(P(), P("cells"), P(), P(), P()),
            )
            def sharded_step(st, Du, sigma_n, load, max_it, cg_rtol, norm0_ref):
                return one_step_core(st, Du, sigma_n, load, max_it, cg_rtol,
                                     norm0_ref, psum)

        return jax.jit(sharded_step)

    # ------------------------------------------------------------------
    def _build_schedule(self):
        """Whole-schedule program: ``lax.scan`` of the compiled step over a
        load array — ONE device execution for the full load-stepping run."""
        step = self._step
        nan = jnp.asarray(jnp.nan, _F)
        elastic = self.linear_solver == "elastic"

        def sched(st, Du, sigma_n, loads, max_it, cg_rtol, *precond):
            def body(carry, load):
                if elastic:
                    Du, sig, Minv, d = carry
                    Du, sig, norm, its, cg, Minv, d = step(
                        st, Du, sig, load, max_it, cg_rtol, nan, Minv, d)
                    return (Du, sig, Minv, d), (norm, its, cg)
                Du, sig = carry
                Du, sig, norm, its, cg = step(st, Du, sig, load, max_it,
                                              cg_rtol, nan)
                return (Du, sig), (norm, its, cg)

            init = (Du, sigma_n) + tuple(precond)
            return jax.lax.scan(body, init, loads)

        return jax.jit(sched)

    def run_schedule(self, loads, Du=None, sigma_n=None):
        """Run ALL load steps in one device execution.

        Equivalent to calling ``run_step`` over ``loads`` (state commit
        between steps included), but the whole schedule is a single
        compiled program: no per-step dispatch/sync round trips (~10 ms
        each through this machine's TPU tunnel — ~0.5 s over the 52-step
        slope schedule).  Returns ``(Du, sigma, norms, newton_its,
        cg_its)`` with per-step history arrays.

        Only for runs whose total device time stays under the tunnel's
        ~60 s per-execution kill limit; use ``run_step`` /
        ``run_step_host`` beyond that (NOTES.md "TPU runtime
        constraints")."""
        if Du is None or sigma_n is None:
            Du0, sig0 = self.zero_state()
            Du = Du0 if Du is None else Du
            sigma_n = sig0 if sigma_n is None else sigma_n
        if getattr(self, "_sched_for", None) is not self._step:
            self._sched = self._build_schedule()
            self._sched_for = self._step
        loads = jnp.asarray(np.asarray(loads, dtype=np.float64), _F)
        args = (self.statics, Du, sigma_n, loads,
                jnp.asarray(self.newton_max_it), jnp.asarray(self.cg_rtol, _F))
        if self.linear_solver == "elastic":
            carry, hist = self._sched(*args, *self._el_precond)
            Du, sigma = carry[0], carry[1]
            self._el_precond = (carry[2], carry[3])
        else:
            (Du, sigma), hist = self._sched(*args)
        norms, its, cgs = hist
        return Du, sigma, norms, its, cgs

    def run_step(self, Du, sigma_n, load):
        """One load step: (Du, sigma_n (nc_pad, nq, 4), load scalar) ->
        (Du_new, sigma (nc_pad, nq, 4), residual_norm, newton_its, cg_its).

        Elastic/lagged mode additionally carries the per-step-refreshed
        preconditioner on ``self`` (it affects only inner-iteration counts,
        never the Newton iterates — solves run to the same tolerance)."""
        args = (self.statics, Du, sigma_n, jnp.asarray(load, _F),
                jnp.asarray(self.newton_max_it), jnp.asarray(self.cg_rtol, _F),
                jnp.asarray(jnp.nan, _F))
        if self.linear_solver == "elastic":
            out = self._step(*args, *self._el_precond)
            self._el_precond = (out[5], out[6])
            return out[:5]
        return self._step(*args)

    def run_step_host(self, Du, sigma_n, load, forcing=True):
        """One load step with a HOST-driven Newton loop: each device
        execution performs exactly ONE Newton update (the same compiled
        program as ``run_step``, called with ``max_it = 1``).

        Two reasons to prefer this at scale: (a) single device executions
        stay short — this machine's TPU tunnel kills executions beyond
        ~60 s, which a fused multi-Newton step with thousands of CG
        iterations exceeds; (b) ``forcing=True`` applies Eisenstat-Walker
        inexact-Newton CG tolerances (loose solves far from the root,
        ``cg_rtol`` for the endgame), typically halving total CG work.
        The host round-trip per Newton iteration (~30 ms) is negligible
        against the multi-second solves this path targets.

        The true ``rtol * norm0`` convergence target is preserved across
        executions by feeding the first iterate's norm back in as
        ``norm0_ref`` (the device body self-initializes its reference norm
        otherwise, which would degenerate the rtol test); the loop ends on
        an execution that performs no update (``its == 0``) — that final
        execution also recomputes ``sigma`` at the converged iterate.
        Raises ``RuntimeError`` if ``newton_max_it`` updates do not reach
        ``max(atol, rtol * norm0)``."""
        one_it = jnp.asarray(1)
        load = jnp.asarray(load, _F)
        its_total = 0
        cg_total = 0
        norm0 = None
        norm = None
        sigma = sigma_n
        converged = False
        # up to newton_max_it updating executions + one closing its==0
        # execution; the loop cannot stop mid-budget without the closing
        # execution because each execution reports the residual of the
        # iterate it STARTED from (the post-update residual is only known
        # to the next execution)
        for _ in range(self.newton_max_it + 1):
            if forcing and norm0 is not None and norm is not None and norm0 > 0:
                eta = float(np.sqrt(max(min(norm / norm0, 1.0), 0.0)))
                rtol_eff = max(min(0.1, eta), self.cg_rtol)
            else:
                rtol_eff = min(1e-2, max(self.cg_rtol, 1e-6)) if forcing else self.cg_rtol
            norm0_ref = jnp.asarray(jnp.nan if norm0 is None else norm0, _F)
            args = (self.statics, Du, sigma_n, load, one_it,
                    jnp.asarray(rtol_eff, _F), norm0_ref)
            if self.linear_solver == "elastic":
                out = self._step(*args, *self._el_precond)
                self._el_precond = (out[5], out[6])
                Du, sigma, norm_j, its, cg = out[:5]
            else:
                Du, sigma, norm_j, its, cg = self._step(*args)
            norm = float(norm_j)
            its_total += int(its)
            cg_total += int(cg)
            if norm0 is None:
                norm0 = norm
            if int(its) == 0:  # converged: no update; sigma is at this iterate
                converged = True
                break
        if not converged:
            # its_total may be newton_max_it + 1 here: the final execution
            # is the only chance to OBSERVE convergence of the max_it-th
            # update (its == 0), and if that iterate was still unconverged
            # it performed one further update whose residual is unknown —
            # quote the last OBSERVED residual and the update count honestly
            raise RuntimeError(
                f"host-driven Newton failed to converge within "
                f"{self.newton_max_it} updates ({its_total} performed; last "
                f"observed |r| = {norm:.3e} predates the final update), "
                f"target {max(self.newton_atol, self.newton_rtol * (norm0 or 0.0)):.3e}")
        return Du, sigma, norm_j, jnp.asarray(its_total), jnp.asarray(cg_total)

    def zero_state(self):
        sig = jnp.zeros((self.nc_pad, self.nq, 4), _F)
        Du = jnp.zeros(self.n_dofs, _F)
        if self.device_mesh is not None:
            sig = jax.device_put(sig, NamedSharding(self.device_mesh, P("cells")))
            Du = jax.device_put(Du, NamedSharding(self.device_mesh, P()))
        return Du, sig
