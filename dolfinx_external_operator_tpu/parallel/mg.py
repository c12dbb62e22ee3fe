"""Multigrid-preconditioned CG: the scalable replacement for MUMPS-LU.

The reference solves every linear system with a direct sparse LU
(``demo_plasticity_mohr_coulomb.py:662-672`` — PETSc ``preonly`` + MUMPS).
XLA:TPU has no sparse factorization and its dense LU is panel-sequential, so
the TPU-native equivalent with the same role (near-mesh-independent solve
cost inside Newton) is an aggregation ALGEBRAIC MULTIGRID V-cycle used as a
CG preconditioner, built so the per-Newton work is pure
gather/einsum/segment-sum — no host round-trips, no dynamic shapes:

* **Setup is split host/device.**  The hierarchy STRUCTURE (transfer
  sparsity, Galerkin-product index maps, ELL layouts) is built ONCE on the
  host from the ELASTIC operator (scipy); it is geometry/elasticity data and
  does not change as the material yields.  The per-Newton VALUES (the
  consistent elastoplastic tangent changes every iteration) are recomputed
  on-device through fixed maps: the P1 coarse matrix is a per-cell `einsum`
  triple product, deeper levels are flat `segment_sum` Galerkin scatters.
* **Level 0** (the Pk displacement space) stays matrix-free element-blocked:
  smoothing matvecs use per-cell (nk, nk) tangent blocks in f32.
* **Level 1** is the P1 (vertex) space on the same mesh — the P2->P1
  restriction is nested and cell-local, so its Galerkin product is an exact
  per-cell triple product.
* **Levels 2+** coarsen by greedy node aggregation with the 2D rigid-body
  modes (translation x/y + rotation) as the tentative nullspace — the
  standard (smoothed-)aggregation construction; the prolongator can be
  Jacobi-smoothed against the frozen elastic operator (``smooth_sa``).
* **Smoother**: Chebyshev/Jacobi of fixed degree => the cycle is a FIXED
  linear operator, as CG requires; per-level spectral radii are estimated
  on-device by a few power iterations at each Newton setup.
* **Coarsest level** (~100-300 dofs): explicit dense f32 inverse computed
  once per setup (XLA triangular solves are row-sequential on TPU; an
  (nL, nL) matvec per application is microseconds).

All preconditioner arithmetic is f32 (TPU-native); the outer CG runs in
(emulated) f64 with the exact element-blocked operator.  A W-cycle
(gamma=2) is used below level 1: the cheap coarse levels absorb the weaker
unsmoothed-aggregation transfers there.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

__all__ = ["build_mg_statics", "mg_setup", "vcycle", "ir_pcg"]

_F32 = jnp.float32

_I = np.int32


# ======================================================================
# Host-side hierarchy construction (scipy/numpy, runs once per problem)
# ======================================================================

def _csr_from_blocks(blocks, dofmap, n):
    """Assemble (nc, nk, nk) element blocks into an n x n CSR."""
    nk = blocks.shape[1]
    rows = np.repeat(dofmap, nk, axis=1).ravel()
    cols = np.tile(dofmap, (1, nk)).ravel()
    # tocsr() sums duplicates in C; the explicit python-side
    # coo.sum_duplicates() lexsorts the same 46M entries (at 200x200)
    # a second time for ~15 s of pure overhead
    return sp.coo_matrix((blocks.ravel(), (rows, cols)), shape=(n, n)).tocsr()


def _eliminate_bc(A, bc_mask):
    """Zero bc rows/cols, unit diagonal (symmetric elimination)."""
    keep = sp.diags((~bc_mask).astype(np.float64))
    return (keep @ A @ keep + sp.diags(bc_mask.astype(np.float64))).tocsr()


def _zero_rows(P, mask):
    if mask is None or not mask.any():
        return P.tocsr()
    keep = sp.diags((~mask).astype(np.float64))
    return (keep @ P).tocsr()


def _p2_to_p1_interpolation(mesh, bs, bc_mask):
    """Geometric P2->P1 interpolation on the same mesh (scalar dof order:
    vertices then edge midpoints — see ``FunctionSpace._build_dofmap``).
    Rows at Dirichlet dofs are zeroed (coarse corrections stay in the
    homogeneous space).  Returns CSR of shape (n_p2*bs, n_p1*bs)."""
    nv = mesh.num_vertices
    ne = mesh.num_edges
    edges = mesh.edges.astype(np.int64)
    rows = np.concatenate([np.arange(nv), nv + np.arange(ne), nv + np.arange(ne)])
    cols = np.concatenate([np.arange(nv), edges[:, 0], edges[:, 1]])
    vals = np.concatenate([np.ones(nv), np.full(ne, 0.5), np.full(ne, 0.5)])
    P_s = sp.coo_matrix((vals, (rows, cols)), shape=(nv + ne, nv)).tocsr()
    return _zero_rows(sp.kron(P_s, sp.eye(bs), format="csr"), bc_mask)


def _block_graph(A, bs):
    """Collapse a dof-level sparse matrix to a node-level |.|-sum graph."""
    n_nodes = A.shape[0] // bs
    ind = sp.coo_matrix(
        (np.ones(A.shape[0]), (np.arange(A.shape[0]) // bs, np.arange(A.shape[0]))),
        shape=(n_nodes, A.shape[0]),
    ).tocsr()
    return (ind @ abs(A.tocsr()) @ ind.T).tocsr()


def _aggregate(G):
    """Greedy standard aggregation (PyAMG-style, two passes) on a node
    graph G (CSR; self-loops ignored).  Returns (agg_id (n,), n_agg)."""
    n = G.shape[0]
    agg = np.full(n, -1, dtype=np.int64)
    indptr, indices = G.indptr, G.indices
    n_agg = 0
    for i in range(n):  # pass 1: roots with fully-unaggregated neighborhoods
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        nbrs = nbrs[nbrs != i]
        if np.all(agg[nbrs] == -1):
            agg[i] = n_agg
            agg[nbrs] = n_agg
            n_agg += 1
    for i in range(n):  # pass 2: join the most-connected aggregated neighbor
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        nbrs = nbrs[nbrs != i]
        cand = agg[nbrs]
        cand = cand[cand != -1]
        if cand.size:
            agg[i] = np.bincount(cand).argmax()
        else:  # isolated node: own aggregate
            agg[i] = n_agg
            n_agg += 1
    return agg, n_agg


def _tentative_rbm(agg, n_agg, B, bs):
    """Tentative prolongator from the near-nullspace B (n_dofs, nns) with
    per-aggregate QR orthonormalization (the standard SA construction).
    Returns (T CSR (n_dofs, n_agg*nns), B_coarse (n_agg*nns, nns))."""
    n_dofs, nns = B.shape
    agg_of_dof = agg[np.arange(n_dofs) // bs]
    order = np.argsort(agg_of_dof, kind="stable")
    bounds = np.searchsorted(agg_of_dof[order], np.arange(n_agg + 1))
    rows, cols, vals = [], [], []
    Bc = np.zeros((n_agg * nns, nns))
    for a in range(n_agg):
        dofs = order[bounds[a]:bounds[a + 1]]
        Q, R = np.linalg.qr(B[dofs, :])
        d = np.abs(np.diag(R))
        keep = d > 1e-10 * max(d.max(), 1e-300)  # rank guard (tiny aggregates)
        Q = Q[:, keep]
        k = int(keep.sum())
        rows.append(np.repeat(dofs, k))
        cols.append(np.tile(a * nns + np.flatnonzero(keep), dofs.size))
        vals.append(Q.ravel())
        Bc[a * nns + np.flatnonzero(keep), :] = R[keep, :]
    T = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_dofs, n_agg * nns),
    ).tocsr()
    return T, Bc


def _lmax_dinv_a(A, iters=20):
    """Host power-iteration estimate of lambda_max(D^-1 A)."""
    d = A.diagonal()
    d = np.where(np.abs(d) > 1e-300, d, 1.0)
    x = np.cos(1.234 * np.arange(A.shape[0]))
    lam = 1.0
    for _ in range(iters):
        x = (A @ x) / d
        lam = np.linalg.norm(x)
        x = x / max(lam, 1e-300)
    return lam


class _EllLayout:
    """Padded-ELL view of a CSR pattern with vectorized (i, j) -> flat-slot
    lookup (flat slot = row * m + position-in-row)."""

    def __init__(self, A):
        A = A.tocsr()
        A.sort_indices()
        self.n = A.shape[0]
        counts = np.diff(A.indptr)
        self.m = max(int(counts.max()) if self.n else 0, 1)
        nnz = A.indptr[-1]
        rows = np.repeat(np.arange(self.n), counts)
        pos = np.arange(nnz) - A.indptr[rows]
        cols = np.tile(np.arange(self.n)[:, None], (1, self.m))  # pad: own row
        cols[rows, pos] = A.indices
        self.cols = cols
        self.indptr = A.indptr
        self.indices = A.indices
        # sorted row-major keys for vectorized membership lookup
        self._keys = rows.astype(np.int64) * self.n + A.indices.astype(np.int64)
        self._rows = rows
        self.diag_slot = self.lookup(np.arange(self.n), np.arange(self.n))

    def lookup(self, i, j, missing=None):
        """Flat ELL slots for (i, j) pairs; entries not in the pattern get
        ``missing`` (default: raises)."""
        i = np.asarray(i, np.int64)
        j = np.asarray(j, np.int64)
        key = i * self.n + j
        p = np.searchsorted(self._keys, key)
        p = np.minimum(p, len(self._keys) - 1)
        found = self._keys[p] == key
        if missing is None:
            assert found.all(), "pattern lookup miss"
        slot = self._rows[p].astype(np.int64) * self.m + (p - self.indptr[self._rows[p]])
        if missing is not None:
            slot = np.where(found, slot, missing)
        return slot


def _padded_rows(P):
    """CSR rows -> (idx (n, pmax), w (n, pmax)) with zero-weight padding."""
    P = P.tocsr()
    P.sort_indices()
    n = P.shape[0]
    counts = np.diff(P.indptr)
    pmax = max(int(counts.max()) if n else 0, 1)
    nnz = P.indptr[-1]
    rows = np.repeat(np.arange(n), counts)
    pos = np.arange(nnz) - P.indptr[rows]
    idx = np.zeros((n, pmax), dtype=np.int64)
    w = np.zeros((n, pmax))
    idx[rows, pos] = P.indices
    w[rows, pos] = P.data
    return idx, w


def _block_gather_form(P, bs_r, bs_c):
    """Row-block gather form of a CSR matrix: for each bs_r-row block, the
    padded list of bs_c-column blocks it touches (idx, (nrb, K)) and the
    dense per-pair weight blocks (w, (nrb, bs_r, K, bs_c)).

    ``y = P @ x`` then becomes a gather of K column blocks per row block
    plus a tiny einsum — no scatter, and bs_r*bs_c weight entries ride on
    one gathered block.  TPU gathers cost ~10-15 ns per gathered ELEMENT
    regardless of table size, so blocking cuts the transfer cost by
    ~bs_r*bs_c/(block sparsity overhead); applying the same form to P^T
    turns the restriction's segment_sum (scatter-add, the slowest XLA:TPU
    primitive here) into a gather as well."""
    n_r, n_col = P.shape
    nrb, ncb = n_r // bs_r, n_col // bs_c
    C = P.tocoo()
    rb = C.row.astype(np.int64) // bs_r
    cb = C.col.astype(np.int64) // bs_c
    key = rb * np.int64(ncb) + cb
    pairs = np.unique(key)
    prb = pairs // ncb
    counts = np.bincount(prb, minlength=nrb)
    kmax = max(int(counts.max()) if nrb else 0, 1)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(pairs.size) - np.repeat(starts, counts)
    idx = np.zeros((nrb, kmax), dtype=np.int64)
    idx[prb, slot] = pairs % ncb
    w = np.zeros((nrb, bs_r, kmax, bs_c), dtype=np.float32)
    pos = np.searchsorted(pairs, key)
    w[rb, C.row % bs_r, slot[pos], C.col % bs_c] = C.data
    return idx, w


def _block_transfer_forms(P, bs_f, bs_c, max_pad=512):
    """Both directions of a prolongator in block gather form (see
    _block_gather_form): Pb_* applies P (prolong, fine rows), Rb_* applies
    P^T (restrict, coarse rows).  Returns None when a row block would need
    more than ``max_pad`` padded column blocks (pathological aggregation —
    fall back to the scalar forms)."""
    P = P.tocsr()
    n_f, n_c = P.shape
    if n_f % bs_f or n_c % bs_c:
        return None
    Pb_idx, Pb_w = _block_gather_form(P, bs_f, bs_c)
    Rb_idx, Rb_w = _block_gather_form(P.T.tocsr(), bs_c, bs_f)
    if Pb_idx.shape[1] > max_pad or Rb_idx.shape[1] > max_pad:
        return None
    return {"Pb_idx": Pb_idx.astype(_I), "Pb_w": Pb_w,
            "Rb_idx": Rb_idx.astype(_I), "Rb_w": Rb_w}


def _galerkin_contrib_map(ell_f, P, ell_c):
    """Flat contribution map for  A_c[I,J] += P[i,I] * A_f[i,j] * P[j,J]
    over FIXED patterns: (src_flat, weight, dst_flat) into the fine/coarse
    ELL value vectors.  Vectorized over (fine nnz) x (P-row pairs)."""
    fi = ell_f._rows
    fj = ell_f.indices
    src_flat = fi.astype(np.int64) * ell_f.m + (np.arange(len(fj)) - ell_f.indptr[fi])
    Pr_idx, Pr_w = _padded_rows(P)
    src, wgt, dst = [], [], []
    for a in range(Pr_idx.shape[1]):
        I = Pr_idx[fi, a]
        wi = Pr_w[fi, a]
        for b in range(Pr_idx.shape[1]):
            J = Pr_idx[fj, b]
            w = wi * Pr_w[fj, b]
            keep = w != 0.0
            if not keep.any():
                continue
            d = ell_c.lookup(I[keep], J[keep])
            src.append(src_flat[keep])
            wgt.append(w[keep])
            dst.append(d)
    src = np.concatenate(src)
    wgt = np.concatenate(wgt)
    dst = np.concatenate(dst)
    # sort by destination: segment_sum takes the fast sorted-indices path
    order = np.argsort(dst, kind="stable")
    return (src[order].astype(_I), wgt[order], dst[order].astype(_I))


def _lattice_node_perm(coords):
    """Detect tensor-product lattice structure in 2D node coordinates.

    Structured-rectangle meshes (``create_rectangle``; the headline slope
    problems) place every scalar dof of a P1/P2 space on a complete
    (nx, ny) grid — P2 midpoints fill the odd slots of the refined
    lattice.  Returns ``perm_l2o`` (lattice slot -> node index, row-major
    in (y, x)) or ``None`` when the node set is not a complete grid.
    Uniform spacing is NOT required — only a bijection onto a tensor grid,
    which is what gives the operator a fixed set of index offsets."""
    n = coords.shape[0]
    if coords.shape[1] != 2 or n == 0:
        return None
    xr = np.round(coords[:, 0], 9)
    yr = np.round(coords[:, 1], 9)
    xs = np.unique(xr)
    ys = np.unique(yr)
    if len(xs) * len(ys) != n:
        return None
    i = np.searchsorted(xs, xr)
    j = np.searchsorted(ys, yr)
    key = j.astype(np.int64) * len(xs) + i
    if np.unique(key).size != n:
        return None
    return np.argsort(key, kind="stable"), (len(ys), len(xs))


def _dia_matvec(bands, offsets, free_lat, x):
    """Banded (DIA) matvec in lattice numbering with identity bc rows.

    ``bands`` (nb, n): band k holds A[r, r + offsets[k]] at slot r;
    ``offsets`` a STATIC tuple of ints.  The matvec is shifted slices +
    FMAs — zero gathers/scatters, which on TPU cost ~15 ns per indexed
    element and dominate every other operator format (NOTES.md op-cost
    table).  Out-of-range slots hold zeros by construction (no wraparound:
    band values come from actual pattern entries).

    PRECONDITION (same as ``ebe_matvec``): the band values must come from
    bc-MASKED element blocks (km outer product) — x is NOT zeroed at bc
    dofs here, so unmasked bc-column entries would leak bc components of
    x into free rows and break the identity-bc-row invariant
    (DESIGN.md / the inner-CG stagnation regression)."""
    n = x.shape[0]
    dt = bands.dtype
    w = max(max(abs(o) for o in offsets), 1)
    xp = jnp.zeros(n + 2 * w, dt).at[w:w + n].set(x.astype(dt))
    out = jnp.zeros(n, dt)
    for k, off in enumerate(offsets):
        out = out + bands[k] * jax.lax.dynamic_slice_in_dim(xp, w + off, n)
    if free_lat is None:  # coarse levels: plain matvec (zero bc rows),
        return out        # mirroring _ell_matvec semantics
    return jnp.where(free_lat, out, x.astype(dt))


def _transfer0_stencil(P0_lat, shape0, shape1, bs, mask0_lat):
    """Derive a 2:1 inter-grid stencil from the (fully lattice-numbered)
    P2->P1 interpolation matrix: offsets (dj, di, w) such that
    ``P0[(2J+dj, 2I+di, c), (J, I, c)] == w`` for every in-range,
    non-bc row.  Verified EXACTLY against P0 by reconstruction — any
    mismatch (non-uniform weights, component coupling, non-nested
    interpolation) returns None and callers keep the gather-based
    transfer.  With a stencil, restrict/prolong become strided slices —
    no gathers (at 100x100 the transfer gathers are ~324k indexed
    elements each, a real share of a cycle once the matvecs are DIA)."""
    ny0, nx0 = shape0
    ny1, nx1 = shape1
    coo = P0_lat.tocoo()
    rnode, rcomp = coo.row // bs, coo.row % bs
    cnode, ccomp = coo.col // bs, coo.col % bs
    if np.any(rcomp != ccomp):
        return None
    rj, ri = rnode // nx0, rnode % nx0
    cj, ci = cnode // nx1, cnode % nx1
    dj, di = rj - 2 * cj, ri - 2 * ci
    if dj.size == 0 or np.abs(dj).max() > 3 or np.abs(di).max() > 3:
        return None
    key = (dj + 4) * 8 + (di + 4)
    stencil = []
    for k in np.unique(key):
        m = key == k
        w = coo.data[m]
        if np.ptp(w) > 1e-12:
            return None
        stencil.append((int(dj[m][0]), int(di[m][0]), float(w[0])))
    # exact reconstruction check
    J, I = np.mgrid[0:ny1, 0:nx1]
    rows_h, cols_h, vals_h = [], [], []
    for dj_, di_, w_ in stencil:
        rj_ = 2 * J + dj_
        ri_ = 2 * I + di_
        ok = (rj_ >= 0) & (rj_ < ny0) & (ri_ >= 0) & (ri_ < nx0)
        rn = (rj_ * nx0 + ri_)[ok]
        cn = (J * nx1 + I)[ok]
        for c in range(bs):
            r_ = rn * bs + c
            keep = ~mask0_lat[r_]
            rows_h.append(r_[keep])
            cols_h.append((cn * bs + c)[keep])
            vals_h.append(np.full(int(keep.sum()), w_))
    P_hat = sp.coo_matrix(
        (np.concatenate(vals_h), (np.concatenate(rows_h), np.concatenate(cols_h))),
        shape=P0_lat.shape).tocsr()
    diff = abs(P_hat - P0_lat)
    if diff.nnz and diff.max() > 1e-12:
        return None
    return tuple(stencil)


def _stencil_restrict(r_f, stencil, shape0, shape1, bs, free0):
    """r_c = P0^T r_f as strided slices (see _transfer0_stencil)."""
    ny0, nx0 = shape0
    ny1, nx1 = shape1
    pad = 4
    g = jnp.where(free0, r_f, 0.0).reshape(ny0, nx0, bs)
    gp = jnp.pad(g, ((pad, pad), (pad, pad), (0, 0)))
    out = jnp.zeros((ny1, nx1, bs), g.dtype)
    for dj, di, w in stencil:
        sub = jax.lax.slice(gp, (pad + dj, pad + di, 0),
                            (pad + dj + 2 * ny1 - 1, pad + di + 2 * nx1 - 1, bs),
                            (2, 2, 1))
        out = out + w * sub
    return out.reshape(-1)


def _stencil_prolong(x_c, stencil, shape0, shape1, bs, free0):
    """x_f = P0 x_c, scatter-free: per parity class the target sub-grid is
    a weighted sum of shifted coarse slices; classes are re-interleaved by
    stack+reshape (no strided scatter — XLA lowers those to full
    scatters)."""
    ny0, nx0 = shape0
    ny1, nx1 = shape1
    pad = 2
    g1 = jnp.pad(x_c.reshape(ny1, nx1, bs), ((pad, pad), (pad, pad), (0, 0)))

    def cls(pj, pi):
        R = ny1 if pj == 0 else ny1 - 1
        C = nx1 if pi == 0 else nx1 - 1
        acc = jnp.zeros((R, C, bs), x_c.dtype)
        for dj, di, w in stencil:
            if (dj - pj) % 2 or (di - pi) % 2:
                continue
            aj = (dj - pj) // 2
            ai = (di - pi) // 2
            acc = acc + w * jax.lax.slice(
                g1, (pad - aj, pad - ai, 0), (pad - aj + R, pad - ai + C, bs))
        return acc

    def colmix(e, o):
        o = jnp.pad(o, ((0, 0), (0, e.shape[1] - o.shape[1]), (0, 0)))
        return jnp.stack([e, o], axis=2).reshape(e.shape[0], -1, bs)[:, :nx0]

    rows_even = colmix(cls(0, 0), cls(0, 1))       # (ny1, nx0, bs)
    rows_odd = colmix(cls(1, 0), cls(1, 1))        # (ny1-1, nx0, bs)
    rows_odd = jnp.pad(rows_odd, ((0, 1), (0, 0), (0, 0)))
    out = jnp.stack([rows_even, rows_odd], axis=1).reshape(-1, nx0, bs)[:ny0]
    return jnp.where(free0, out.reshape(-1), 0.0)


def _ell_vals_from_csr(K, ell):
    """Map CSR values into an ELL layout's flat value vector (the layout's
    pattern is a structural superset of K's by construction)."""
    K = K.tocsr()
    K.sort_indices()
    rows = np.repeat(np.arange(K.shape[0]), np.diff(K.indptr))
    slots = ell.lookup(rows, K.indices)
    vals = np.zeros(ell.n * ell.m, dtype=np.float32)
    vals[slots] = K.data
    return vals.reshape(ell.n, ell.m)


def build_mg_statics(mesh, V, bc_mask, K0_cell_elastic, *,
                     coarse_target=150, max_levels=8, smooth_sa=True,
                     cheb_degree=3, galerkin_levels=None, dia=False,
                     agg_reach=(1, 1), verbose=False):
    """Build the fixed multigrid hierarchy (host, once per problem).

    Parameters
    ----------
    mesh, V : the framework mesh and displacement space (P1/P2 vector, 2D).
    bc_mask : (n_dofs,) bool Dirichlet mask.
    K0_cell_elastic : (nc, nk, nk) ELASTIC element stiffness blocks — the
        sparsity/aggregation/smoothing proxy for the evolving tangent.
    smooth_sa : Jacobi-smooth the aggregation prolongators against the
        frozen elastic operator (default True: measured ~1.7x fewer CG
        iterations on the slope problem at identical Newton counts, at the
        cost of larger Galerkin maps — ~24M contribution entries at
        100x100; the geometric P2->P1 transfer is never smoothed, it is
        already the exact nested interpolation).
    galerkin_levels : number of hierarchy levels below level 0 whose VALUES
        are recomputed from the current tangent every Newton iteration.
        ``None`` (default) = all of them.  ``1`` = only the P1 level tracks
        the tangent (cheap cell-local einsum); deeper levels keep FROZEN
        values Galerkin-projected from the ELASTIC operator at build time.
        The frozen levels only steer the smooth/coarse end of a
        preconditioner, so the cost is a few extra CG iterations while the
        per-Newton Galerkin segment-sums AND the contribution maps
        disappear — at 200x200 those maps are ~1.2 GB of device statics
        (~97% of the hierarchy) and ~95M summed entries per Newton, which
        is what made the full-Galerkin variant untransportable through the
        single-chip tunnel.
    agg_reach : per-algebraic-level aggregation radius (last entry repeats
        for deeper levels).  1 = standard root-node aggregation; 2 =
        distance-2 (aggregate over G + G^2) for ~3-4x bigger aggregates —
        see the comment at the aggregation loop for when it pays.

    Returns a dict of HOST (numpy) arrays consumed by ``mg_setup``/
    ``vcycle`` after the caller device-puts them (see FusedPlasticityStep).
    """
    bs = V.bs
    if bs != 2:
        # typed error (not assert): reachable from user petsc_options
        # (pc_type='mg' on a scalar space, e.g. the heat demos), and an
        # -O run must not silently build a bs=2 RBM nullspace for it
        raise NotImplementedError(
            "the mg hierarchy implements the 2D vector (rigid-body-mode) "
            f"case, bs == 2; this space has bs == {bs} — use "
            "pc_type='jacobi' (ksp_type='cg') instead")
    n0 = V.num_dofs
    dm0 = V.unrolled_dofmap.astype(np.int64)
    bc_mask = np.asarray(bc_mask, dtype=bool)

    K0_raw = _csr_from_blocks(np.asarray(K0_cell_elastic, np.float64), dm0, n0)
    K0 = _eliminate_bc(K0_raw, bc_mask)

    # ---- internal lattice numbering (dia mode) ----------------------------
    # On lattice-structured meshes the level-0 AND level-1 operators become
    # stencil-banded in lexicographic numberings (see _dia_matvec): the
    # whole f32 inner iteration then runs in the lattice layout, with the
    # permutation paid only at the refinement-round boundary (ir_pcg
    # to_inner/from_inner).  Everything framework-facing keeps the
    # original numbering.  LEVEL-1 side: the hierarchy below level 0 is
    # simply BUILT in the permuted numbering (P0 columns, vdofs, RBM rows),
    # so ELL layouts, Galerkin maps and aggregation stay numbering-agnostic.
    dia_info = None
    perm1_l2o = perm1_o2l = None
    degree = V.element.degree
    if dia and degree in (1, 2):
        if degree == 2:
            node_xy = np.vstack([mesh.points[:, :2],
                                 mesh.points[mesh.edges, :2].mean(axis=1)])
        else:
            node_xy = mesh.points[:, :2]
        det0 = _lattice_node_perm(node_xy)
        det1 = det0 if degree == 1 else _lattice_node_perm(mesh.points[:, :2])
        if det0 is not None and det1 is not None:
            node_perm, shape0 = det0
            vert_perm, shape1 = det1
            perm0_l2o = (node_perm[:, None] * bs
                         + np.arange(bs)[None, :]).ravel()  # lattice dof -> orig dof
            perm0_o2l = np.empty(n0, np.int64)
            perm0_o2l[perm0_l2o] = np.arange(n0)
            coo = K0_raw.tocoo()
            offs = np.unique(perm0_o2l[coo.col] - perm0_o2l[coo.row])
            if offs.size <= 128:
                # contribution map: (cell, a, b) -> band(col-row)*n0 + row,
                # all in lattice numbering; every pair is structurally in
                # K0_raw by construction so the searchsorted always hits
                rlat = perm0_o2l[dm0]  # (nc, nk0)
                off_ab = rlat[:, None, :] - rlat[:, :, None]  # (nc, a, b): col-row
                band = np.searchsorted(offs, off_ab)
                dia0_dst = (band * np.int64(n0)
                            + rlat[:, :, None]).reshape(mesh.num_cells, -1)
                dia_info = {
                    "dia0_dst": dia0_dst.astype(np.int64 if offs.size * n0 > 2**31 - 1 else _I),
                    "perm0_l2o": perm0_l2o.astype(_I),
                    "perm0_o2l": perm0_o2l.astype(_I),
                    "mask0_lat": bc_mask[perm0_l2o],
                    "dia0_offsets": tuple(int(o) for o in offs),
                    "lat_shapes": (shape0, shape1),
                }
                perm1_l2o = (vert_perm[:, None] * bs
                             + np.arange(bs)[None, :]).ravel()
                perm1_o2l = np.empty(perm1_l2o.size, np.int64)
                perm1_o2l[perm1_l2o] = np.arange(perm1_l2o.size)

    # ---- transfer 0: geometric p-coarsening (P2 -> P1), cell-local -------
    if degree == 2:
        P0 = _p2_to_p1_interpolation(mesh, bs, bc_mask)
    elif degree == 1:
        P0 = _zero_rows(sp.eye(n0, format="csr"), bc_mask)
    else:
        raise NotImplementedError(f"mg hierarchy for degree-{degree} spaces")
    if dia_info is not None:
        # level-1 in its lattice numbering from here on down
        P0 = P0.tocsc()[:, perm1_l2o].tocsr()
    n1 = P0.shape[1]
    K1 = (P0.T @ K0 @ P0).tocsr()

    def _pattern(K, P=None):
        """Structural sparsity for the ELL layout: |P|^T |K| |P| with the
        diagonal forced in — immune to numerical cancellation/pruning and
        to zero rows from bc-zeroed interpolation (lookups never miss)."""
        A = abs(K.tocsr())
        if P is not None:
            Pa = abs(P.tocsr())
            A = Pa.T @ (A + sp.eye(A.shape[0])) @ Pa
        return (A + sp.eye(A.shape[1])).tocsr()

    # per-cell restriction weights: W[c] = P0[cell_dofs(c), cell_vertex_dofs(c)]
    # (nested interpolation => every row's support lies in the cell's vertices)
    vdofs = (np.repeat(mesh.cells.astype(np.int64) * bs, bs, axis=1)
             + np.tile(np.arange(bs), mesh.cells.shape[1]))  # (nc, nv_cell*bs)
    if dia_info is not None:
        vdofs = perm1_o2l[vdofs]
    nc = mesh.num_cells
    nk1 = vdofs.shape[1]
    P0_idx, P0_w = _padded_rows(P0)
    W01 = np.zeros((nc, dm0.shape[1], nk1))
    for a in range(P0_idx.shape[1]):
        tgt = P0_idx[dm0, a]  # (nc, nk0) interpolation targets
        wv = P0_w[dm0, a]
        W01 += (tgt[:, :, None] == vdofs[:, None, :]) * wv[:, :, None]
    assert np.allclose(np.abs(W01).sum(2), np.abs(P0_w[dm0]).sum(2)), \
        "P2->P1 interpolation is not cell-local"

    ell1 = _EllLayout(_pattern(K0, P0))
    # scatter map for the per-cell (nk1 x nk1) blocks into K1's ELL values;
    # pairs absent from the pattern (bc-zeroed) go to a dummy slot
    ii = np.repeat(vdofs, nk1, axis=1).ravel()
    jj = np.tile(vdofs, (1, nk1)).ravel()
    blk_dst = ell1.lookup(ii, jj, missing=n1 * ell1.m).reshape(nc, nk1 * nk1)

    levels = [{"cols": ell1.cols.astype(_I), "m": ell1.m, "n": n1,
               "diag_slot": ell1.diag_slot.astype(_I)}]
    transfers = [{"W": W01.astype(np.float32),
                  "blk_dst": blk_dst.astype(_I),
                  "nnz_flat": n1 * ell1.m,
                  "P_idx": P0_idx.astype(_I),
                  "P_w": P0_w.astype(np.float32)}]

    if dia_info is not None:
        # transfer-0 rows in lattice-0 order (restrict/prolong run on
        # lattice-layout level-0 vectors inside the cycle; their ENTRIES
        # are already lattice-1 via the permuted P0 columns)
        transfers[0]["P_idx"] = P0_idx[dia_info["perm0_l2o"]].astype(_I)
        transfers[0]["P_w"] = P0_w[dia_info["perm0_l2o"]].astype(np.float32)
        # 2:1 inter-grid stencil for gather-free transfers (None -> the
        # padded-row gather transfer above stays in use)
        shape0, shape1 = dia_info["lat_shapes"]
        t0s = _transfer0_stencil(P0[dia_info["perm0_l2o"]], shape0, shape1,
                                 bs, dia_info["mask0_lat"])
        if t0s is not None:
            dia_info["t0_stencil"] = t0s
        # level-1 DIA: band layout of the (lattice-numbered) ELL pattern;
        # per-Newton values re-scatter from the ELL value vector through a
        # fixed slot map (padded ELL slots hold zeros and alias the
        # diagonal band harmlessly)
        off1 = ell1.cols.astype(np.int64) - np.arange(n1, dtype=np.int64)[:, None]
        offs1 = np.unique(off1)
        if offs1.size <= 160:
            band1 = np.searchsorted(offs1, off1)
            dia1_dst = (band1 * np.int64(n1)
                        + np.arange(n1, dtype=np.int64)[:, None]).ravel()
            dia_info["dia1_dst"] = dia1_dst.astype(_I)
            dia_info["dia1_offsets"] = tuple(int(o) for o in offs1)

    # ---- aggregation levels ----------------------------------------------
    # near-nullspace at the P1 level: 2D rigid-body modes, zeroed on bc
    # (P1 vertex dofs share their indices with the fine vertex dofs)
    pts = mesh.points
    B = np.zeros((n1, 3))
    B[0::bs, 0] = 1.0
    B[1::bs, 1] = 1.0
    B[0::bs, 2] = -(pts[:, 1] - pts[:, 1].mean())
    B[1::bs, 2] = pts[:, 0] - pts[:, 0].mean()
    B[bc_mask[:n1], :] = 0.0
    if dia_info is not None:
        B = B[perm1_l2o]  # rows follow the lattice level-1 numbering

    K_l, B_l, bs_l, ell_l = K1, B, bs, ell1
    while levels[-1]["n"] > coarse_target and len(levels) < max_levels:
        G = _block_graph(K_l, bs_l)
        reach = agg_reach[min(len(levels) - 1, len(agg_reach) - 1)]
        if reach == 2:
            # distance-2 aggregation: ~3-4x bigger aggregates shrink the
            # next level under the dense-matvec threshold (mg_setup
            # dense_below) so its matvec runs on the MXU instead of
            # gather-latency-bound ELL.  Opt-in (mg_opts={'agg_reach':
            # (2, 1)}), NOT the default: measured on the slope problem it
            # buys nothing once dense_below=6144 already captures the
            # first algebraic level, and costs CG iterations
            # (100x100, 3 steps: 2.62 s/step @ 128 CG vs distance-1's
            # 2.47 s/step @ 111).  Worth retrying only when level 1
            # lands above dense_below (e.g. >= 200x200 lattices).
            G = ((G + G @ G) > 0).tocsr()
        agg, n_agg = _aggregate(G)
        T, Bc = _tentative_rbm(agg, n_agg, B_l, bs_l)
        if smooth_sa:
            d = K_l.diagonal()
            d = np.where(np.abs(d) > 1e-300, d, 1.0)
            P = (T - (4.0 / (3.0 * _lmax_dinv_a(K_l))) * (sp.diags(1.0 / d) @ (K_l @ T))).tocsr()
        else:
            P = T
        K_c = (P.T @ K_l @ P).tocsr()
        n_c = K_c.shape[0]
        if n_c >= levels[-1]["n"]:
            break  # aggregation stalled
        ell_c = _EllLayout(_pattern(K_l, P))
        P_idx, P_w = _padded_rows(P)
        t = {"P_idx": P_idx.astype(_I), "P_w": P_w.astype(np.float32)}
        blk = _block_transfer_forms(P, bs_l, 3)
        if blk is not None:
            t.update(blk)
        lvl = {"cols": ell_c.cols.astype(_I), "m": ell_c.m, "n": n_c,
               "diag_slot": ell_c.diag_slot.astype(_I)}
        if galerkin_levels is None or len(levels) < galerkin_levels:
            src, wgt, dst = _galerkin_contrib_map(ell_l, P, ell_c)
            t.update({"src": src, "w": wgt.astype(np.float32), "dst": dst,
                      "nnz_flat": n_c * ell_c.m})
        else:
            lvl["frozen_vals"] = _ell_vals_from_csr(K_c, ell_c)
        transfers.append(t)
        levels.append(lvl)
        if verbose:
            print(f"  mg level {len(levels)}: n={n_c} (aggregates {n_agg}, "
                  f"nnz/row <= {ell_c.m})")
        K_l, B_l, bs_l, ell_l = K_c, Bc, 3, ell_c

    # strip static ints: device functions derive (n, m) from `cols` shapes,
    # so the returned pytree is arrays-only (shard_map-spec friendly)
    nL, mL = levels[-1]["n"], levels[-1]["m"]
    for lvl in levels:
        lvl.pop("n"), lvl.pop("m")
    for t in transfers:
        t.pop("nnz_flat", None)
    out = {
        "levels": levels,
        "transfers": transfers,
        "coarse_rows": np.tile(np.arange(nL, dtype=_I)[:, None], (1, mL)),
        "cheb_degree": cheb_degree,
    }
    if dia_info is not None:
        out.update(dia_info)
    return out


# ======================================================================
# Device-side per-Newton setup + cycle (pure jittable functions)
# ======================================================================

def _ell_matvec(vals, cols, x):
    return jnp.einsum("nm,nm->n", vals, x[cols])


def _power_lmax(matvec, dinv, n, iters, dtype=_F32):
    """lambda_max(D^-1 A) by fixed-count power iteration (deterministic
    start vector; overestimation is safe for Chebyshev — add 10%)."""
    x = jnp.cos(1.234 * jnp.arange(n, dtype=dtype))

    def body(_, carry):
        x, lam = carry
        y = dinv * matvec(x)
        lam = jnp.linalg.norm(y)
        return y / jnp.maximum(lam, 1e-30), lam

    _, lam = jax.lax.fori_loop(0, iters, body, (x, jnp.asarray(1.0, dtype)))
    return 1.1 * lam


def ebe_matvec(K_blocks, dofmap, bc_mask, n, psum=None, *, mode="scalar", bs=2):
    """Element-blocked matvec ``x -> A x`` with IDENTITY rows on bc dofs.

    The identity-bc-row invariant is load-bearing: a zero bc row makes the
    (f32) system singular, and any nonzero bc component of a refinement
    residual (e.g. the first Newton step after a load-step
    re-initialization of Du, bc rows ~1e-8) becomes an irreducible
    direction that poisons the inner CG — observed as immediate stagnation
    at ~1e-3 relative on the von Mises general path.  With identity rows
    the bc block is a perfectly-conditioned sub-problem the iteration
    solves exactly.  EVERY element-blocked operator in the mg stack (f32
    iteration matvec, f64 refinement operator) must go through this one
    helper so the invariant lives in one place.

    ``dofmap`` is the (possibly padded) (nc, nk) unrolled dof array with
    dummy index ``n``; ``K_blocks`` (nc, nk, nk) must already be
    bc-masked (km outer product) by the caller.  The matvec runs in
    ``K_blocks.dtype``.

    ``mode`` picks the gather/scatter layout — the dominant cost on TPU,
    which pays per indexed element (~15 ns each; NOTES.md op-cost table):
    - ``"scalar"``: per-dof indices (nc*nk elements each way).
    - ``"node"``: per-NODE indices with ``bs``-wide contiguous component
      rows (nc*nk/bs elements each way) — exploits the unrolled-dofmap
      convention ``dof = scalar_dof * bs + component``
      (functionspace.py ``unrolled_dofmap``).
    """
    if psum is None:
        psum = lambda x: x
    if mode not in ("scalar", "node"):
        raise ValueError(f"ebe_matvec mode must be 'scalar' or 'node', got "
                         f"{mode!r} (the banded layout is mg_setup(dia=...))")
    dt = K_blocks.dtype
    free = ~bc_mask
    nc, nk = dofmap.shape

    if mode == "node":
        ns = n // bs
        # node index of every bs-th unrolled dof; padding rows (value n)
        # land on the dummy node ns
        ndof = dofmap[:, ::bs] // bs  # (nc, nk/bs)

        def mv(x):
            xz = jnp.where(free, x, 0.0).astype(dt).reshape(ns, bs)
            u = jnp.concatenate([xz, jnp.zeros((1, bs), dt)])
            y = jnp.einsum("cab,cb->ca", K_blocks, u[ndof].reshape(nc, nk))
            out = psum(jax.ops.segment_sum(
                y.reshape(nc * (nk // bs), bs), ndof.ravel(),
                num_segments=ns + 1)[:-1]).reshape(-1)
            return jnp.where(free, out, x.astype(dt))
    else:
        def mv(x):
            xz = jnp.where(free, x, 0.0).astype(dt)
            u = jnp.concatenate([xz, jnp.zeros(1, dt)])
            y = jnp.einsum("cab,cb->ca", K_blocks, u[dofmap])
            out = psum(jax.ops.segment_sum(
                y.ravel(), dofmap.ravel(), num_segments=n + 1)[:-1])
            return jnp.where(free, out, x.astype(dt))

    return mv


def mg_setup(statics, K0_cell_f32, dofmap, bc_mask, n0, psum=None, *, power_iters=8,
             mv0_mode="scalar", bs=2, dia=None, dense_below=6144):
    """Per-Newton value computation: coarse ELL values, Jacobi diagonals,
    Chebyshev bounds, coarsest dense LU.  All f32, all fixed shapes.

    ``dofmap`` is the (possibly padded) (nc, nk) level-0 dof array with
    dummy index n0; under shard_map the cell axis of ``K0_cell_f32`` /
    ``dofmap`` / the transfer-0 statics is sharded and ``psum`` reduces the
    scattered results (coarse levels are replicated).

    ``mv0_mode``/``bs``: level-0 gather/scatter layout — see
    ``ebe_matvec``.

    ``dia``: stencil-banded level-0 operator (lattice meshes).  A dict
    ``{"dst": (nc, nk*nk) padded contribution map (dummy = nb*n0),
    "offsets": STATIC tuple of band offsets, "mask_lat": (n0,) bc mask in
    lattice numbering}`` — see ``build_mg_statics(dia=True)`` /
    ``_dia_matvec``.  Level-0 runtime vectors (mv0, d0, the V-cycle input)
    are then in the LATTICE numbering; callers permute at the
    refinement-round boundary (``ir_pcg`` to_inner/from_inner)."""
    if psum is None:
        psum = lambda x: x
    if mv0_mode == "dia" and dia is None:
        raise ValueError("mv0_mode='dia' requires the dia= dict (band dst "
                         "map, offsets, lattice bc mask) — see "
                         "build_mg_statics(dia=True)")
    levels, transfers = statics["levels"], statics["transfers"]

    if dia is not None:
        offsets = dia["offsets"]
        nb = len(offsets)
        vals0 = psum(jax.ops.segment_sum(
            K0_cell_f32.reshape(K0_cell_f32.shape[0], -1).ravel(),
            dia["dst"].ravel(), num_segments=nb * n0 + 1)[:-1]).reshape(nb, n0)
        free_lat = ~dia["mask_lat"]
        mv0 = lambda x: _dia_matvec(vals0, offsets, free_lat, x)
        d0 = vals0[offsets.index(0)]  # lattice diagonal band
        d0 = jnp.where(jnp.abs(d0) > 1e-30, d0, 1.0)
    else:
        d0 = psum(jax.ops.segment_sum(
            jnp.einsum("ckk->ck", K0_cell_f32).ravel(),
            dofmap.ravel(), num_segments=n0 + 1)[:-1])
        d0 = jnp.where(jnp.abs(d0) > 1e-30, d0, 1.0)

        mv0 = ebe_matvec(K0_cell_f32, dofmap, bc_mask, n0, psum,
                         mode=mv0_mode, bs=bs)

    rt = {"d0": d0, "mv0": mv0,
          "lmax0": _power_lmax(mv0, 1.0 / d0, n0, power_iters)}

    # level 1: per-cell triple product, scatter to ELL
    t0 = transfers[0]
    nnz1 = levels[0]["cols"].size
    blocks = jnp.einsum("cia,cij,cjb->cab", t0["W"], K0_cell_f32, t0["W"])
    vals_flat = psum(jax.ops.segment_sum(
        blocks.reshape(blocks.shape[0], -1).ravel(),
        t0["blk_dst"].ravel(), num_segments=nnz1 + 1)[:-1])
    lvl_vals = [vals_flat.reshape(levels[0]["cols"].shape)]

    # deeper levels: flat Galerkin contribution maps (replicated work;
    # dst is host-sorted so segment_sum takes its fast path) — or FROZEN
    # elastic values when the level carries no map (galerkin_levels)
    for t, lvl in zip(transfers[1:], levels[1:]):
        if "src" not in t:
            lvl_vals.append(lvl["frozen_vals"])
            continue
        prev = lvl_vals[-1].ravel()
        vals = jax.ops.segment_sum(prev[t["src"]] * t["w"], t["dst"],
                                   num_segments=lvl["cols"].size,
                                   indices_are_sorted=True)
        lvl_vals.append(vals.reshape(lvl["cols"].shape))
    rt["vals"] = lvl_vals

    diags, lmaxs, mvs = [], [], []
    for i, (lvl, vals) in enumerate(zip(levels, lvl_vals)):
        d = vals.ravel()[lvl["diag_slot"]]
        d = jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
        diags.append(d)
        nk_l = lvl["cols"].shape[0]
        if i == 0 and dia is not None and "dst1" in dia:
            # level-1 DIA: re-scatter the ELL values into band layout once
            # per Newton; the smoothing matvecs (7+ per cycle) then run
            # gather-free (see _dia_matvec).  No identity-row handling —
            # mirrors the plain ELL matvec (zero rows at bc dofs).
            offs1 = dia["offsets1"]
            n1 = lvl["cols"].shape[0]
            vals1_dia = jax.ops.segment_sum(
                vals.ravel(), dia["dst1"],
                num_segments=len(offs1) * n1).reshape(len(offs1), n1)
            mv = lambda x, v=vals1_dia, o=offs1: _dia_matvec(v, o, None, x)
        elif nk_l <= dense_below:
            # small aggregation levels: materialize the DENSE operator from
            # the ELL values once per Newton and ride the MXU.  An ELL
            # matvec at n~1-3k costs 0.2-0.9 ms of pure gather latency
            # (~15 ns/element) and the W-cycle applies it ~14-30x per
            # preconditioner application (scripts/micro_vcycle.py); the
            # dense matvec is microseconds and the (nk, nk) scatter-add is
            # paid once per Newton.  Padded ELL slots hold zero values, so
            # wherever their columns alias, the .add is a no-op.
            rows_l = jnp.arange(nk_l, dtype=jnp.int32)[:, None]
            Kd = jnp.zeros((nk_l, nk_l), vals.dtype).at[
                jnp.broadcast_to(rows_l, lvl["cols"].shape),
                lvl["cols"]].add(vals)
            mv = lambda x, K=Kd: K @ x
        else:
            mv = lambda x, vals=vals, cols=lvl["cols"]: _ell_matvec(vals, cols, x)
        mvs.append(mv)
        lmaxs.append(_power_lmax(mv, 1.0 / d, lvl["cols"].shape[0], power_iters))
    rt["diags"], rt["lmaxs"], rt["mvs"] = diags, lmaxs, mvs

    # coarsest dense solve (f32); guard zero rows (fully-bc-supported dofs).
    # EXPLICIT INVERSE, not lu_factor+lu_solve: XLA triangular solves are
    # row-sequential (~ms even at n~50 on TPU) and the W-cycle applies the
    # coarse solve several times per V-cycle — as a dense (nL, nL) matvec
    # each application is microseconds, and the one-time inversion cost
    # sits in the per-Newton setup where it is amortized over all CG its.
    lvl, vals = levels[-1], lvl_vals[-1]
    nL = lvl["cols"].shape[0]
    KL = jnp.zeros((nL, nL), _F32)
    KL = KL.at[statics["coarse_rows"], lvl["cols"]].add(vals)
    dL = jnp.diagonal(KL)
    KL = KL + jnp.diag(jnp.where(jnp.abs(dL) > 1e-30, 0.0, 1.0).astype(_F32))
    rt["coarse_inv"] = jnp.linalg.inv(KL)
    return rt


def _chebyshev(matvec, dinv, b, x0, lmax, degree, lmin_frac=0.3):
    """Fixed-degree Chebyshev/Jacobi smoothing targeting the interval
    [lmin_frac*lmax, lmax] (a FIXED linear operator of (b, x0)).

    ``x0=None`` means a ZERO initial guess (every pre-smooth in a cycle on
    a residual equation): the initial residual is then ``b`` itself and the
    first matvec is skipped — one level-0 matvec per V-cycle, the single
    most expensive op in the cycle (do not rely on XLA folding A@0)."""
    lmin = lmin_frac * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    if x0 is None:
        r = b
        d = dinv * r / theta
        x = d
    else:
        r = b - matvec(x0)
        d = dinv * r / theta
        x = x0 + d
    for _ in range(degree - 1):
        r = r - matvec(d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (dinv * r)
        x = x + d
        rho = rho_new
    return x


def _restrict(t, r_f, n_c):
    if "Rb_idx" in t:
        # block gather form of P^T: gather fine node blocks per coarse
        # block and contract — no segment_sum (scatter-add) on the device
        bs_f = t["Rb_w"].shape[3]
        g = r_f.reshape(-1, bs_f)[t["Rb_idx"]]          # (n_cb, M, bs_f)
        return jnp.einsum("cbmf,cmf->cb", t["Rb_w"], g).reshape(-1)
    contrib = (t["P_w"] * r_f[:, None]).ravel()
    return jax.ops.segment_sum(contrib, t["P_idx"].ravel(), num_segments=n_c)


def _prolong(t, x_c):
    if "Pb_idx" in t:
        bs_c = t["Pb_w"].shape[3]
        g = x_c.reshape(-1, bs_c)[t["Pb_idx"]]          # (n_fb, K, bs_c)
        return jnp.einsum("fbkc,fkc->fb", t["Pb_w"], g).reshape(-1)
    return jnp.einsum("np,np->n", t["P_w"], x_c[t["P_idx"]])


def ir_pcg(mv64, mv32, M32, b, rtol, maxiter, *, atol=0.0, max_rounds=6,
           inner_floor=1e-6, inner_cap=600, stall_window=30,
           to_inner=None, from_inner=None):
    """Mixed-precision solve: f32 PCG rounds inside f64 iterative
    refinement.

    On TPU every f64 op is emulated (double-double) at ~5-10x the f32
    cost, and the Krylov loop is made of exactly those ops — measured at
    100x100, one f64 element-blocked matvec is 45 ms vs 4.1 ms in f32.
    The standard TPU-native answer is to keep the ITERATION in f32
    (matvec, V-cycle preconditioner, dot products) and restore f64
    accuracy outside the loop: each refinement round solves
    ``A dx = r`` in f32 to ~1e-6 relative and re-evaluates the residual
    with the exact f64 operator; 2-3 rounds reach 1e-13.  Newton iterate
    parity with a direct f64 solve is asserted in tests/test_mg.py.

    ``to_inner``/``from_inner``: optional layout maps applied at the
    refinement-round boundary — the f32 iteration (mv32, M32, dots) then
    runs entirely in the inner layout (e.g. the DIA lattice numbering,
    where the level-0 matvec is gather-free) while the f64 operator and
    the returned solution stay in the caller's numbering.  Norm targets
    are permutation-invariant, so convergence behavior is unchanged.

    Returns (x_best, total_inner_iterations).
    """
    if to_inner is None:
        to_inner = lambda v: v
    if from_inner is None:
        from_inner = lambda v: v
    f64 = b.dtype
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    # PETSc KSP convergence convention: |r| <= max(rtol*|b|, atol)
    target = jnp.maximum(rtol * bnorm, atol)

    def pcg32(r32, tgt, it_budget):
        """Safeguarded f32 PCG on A dx = r32 down to |r| <= tgt.

        Exits on: target reached, budget, SPD breakdown, divergence past
        100x the best residual, or STAGNATION (no new best iterate within
        ``stall_window`` iterations — an f32 Krylov iterated past its
        attainable floor neither converges nor diverges, it dithers, and
        without this exit a single round can eat the whole budget)."""
        x = jnp.zeros_like(r32)
        r = r32
        z = M32(r)
        rz = jnp.vdot(r, z)
        n0 = jnp.sqrt(jnp.vdot(r, r))

        def cond(s):
            x, r, z, p, rz, k, k_best, ok, xb, nb, ncur = s
            return (ok & (ncur > tgt) & (k < it_budget)
                    & (k - k_best < stall_window))

        def body(s):
            x, r, z, p, rz, k, k_best, ok, xb, nb, ncur = s
            Ap = mv32(p)
            pAp = jnp.vdot(p, Ap)
            ok = jnp.isfinite(pAp) & (pAp > 0.0) & jnp.isfinite(rz) & (rz > 0.0)
            alpha = jnp.where(ok, rz / jnp.where(pAp > 0.0, pAp, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M32(r)
            rz2 = jnp.vdot(r, z)
            beta = jnp.where(rz > 0.0, rz2 / jnp.where(rz > 0.0, rz, 1.0), 0.0)
            p = z + beta * p
            nn = jnp.sqrt(jnp.vdot(r, r))
            better = nn < nb
            xb = jnp.where(better, x, xb)
            nb = jnp.where(better, nn, nb)
            k_best = jnp.where(better, k + 1, k_best)
            ok = ok & jnp.isfinite(nn) & (nn < 100.0 * nb)
            return (x, r, z, p, rz2, k + 1, k_best, ok, xb, nb, nn)

        s0 = (x, r, z, z, rz, 0, 0, rz >= 0.0, x, n0, n0)
        out = jax.lax.while_loop(cond, body, s0)
        return out[8], out[5]

    def ir_cond(s):
        x, r64, rnorm, k_tot, rounds, ok, xb, nb = s
        return ok & (rnorm > target) & (rounds < max_rounds) & (k_tot < maxiter)

    def ir_body(s):
        x, r64, rnorm, k_tot, rounds, ok, xb, nb = s
        # inner tolerance: enough to hit the outer target in this round,
        # floored at the f32 attainable range
        t_rel = jnp.clip(target / jnp.maximum(rnorm, 1e-300), inner_floor, 0.5)
        r32 = to_inner(r64.astype(_F32))
        tgt32 = (t_rel * rnorm).astype(_F32)
        dx, k = pcg32(r32, tgt32, jnp.minimum(maxiter - k_tot, inner_cap))
        x = x + from_inner(dx).astype(f64)
        r64 = b - mv64(x)
        rn = jnp.sqrt(jnp.vdot(r64, r64))
        better = rn < nb
        xb = jnp.where(better, x, xb)
        nb = jnp.where(better, rn, nb)
        ok = jnp.isfinite(rn) & (rn < rnorm)  # stop when a round stalls
        return (x, r64, rn, k_tot + k, rounds + 1, ok, xb, nb)

    x0 = jnp.zeros_like(b)
    s = (x0, b, bnorm, 0, 0, jnp.asarray(True), x0, bnorm)
    out = jax.lax.while_loop(ir_cond, ir_body, s)
    return out[6], out[3]


def vcycle(statics, rt, r0, cheb_degree=3, *, gamma_coarse=(1, 2), t0s=None):
    """One multigrid cycle as a preconditioner application z = M^-1 r0
    (f32 in / f32 out).

    ``gamma_coarse``: cycle index below each level — an int (uniform), or a
    tuple indexed by level (last entry repeats).  The default ``(1, 2)``
    visits level 2 once (V at the top: the level-2 ELL matvec is the single
    most expensive op in the cycle, scripts/micro_vcycle.py) and W-cycles
    below it, where the dense small-level matvecs make repeat visits nearly
    free.

    ``t0s``: optional gather-free transfer-0 spec
    ``(stencil, shape0, shape1, bs, free0)`` (see _transfer0_stencil);
    level-0 vectors are then in the DIA lattice layout."""
    levels, transfers = statics["levels"], statics["transfers"]
    deg = cheb_degree
    L = len(levels)
    if isinstance(gamma_coarse, int):
        gammas = (gamma_coarse,)
    else:
        gammas = tuple(gamma_coarse)

    def _gamma(k):
        return gammas[min(k - 1, len(gammas) - 1)]

    def level_solve(k, r):
        """Approximate solve at level k (1-based; levels[k-1])."""
        if k == L:
            return rt["coarse_inv"] @ r
        lvl = levels[k - 1]
        mv = rt["mvs"][k - 1]
        dinv = 1.0 / rt["diags"][k - 1]
        lmax = rt["lmaxs"][k - 1]
        x = _chebyshev(mv, dinv, r, None, lmax, deg)
        t_down = transfers[k]
        r_c = _restrict(t_down, r - mv(x), levels[k]["cols"].shape[0])
        x_c = level_solve(k + 1, r_c)
        for _ in range(_gamma(k) - 1):
            resid_c = r_c - rt["mvs"][k](x_c)
            x_c = x_c + level_solve(k + 1, resid_c)
        x = x + _prolong(t_down, x_c)
        return _chebyshev(mv, dinv, r, x, lmax, deg)

    mv0, dinv0, lmax0 = rt["mv0"], 1.0 / rt["d0"], rt["lmax0"]
    x0 = _chebyshev(mv0, dinv0, r0, None, lmax0, deg)
    resid = r0 - mv0(x0)
    if t0s is None:
        r1 = _restrict(transfers[0], resid, levels[0]["cols"].shape[0])
    else:
        r1 = _stencil_restrict(resid, *t0s)
    x1 = level_solve(1, r1) if L > 1 else rt["coarse_inv"] @ r1
    x0 = x0 + (_prolong(transfers[0], x1) if t0s is None
               else _stencil_prolong(x1, *t0s))
    return _chebyshev(mv0, dinv0, r0, x0, lmax0, deg)
