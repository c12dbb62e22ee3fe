"""Block-cyclic-reduction (BCR) direct solver for lattice-structured meshes.

TPU-native replacement for the reference's per-Newton sparse direct LU
(PETSc SNES + MUMPS, ``demo_plasticity_mohr_coulomb.py:662-672``) on
structured-rectangle meshes: every scalar dof of a P1/P2 vector space lies
on a complete tensor lattice (``mg._lattice_node_perm``), so in
lexicographic (y, x, component) numbering the tangent operator is
block-banded with |Δrow_y| <= 2.  Merging two lattice rows per block makes
it BLOCK-TRIDIAGONAL with dense (B, B) blocks, B = 2 * Lx * bs.

Cyclic reduction eliminates the odd block rows level by level (log2(m)
levels).  Every level is a BATCH of same-shape (B, B) SPD inversions
(Cholesky + blocked triangular inversion) and batched matmuls — exactly
the shape the MXU wants — instead of the row-sequential panel loop XLA's
LU/Cholesky would run on the assembled global matrix, and instead of a
latency-bound Krylov iteration (the AMG-CG path's ~0.5-1 ms dots and
transfers per iteration, NOTES.md).  The factorization is f32
(symmetrically diagonal-equilibrated); f64 accuracy is restored by
iterative refinement against the exact element-blocked f64 operator
(``ir_direct`` — same mixed-precision design as ``mg.ir_pcg``: on TPU
every f64 op is emulated at ~5-10x the f32 cost, so f64 appears once per
refinement round).

The linear solve is then exact (to the requested rtol) with ZERO Krylov
iterations, so global Newton trajectories match the reference's
direct-LU ones by construction — the identical-iteration-counts clause of
BASELINE.json without tolerance tuning.

SPD assumption: the associative (phi == psi) Mohr-Coulomb and von Mises
consistent tangents are symmetric (positive definite until collapse), and
cyclic reduction of an SPD block tridiagonal produces SPD reduced systems
(they are Schur complements), so every diagonal block stays
Cholesky-invertible.  A non-SPD tangent NaNs the Cholesky; each level then
falls back to batched pivoted-LU inversion (``lax.cond``, mirroring
``spmd._spd_inv_chol``).

Memory: the factorization stores ~5 (B, B) blocks per eliminated block row
(~5 m/2 per level, sum(m_l) ~ 2m) -> ~5 m B^2 f32 total; at 100x100
(m=101, B=804) that is ~1.3 GB of HBM.  Use the AMG path above ~130k dofs.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .mg import _lattice_node_perm
from .spmd import _blocked_tri_inv

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# host-side build
# ---------------------------------------------------------------------------

def build_bcr_statics(mesh, V, bc_mask):
    """Lattice detection + the (cell, a, b) -> T-slot scatter map (host).

    The per-Newton device work is then ONE segment_sum of the bc-masked
    element stiffness blocks into the flat ``T`` array holding, per block
    row p, the (B, 3B) row band ``[L_p | D_p | U_p]`` in lattice
    numbering, plus +1 on the diagonal of bc/padding rows (identity rows,
    same invariant as ``mg._dia_matvec``).

    Returns None when the mesh is not lattice-structured (caller falls
    back to mg), else a dict of host arrays:
      dst       (nc, nk*nk) int32/int64 scatter destinations (sentinel-safe)
      diag_fix  flat T slots of bc + padding rows needing the +1 identity
      diag_slot (N,) flat T slot of each row's diagonal entry (equilibration)
      perm_l2o / perm_o2l  lattice <-> original dof permutations (n,)
      m, B, n, sentinel    block count / block size / real dofs / dummy slot
    """
    bs = V.bs
    degree = V.element.degree
    if degree not in (1, 2) or mesh.points.shape[1] < 2:
        return None
    if degree == 2:
        node_xy = np.vstack([mesh.points[:, :2],
                             mesh.points[mesh.edges, :2].mean(axis=1)])
    else:
        node_xy = mesh.points[:, :2]
    det = _lattice_node_perm(node_xy)
    if det is None:
        return None
    node_perm, (Ly, Lx) = det
    n = node_xy.shape[0] * bs
    perm_l2o = (node_perm[:, None] * bs + np.arange(bs)[None, :]).ravel()
    perm_o2l = np.empty(n, np.int64)
    perm_o2l[perm_l2o] = np.arange(n)

    R = Lx * bs            # lattice dofs per lattice row
    B = 2 * R              # block = two lattice rows
    m = (Ly + 1) // 2      # block rows (last may be half-padded)
    N = m * B
    row_band = 3 * B
    sentinel = m * B * row_band

    dm = V.unrolled_dofmap.astype(np.int64)   # (nc, nk)
    rlat = perm_o2l[dm]                       # lattice dof of each cell dof
    br = rlat // B
    ri = rlat % B
    # column slot within the row band [L | D | U] of block row br:
    # col - (br - 1) * B, for every (a, b) pair of the cell block
    slot = rlat[:, None, :] - (br[:, :, None] - 1) * B   # (nc, a, b)
    if slot.min() < 0 or slot.max() >= row_band:
        # a coupling reaches beyond the neighbor block rows (|dy| > 2):
        # not block-tridiagonal under 2-row merging — bail to mg
        return None
    dst = (br[:, :, None] * (B * row_band) + ri[:, :, None] * row_band
           + slot).reshape(dm.shape[0], -1)
    idt = np.int64 if sentinel > 2**31 - 2 else np.int32
    dst = dst.astype(idt)

    # identity rows: bc dofs (in lattice numbering) + padding rows >= n
    rows = np.arange(N, dtype=np.int64)
    is_pad = rows >= n
    is_bc = np.zeros(N, dtype=bool)
    is_bc[:n] = np.asarray(bc_mask, bool)[perm_l2o]
    diag_all = (rows // B) * (B * row_band) + (rows % B) * row_band \
        + B + (rows % B)
    diag_fix = diag_all[is_pad | is_bc].astype(idt)

    return {
        "dst": dst,
        "diag_fix": diag_fix,
        "diag_slot": diag_all.astype(idt),
        "perm_l2o": perm_l2o.astype(np.int32),
        "perm_o2l": perm_o2l.astype(np.int32),
        "m": int(m), "B": int(B), "n": int(n), "sentinel": int(sentinel),
    }


# ---------------------------------------------------------------------------
# device-side factorization / solve
# ---------------------------------------------------------------------------

def _spd_inv_batched(Ks):
    """Explicit inverses of a batch of SPD matrices: batched Cholesky +
    blocked triangular inversion + Gram product — matmul-rich (the
    reasoning of ``spmd._spd_inv_chol``, vmapped).  A Cholesky breakdown
    anywhere in the batch (non-SPD block) NaNs that factor; the whole
    level then falls back to batched pivoted-LU inversion.  The breakdown
    check covers EVERY factor entry — relying on NaN reaching the last
    diagonal entry is a LAPACK-lowering detail, not a backend contract
    (ADVICE r4)."""
    L = jnp.linalg.cholesky(Ks)

    def chol_path(_):
        Li = jax.vmap(_blocked_tri_inv)(L)
        return jnp.einsum("kji,kjl->kil", Li, Li, precision=_HI)

    ok = jnp.all(jnp.isfinite(L))
    return jax.lax.cond(ok, chol_path, jnp.linalg.inv, Ks)


def _bmm(A, Bm):
    return jnp.einsum("kij,kjl->kil", A, Bm, precision=_HI)


def _bmv(A, x):
    return jnp.einsum("kij,kj->ki", A, x, precision=_HI)


def _pad_front(x):
    return jnp.concatenate([jnp.zeros_like(x[:1]), x])


def _pad_back_to(x, k):
    pad = k - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])


def bcr_factor(T, m, B):
    """Cyclic-reduction factorization of the block-tridiagonal system.

    ``T`` (m, B, 3B): per block row the dense row band [L | D | U]
    (equilibrated f32, identity bc rows).  Python loop over the
    log2(m) levels — every level's shapes are static, all work is batched
    (B, B) matmuls and SPD inversions on the MXU.

    Returns (levels, root_inv): per level the solve operators
      A  = L_even @ inv(D_left-odd)      (ne, B, B)
      C  = U_even @ inv(D_right-odd)     (ne, B, B)
      V  = inv(D_odd)                    (no, B, B)
      VL = V @ L_odd,  VU = V @ U_odd    (no, B, B)
    """
    L = T[:, :, :B]
    D = T[:, :, B:2 * B]
    U = T[:, :, 2 * B:]
    levels = []
    while m > 1:
        no = m // 2
        ne = m - no
        V = _spd_inv_batched(D[1::2])
        L_odd, U_odd = L[1::2], U[1::2]
        # alignment for even block 2k: left odd = #(k-1), right odd = #k
        Vl = _pad_front(V)[:ne]
        Llo = _pad_front(L_odd)[:ne]
        Ulo = _pad_front(U_odd)[:ne]
        Vr = _pad_back_to(V, ne)
        Lro = _pad_back_to(L_odd, ne)
        Uro = _pad_back_to(U_odd, ne)

        A = _bmm(L[0::2], Vl)
        C = _bmm(U[0::2], Vr)
        levels.append({"A": A, "C": C, "V": V,
                       "VL": _bmm(V, L_odd), "VU": _bmm(V, U_odd)})
        D = D[0::2] - _bmm(A, Ulo) - _bmm(C, Lro)
        L = -_bmm(A, Llo)
        U = -_bmm(C, Uro)
        m = ne
    root_inv = _spd_inv_batched(D)  # (1, B, B)
    return levels, root_inv


def bcr_apply(fact, b):
    """Solve the factored system for one rhs ``b`` (m*B,) -> (m*B,).

    Forward: fold the odd rows' contributions into the reduced rhs at
    every level; backward: recover odd unknowns and re-interleave (stack +
    reshape — never strided .at[] updates, which XLA lowers to full
    scatters).  Everything is batched (B, B) x (B,) matvecs: ~3 per level
    each way, microseconds apiece."""
    levels, root_inv = fact
    B = root_inv.shape[-1]
    b = b.reshape(-1, B)
    odd_rhs = []
    for lv in levels:
        bo = b[1::2]
        ne = lv["A"].shape[0]
        bol = _pad_front(bo)[:ne]
        bor = _pad_back_to(bo, ne)
        odd_rhs.append(bo)
        b = b[0::2] - _bmv(lv["A"], bol) - _bmv(lv["C"], bor)
    x = _bmv(root_inv, b)  # (1, B)
    for lv, bo in zip(reversed(levels), reversed(odd_rhs)):
        no = lv["V"].shape[0]
        ne = lv["A"].shape[0]
        xr = _pad_back_to(x, ne + 1)[1:no + 1]
        xo = _bmv(lv["V"], bo) - _bmv(lv["VL"], x[:no]) - _bmv(lv["VU"], xr)
        xo_p = _pad_back_to(xo, ne)
        x = jnp.stack([x, xo_p], axis=1).reshape(2 * ne, B)[:ne + no]
    return x.reshape(-1)


def equilibrate(Tflat, diag_slot, m, B):
    """Symmetric diagonal equilibration of the assembled row bands.

    Returns (T (m, B, 3B) scaled, d (m*B,) f32 with ``d = 1/sqrt(diag)``);
    the solve wrapper applies ``x = d * apply(d * r)``.  Identity rows
    (bc/padding) have diag exactly 1 -> d = 1, preserving the
    identity-row invariant."""
    dvec = Tflat[diag_slot]
    d = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(dvec), 1e-30, None))
    T = Tflat.reshape(m, B, 3 * B)
    dpad = jnp.concatenate([jnp.zeros(B, d.dtype), d, jnp.zeros(B, d.dtype)])
    win = dpad[jnp.arange(m)[:, None] * B + jnp.arange(3 * B)[None, :]]
    return T * d.reshape(m, B)[:, :, None] * win[:, None, :], d


def ir_direct(mv64, solve32, b, rtol, *, atol=0.0, max_rounds=25):
    """f64 iterative refinement around the f32 direct solve.

    Each round applies the factorization once and re-evaluates the
    residual with the exact f64 operator; convergence rate per round is
    ~kappa(A) * eps_f32, so tight targets (1e-13 |b|) take a handful of
    rounds even at 100x100-class conditioning.  Exits on target, a
    non-contracting round (stall), or ``max_rounds``; returns
    (best iterate, signed rounds) — the count slots into the Newton
    loop's ``cg_k`` telemetry, and is NEGATED when the solve exited
    without reaching the target (stall / round budget), so a stalled f32
    direct solve is distinguishable from success in telemetry instead of
    only through the outer Newton residual check (ADVICE r4)."""
    bnorm = jnp.sqrt(jnp.vdot(b, b))
    target = jnp.maximum(rtol * bnorm, atol)
    x0 = jnp.zeros_like(b)

    def cond(s):
        x, r, rn, k, ok, xb, nb = s
        return ok & (rn > target) & (k < max_rounds)

    def body(s):
        x, r, rn, k, ok, xb, nb = s
        x = x + solve32(r)
        r = b - mv64(x)
        nn = jnp.sqrt(jnp.vdot(r, r))
        better = nn < nb
        xb = jnp.where(better, x, xb)
        nb = jnp.where(better, nn, nb)
        ok = jnp.isfinite(nn) & (nn < rn)  # stop when a round stalls
        return (x, r, nn, k + 1, ok, xb, nb)

    s = (x0, b, bnorm, 0, jnp.asarray(True), x0, bnorm)
    out = jax.lax.while_loop(cond, body, s)
    converged = out[6] <= target
    return out[5], jnp.where(converged, out[3], -out[3])
