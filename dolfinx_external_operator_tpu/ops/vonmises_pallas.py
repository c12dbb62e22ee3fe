"""Pallas TPU kernel: fused von Mises return mapping (SoA layout).

The hot op of the von Mises demo (reference Numba loop,
``demo_plasticity_von_mises.py:298-332``) written directly against the TPU
vector unit: one grid step processes a (lane-aligned) tile of Gauss points
with the batch axis in lanes, computing the return-mapped stress, the
consistent tangent and the plastic-increment update in a single pass over
VMEM — no intermediate HBM traffic between the elastic predictor, the
radial-return correction and the tangent assembly.

Runs in f32 on the VPU with an f64 polish OUTSIDE the kernel when full
double precision is required (the von Mises map is a closed-form expression,
so one f64 re-evaluation of the formula at the f32-determined plastic state
is exact — the only branch, elastic/plastic, is bit-stable away from the
yield surface and the f64 fallback path recomputes it anyway).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vonmises_return_map_pallas"]


def _kernel(params_ref, deps_ref, sig_n_ref, p_ref, ctang_ref, sig_ref, dp_ref):
    """One tile: deps/sig_n (4, T), p (1, T) -> C_tang (16, T), sig (4, T), dp (1, T)."""
    lmbda = params_ref[0, 0]
    mu = params_ref[0, 1]
    H = params_ref[0, 2]
    sig0 = params_ref[0, 3]

    deps = deps_ref[:]          # (4, T)
    sign = sig_n_ref[:]         # (4, T)
    p = p_ref[0, :]             # (T,)

    # elastic predictor: sig_el = sig_n + C_elas @ deps  (C in Mandel form)
    tr_e = deps[0] + deps[1] + deps[2]
    two_mu = 2.0 * mu
    s0 = sign[0] + lmbda * tr_e + two_mu * deps[0]
    s1 = sign[1] + lmbda * tr_e + two_mu * deps[1]
    s2 = sign[2] + lmbda * tr_e + two_mu * deps[2]
    s3 = sign[3] + two_mu * deps[3]

    m = (s0 + s1 + s2) / 3.0
    d0, d1, d2, d3 = s0 - m, s1 - m, s2 - m, s3
    sig_eq = jnp.sqrt(1.5 * (d0 * d0 + d1 * d1 + d2 * d2 + d3 * d3))

    f_el = sig_eq - sig0 - H * p
    plastic = f_el > 0.0
    f_plus = jnp.where(plastic, f_el, 0.0)
    dp = f_plus / (3.0 * mu + H)

    seq_safe = jnp.where(sig_eq > 0.0, sig_eq, 1.0)
    beta = jnp.where(plastic, 3.0 * mu * dp / seq_safe, 0.0)
    # n_elas = s/sig_eq * f_plus/f_el  ->  s/seq where plastic else 0
    scale_n = jnp.where(plastic, 1.0 / seq_safe, 0.0)
    n0, n1, n2, n3 = d0 * scale_n, d1 * scale_n, d2 * scale_n, d3 * scale_n

    sig_ref[0, :] = s0 - beta * d0
    sig_ref[1, :] = s1 - beta * d1
    sig_ref[2, :] = s2 - beta * d2
    sig_ref[3, :] = s3 - beta * d3
    dp_ref[0, :] = dp

    # C_tang = C_elas - 3mu(3mu/(3mu+H) - beta) n⊗n - 2mu beta DEV
    coef_n = 3.0 * mu * (3.0 * mu / (3.0 * mu + H) - beta)
    nvec = (n0, n1, n2, n3)
    for i in range(4):
        for j in range(4):
            # static (i, j): the elastic matrix entry is resolved at trace time
            if i == 3 and j == 3:
                c_el = two_mu
            elif i < 3 and j < 3:
                c_el = lmbda + (two_mu if i == j else 0.0)
            else:
                c_el = 0.0
            dev_ij = (1.0 if i == j else 0.0) - (1.0 / 3.0 if (i < 3 and j < 3) else 0.0)
            ctang_ref[4 * i + j, :] = c_el - coef_n * nvec[i] * nvec[j] - two_mu * beta * dev_ij


@partial(jax.jit, static_argnames=("tile",))
def vonmises_return_map_pallas(deps_soa, sig_n_soa, p_row, params, tile=512):
    """deps/sig_n (4, N) f32, p (N,) f32, params [lmbda, mu, H, sig0].

    Returns (C_tang (16, N), sig (4, N), dp (N,)).  N must be a multiple of
    ``tile`` (pad the batch); tile must be a multiple of 128 (lanes)."""
    n = deps_soa.shape[1]
    assert n % tile == 0, "pad the Gauss-point batch to a tile multiple"
    p2 = p_row.reshape(1, n)
    params2 = jnp.asarray(params, jnp.float32).reshape(1, 4)
    grid = (n // tile,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, n), jnp.float32),
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
    )(params2, deps_soa.astype(jnp.float32), sig_n_soa.astype(jnp.float32), p2.astype(jnp.float32))
    C_tang, sig, dp = out
    return C_tang, sig, dp[0]
