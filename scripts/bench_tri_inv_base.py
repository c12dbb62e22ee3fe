#!/usr/bin/env python
"""Sweep the `_blocked_tri_inv` recursion base at n=5202 (25x25 dofs).

The blocked triangular inversion is half the dense factorization cost
(NOTES round-3 profile: tri_inv 8 ms vs chol 6 ms standalone); the
recursion bottoms out in XLA `linalg.inv` calls of (base, base) blocks and
spends the rest in triangular matmuls.  Base too small -> many small
latency-bound matmuls; too large -> the bottom `inv` (itself LU-based and
panel-sequential) dominates.  Usage: bench_tri_inv_base.py [N] [REPS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from dolfinx_external_operator_tpu.parallel import spmd


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5202
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(0)
    # SPD-ish lower-triangular factors with a safe diagonal
    Ls = []
    for i in range(reps):
        A = rng.normal(size=(n, n)).astype(np.float32) / np.sqrt(n)
        L = (np.tril(A) + np.eye(n, dtype=np.float32) * 2.0).astype(np.float32)
        Ls.append(jnp.asarray(L))
    assert Ls[0].dtype == jnp.float32, Ls[0].dtype
    jax.block_until_ready(Ls)
    print(f"device={jax.devices()[0]} n={n} reps={reps}", flush=True)

    # first measured config through the tunnel reads absurdly fast
    # (observed 0.029 ms twice) — sacrifice one repeat of base=256 first
    for base in (256, 64, 96, 128, 192, 256, 384, 512):
        fn = jax.jit(lambda L, b=base: spmd._blocked_tri_inv(L, base=b))
        jax.block_until_ready(fn(Ls[0]))
        jax.block_until_ready(fn(Ls[1]))
        t0 = time.perf_counter()
        outs = [fn(L) for L in Ls]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps * 1e3
        err = float(jnp.abs(outs[0] @ Ls[0] - jnp.eye(n)).max())
        print(f"  base={base:5d}: {dt:7.3f} ms   |Li L - I|_max = {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
