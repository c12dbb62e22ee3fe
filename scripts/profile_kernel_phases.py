#!/usr/bin/env python
"""Phase split of the Mohr-Coulomb return-map kernel (round-5 #5).

Times, on the bench.py strain mix (honest varying-input protocol):
  A. full sorted kernel (the headline metric configuration);
  B. full unsorted vmapped tangent_stress_point;
  C. return_mapping only (no implicit-tangent extra rj64 + 5x5 solve);
  D. a tol=3e-5 variant (f64 polish exits immediately -> f32 phase +
     trial + tangent only);
  E. a max_iter32=0 variant (all-f64 Newton, no f32 phase) — the
     mixed-precision win, for the record.

Usage: python scripts/profile_kernel_phases.py [N_POINTS] [REPS] [CHUNK]
Prints one JSON line (pts/s per variant + derived shares).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def run(fn, inputs, s):
    out = fn(inputs[0], s)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(x, s) for x in inputs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(inputs)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

    from dolfinx_external_operator_tpu.models.mohr_coulomb import (
        MohrCoulombMaterial)

    rng = np.random.default_rng(0)
    deps = rng.normal(scale=1e-3, size=(n, 4))
    deps[:, :3] -= 1.5e-3
    deps[: n // 2, 3] += 6e-3
    s = jnp.zeros((4, n))
    inputs = [jnp.asarray((deps * (1.0 + 1e-9 * i)).T) for i in range(reps)]
    jax.block_until_ready(inputs)

    out = {"n_points": n, "chunk": chunk, "device": str(jax.devices()[0])}

    mat = MohrCoulombMaterial()
    sorted_fn = mat._sorted_soa(chunk)
    t = run(jax.jit(lambda a, b: sorted_fn(a, b)[0]), inputs, s)
    out["sorted_full_pts_s"] = n / t

    t = run(jax.jit(lambda a, b: mat._vmapped_soa(a, b)[0]), inputs, s)
    out["unsorted_full_pts_s"] = n / t

    t = run(jax.jit(lambda a, b: mat._vmapped_rm_soa(a, b)[0]), inputs, s)
    out["return_map_only_pts_s"] = n / t

    mat_nopolish = MohrCoulombMaterial(tol=3e-5)
    t = run(jax.jit(lambda a, b: mat_nopolish._vmapped_soa(a, b)[0]),
            inputs, s)
    out["no_polish_pts_s"] = n / t

    mat_f64 = MohrCoulombMaterial(max_iter32=0)
    t = run(jax.jit(lambda a, b: mat_f64._vmapped_soa(a, b)[0]), inputs, s)
    out["all_f64_pts_s"] = n / t

    full = 1.0 / out["unsorted_full_pts_s"]
    out["tangent_extra_share"] = 1.0 - (1.0 / out["return_map_only_pts_s"]) / full
    out["polish_share_approx"] = 1.0 - (1.0 / out["no_polish_pts_s"]) / full
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
