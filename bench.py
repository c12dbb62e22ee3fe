#!/usr/bin/env python
"""Headline benchmark: Mohr-Coulomb return-map throughput + load-step time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: Gauss points/second through the full consistent-tangent
return map (inner Newton via lax.while_loop + jacfwd tangent — the hot loop
of the reference's headline demo, ``demo_plasticity_mohr_coulomb.py:574``).
``vs_baseline`` is the speedup over the SAME jitted kernel executed on this
host's CPU — the reference implements this exact kernel with JAX-on-CPU, so
this isolates the hardware + batching win at equal algorithmic footing.

Extras report the end-to-end fused load-step wall time on the reference's
25x25 slope-stability mesh (52-step schedule, BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _kernel_throughput(mat, device, n_points, reps):
    """Honest protocol: pre-staged DISTINCT inputs per rep, one blocking
    wait over the list of outputs (repeat-identical dispatches through the
    TPU tunnel can return unreliably fast)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # strain mix resembling the slope-stability demo: compressive normal
    # strains with ~half the points sheared past yield
    deps = rng.normal(scale=1e-3, size=(n_points, 4))
    deps[:, :3] -= 1.5e-3
    deps[: n_points // 2, 3] += 6e-3
    sigma_n = np.zeros((n_points, 4))

    with jax.default_device(device):
        s = jnp.asarray(sigma_n)
        fn = jax.jit(lambda a, b: mat.tangent_and_stress(a.reshape(-1), b.reshape(-1))[:2])
        inputs = [jnp.asarray(deps * (1.0 + 1e-9 * i)) for i in range(reps)]
        jax.block_until_ready(inputs)
        out = fn(inputs[0], s)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(x, s) for x in inputs]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps
    return n_points / dt


def _end_to_end(device):
    """Fused 52-step slope-stability schedule on the reference mesh size."""
    import jax
    import jax.numpy as jnp

    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import build_slope_problem
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    P = build_slope_problem(Nx=25, Ny=25)
    mat, mesh, V, S = P["material"], P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc_dofs = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C_tang, state = mat.tangent_stress_point(deps, sn)
        return C_tang, state[0]

    fp = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver="dense")
    load_steps = np.concatenate([np.linspace(2, 22.9, 50), np.array([22.96, 22.99])])

    Du, sig = fp.zero_state()
    # warmup/compile on the first step
    Du_w, sig_w, *_ = fp.run_step(Du, sig, float(load_steps[0]))
    jax.block_until_ready((Du_w, sig_w))

    Du, sig = fp.zero_state()
    newton_total = 0
    t0 = time.perf_counter()
    for i, load in enumerate(load_steps):
        Du, sig, norm, its, cg = fp.run_step(Du, sig, float(load))
        newton_total += int(its)
        if i % 10 == 0:
            _log(f"  e2e step {i}: load={load:.2f} newton={int(its)} cg={int(cg)} norm={float(norm):.2e}")
    jax.block_until_ready((Du, sig))
    wall = time.perf_counter() - t0
    n_gauss = fp.nc * fp.nq
    return {
        "steps": len(load_steps),
        "wall_s": wall,
        "per_step_s": wall / len(load_steps),
        "newton_total": newton_total,
        "gauss_points": n_gauss,
        "final_residual": float(norm),
    }


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    accel = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    from dolfinx_external_operator_tpu.models.mohr_coulomb import MohrCoulombMaterial

    mat = MohrCoulombMaterial()

    n_points = 1 << 16  # 65536 Gauss points (largest validated-safe width)
    _log("bench: TPU kernel throughput...")
    tpu_pps = _kernel_throughput(mat, accel, n_points, reps=10)
    _log(f"bench: TPU {tpu_pps:.3e} pts/s; CPU baseline...")
    cpu_pps = _kernel_throughput(mat, cpu, n_points, reps=3)
    _log(f"bench: CPU {cpu_pps:.3e} pts/s; end-to-end...")

    e2e = _end_to_end(accel)

    print(
        json.dumps(
            {
                "metric": "mohr_coulomb_return_map_throughput",
                "value": round(tpu_pps, 1),
                "unit": "gauss_pts_per_sec",
                "vs_baseline": round(tpu_pps / cpu_pps, 2),
                "cpu_baseline_pts_per_sec": round(cpu_pps, 1),
                "device": str(accel),
                "e2e_slope_stability_25x25": e2e,
            }
        )
    )


if __name__ == "__main__":
    main()
