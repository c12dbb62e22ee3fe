#!/usr/bin/env python
"""Headline benchmark: Mohr-Coulomb return-map throughput + load-step time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: Gauss points/second through the full consistent-tangent
return map (mixed-precision inner Newton with closed-form Jacobians +
difficulty-sorted chunking — the hot loop of the reference's headline demo,
``demo_plasticity_mohr_coulomb.py:574``).  ``vs_baseline`` is the speedup
over the SAME jitted kernel on this host's CPU — the reference implements
this exact kernel with JAX-on-CPU, so this isolates the hardware + batching
win at equal algorithmic footing.

Extras:
- ``e2e_slope_stability_25x25``: the full 52-step schedule on the
  reference's mesh, on TPU AND on the host CPU through the SAME fused
  pipeline — an honest end-to-end hardware ratio.
- ``scaling``: per-step wall time + kernel throughput at 50x50, 100x100
  and 200x200 meshes through the fused AMG-preconditioned-CG path
  (parallel/mg.py — the MUMPS-LU replacement), the cost-vs-size curve.

CPU-baseline caveat (printed in the JSON as ``cpu_baseline_note``): the
reference's own stack (dolfinx+PETSc/MUMPS) is not installed on this
machine, so the CPU numbers time the SAME JAX pipeline on the host CPU —
a hardware ratio at equal algorithmic footing, not a cross-framework one.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _kernel_throughput(mat, device, n_points, reps, sorted_chunk=None):
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
        if sorted_chunk:
            fn = jax.jit(lambda a, b: mat.tangent_and_stress_sorted(
                a.reshape(-1), b.reshape(-1), chunk=sorted_chunk)[:2])
        else:
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


def _build_fused(mat, Nx, Ny, linear_solver, sorted_chunk=None, **fp_kwargs):
    from dolfinx_external_operator_tpu import locate_dofs_geometrical
    from dolfinx_external_operator_tpu.models.mohr_coulomb import build_slope_problem
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    P = build_slope_problem(Nx=Nx, Ny=Ny)
    mesh, V, S = P["mesh"], P["V"], P["S"]
    bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
    bc_dofs = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])

    def kernel(deps, sn):
        C_tang, state = mat.tangent_stress_point(deps, sn)
        return C_tang, state[0]

    bk = mat.batched_kernel_sorted(sorted_chunk) if sorted_chunk else None
    return FusedPlasticityStep(mesh, V, S, kernel, bc_dofs,
                               linear_solver=linear_solver, batched_kernel=bk,
                               **fp_kwargs)


def _run_schedule(fp, load_steps, label, host_driver=False):
    """host_driver=True runs one Newton iteration per device execution
    (with Eisenstat-Walker CG forcing) — required at large mesh sizes,
    where a fused multi-Newton execution exceeds the TPU tunnel's
    per-execution time limit."""
    import jax

    step = fp.run_step_host if host_driver else fp.run_step

    Du, sig = fp.zero_state()
    Du_w, sig_w, *_ = step(Du, sig, float(load_steps[0]))  # warmup/compile
    jax.block_until_ready((Du_w, sig_w))

    Du, sig = fp.zero_state()
    newton_its = []
    cg_its = []
    t0 = time.perf_counter()
    for i, load in enumerate(load_steps):
        Du, sig, norm, its, cg = step(Du, sig, float(load))
        # keep `its`/`cg` as device scalars: converting per step would force
        # a host sync (one ~10 ms tunnel round trip each) and serialize the
        # dispatch pipeline; everything is summed after the final block.
        newton_its.append(its)
        cg_its.append(cg)
        if host_driver and i % 10 == 0:
            _log(f"  {label} step {i}: load={load:.2f} newton={int(its)} cg={int(cg)} norm={float(norm):.2e}")
    jax.block_until_ready((Du, sig))
    wall = time.perf_counter() - t0
    newton_total = int(sum(int(x) for x in newton_its))
    cg_total = int(sum(int(x) for x in cg_its))
    _log(f"  {label}: {len(load_steps)} steps, newton_total={newton_total}, "
         f"cg_total={cg_total}, final norm={float(norm):.2e}")
    return {
        "steps": len(load_steps),
        "wall_s": round(wall, 3),
        "per_step_s": round(wall / len(load_steps), 4),
        "newton_total": newton_total,
        "cg_total": cg_total,
        "cg_per_step": round(cg_total / len(load_steps), 1),
        "gauss_points": fp.nc * fp.nq,
        "final_residual": float(norm),
    }


def _init_devices():
    """Initialize JAX and return (accel, cpu, tpu_unavailable_note).

    Guards against a down/wedged TPU tunnel: the axon client retries its
    localhost relay connection in an infinite 1/s sleep loop, so a naive
    ``jax.devices()`` would hang the whole bench (observed 2026-08-17: relay
    ports 8082/8083 closed, clients stuck in nanosleep for 40+ min).  Probe
    the relay port first and fall back to host CPU — an honestly-flagged
    CPU record beats an empty one.  A watchdog still force-emits a JSON
    line if init wedges past the probe."""
    import json as _json
    import os
    import socket
    import threading

    note = None
    if os.environ.get("JAX_PLATFORMS", "") == "axon":
        # 8083 = topology/devices leg, 8082 = session leg; either one
        # listening means the relay is up
        for port in (8083, 8082):
            try:
                s = socket.create_connection(("127.0.0.1", port), timeout=3)
                s.close()
                break
            except OSError:
                continue
        else:
            note = ("TPU tunnel relay down (ports 8082/8083 closed) at bench "
                    "time; ran on host CPU instead")
            _log(f"bench: {note}")

    import jax

    if note is not None:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    watchdog = threading.Timer(300.0, lambda: (
        print(_json.dumps({
            "metric": "mohr_coulomb_return_map_throughput",
            "value": 0, "unit": "gauss_pts_per_sec", "vs_baseline": 0,
            "error": "jax device init wedged >300s (TPU tunnel hung); no run",
        }), flush=True),
        os._exit(3)))
    watchdog.daemon = True
    watchdog.start()
    accel = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    watchdog.cancel()
    return accel, cpu, note


def main():
    import os
    import threading

    import jax

    accel, cpu, tpu_note = _init_devices()

    from dolfinx_external_operator_tpu.models.mohr_coulomb import MohrCoulombMaterial

    mat = MohrCoulombMaterial()

    # Incremental record + global watchdog: a tunnel death mid-run leaves
    # block_until_ready hung forever, which would void the whole bench.
    # The watchdog prints whatever has been measured so far and exits.
    record = {
        "metric": "mohr_coulomb_return_map_throughput",
        "value": 0, "unit": "gauss_pts_per_sec", "vs_baseline": 0,
        "cpu_baseline_note": (
            "reference stack (dolfinx+PETSc/MUMPS) not installed on "
            "this machine; CPU numbers run the SAME JAX pipeline on "
            "host CPU (equal algorithmic footing, hardware ratio)"),
        **({"tpu_unavailable": tpu_note} if tpu_note else {}),
    }

    def _emit_partial():
        record["watchdog"] = "bench wall-clock limit hit; partial record"
        print(json.dumps(record), flush=True)
        os._exit(0)

    watchdog = threading.Timer(50 * 60.0, _emit_partial)
    watchdog.daemon = True
    watchdog.start()

    n_points = 1 << 16  # 65536 Gauss points
    _log("bench: TPU kernel throughput (difficulty-sorted chunked)...")
    tpu_pps = _kernel_throughput(mat, accel, n_points, reps=10, sorted_chunk=8192)
    _log(f"bench: TPU {tpu_pps:.3e} pts/s; CPU baseline (same kernel)...")
    cpu_pps = _kernel_throughput(mat, cpu, n_points, reps=3, sorted_chunk=8192)
    _log(f"bench: CPU {cpu_pps:.3e} pts/s; e2e 25x25 on TPU...")
    record.update({
        "value": round(tpu_pps, 1),
        "vs_baseline": round(tpu_pps / cpu_pps, 2),
        "cpu_baseline_pts_per_sec": round(cpu_pps, 1),
        "device": str(accel),
    })

    full_schedule = np.concatenate([np.linspace(2, 22.9, 50), np.array([22.96, 22.99])])
    fp_tpu = _build_fused(mat, 25, 25, "auto", sorted_chunk=4096)
    e2e_tpu = _run_schedule(fp_tpu, full_schedule, "tpu-25x25")
    record["e2e_slope_stability_25x25"] = e2e_tpu

    _log("bench: e2e 25x25 on host CPU (same pipeline)...")
    with jax.default_device(cpu):
        fp_cpu = _build_fused(mat, 25, 25, "auto", sorted_chunk=4096)
        e2e_cpu = _run_schedule(fp_cpu, full_schedule, "cpu-25x25")
    record["e2e_cpu_same_pipeline"] = e2e_cpu
    record["e2e_tpu_vs_cpu"] = round(e2e_cpu["wall_s"] / e2e_tpu["wall_s"], 2)

    # Second, reference-ALGORITHM CPU baseline (recorded full-schedule run
    # of scripts/bench_reference_proxy.py: the reference demo's own
    # algorithm — f64 jacfwd return-mapping kernel, per-Newton sparse
    # direct LU — on this host).  The same-pipeline number above is the
    # conservative hardware ratio (the CPU gets every algorithmic win);
    # this one is the algorithm+hardware ratio against what the reference
    # actually runs.
    try:
        rec_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "docs", "records", "reference_proxy_25x25.json")
        with open(rec_path) as fh:
            proxy = json.load(fh)
        record["e2e_cpu_reference_algorithm"] = proxy
        record["e2e_tpu_vs_reference_algorithm"] = round(
            proxy["per_step_s"] / e2e_tpu["per_step_s"], 1)
    except (OSError, KeyError, ValueError) as e:
        record["e2e_cpu_reference_algorithm"] = {"error": str(e)[:120]}

    _log("bench: scaling curve (fused AMG-CG path, sorted kernel)...")
    scaling = record["scaling"] = {}
    short = full_schedule[:3]
    # on the CPU-fallback emergency path keep only the smallest scaling
    # size: 100/200 host runs would blow the driver's bench budget
    for nx in ((50,) if tpu_note else (50, 100, 200)):
        # one flaky size (tunnel hiccup, compile-helper timeout) must not
        # void the whole bench record
        try:
            fp = _build_fused(mat, nx, nx, "mg", sorted_chunk=8192)
            # >=100: a fused multi-Newton execution exceeds the tunnel's
            # ~60 s per-execution kill — drive one Newton per execution
            # (Eisenstat-Walker forcing; disclosed in the record)
            host = nx >= 100 and not tpu_note
            r = _run_schedule(fp, short, f"tpu-{nx}x{nx}", host_driver=host)
            if host:
                r["driver"] = "host (1 Newton/execution, EW forcing)"
        except Exception as e:  # noqa: BLE001
            _log(f"  tpu-{nx}x{nx} FAILED: {e}")
            r = {"error": f"{type(e).__name__}: {e}"[:200]}
        scaling[f"{nx}x{nx}"] = r
        if "error" in r:
            continue
        try:  # a throughput-rep hiccup must not void the schedule numbers
            r["kernel_pts_per_s"] = round(
                _kernel_throughput(mat, accel, fp.nc * fp.nq, reps=5, sorted_chunk=8192), 1)
        except Exception as e:  # noqa: BLE001
            _log(f"  tpu-{nx}x{nx} kernel throughput FAILED: {e}")
            r["kernel_pts_per_s_error"] = f"{type(e).__name__}: {e}"[:200]

    watchdog.cancel()
    print(json.dumps(record))


if __name__ == "__main__":
    main()
