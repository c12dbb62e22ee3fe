#!/usr/bin/env python
"""Headline benchmark: Mohr-Coulomb return-map throughput + load-step time.

After EVERY completed section (kernel -> committed baselines -> 25x25 e2e
TPU -> 25x25 e2e CPU -> MFU -> each scaling size) this writes the FULL
cumulative record to ``docs/records/bench_full.json`` and prints ONE
COMPACT (<=1.5 KB) summary JSON line, so a timeout at any point still
leaves the last-emitted line parseable within the driver's tail window
(rounds 3 and 4 both lost their official metrics to an oversized line):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...summary}

Primary metric: Gauss points/second through the full consistent-tangent
return map (mixed-precision inner Newton with closed-form Jacobians +
difficulty-sorted chunking — the hot loop of the reference's headline demo,
``demo_plasticity_mohr_coulomb.py:574``).  ``vs_baseline`` is the speedup
over the SAME jitted kernel on this host's CPU.

End-to-end baselines, labeled honestly:
- ``e2e_cpu_same_pipeline``: the full 52-step schedule through the SAME
  fused pipeline on the host CPU — a hardware ratio at equal algorithmic
  footing (the CPU gets every TPU-oriented algorithmic win).
- ``e2e_cpu_reference_algorithm``: committed record of
  ``scripts/bench_reference_proxy.py`` — the reference demo's OWN algorithm
  (f64 jacfwd return map + per-Newton sparse direct LU, matching
  ``demo_plasticity_mohr_coulomb.py:555,662-672``) on this host's CPU.
  This is the honest reference denominator for the >=50x north star.
- ``scaling_100x100_full``: committed records of the full-schedule
  Newton-parity run (EW forcing OFF) on TPU and host CPU at 100x100
  (``scripts/bench_scaling_full.py``).

MFU/roofline: the ``mfu`` entry reports achieved vs v5e peak for the two
hot kernels (return map vs VPU f32 peak; DIA matvec vs HBM bandwidth),
with the DIA dispatch floor separated from the device limit by batching
many matvecs into one dispatch.
"""

import json
import sys
import time

import numpy as np

# finish-by budget for the whole bench (driver kills around ~30 min; r3's
# record was voided by exactly that).  Sections check the remaining budget
# and skip, and a watchdog force-emits the record shortly past the target.
DEADLINE_S = 22 * 60.0
WATCHDOG_S = 26 * 60.0

# XLA cost-analysis FLOPs per Gauss point of the difficulty-sorted
# consistent-tangent return map (chunk=8192, f64 in / mixed f32-f64 inner
# Newton), measured via utils/roofline.py::return_map_flops_per_pt.
# Executed FLOPs are data-dependent (inner Newton = lax.while_loop), so two
# static counts bracket them: XLA:CPU counts the loop body once (LO), XLA:TPU
# counts it at the static trip bound (HI).  tests/test_roofline.py re-derives
# LO on this host to keep the constants honest.
RM_FLOPS_PER_PT_LO = 15214.0
RM_FLOPS_PER_PT_HI = 222268.0

_T0 = time.perf_counter()


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _left():
    return DEADLINE_S - (time.perf_counter() - _T0)


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
    (with Eisenstat-Walker forcing) — required at large mesh sizes,
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


def _compact(record):
    """Distill the cumulative record into a <=1.5 KB summary object.

    Every value here also exists (with full context/disclosures) in the
    full record at docs/records/bench_full.json; this object exists only
    so the driver's tail-line JSON parse always succeeds."""
    def leg(e):
        if not isinstance(e, dict) or "per_step_s" not in e:
            return None
        out = {"s_step": e["per_step_s"], "newton": e.get("newton_total")}
        if e.get("cg_total") is not None:
            out["cg"] = e["cg_total"]
        if e.get("kernel_pts_per_s") is not None:
            out["pts_s"] = e["kernel_pts_per_s"]
        if e.get("solver"):
            out["solver"] = e["solver"]
        return out

    c = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": record["unit"],
        "vs_baseline": record["vs_baseline"],
    }
    for k in ("tpu_unavailable", "watchdog", "error"):
        if record.get(k):
            c[k] = str(record[k])[:120]
    e25 = leg(record.get("e2e_slope_stability_25x25"))
    if e25:
        for rk, ck in (("e2e_tpu_vs_reference_algorithm", "vs_ref_alg"),
                       ("e2e_tpu_vs_cpu", "vs_cpu")):
            if record.get(rk) is not None:
                e25[ck] = record[rk]
        c["e2e_25x25"] = e25
    proxy = record.get("e2e_cpu_reference_algorithm")
    if isinstance(proxy, dict) and "per_step_s" in proxy:
        c["ref_alg_cpu_25x25_s_step"] = proxy["per_step_s"]
    sched = record.get("e2e_25x25_schedule_driver")
    if isinstance(sched, dict) and "per_step_s" in sched:
        c["e2e_25x25_sched"] = {"s_step": sched["per_step_s"],
                                "newton": sched.get("newton_total")}
        if record.get("e2e_schedule_vs_reference_algorithm") is not None:
            c["e2e_25x25_sched"]["vs_ref_alg"] = \
                record["e2e_schedule_vs_reference_algorithm"]
    for rk, ck in (("e2e_cpu_same_pipeline", "cpu_same_pipeline_25x25"),):
        lg = leg(record.get(rk))
        if lg:
            c[ck] = {"s_step": lg["s_step"]}
    for size in ("100x100", "200x200"):
        f = record.get(f"scaling_{size}_full")
        if isinstance(f, dict):
            cf = {}
            for lk in ("tpu", "cpu", "tpu_bcr", "ref_alg"):
                if isinstance(f.get(lk), dict) and "per_step_s" in f[lk]:
                    cf[lk] = f[lk]["per_step_s"]
            for pk in ("tpu_vs_cpu", "newton_parity", "tpu_bcr_vs_cpu",
                       "newton_parity_bcr", "tpu_vs_reference_algorithm",
                       "steps"):
                if f.get(pk) is not None:
                    cf[pk] = f[pk]
            if cf:
                c[f"full_{size}"] = cf
    coll = record.get("collapse_100x100")
    if isinstance(coll, dict):
        cc = {}
        tr = coll.get("tuned_retry")
        if isinstance(tr, dict):
            cc["tuned_retry_52of52"] = bool(tr.get("completed_schedule"))
        ws = coll.get("reference_alg_warmstart")
        if isinstance(ws, dict):
            # proxy record: converged steps counted from the resume point
            cc["ref_alg_s49_steps_converged"] = ws.get("steps")
            if ws.get("collapse"):
                cc["ref_alg_collapse"] = True
        if cc:
            c["collapse_100x100"] = cc
    sc = record.get("scaling")
    if isinstance(sc, dict):
        c["scaling"] = {}
        for size, e in sc.items():
            lg = leg(e)
            c["scaling"][size] = lg if lg else {
                k: str(v)[:60] for k, v in e.items()
                if k in ("skipped", "error")}
    mfu = record.get("mfu")
    if isinstance(mfu, dict):
        cm = {}
        rm = mfu.get("return_map")
        if isinstance(rm, dict) and "pts_per_s" in rm:
            cm["rm_pts_s"] = rm["pts_per_s"]
            cm["rm_pct_vpu_lo_hi"] = rm.get("pct_vpu_peak_lo_hi")
        for k, v in mfu.items():
            if k.startswith("dia_matvec") and isinstance(v, dict) \
                    and "pct_hbm_peak_chained" in v:
                cm[k.replace("matvec_", "")] = {
                    "gbps": v.get("achieved_gbps_chained"),
                    "pct_hbm": v["pct_hbm_peak_chained"]}
        if cm:
            c["mfu"] = cm
    c["full_record"] = "docs/records/bench_full.json"
    c["elapsed_s"] = record.get("bench_elapsed_s")
    # hard guarantee: the driver's tail/parse window is the contract
    line = json.dumps(c)
    if len(line) > 1500:
        for k in ("scaling", "mfu", "cpu_same_pipeline_25x25",
                  "full_200x200"):
            c.pop(k, None)
            if len(json.dumps(c)) <= 1500:
                break
    return c


def _load_committed_records(record, records_dir):
    """Attach the committed CPU/parity baseline records (verdict r3 #2/#3).

    Missing or mismatched records are reported LOUDLY on stderr and as an
    ``error`` field — a silent `{"error": ...}` buried a whole round's
    headline ratio in r3."""
    import os

    out = {}
    p = os.path.join(records_dir, "reference_proxy_25x25.json")
    try:
        with open(p) as fh:
            proxy = json.load(fh)
        if proxy.get("mesh") != "25x25" or proxy.get("steps") != 52:
            raise ValueError(f"record shape mismatch: mesh={proxy.get('mesh')} "
                             f"steps={proxy.get('steps')} (want 25x25/52)")
        record["e2e_cpu_reference_algorithm"] = proxy
        out["proxy"] = proxy
    except (OSError, KeyError, ValueError) as e:
        _log("=" * 72)
        _log(f"bench: MISSING/BAD reference-algorithm baseline {p}: {e}")
        _log("bench: run `python scripts/bench_reference_proxy.py 25 52` and "
             "commit its output to docs/records/reference_proxy_25x25.json")
        _log("=" * 72)
        record["e2e_cpu_reference_algorithm"] = {"error": str(e)[:200]}

    full = {}
    for leg in ("tpu", "cpu", "tpu_bcr"):
        p = os.path.join(records_dir, f"scaling_100x100_full_{leg}.json")
        try:
            with open(p) as fh:
                r = json.load(fh)
            if r.get("mesh") != "100x100":
                raise ValueError(f"mesh={r.get('mesh')} (want 100x100)")
            full[leg] = r
        except (OSError, KeyError, ValueError) as e:
            _log(f"bench: no committed 100x100 full-schedule {leg} record ({e})")

    # round-5 schedule-driver 25x25 record (verdict r4 #3): multiple load
    # steps per device execution via lax.scan — the committed best-latency
    # leg at the reference's own problem size
    p = os.path.join(records_dir, "scaling_25x25_full_tpu_bcr_schedule.json")
    try:
        with open(p) as fh:
            r = json.load(fh)
        if r.get("mesh") != "25x25" or r.get("steps") != 52:
            raise ValueError(f"mesh={r.get('mesh')} steps={r.get('steps')}")
        record["e2e_25x25_schedule_driver"] = r
        proxy25 = out.get("proxy")
        if proxy25 and proxy25.get("per_step_s"):
            record["e2e_schedule_vs_reference_algorithm"] = round(
                proxy25["per_step_s"] / r["per_step_s"], 1)
    except OSError:
        pass
    except (KeyError, ValueError) as e:
        _log(f"bench: bad 25x25 schedule record ({e})")

    # round-5 collapse resolution (verdict r4 #4): raised-budget retry of
    # the 49/52 stop + the reference-algorithm warm-start at the same state
    coll = {}
    for key, fname in (("tuned_retry", "collapse_step49_retry.json"),
                       ("tuned_retry_50x50",
                        "collapse_step49_retry_50x50.json"),
                       ("reference_alg_warmstart",
                        "reference_proxy_100x100_warmstart_s49.json")):
        p = os.path.join(records_dir, fname)
        try:
            with open(p) as fh:
                coll[key] = json.load(fh)
        except OSError:
            pass
    if coll:
        record["collapse_100x100"] = coll
    p = os.path.join(records_dir, "reference_proxy_100x100.json")
    try:
        with open(p) as fh:
            r = json.load(fh)
        if r.get("mesh") != "100x100":
            raise ValueError(f"mesh={r.get('mesh')} (want 100x100)")
        # the proxy's first two steps carry jacfwd-kernel compile time
        # (432 + 207 s); steady-state per-step (steps 2+) is the honest
        # denominator against TPU legs that exclude their own warmup
        ss = r.get("step_s", [])
        if len(ss) > 4:
            r["per_step_s_steady"] = round(float(np.mean(ss[2:])), 3)
        full["ref_alg"] = r
    except (OSError, KeyError, ValueError) as e:
        _log(f"bench: no committed 100x100 reference-proxy record ({e})")
    if full:
        entry = {leg: {k: r[k] for k in ("steps", "steps_scheduled",
                                         "per_step_s", "per_step_s_steady",
                                         "newton_total",
                                         "cg_per_step", "backend", "solver",
                                         "driver", "collapse",
                                         "budget_exhausted")
                       if k in r} for leg, r in full.items()}
        best_tpu = full.get("tpu_bcr") or full.get("tpu")
        ref = full.get("ref_alg")
        if best_tpu and ref and ref.get("per_step_s_steady"):
            # matched protocol: steady-state (steps 2+) means on both legs,
            # over the proxy's converged prefix where per-step times exist
            n_ref = int(ref["steps"])
            ts = best_tpu.get("step_s")
            if ts and len(ts) >= n_ref:
                tpu_ps = float(np.mean(ts[2:n_ref]))
                basis = (f"steady-state steps 2..{n_ref - 1} on both legs "
                         f"(proxy budget_exhausted prefix)")
            else:
                tpu_ps = float(best_tpu["per_step_s"])
                basis = (f"proxy steady-state (steps 2+) vs TPU whole-run "
                         f"mean (no per-step TPU times committed)")
            entry["tpu_vs_reference_algorithm"] = round(
                ref["per_step_s_steady"] / tpu_ps, 1)
            entry["ref_ratio_basis"] = basis
        if "tpu" in full and "cpu" in full:
            entry["tpu_vs_cpu"] = round(full["cpu"]["per_step_s"] /
                                        full["tpu"]["per_step_s"], 2)
            # parity = identical per-step Newton trajectory AND (if a
            # near-limit collapse was detected) the same collapse step
            entry["newton_parity"] = (
                full["tpu"].get("newton_per_step") ==
                full["cpu"].get("newton_per_step")
                and full["tpu"].get("collapse", {}).get("step") ==
                    full["cpu"].get("collapse", {}).get("step"))
        if "tpu_bcr" in full and "cpu" in full:
            # best-TPU-solver leg: block-cyclic-reduction direct solve
            # (parallel/bcr.py) — exact solves, so the Newton-parity claim
            # is checked against the SAME CPU trajectory
            entry["tpu_bcr_vs_cpu"] = round(full["cpu"]["per_step_s"] /
                                            full["tpu_bcr"]["per_step_s"], 2)
            entry["newton_parity_bcr"] = (
                full["tpu_bcr"].get("newton_per_step") ==
                full["cpu"].get("newton_per_step")
                and full["tpu_bcr"].get("collapse", {}).get("step") ==
                    full["cpu"].get("collapse", {}).get("step"))
        entry["source"] = "committed records (scripts/bench_scaling_full.py)"
        record["scaling_100x100_full"] = entry

    # 200x200 committed full-schedule legs (verdict r4 #6)
    f200 = {}
    for leg in ("tpu", "tpu_bcr", "cpu"):
        p = os.path.join(records_dir, f"scaling_200x200_full_{leg}.json")
        try:
            with open(p) as fh:
                r = json.load(fh)
            if r.get("mesh") != "200x200":
                raise ValueError(f"mesh={r.get('mesh')} (want 200x200)")
            f200[leg] = r
        except OSError:
            pass
        except (KeyError, ValueError) as e:
            _log(f"bench: bad 200x200 {leg} record ({e})")
    if f200:
        entry = {leg: {k: r[k] for k in ("steps", "steps_scheduled",
                                         "per_step_s", "newton_total",
                                         "cg_per_step", "backend", "solver",
                                         "driver", "collapse",
                                         "budget_exhausted")
                       if k in r} for leg, r in f200.items()}
        best = f200.get("tpu_bcr") or f200.get("tpu")
        if best and "cpu" in f200:
            n = min(int(best["steps"]), int(f200["cpu"]["steps"]))
            entry["tpu_vs_cpu"] = round(f200["cpu"]["per_step_s"] /
                                        best["per_step_s"], 2)
            entry["newton_parity"] = (
                best.get("newton_per_step", [])[:n] ==
                f200["cpu"].get("newton_per_step", [])[:n] and n > 0)
            entry["parity_steps"] = n
        entry["source"] = "committed records (scripts/bench_scaling_full.py)"
        record["scaling_200x200_full"] = entry
    return out


def main():
    import os
    import threading

    import jax

    record = {
        "metric": "mohr_coulomb_return_map_throughput",
        "value": 0, "unit": "gauss_pts_per_sec", "vs_baseline": 0,
        "cpu_baseline_note": (
            "reference stack (dolfinx+PETSc/MUMPS) not installed on this "
            "machine; two CPU denominators recorded: the SAME JAX pipeline "
            "on host CPU (e2e_cpu_same_pipeline) and the reference's own "
            "algorithm, f64 jacfwd + sparse direct LU "
            "(e2e_cpu_reference_algorithm)"),
    }

    full_record_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "docs", "records", "bench_full.json")

    def emit():
        """Write the FULL cumulative record to docs/records/bench_full.json
        and print a COMPACT (<=1.5 KB) summary line to stdout.

        The driver parses the LAST stdout line within a small tail window;
        rounds 3 and 4 both lost their official metrics because the
        cumulative line outgrew it (r4: ~3.3 KB, parsed=null)."""
        record["bench_elapsed_s"] = round(time.perf_counter() - _T0, 1)
        try:
            with open(full_record_path, "w") as fh:
                json.dump(record, fh, indent=1)
        except OSError as e:  # read-only checkout must not kill the bench
            _log(f"bench: could not write full record: {e}")
        print(json.dumps(_compact(record)), flush=True)

    def _emit_partial():
        record["watchdog"] = "bench wall-clock limit hit; partial record"
        emit()
        os._exit(0)

    watchdog = threading.Timer(WATCHDOG_S, _emit_partial)
    watchdog.daemon = True
    watchdog.start()

    # ---- section 0: committed baseline records ------------------------------
    # Loaded FIRST (no device needed): if the TPU tunnel hangs anywhere
    # below — including jax.devices() itself, observed twice in round 5
    # with in-flight compiles blocked 30+ min — the watchdog's partial
    # record still carries every committed headline ratio.
    records_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "docs", "records")
    _load_committed_records(record, records_dir)
    emit()

    accel, cpu, tpu_note = _init_devices()
    if tpu_note:
        record["tpu_unavailable"] = tpu_note

    from dolfinx_external_operator_tpu.models.mohr_coulomb import MohrCoulombMaterial

    mat = MohrCoulombMaterial()

    # ---- section 1: kernel throughput (TPU + CPU) --------------------------
    n_points = 1 << 16  # 65536 Gauss points
    _log("bench: TPU kernel throughput (difficulty-sorted chunked)...")
    tpu_pps = _kernel_throughput(mat, accel, n_points, reps=10, sorted_chunk=8192)
    record.update({"value": round(tpu_pps, 1), "device": str(accel)})
    emit()
    _log(f"bench: TPU {tpu_pps:.3e} pts/s; CPU baseline (same kernel)...")
    cpu_pps = _kernel_throughput(mat, cpu, n_points, reps=3, sorted_chunk=8192)
    record.update({
        "vs_baseline": round(tpu_pps / cpu_pps, 2),
        "cpu_baseline_pts_per_sec": round(cpu_pps, 1),
    })
    emit()

    # ---- section 3: e2e 25x25 on TPU ----------------------------------------
    _log("bench: e2e 25x25 on TPU...")
    full_schedule = np.concatenate([np.linspace(2, 22.9, 50), np.array([22.96, 22.99])])
    fp_tpu = _build_fused(mat, 25, 25, "auto", sorted_chunk=4096)
    e2e_tpu = _run_schedule(fp_tpu, full_schedule, "tpu-25x25")
    record["e2e_slope_stability_25x25"] = e2e_tpu
    proxy = record.get("e2e_cpu_reference_algorithm", {})
    if "per_step_s" in proxy:
        record["e2e_tpu_vs_reference_algorithm"] = round(
            proxy["per_step_s"] / e2e_tpu["per_step_s"], 1)
    emit()

    # ---- section 4: e2e 25x25 on host CPU (same pipeline) -------------------
    if _left() > 360:
        _log("bench: e2e 25x25 on host CPU (same pipeline)...")
        with jax.default_device(cpu):
            fp_cpu = _build_fused(mat, 25, 25, "auto", sorted_chunk=4096)
            e2e_cpu = _run_schedule(fp_cpu, full_schedule, "cpu-25x25")
        record["e2e_cpu_same_pipeline"] = e2e_cpu
        record["e2e_tpu_vs_cpu"] = round(e2e_cpu["wall_s"] / e2e_tpu["wall_s"], 2)
    else:
        record["e2e_cpu_same_pipeline"] = {"skipped": "bench deadline"}
    emit()

    # ---- section 5: MFU / roofline (return map leg) --------------------------
    # FLOPs/pt from XLA cost analysis of the sorted kernel (docs/ROOFLINE.md,
    # kept honest by tests/test_roofline.py); the DIA-matvec leg is measured
    # in the scaling section on the live 100x100 operator.
    from dolfinx_external_operator_tpu.utils import roofline as _roofline
    try:
        record["mfu"] = {"return_map": _roofline.return_map_mfu(
            tpu_pps, RM_FLOPS_PER_PT_LO, RM_FLOPS_PER_PT_HI)}
    except Exception as e:  # noqa: BLE001
        # per-leg error sub-key: a return-map failure must not shadow the
        # DIA-matvec entries the scaling section adds later (ADVICE r4)
        record["mfu"] = {"return_map": {"error": f"{type(e).__name__}: {e}"[:200]}}
    emit()

    # ---- section 6: scaling curve -------------------------------------------
    _log("bench: scaling curve (fused AMG-CG path, sorted kernel)...")
    scaling = record["scaling"] = {}
    short = full_schedule[:3]
    # time cost per size (warm compile + 3 steps), used to gate on deadline
    est_cost = {50: 120, 100: 180, 200: 360}
    # on the CPU-fallback emergency path keep only the smallest scaling
    # size: 100/200 host runs would blow the driver's bench budget
    for nx in ((50,) if tpu_note else (50, 100, 200)):
        if _left() < est_cost[nx]:
            scaling[f"{nx}x{nx}"] = {"skipped": "bench deadline"}
            emit()
            continue
        # one flaky size (tunnel hiccup, compile-helper timeout) must not
        # void the whole bench record
        try:
            # block-cyclic-reduction direct solve (parallel/bcr.py) on
            # lattice meshes up to its ~130k-dof memory bound; AMG-CG
            # above.  BCR steps are fast enough to stay fused (one
            # execution per load step) even at 100x100.
            solver = "bcr" if nx <= 100 else "mg"
            fp = _build_fused(mat, nx, nx, solver, sorted_chunk=8192)
            if solver == "mg" and not tpu_note:
                # DIA level-0 matvec roofline on the LIVE operator:
                # separates the r3 "~1 ms dispatch floor" from the device
                # limit by chaining matvecs inside one dispatch (verdict
                # r3 #4).  Runs on the largest (mg) size now that the
                # smaller sizes solve via BCR.
                try:
                    record["mfu"][f"dia_matvec_{nx}x{nx}"] = \
                        _roofline.dia_roofline_from_fp(fp)
                except Exception as e:  # noqa: BLE001
                    record["mfu"][f"dia_matvec_{nx}x{nx}"] = {
                        "error": f"{type(e).__name__}: {e}"[:200]}
                emit()
            # mg at >=100: a fused multi-Newton execution exceeds the
            # tunnel's ~60 s per-execution kill — drive one Newton per
            # execution (Eisenstat-Walker forcing; disclosed in the record)
            host = solver == "mg" and nx >= 100 and not tpu_note
            r = _run_schedule(fp, short, f"tpu-{nx}x{nx}", host_driver=host)
            r["solver"] = solver
            if host:
                r["driver"] = "host (1 Newton/execution, EW forcing)"
        except Exception as e:  # noqa: BLE001
            _log(f"  tpu-{nx}x{nx} FAILED: {e}")
            r = {"error": f"{type(e).__name__}: {e}"[:200]}
        scaling[f"{nx}x{nx}"] = r
        emit()
        if "error" in r:
            continue
        try:  # a throughput-rep hiccup must not void the schedule numbers
            r["kernel_pts_per_s"] = round(
                _kernel_throughput(mat, accel, fp.nc * fp.nq, reps=5, sorted_chunk=8192), 1)
        except Exception as e:  # noqa: BLE001
            _log(f"  tpu-{nx}x{nx} kernel throughput FAILED: {e}")
            r["kernel_pts_per_s_error"] = f"{type(e).__name__}: {e}"[:200]
        emit()

    watchdog.cancel()
    emit()


if __name__ == "__main__":
    main()
