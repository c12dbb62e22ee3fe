"""The driver parses bench.py's LAST stdout line within a small tail
window; rounds 3 and 4 both lost their official metrics because the
cumulative record line outgrew it.  Pin the compact-summary contract:
<= 1.5 KB for a fully-populated record, and the headline fields survive
the distillation."""

import importlib.util
import json
import os

import pytest


@pytest.fixture(scope="module")
def bench_mod():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_for_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _full_record():
    leg = {"steps": 52, "wall_s": 250.4, "per_step_s": 4.8161,
           "newton_total": 171, "cg_total": 12345, "cg_per_step": 237.4,
           "gauss_points": 60000, "final_residual": 1.8e-12,
           "kernel_pts_per_s": 858126.7, "solver": "bcr",
           "driver": "host (1 Newton/execution, EW forcing)"}
    full = {"tpu": {"per_step_s": 10.2097, "newton_total": 239,
                    "solver": "mg", "driver": "host", "collapse": {"step": 49}},
            "cpu": {"per_step_s": 55.2242, "newton_total": 239},
            "tpu_bcr": {"per_step_s": 2.29, "newton_total": 239},
            "tpu_vs_cpu": 5.41, "newton_parity": True,
            "tpu_bcr_vs_cpu": 24.11, "newton_parity_bcr": True,
            "tpu_vs_reference_algorithm": 33.3, "steps": 49,
            "source": "committed records (scripts/bench_scaling_full.py)"}
    return {
        "metric": "mohr_coulomb_return_map_throughput",
        "value": 1717933.3, "unit": "gauss_pts_per_sec", "vs_baseline": 11.6,
        "cpu_baseline_note": "n" * 400,
        "device": "TPU v5 lite0", "cpu_baseline_pts_per_sec": 61891.0,
        "e2e_cpu_reference_algorithm": dict(leg, mesh="25x25"),
        "scaling_100x100_full": full,
        "scaling_200x200_full": dict(full),
        "e2e_slope_stability_25x25": dict(leg),
        "e2e_tpu_vs_reference_algorithm": 49.8,
        "e2e_cpu_same_pipeline": dict(leg),
        "e2e_tpu_vs_cpu": 49.1,
        "mfu": {"return_map": {"pts_per_s": 1717933.3,
                               "pct_vpu_peak_lo_hi": [0.28, 4.04],
                               "flops_per_pt_xla_lo_hi": [15214.0, 222268.0],
                               "note": "x" * 200},
                "dia_matvec_200x200": {"achieved_gbps_chained": 571.8,
                                       "pct_hbm_peak_chained": 69.8,
                                       "n_rows": 321602,
                                       "bytes_per_matvec": 57888360}},
        "scaling": {s: dict(leg) for s in ("50x50", "100x100", "200x200")},
        "bench_elapsed_s": 1200.0,
        "tpu_unavailable": None,
    }


def test_compact_line_fits_tail_window(bench_mod):
    line = json.dumps(bench_mod._compact(_full_record()))
    assert len(line) <= 1500, f"compact line is {len(line)} bytes"


def test_compact_preserves_headline_fields(bench_mod):
    c = bench_mod._compact(_full_record())
    assert c["metric"] == "mohr_coulomb_return_map_throughput"
    assert c["value"] == 1717933.3
    assert c["vs_baseline"] == 11.6
    assert c["e2e_25x25"]["vs_ref_alg"] == 49.8
    assert c["full_100x100"]["tpu_vs_cpu"] == 5.41
    assert c["full_100x100"]["newton_parity"] is True
    assert c["full_record"] == "docs/records/bench_full.json"
    # round-trips as one JSON line
    assert json.loads(json.dumps(c)) == c


def test_compact_minimal_and_error_records(bench_mod):
    base = {"metric": "m", "value": 0, "unit": "u", "vs_baseline": 0}
    c = bench_mod._compact(dict(base))
    assert json.loads(json.dumps(c))["value"] == 0
    c = bench_mod._compact(dict(
        base, watchdog="bench wall-clock limit hit; partial record",
        scaling={"50x50": {"skipped": "bench deadline"},
                 "100x100": {"error": "RuntimeError: boom" * 30}}))
    line = json.dumps(c)
    assert len(line) <= 1500
    assert "watchdog" in c
