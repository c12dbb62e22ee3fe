"""Run every demo script as a subprocess (reference doc/demo/test_demos.py:23-36)."""
import os
import subprocess
import sys

import pytest

DEMOS = os.path.join(os.path.dirname(__file__), "..", "demos")


@pytest.mark.parametrize("demo,args", [
    ("demo_simple_example.py", []),
    ("demo_nonlinear_heat.py", []),
    ("demo_plasticity_von_mises.py", ["--small", "--no-plot"]),
    ("demo_plasticity_mohr_coulomb.py", ["--small", "--no-plot"]),
    ("demo_hyperelasticity.py", ["--small", "--no-plot"]),
])
@pytest.mark.slow
def test_demo_runs(demo, args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # PYTHONPATH must NOT include /root/.axon_site: its sitecustomize
    # overrides JAX_PLATFORMS back to the tunneled TPU, silently running the
    # demo on the single-client device (contention -> flaky convergence)
    env["PYTHONPATH"] = os.path.abspath(os.path.join(DEMOS, ".."))
    r = subprocess.run([sys.executable, os.path.join(DEMOS, demo), *args],
                       capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]


def _run_von_mises(extra_args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.abspath(os.path.join(DEMOS, ".."))
    env.pop("XLA_FLAGS", None)  # the demo sets the device count itself
    r = subprocess.run(
        [sys.executable, os.path.join(DEMOS, "demo_plasticity_von_mises.py"),
         "--small", "--no-plot", *extra_args],
        capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    for line in r.stdout.splitlines():
        if line.startswith("final_displacement="):
            return float(line.split("=", 1)[1])
    raise AssertionError(f"no final_displacement line in:\n{r.stdout[-2000:]}")


@pytest.mark.slow
def test_von_mises_demo_8_devices_parity():
    """Full demo end-to-end on an 8-device virtual mesh through the GENERAL
    pipeline (every form GSPMD-sharded via the default device mesh), parity
    with the single-device run — the analog of the reference CI executing
    demos under ``mpirun`` (build-and-test.yml:52-54)."""
    single = _run_von_mises([])
    sharded = _run_von_mises(["--devices", "8"])
    assert abs(single - sharded) <= 1e-12 * max(1.0, abs(single)), (
        f"single={single!r} sharded={sharded!r}")
