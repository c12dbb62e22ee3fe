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
