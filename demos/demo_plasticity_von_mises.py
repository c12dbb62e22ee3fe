"""Von Mises cylinder-expansion demo (reference demo_plasticity_von_mises.py).

Emits the reference's load-displacement verification figure
(``demo_plasticity_von_mises.py:580-597``: external-operator curve overlaid
on the pure-form twin, with the analytic collapse load) under
``docs/figures/`` unless ``--no-plot`` is passed.
"""
import os
import sys

import numpy as np

from dolfinx_external_operator_tpu.models.von_mises import (
    Q_LIM, solve_von_mises, solve_von_mises_pure_form)

FIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "figures")


def main(num_increments=20, lc=0.3, plot=True):
    ext = solve_von_mises(lc=lc, num_increments=num_increments, verbose=True)
    pure = solve_von_mises_pure_form(lc=lc, num_increments=num_increments)
    diff = np.abs(ext["results"][:, 0] - pure["results"][:, 0]).max()
    print(f"collapse load q_lim = {Q_LIM:.3f} MPa")
    print(f"external vs pure-form twin max displacement diff: {diff:.3e}")
    # machine-checkable parity line: tests compare this across device-mesh
    # sizes (the reference CI's mpirun -n 2 demo runs,
    # .github/workflows/build-and-test.yml:52-54)
    print(f"final_displacement={ext['results'][-1, 0]:.17g}")
    assert diff < 1e-9
    if plot:
        from dolfinx_external_operator_tpu.utils.plots import save_load_displacement

        os.makedirs(FIG_DIR, exist_ok=True)
        out = save_load_displacement(
            [("external operator", ext["results"]),
             ("pure-form twin", pure["results"])],
            os.path.join(FIG_DIR, "von_mises_load_displacement.png"),
            xlabel="displacement of inner boundary",
            ylabel="q / q_lim",
            title="Von Mises cylinder expansion: external operator vs twin",
            hline=1.0,
            hline_label=f"analytic collapse load q_lim = {Q_LIM:.1f} MPa")
        if out:
            print(f"figure: {out}")
    print("von Mises demo OK")


if __name__ == "__main__":
    if "--devices" in sys.argv:
        # run the whole demo with every form sharded over an n-device mesh
        # (the reference CI runs each demo under ``mpirun -n 2``,
        # .github/workflows/build-and-test.yml:52-54; the TPU analog is
        # GSPMD over a jax.sharding.Mesh installed as the default)
        n_dev = int(sys.argv[sys.argv.index("--devices") + 1])
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_dev} "
            + os.environ.get("XLA_FLAGS", ""))
        import jax

        jax.config.update("jax_platforms", "cpu")
        from dolfinx_external_operator_tpu import parallel

        parallel.set_default_device_mesh(parallel.make_device_mesh(n_dev))
    main(num_increments=8 if "--small" in sys.argv else 20,
         plot="--no-plot" not in sys.argv)
