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
    main(num_increments=8 if "--small" in sys.argv else 20,
         plot="--no-plot" not in sys.argv)
