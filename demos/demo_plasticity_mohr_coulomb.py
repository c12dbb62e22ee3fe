"""Mohr-Coulomb slope stability demo (reference demo_plasticity_mohr_coulomb.py).

Full size: Nx=Ny=25, 52 load steps to the collapse plateau; slope stability
factor ~ 6.69 (Chen 1990).  Pass --small for a quick run.

Emits the reference's figures (load-displacement curve with the analytic
limit, ``:751-764``; displacement-field render replacing the pyvista view,
``:777-802``) under ``docs/figures/`` unless ``--no-plot`` is passed.
"""
import os
import sys

import numpy as np

from dolfinx_external_operator_tpu.models.mohr_coulomb import solve_slope_stability

FIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "figures")


def main(small=False, plot=True):
    if small:
        out = solve_slope_stability(Nx=8, Ny=8, load_steps=np.linspace(2, 20, 10), verbose=True)
    else:
        out = solve_slope_stability(Nx=25, Ny=25, verbose=True, verbose_inner=True)
    print(f"slope stability factor: {out['slope_factor']:.3f} (analytic ~ 6.69)")
    print(f"newton iterations per step: {out['iterations']}")
    if plot:
        from dolfinx_external_operator_tpu.utils.plots import (
            save_displacement_field, save_load_displacement)

        os.makedirs(FIG_DIR, exist_ok=True)
        f1 = save_load_displacement(
            [("slope crest", out["results"])],
            os.path.join(FIG_DIR, "mohr_coulomb_load_displacement.png"),
            xlabel="crest horizontal displacement (-u_x)",
            ylabel="soil self-weight gamma",
            title="Mohr-Coulomb slope stability",
            hline=6.69 * out["material"].c / out["H"],
            hline_label="limit analysis: gamma_lim = 6.69 c/H (Chen 1990)")
        f2 = save_displacement_field(
            out["mesh"], out["u"],
            os.path.join(FIG_DIR, "mohr_coulomb_displacement_field.png"),
            title="Slope displacement magnitude at collapse (warped x10%)")
        for f in (f1, f2):
            if f:
                print(f"figure: {f}")
    print("Mohr-Coulomb demo OK")


if __name__ == "__main__":
    main(small="--small" in sys.argv, plot="--no-plot" not in sys.argv)
