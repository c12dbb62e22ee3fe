"""Mohr-Coulomb slope stability demo (reference demo_plasticity_mohr_coulomb.py).

Full size: Nx=Ny=25, 52 load steps to the collapse plateau; slope stability
factor ~ 6.69 (Chen 1990).  Pass --small for a quick run.
"""
import sys

import numpy as np

from dolfinx_external_operator_tpu.models.mohr_coulomb import solve_slope_stability


def main(small=False):
    if small:
        out = solve_slope_stability(Nx=8, Ny=8, load_steps=np.linspace(2, 20, 10), verbose=True)
    else:
        out = solve_slope_stability(Nx=25, Ny=25, verbose=True, verbose_inner=True)
    print(f"slope stability factor: {out['slope_factor']:.3f} (analytic ~ 6.69)")
    print(f"newton iterations per step: {out['iterations']}")
    print("Mohr-Coulomb demo OK")


if __name__ == "__main__":
    main(small="--small" in sys.argv)
