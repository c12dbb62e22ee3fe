"""Von Mises cylinder-expansion demo (reference demo_plasticity_von_mises.py)."""
import sys

import numpy as np

from dolfinx_external_operator_tpu.models.von_mises import (
    Q_LIM, solve_von_mises, solve_von_mises_pure_form)


def main(num_increments=20, lc=0.3):
    ext = solve_von_mises(lc=lc, num_increments=num_increments, verbose=True)
    pure = solve_von_mises_pure_form(lc=lc, num_increments=num_increments)
    diff = np.abs(ext["results"][:, 0] - pure["results"][:, 0]).max()
    print(f"collapse load q_lim = {Q_LIM:.3f} MPa")
    print(f"external vs pure-form twin max displacement diff: {diff:.3e}")
    assert diff < 1e-9
    print("von Mises demo OK")


if __name__ == "__main__":
    main(num_increments=8 if "--small" in sys.argv else 20)
