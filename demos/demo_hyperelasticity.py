"""ICNN hyperelasticity demo (reference demo_hyperelasticity.py).

Pretrained input-convex NN energy as the constitutive law; verified against
the analytic Isihara model.  Pass --small for a coarse quick run.
"""
import sys

from dolfinx_external_operator_tpu.models.hyperelasticity import run_comparison


def main(small=False):
    if small:
        out = run_comparison(lc=0.12, n_steps=5, max_displacement=0.25, verbose=True)
    else:
        out = run_comparison(lc=0.05, n_steps=100, max_displacement=0.5, verbose=True)
    print(f"relative L-inf displacement error (NN vs Isihara): {out['rel_linf']:.3e}")
    print(f"absolute L2 displacement error: {out['l2']:.3e}")
    print("hyperelasticity demo OK")


if __name__ == "__main__":
    main(small="--small" in sys.argv)
