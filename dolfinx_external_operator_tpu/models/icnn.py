"""Input-Convex Neural Network constitutive model in pure JAX.

TPU-native port of the EUCLID-hyperelasticity ICNN consumed by the reference
(``demo_hyperelasticity.py:221-300``; architecture from
github.com/EUCLID-code/EUCLID-hyperelasticity-NN): a 3->[64,64,64]->1 network
over the invariant features (K1, K2, K3) of the deformation gradient, with
softplus-positive hidden weights (input convexity) and linear skip
connections.  Pretrained weights are loaded from the reference's
``Isihara_noise=high.pth`` checkpoint (a data asset) via torch-CPU and
converted to f64 jax arrays.

The stress is the energy gradient with the NN-EUCLID corrections
(``demo_hyperelasticity.py:361-381``): ``P(F) = dW_NN/dF + F @ H`` where
``H = -dW_NN/dF|_{F=I}`` guarantees a stress-free reference state; the
consistent tangent dP/dF comes from forward-mode AD.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["ICNN", "load_isihara_weights", "DEFAULT_WEIGHTS_PATH"]

DEFAULT_WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "data", "Isihara_noise=high.pth")
_REFERENCE_WEIGHTS = "/root/reference/doc/demo/Isihara_noise=high.pth"


def load_isihara_weights(path: str | None = None):
    """Load the pretrained ICNN checkpoint into a dict of f64 numpy arrays.

    Keys follow the torch module names: ``layers.{0..3}``, ``skip_layers.{1..3}``."""
    candidates = [path] if path else [DEFAULT_WEIGHTS_PATH, _REFERENCE_WEIGHTS]
    for cand in candidates:
        if cand and os.path.exists(cand):
            import torch

            sd = torch.load(cand, map_location="cpu", weights_only=True)
            return {k: np.asarray(v.detach().numpy(), dtype=np.float64) for k, v in sd.items()}
    raise FileNotFoundError(f"ICNN weights not found in {candidates}")


class ICNN:
    """The EUCLID ICNN energy + corrected stress/tangent, all in JAX f64."""

    def __init__(self, weights: dict | None = None, n_hidden=(64, 64, 64)):
        if weights is None:
            weights = load_isihara_weights()
        self.depth = len(n_hidden)
        w = {k: jnp.asarray(v) for k, v in weights.items()}
        self.params = w

        # correction tensor H = -dW_NN/dF at F = I (stress-free reference)
        F0 = jnp.array([1.0, 0.0, 0.0, 1.0])
        P0 = jax.grad(self.energy)(F0)
        h = -P0
        self.H = jnp.array(
            [
                [h[0], h[1], 0.0, 0.0],
                [h[2], h[3], 0.0, 0.0],
                [0.0, 0.0, h[0], h[1]],
                [0.0, 0.0, h[2], h[3]],
            ]
        )
        self._stress_and_tangent = jax.jit(jax.vmap(jax.jacfwd(self._stress_point, has_aux=True)))

    # -- energy ---------------------------------------------------------
    def features(self, F_flat):
        """Invariant features (K1, K2, K3) of the flat 2D deformation
        gradient [F11, F12, F21, F22] under plane strain."""
        F11, F12, F21, F22 = F_flat[0], F_flat[1], F_flat[2], F_flat[3]
        C11 = F11 * F11 + F21 * F21
        C12 = F11 * F12 + F21 * F22
        C22 = F12 * F12 + F22 * F22
        I1 = C11 + C22 + 1.0
        I2 = C11 + C22 - C12 * C12 + C11 * C22
        I3 = C11 * C22 - C12 * C12
        K1 = I1 * jnp.power(I3, -1.0 / 3.0) - 3.0
        K2 = I2 * jnp.power(I3, -2.0 / 3.0) - 3.0
        K3 = (jnp.sqrt(I3) - 1.0) ** 2
        return jnp.stack([K1, K2, K3])

    def energy(self, F_flat):
        """W_NN(F): scalar energy at one point (uncorrected)."""
        w = self.params
        x = self.features(F_flat)
        z = w["layers.0.weight"] @ x + w["layers.0.bias"]
        for i in range(1, self.depth):
            z = jax.nn.softplus(w[f"layers.{i}.weights"]) @ z
            z = z + w[f"skip_layers.{i}.weight"] @ x + w[f"skip_layers.{i}.bias"]
            z = jax.nn.softplus(z)
            z = z * z / 12.0
        y = jax.nn.softplus(w[f"layers.{self.depth}.weights"]) @ z \
            + jax.nn.softplus(w[f"skip_layers.{self.depth}.weights"]) @ x
        return y[0]

    # -- stress / tangent -------------------------------------------------
    def _stress_point(self, F_flat):
        P_nn = jax.grad(self.energy)(F_flat)
        P = P_nn + F_flat @ self.H
        return P, P

    def stress_and_tangent(self, F_batch_flat):
        """Batched (dP/dF (n,4,4), P (n,4)) — the external-function body
        (reference ``dP_dF_impl``, ``demo_hyperelasticity.py:445-456``)."""
        F = F_batch_flat.reshape(-1, 4)
        dP, P = self._stress_and_tangent(F)
        return dP.reshape(-1), P.reshape(-1)
