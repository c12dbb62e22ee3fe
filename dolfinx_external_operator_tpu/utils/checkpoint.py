"""Load-step checkpoint/resume for Gauss-point state.

The reference keeps history state (sigma_n, p) purely in RAM across load
steps (SURVEY.md section 5; ``demo_plasticity_von_mises.py:564-565``) with no
restart capability.  This module adds cheap durable checkpoints: the state
pytree (dof vectors + Gauss-point arrays + step counter) is pulled from HBM
once per save and written as a compressed npz; ``load`` restores it onto the
current default device (and resharding happens on first use under a mesh).
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from ..function import Function

__all__ = ["save_state", "load_state"]


def save_state(path: str, step: int, **arrays) -> None:
    """Save named state arrays (Function or jax/numpy arrays) plus the step."""
    assert path.endswith(".npz"), "checkpoint path must end in .npz"
    out = {"__step__": np.asarray(step)}
    for name, a in arrays.items():
        out[name] = np.asarray(a.data if isinstance(a, Function) else a)
    tmp = path[:-4] + ".tmp.npz"
    np.savez_compressed(tmp, **out)
    os.replace(tmp, path)


def load_state(path: str, **targets):
    """Restore arrays saved by ``save_state``.  ``targets`` maps name ->
    Function (written in place) or None (returned as jnp array).
    Returns (step, {name: array for None targets})."""
    with np.load(path) as data:
        step = int(data["__step__"])
        extra = {}
        for name, tgt in targets.items():
            arr = data[name]
            if isinstance(tgt, Function):
                tgt.x.array = jnp.asarray(arr)
            else:
                extra[name] = jnp.asarray(arr)
    return step, extra
