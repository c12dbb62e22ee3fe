"""Pipeline dtype selection.

The reference parametrizes its assembly-parity oracles over float64,
float32, and complex128 with ``50 * eps``-scaled tolerances
(``test/test_multiaction.py:15-125``; dtype flows from the DOLFINx
function-space scalar type).  In this build the working precision is a
module-scoped scalar type consulted when forms/expressions are compiled:

* float64 (default) — the 1e-10 parity target (BASELINE.md);
* float32 — supported through the evaluate/assemble pipeline via
  ``scalar_type_context``; Newton/Krylov solves stay f64 (they already
  mix precisions deliberately, see ``solvers.py``);
* complex128 — supported on the CPU backend only (the reference
  parametrizes its adjoint oracle over it, ``test_multiaction.py:15-23``);
  on TPU it remains a documented exclusion: XLA:TPU's f64 emulation does
  not extend to complex arithmetic.

Build AND first-evaluate forms inside the context — jitted kernels bake the
scalar type at trace time::

    with scalar_type_context(jnp.float32):
        F_r, ops = replace_external_operators(F)
        b = fem.assemble_vector(F_r)   # float32
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp

__all__ = ["scalar_type_context", "default_scalar_type"]


def default_scalar_type():
    from . import assembly

    return assembly._F


@contextlib.contextmanager
def scalar_type_context(dtype):
    """Temporarily set the scalar type used by newly compiled forms,
    expressions, and Functions."""
    import jax

    dtype = jnp.dtype(dtype).type
    if dtype == jnp.complex128 and jax.default_backend() != "cpu":
        raise NotImplementedError(
            "complex128 is supported only on the CPU backend "
            "(XLA:TPU f64 emulation does not cover complex arithmetic); "
            'run under jax.config.update("jax_platforms", "cpu")'
        )
    from . import assembly, compile, expression, function

    targets = [(assembly, "_F"), (compile, "_F"), (expression, "_F"), (function, "_DTYPE")]
    saved = [(m, n, getattr(m, n)) for m, n in targets]
    for m, n in targets:
        setattr(m, n, dtype)
    try:
        yield
    finally:
        for m, n, v in saved:
            setattr(m, n, v)
