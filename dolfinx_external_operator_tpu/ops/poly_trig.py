"""Range-limited polynomial transcendentals for fast f64 on TPU.

XLA:TPU emulates f64 transcendentals in software at ~100x the cost of
arithmetic; the Mohr-Coulomb surface only ever needs them on tiny ranges
(the Lode angle satisfies |theta| <= pi/6 by construction), where short
Taylor series reach full f64 accuracy in ~a dozen fused multiply-adds:

- sin/cos for |t| <= 1.6 rad (covers 3*theta of the smoothing formulas)
- asin3(x) = arcsin(x)/3 for |x| <= 1, computed as an f32 arcsin seed
  (native-speed) + two f64 Newton corrections on sin(3 theta) = x

All functions are pure polynomial/arithmetic f64 -> cheap under jacfwd
(the surface is differentiated twice for the return-map Jacobian).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sin_small", "cos_small", "asin3"]

# Taylor coefficients; |t| <= 1.6: t^27/27! ~ 3e-23 — beyond f64
_SIN_C = [(-1.0) ** k / float(__import__("math").factorial(2 * k + 1)) for k in range(14)]
_COS_C = [(-1.0) ** k / float(__import__("math").factorial(2 * k)) for k in range(14)]


def sin_small(t):
    """sin(t) for |t| <= ~1.6 rad, full f64 accuracy, polynomial only."""
    t2 = t * t
    acc = jnp.full_like(t, _SIN_C[-1])
    for c in _SIN_C[-2::-1]:
        acc = acc * t2 + c
    return acc * t


def cos_small(t):
    t2 = t * t
    acc = jnp.full_like(t, _COS_C[-1])
    for c in _COS_C[-2::-1]:
        acc = acc * t2 + c
    return acc


def asin3(x):
    """arcsin(x)/3 in f64 for |x| <= 1 without an emulated f64 arcsin.

    Seed with the native f32 arcsin (~1e-7), then two f64 Newton steps on
    sin(3 theta) = x.  Near |x| -> 1 the Newton correction degrades
    (cos(3 theta) -> 0); there the smoothed-corner branch of the surface is
    active and theta only enters through sin(3 theta), so the residual
    inaccuracy is harmless — still, a guarded derivative keeps it stable."""
    import jax

    x_c = jnp.clip(x, -1.0, 1.0)
    # stop_gradient on the seed: at the triaxial corners (x -> +-1) the f32
    # arcsin derivative is infinite and would NaN the whole surface Jacobian
    # (the reference's jnp.arcsin(clip(...)) NaNs there too when rounding
    # lands exactly on the corner).  The Newton steps below reference x
    # directly and carry the correct guarded derivative: in compositions
    # like sin(3 theta(x)) the guarded 1/cos factors cancel exactly.
    th = jax.lax.stop_gradient(jnp.arcsin(x_c.astype(jnp.float32)).astype(x.dtype)) / 3.0
    for _ in range(2):
        t3 = 3.0 * th
        s, c = sin_small(t3), cos_small(t3)
        th = th - (s - x_c) / jnp.maximum(3.0 * c, 1e-8)
    return th
