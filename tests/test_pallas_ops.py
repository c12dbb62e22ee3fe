"""Pallas hot-op kernels vs the XLA reference implementations.

On CPU the kernel runs in Pallas interpret mode; on TPU it compiles to
Mosaic.  Oracle: the f64 analytic von Mises return map (f32-level agreement
since the Pallas kernel computes in f32)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dolfinx_external_operator_tpu.models.von_mises import VonMisesMaterial


def test_pallas_vonmises_matches_xla():
    from functools import partial

    from dolfinx_external_operator_tpu.ops import vonmises_pallas as vp
    from dolfinx_external_operator_tpu.models.von_mises import LAMBDA, MU, H_MOD, SIGMA_0

    # interpret mode on CPU
    orig = vp.pl.pallas_call
    vp.pl.pallas_call = partial(orig, interpret=True)
    try:
        n = 512
        rng = np.random.default_rng(3)
        deps = rng.normal(scale=2e-3, size=(n, 4))
        deps[: n // 2, 3] += 6e-3  # plastic half
        sig_n = rng.normal(scale=20.0, size=(n, 4))
        p = np.abs(rng.normal(scale=1e-3, size=n))

        mat = VonMisesMaterial()
        C_ref, s_ref, dp_ref = mat(jnp.asarray(deps).ravel(), jnp.asarray(sig_n).ravel(), jnp.asarray(p))
        C_ref = np.asarray(C_ref).reshape(n, 4, 4)
        s_ref = np.asarray(s_ref).reshape(n, 4)
        dp_ref = np.asarray(dp_ref)

        C_p, s_p, dp_p = vp.vonmises_return_map_pallas(
            jnp.asarray(deps.T), jnp.asarray(sig_n.T), jnp.asarray(p),
            [LAMBDA, MU, H_MOD, SIGMA_0], tile=512,
        )
        C_p = np.moveaxis(np.asarray(C_p).reshape(4, 4, n), -1, 0)
        s_p = np.asarray(s_p).T
        dp_p = np.asarray(dp_p)

        scale_C = np.abs(C_ref).max()
        assert np.abs(C_p - C_ref).max() / scale_C < 1e-5
        assert np.abs(s_p - s_ref).max() / max(np.abs(s_ref).max(), 1.0) < 1e-5
        assert np.abs(dp_p - dp_ref).max() < 1e-7
    finally:
        vp.pl.pallas_call = orig
