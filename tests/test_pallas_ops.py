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


def test_pallas_kernel_drives_fused_step():
    """The Pallas f32 kernel wired into FusedPlasticityStep
    (``batched_kernel=``): a von Mises load step converges with the same
    Newton count as the f64 vmapped path and f32-level displacement
    agreement."""
    from functools import partial

    from dolfinx_external_operator_tpu.ops import vonmises_pallas as vp
    from dolfinx_external_operator_tpu.models.von_mises import (
        _return_mapping_kernel, pallas_batched_kernel)
    from dolfinx_external_operator_tpu import (
        create_rectangle, functionspace, locate_dofs_geometrical, quadrature_element)
    from dolfinx_external_operator_tpu.parallel.spmd import FusedPlasticityStep

    orig = vp.pl.pallas_call
    vp.pl.pallas_call = partial(orig, interpret=True)
    try:
        mesh = create_rectangle((0.0, 0.0), (1.2, 1.0), (4, 3), "triangle")
        V = functionspace(mesh, ("Lagrange", 2, (2,)))
        S = functionspace(mesh, quadrature_element(mesh.cell_name(), degree=2, value_shape=(4,)))
        bottom = locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
        right = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 1.2))
        bc_dofs = np.concatenate([np.concatenate([s * 2, s * 2 + 1]) for s in (bottom, right)])
        vm = _return_mapping_kernel()

        def kernel(deps, sn):
            C_tang, sig, dp = vm(deps, sn, jnp.zeros(()))
            return C_tang, sig

        results = {}
        # the f32 kernel cannot drive the residual to f64 tolerances:
        # the fast path runs with f32-scaled Newton tolerances
        for name, bk, tols in (
            ("f64", None, {}),
            ("pallas_f32", pallas_batched_kernel(tile=512),
             {"newton_rtol": 1e-5, "newton_atol": 1e-3}),
        ):
            fp = FusedPlasticityStep(mesh, V, S, kernel, bc_dofs, linear_solver="dense",
                                     batched_kernel=bk, **tols)
            Du, sig = fp.zero_state()
            Du, sig, norm, its, cg = fp.run_step(Du, sig, 30.0)
            assert not bool(jnp.isnan(norm))
            results[name] = (np.asarray(Du), int(its))

        assert results["pallas_f32"][1] <= 10  # converged, not the iteration cap
        du_ref = results["f64"][0]
        err = np.abs(results["pallas_f32"][0] - du_ref).max() / max(np.abs(du_ref).max(), 1e-30)
        assert err < 1e-3, err
    finally:
        vp.pl.pallas_call = orig
