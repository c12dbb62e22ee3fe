"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The shell environment pins JAX_PLATFORMS=axon (tunneled TPU) and a
sitecustomize imports jax before user code, so plain env vars are too late —
the platform must be forced through jax.config before first backend use.

Mirrors the reference CI, which validates every test serially AND under
``mpirun -n 3`` (.github/workflows/build-and-test.yml:44-46); the
multi-device analog is the 8-device host mesh exercised in test_parallel.py.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
