"""Cell-axis distribution of the general pipeline (the ``mpirun -n N`` analog).

The reference runs its ENTIRE test suite under MPI
(``.github/workflows/build-and-test.yml:44-54``): every rank owns a cell
partition and PETSc assembles across ranks.  The TPU-native equivalent for
the *general* pipeline (operand evaluation, form assembly, Krylov solves) is
GSPMD auto-partitioning: cell-axis static arrays (coordinates, dof maps,
gathered indices) are ``device_put`` with a ``P("cells")`` sharding over a
1D ``jax.sharding.Mesh``, and XLA inserts the collectives (the reduce over
shard-boundary dofs in ``segment_sum``, replication of global dof vectors).
Owner-computes layout: no ghost cells, so the reference's forward scatter
(``external_operator.py:445``) has no analog here.

The hand-written ``shard_map`` hot path lives in ``parallel.spmd``
(FusedPlasticityStep); this module covers everything else.

Usage::

    from dolfinx_external_operator_tpu import parallel
    parallel.set_default_device_mesh(parallel.spmd.make_device_mesh(8))
    # every CompiledForm / Expression built afterwards assembles SPMD

"""

from __future__ import annotations

from . import spmd  # noqa: F401
from .spmd import FusedPlasticityStep, make_device_mesh  # noqa: F401

_default_device_mesh = None

__all__ = [
    "FusedPlasticityStep",
    "make_device_mesh",
    "set_default_device_mesh",
    "get_default_device_mesh",
    "shard_cells",
    "spmd",
]


def set_default_device_mesh(device_mesh) -> None:
    """Install (or clear, with ``None``) the device mesh over which newly
    compiled forms and expressions shard their cell axis."""
    global _default_device_mesh
    _default_device_mesh = device_mesh


def get_default_device_mesh():
    return _default_device_mesh


def shard_cells(a):
    """``device_put`` a cell-leading-axis array sharded over the default
    device mesh; identity when no mesh is installed or ``a`` is None.
    The leading axis must already be padded to a multiple of the device
    count (``padded_cell_count`` / ``pad_shard_cells``)."""
    dm = _default_device_mesh
    if dm is None or a is None:
        return a
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    spec = PartitionSpec(dm.axis_names[0], *([None] * (a.ndim - 1)))
    return jax.device_put(a, NamedSharding(dm, spec))


def padded_cell_count(n: int) -> int:
    """Cell count rounded up to a multiple of the device count (1 without a
    default mesh) — GSPMD requires even shards."""
    dm = _default_device_mesh
    if dm is None:
        return n
    nd = dm.devices.size
    return ((n + nd - 1) // nd) * nd


def pad_shard_cells(a, n_pad: int):
    """Pad the leading (cell) axis to ``n_pad`` by repeating row 0 (valid
    geometry/indices; contributions are masked out by the caller's validity
    array), then shard.  Identity when no mesh is installed."""
    if _default_device_mesh is None or a is None:
        return a
    import numpy as np

    a = np.asarray(a)
    extra = n_pad - a.shape[0]
    if extra > 0:
        a = np.concatenate([a, np.repeat(a[:1], extra, axis=0)], axis=0)
    return shard_cells(a)
