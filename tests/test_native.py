"""Native (C++) topology kernels vs the numpy fallback.

The native library (csrc/topology.cpp, built to
_native/libtpufem_topology.so) must produce topologically identical meshes:
same edge/facet SETS and incidences (numbering may differ)."""
import numpy as np
import pytest

import dolfinx_external_operator_tpu as fem
from dolfinx_external_operator_tpu._native import loader
from dolfinx_external_operator_tpu.mesh import CELL_EDGES, CELL_FACETS

pytestmark = pytest.mark.skipif(not loader.available(), reason="native lib not built")


@pytest.mark.parametrize("cell_type,n", [("triangle", 6), ("quadrilateral", 5),
                                         ("tetrahedron", 3), ("hexahedron", 3)])
def test_native_matches_numpy_topology(cell_type, n):
    if cell_type in ("triangle", "quadrilateral"):
        mesh = fem.create_unit_square(n, n, cell_type)
    else:
        mesh = fem.create_unit_cube(n, n, n, cell_type)

    # native results (used by the Mesh by default)
    edges_nat = {tuple(e) for e in np.sort(mesh.edges, axis=1).tolist()}
    ext_nat = {tuple(sorted(mesh.facets[f])) for f in mesh.exterior_facets}

    # numpy fallback, recomputed from scratch
    le = np.asarray(CELL_EDGES[cell_type], dtype=np.int32)
    ev = np.sort(mesh.cells[:, le], axis=-1).reshape(-1, 2)
    edges_np = {tuple(e) for e in np.unique(ev, axis=0).tolist()}
    assert edges_nat == edges_np

    lfs = [np.asarray(f) for f in CELL_FACETS[cell_type]]
    fv = np.sort(np.stack([mesh.cells[:, f] for f in lfs], axis=1), axis=-1)
    flat = fv.reshape(-1, fv.shape[-1])
    uniq, counts = np.unique(flat, axis=0, return_counts=True)
    ext_np = {tuple(r) for r in uniq[counts == 1].tolist()}
    assert ext_nat == ext_np


def test_rcb_partition_balanced_and_compact():
    mesh = fem.create_unit_square(16, 16)
    mids = mesh.cell_midpoints()
    for parts in (2, 3, 8):
        p = loader.partition_rcb(mids, parts)
        counts = np.bincount(p, minlength=parts)
        assert counts.min() >= (mesh.num_cells // parts) - parts
        # compactness: each part's bounding box much smaller than the domain
        for k in range(parts):
            box = mids[p == k]
            assert (box.max(0) - box.min(0)).prod() < 1.01 / parts * 2.5


def test_facet_incidence_consistency():
    mesh = fem.create_unit_square(4, 4)
    # each facet's recorded (cell, local) pairs actually contain the facet
    from dolfinx_external_operator_tpu.mesh import CELL_FACETS as CF

    for fidx in range(mesh.num_facets):
        verts = set(mesh.facets[fidx].tolist())
        for slot in range(2):
            c = mesh.facet_cells[fidx, slot]
            if c < 0:
                continue
            lfi = mesh.facet_local_index[fidx, slot]
            cell_facet_verts = set(mesh.cells[c][list(CF["triangle"][lfi])].tolist())
            assert cell_facet_verts == verts
