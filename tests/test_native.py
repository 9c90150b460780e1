"""Native C++ layer: differential tests against the numpy fallbacks, and
the async binary writer."""
import os

import numpy as np
import numpy.testing as npt
import pytest

from pynama_tpu import native
from pynama_tpu.io.binary import BinarySnapshotWriter, load_snapshot
from pynama_tpu.mesh.box import BoxMesh, build_incidence
from tests.msh_fixtures import grid_quad_mesh
from pynama_tpu.mesh import UnstructuredMesh


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library unavailable")


def _numpy_unique_edges(cells_tensor):
    ct = np.asarray(cells_tensor, dtype=np.int32)
    C = len(ct)
    pairs = np.concatenate([ct[:, [0, 1]], ct[:, [2, 3]],
                            ct[:, [0, 2]], ct[:, [1, 3]]], axis=0)
    keys = np.sort(pairs, axis=1)
    edges, inverse = np.unique(keys, axis=0, return_inverse=True)
    return edges.astype(np.int32), inverse.reshape(4, C).T.astype(np.int32)


@needs_native
def test_unique_edges_matches_numpy():
    v, q, _ = grid_quad_mesh(5, 4, distort=0.1)
    m = UnstructuredMesh.create(3, v, q)
    e_np, ce_np = _numpy_unique_edges(m.cells_tensor)
    e_cc, ce_cc = native.unique_edges(m.cells_tensor)
    npt.assert_array_equal(e_cc, e_np)
    npt.assert_array_equal(ce_cc, ce_np)


@needs_native
def test_incidence_matches_numpy():
    mesh = BoxMesh.create(4, (3, 3), (0, 0), (1, 1))
    inc_np = build_incidence(mesh.cell_nodes, mesh.n_nodes)
    inc_cc = native.build_incidence(mesh.cell_nodes, mesh.n_nodes)
    npt.assert_array_equal(inc_cc, inc_np)


@needs_native
def test_cell_nodes_matches_python(monkeypatch):
    """Native cell_nodes == pure-Python loop on the same mesh."""
    v, q, l = grid_quad_mesh(4, 3, distort=0.15)
    m1 = UnstructuredMesh.create(5, v, q, l)
    cn_native = m1.cell_nodes
    monkeypatch.setenv("PYNAMA_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    m2 = UnstructuredMesh.create(5, v, q, l)
    cn_python = m2.cell_nodes
    npt.assert_array_equal(cn_native, cn_python)


def test_binary_writer_roundtrip(tmp_path):
    w = BinarySnapshotWriter(str(tmp_path))
    rng = np.random.default_rng(0)
    a0 = rng.standard_normal((50, 2)).astype(np.float32)
    a1 = rng.standard_normal((50, 1))
    w.save(0, 0.0, velocity=a0, vorticity=a1)
    w.save(1, 0.1, velocity=2 * a0, vorticity=3 * a1)
    w.close()
    npt.assert_array_equal(load_snapshot(str(tmp_path), 0, "velocity"), a0)
    npt.assert_array_equal(load_snapshot(str(tmp_path), 1, "vorticity"),
                           3 * a1)
    assert os.path.exists(tmp_path / "manifest.json")


@needs_native
def test_binary_writer_is_async(tmp_path):
    w = BinarySnapshotWriter(str(tmp_path))
    assert w.is_async
    for s in range(16):
        w.save(s, 0.01 * s, f=np.full((1000,), float(s)))
    w.flush()
    npt.assert_array_equal(load_snapshot(str(tmp_path), 7, "f"),
                           np.full((1000,), 7.0))
    w.close()
