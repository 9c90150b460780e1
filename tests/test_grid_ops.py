"""Differential tests: grid-structured apply path vs the generic
incidence-based ElementOp path (which is itself tested against dense
assembly)."""
import numpy as np
import pytest

from pynama_tpu.mesh import BoxMesh
from pynama_tpu.ops.apply import apply_op, assembled_diagonal, \
    make_element_op
from pynama_tpu.ops.grid import apply_grid_op, grid_diagonal, grid_dss, \
    grid_gather, make_grid_op


def _rand_mat(rng, nnode, din, dout):
    return rng.standard_normal((nnode * dout, nnode * din))


@pytest.mark.parametrize("dim,nelem,ngl", [
    (2, (3, 2), 3), (2, (4, 4), 5), (2, (1, 1), 4),
    (3, (2, 3, 2), 3), (3, (2, 2, 2), 4),
])
@pytest.mark.parametrize("din,dout", [(1, 1), (2, 3), (3, 2)])
def test_grid_matches_element_op(dim, nelem, ngl, din, dout):
    nelem = nelem[:dim]
    mesh = BoxMesh.create(ngl, nelem, [0.0] * dim, [1.0] * dim)
    rng = np.random.default_rng(hash((dim, ngl, din, dout)) % 2**31)
    mat = _rand_mat(rng, mesh.nnode_el, din, dout)
    x = rng.standard_normal((mesh.n_nodes, din))

    eop = make_element_op(mat, mesh.cell_nodes, mesh.incidence, din, dout,
                          mesh.n_nodes)
    gop = make_grid_op(mat, ngl, nelem, din, dout)
    y_ref = np.asarray(apply_op(eop, x))
    y_grid = np.asarray(apply_grid_op(gop, x))
    np.testing.assert_allclose(y_grid, y_ref, rtol=1e-11, atol=1e-11)


def test_grid_gather_roundtrip():
    """DSS of an all-ones element field counts node multiplicity."""
    mesh = BoxMesh.create(4, (3, 2), [0, 0], [1, 1])
    gop = make_grid_op(np.eye(mesh.nnode_el), 4, (3, 2), 1, 1)
    ones = np.ones((mesh.n_cells, mesh.nnode_el * 1))
    mult = np.asarray(grid_dss(gop, ones))[:, 0]
    # multiplicity from the incidence table
    counts = np.bincount(mesh.cell_nodes.ravel(), minlength=mesh.n_nodes)
    np.testing.assert_array_equal(mult, counts)
    # gather of node ids reproduces cell_nodes
    ids = np.arange(mesh.n_nodes, dtype=float)[:, None]
    gathered = np.asarray(grid_gather(gop, ids)).reshape(
        mesh.n_cells, mesh.nnode_el)
    np.testing.assert_array_equal(gathered, mesh.cell_nodes)


def test_grid_diagonal_matches():
    mesh = BoxMesh.create(3, (2, 2, 2), [0, 0, 0], [1, 1, 1])
    rng = np.random.default_rng(7)
    d = 3
    mat = _rand_mat(rng, mesh.nnode_el, d, d)
    eop = make_element_op(mat, mesh.cell_nodes, mesh.incidence, d, d,
                          mesh.n_nodes)
    gop = make_grid_op(mat, 3, (2, 2, 2), d, d)
    np.testing.assert_allclose(np.asarray(grid_diagonal(gop)),
                               np.asarray(assembled_diagonal(eop)),
                               rtol=1e-12, atol=1e-12)
