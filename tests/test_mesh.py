"""Box mesh tests (counts follow reference src/tests/test_dmplex_wrapper.py:
node totals and border-node counts as closed-form functions of ngl)."""
import numpy as np
import numpy.testing as npt
import pytest

import jax.numpy as jnp

from pynama_tpu.mesh import BoxMesh
from pynama_tpu.mesh.box import border_names
from pynama_tpu.ops.apply import make_element_op, fanin_sum, apply_op, \
    assemble_dense


@pytest.mark.parametrize("ngl", [2, 3, 5])
def test_counts_2d(ngl):
    m = BoxMesh.create(ngl, (3, 4), (0, 0), (1, 2))
    nx, ny = 3 * (ngl - 1) + 1, 4 * (ngl - 1) + 1
    assert m.npts == (nx, ny)
    assert m.n_nodes == nx * ny
    assert m.n_cells == 12
    assert m.cell_nodes.shape == (12, ngl**2)
    # border node counts
    assert len(m.border_nodes("left")) == ny
    assert len(m.border_nodes("up")) == nx
    assert len(m.all_border_nodes) == 2 * nx + 2 * ny - 4


@pytest.mark.parametrize("ngl", [2, 3])
def test_counts_3d(ngl):
    m = BoxMesh.create(ngl, (2, 3, 4), (0, 0, 0), (1, 1, 1))
    n = [e * (ngl - 1) + 1 for e in (2, 3, 4)]
    assert m.n_nodes == np.prod(n)
    assert len(m.border_nodes("left")) == n[1] * n[2]
    assert len(m.border_nodes("front")) == n[0] * n[1]


def test_coordinates_and_connectivity():
    m = BoxMesh.create(3, (2, 2), (0, 0), (1, 1))
    # 5x5 grid, GLL(3) interior points are element midpoints
    npt.assert_allclose(m.axis_coords[0], [0, 0.25, 0.5, 0.75, 1.0])
    # cell 0 holds the lower-left 3x3 block of nodes
    expect = [0, 1, 2, 5, 6, 7, 10, 11, 12]
    npt.assert_array_equal(sorted(m.cell_nodes[0]), expect)
    # every cell's nodes map to its corner bounding box
    for c in range(m.n_cells):
        cc = m.coords[m.cell_nodes[c]]
        corners = m.cell_corners[c]
        assert (cc.min(0) >= corners.min(0) - 1e-12).all()
        assert (cc.max(0) <= corners.max(0) + 1e-12).all()


@pytest.mark.parametrize("dim", [2, 3])
def test_incidence_fanin_equals_scatter(dim):
    """fanin_sum must equal an np.add.at scatter — the assembly identity."""
    nelem = (2, 3) if dim == 2 else (2, 2, 2)
    m = BoxMesh.create(3, nelem, [0] * dim, [1] * dim)
    rng = np.random.default_rng(2)
    ze = rng.standard_normal((m.n_cells, m.nnode_el, 2))
    expect = np.zeros((m.n_nodes, 2))
    np.add.at(expect, m.cell_nodes.ravel(),
              ze.reshape(-1, 2))
    op = make_element_op(np.zeros((2, 2)), m.cell_nodes, m.incidence,
                         din=1, dout=2, n_nodes=m.n_nodes)
    got = fanin_sum(op, jnp.asarray(ze.reshape(m.n_cells, -1)))
    npt.assert_allclose(np.asarray(got), expect, atol=1e-12)


def test_apply_matches_dense_assembly():
    """Matrix-free apply == assembled dense matvec (PETSc-parity check)."""
    m = BoxMesh.create(4, (2, 2), (0, 0), (1, 1))
    rng = np.random.default_rng(3)
    nd = m.nnode_el * 2
    mat = rng.standard_normal((nd, nd))
    op = make_element_op(mat, m.cell_nodes, m.incidence, din=2, dout=2,
                         n_nodes=m.n_nodes)
    A = assemble_dense(mat, np.asarray(m.cell_nodes), 2, 2, m.n_nodes)
    x = rng.standard_normal((m.n_nodes, 2))
    y1 = np.asarray(apply_op(op, jnp.asarray(x)))
    y2 = (A @ x.ravel()).reshape(m.n_nodes, 2)
    npt.assert_allclose(y1, y2, atol=1e-11)


def test_nodes_over_line():
    m = BoxMesh.create(3, (2, 2), (0, 0), (1, 1))
    nodes, coords = m.nodes_over_line("x", 0.5)
    assert len(nodes) == 5
    npt.assert_allclose(m.coords[nodes, 0], 0.5)
    assert (np.diff(coords) > 0).all()
