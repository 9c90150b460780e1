"""3D unstructured hex mesh (HexMesh): numbering, face orientation,
geometry consistency, and KLE solves on distorted meshes from gmsh files.

This extends beyond the reference's tested surface (its gmsh tests are 2D
only, src/tests/test_domain.py:41-71); the orientation rules are the
explicit analog of DMPlex's 3D fixups (src/domain/indices.py:80-92).
"""
import numpy as np
import numpy.testing as npt
import jax.numpy as jnp
import pytest

from pynama_tpu.basis.quadrature import lobatto_points
from pynama_tpu.cases import Problem
from pynama_tpu.mesh import HexMesh, mesh_from_gmsh
from tests.msh_fixtures import grid_hex_mesh, write_msh22_3d


def make_hex(ngl=4, n=(3, 2, 2), distort=0.15):
    v, h, s = grid_hex_mesh(*n, distort=distort)
    return HexMesh.create(ngl, v, h, s)


def expected_nodes(nx, ny, nz, ngl):
    V = (nx + 1) * (ny + 1) * (nz + 1)
    E = (nx * (ny + 1) * (nz + 1) + ny * (nx + 1) * (nz + 1)
         + nz * (nx + 1) * (ny + 1))
    F = (nx + 1) * ny * nz + (ny + 1) * nx * nz + (nz + 1) * nx * ny
    C = nx * ny * nz
    k = ngl - 2
    return V + E * k + F * k * k + C * k ** 3


@pytest.mark.parametrize("ngl", [2, 3, 4, 6])
def test_node_counts(ngl):
    m = make_hex(ngl=ngl)
    assert m.n_nodes == expected_nodes(3, 2, 2, ngl)


def test_coords_consistent_with_trilinear_map():
    """Every cell's nodes coincide with that cell's own trilinear corner
    map at the GLL grid — shared faces/edges must serve ALL adjacent
    cells, so this catches any orientation (8-symmetry) mistake."""
    m = make_hex(ngl=5, n=(3, 3, 2), distort=0.2)
    N = m.ngl
    t = (lobatto_points(N)[0] + 1) / 2
    t0 = t[:, None, None, None]
    t1 = t[None, :, None, None]
    t2 = t[None, None, :, None]
    cc = m.cell_corners.reshape(-1, 2, 2, 2, 3)
    w = [(1 - t0, t0), (1 - t1, t1), (1 - t2, t2)]
    for c in range(m.n_cells):
        tri = sum(w[0][i] * w[1][j] * w[2][l] * cc[c, i, j, l]
                  for i in (0, 1) for j in (0, 1) for l in (0, 1))
        npt.assert_allclose(m.coords[m.cell_nodes[c]].reshape(N, N, N, 3),
                            tri, atol=1e-13)


def test_borders_and_normals():
    m = make_hex(ngl=4, n=(3, 2, 2), distort=0.0)
    left = m.border_nodes("left")
    assert (np.abs(m.coords[left][:, 0]) < 1e-14).all()
    assert len(left) == (2 * 3 + 1) ** 2
    assert m.border_normal_axis("left") == 0
    assert m.border_normal_axis("up") == 1
    assert m.border_normal_axis("front") == 2
    n = m.border_outward_normals("front")
    npt.assert_allclose(n, np.tile([0.0, 0.0, 1.0], (len(n), 1)),
                        atol=1e-14)


def test_matches_box_counts():
    m = make_hex(ngl=4, n=(2, 2, 2), distort=0.0)
    from pynama_tpu.mesh import BoxMesh
    b = BoxMesh.create(4, (2, 2, 2), (0, 0, 0), (1, 1, 1))
    assert m.n_nodes == b.n_nodes
    assert m.n_cells == b.n_cells


# ----------------------------------------------------------------- solves
def test_uniform_flow_distorted_hex(tmp_path):
    v, h, s = grid_hex_mesh(3, 3, 3, distort=0.12)
    path = str(tmp_path / "hex.msh")
    write_msh22_3d(path, v, h, s)
    cfg = {"name": "hexu", "material-properties": {"rho": 1, "mu": 0.01},
           "domain": {"ngl": 4, "gmsh-file": path},
           "boundary-conditions": {"uniform": {"velocity": [4, 0, 0],
                                               "vorticity": [0, 0, 0]}},
           "initial-conditions": {"velocity": [4, 0, 0]}}
    p = Problem(cfg, solver="direct")
    p.setUp()
    assert type(p.mesh).__name__ == "HexMesh"
    vort = jnp.zeros((p.mesh.n_nodes, 3))
    _, vel = p.solve_kle(vort, p.vel, 0.0)
    exact = np.tile([4.0, 0, 0], (p.mesh.n_nodes, 1))
    assert np.linalg.norm(np.asarray(vel) - exact) < 1e-10


def test_taylor_green3d_hex_p_convergence(tmp_path):
    v, h, s = grid_hex_mesh(3, 3, 3, distort=0.12)
    path = str(tmp_path / "hex.msh")
    write_msh22_3d(path, v, h, s)
    errs = []
    for ngl in (3, 4, 5):
        cfg = {"name": "hextg",
               "material-properties": {"rho": 1, "mu": 0.01},
               "domain": {"ngl": ngl, "gmsh-file": path},
               "boundary-conditions": {"custom-func": {
                   "name": "taylor_green3d",
                   "attributes": ["velocity", "vorticity", "alpha"]}},
               "initial-conditions": {"custom-func": {
                   "name": "taylor_green3d"}},
               "tests": {"custom-func": {"name": "taylor_green3d"}}}
        p = Problem(cfg, solver="direct")
        p.setUp()
        errs.append(p.kle_errors([0.1])[0])
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 2e-2


def test_no_slip_cavity_hex(tmp_path):
    """Axis-aligned hex boundary carries the two-stage no-slip solve."""
    v, h, s = grid_hex_mesh(2, 2, 2, distort=0.0)
    path = str(tmp_path / "hex.msh")
    write_msh22_3d(path, v, h, s)
    zero = [0, 0, 0]
    cfg = {"name": "hexcav", "material-properties": {"rho": 1, "mu": 0.01},
           "domain": {"ngl": 3, "gmsh-file": path},
           "time-solver": {"start-time": 0, "end-time": 0.005,
                           "max-steps": 3},
           "boundary-conditions": {"no-slip": {
               "up": [1, 0, 0], "down": zero, "left": zero,
               "right": zero, "back": zero, "front": zero}},
           "initial-conditions": {"vorticity": zero}}
    p = Problem(cfg, solver="direct")
    p.setUp()
    p.start_solver(dt0=1e-4)
    vel = np.asarray(p.vel)
    assert np.isfinite(vel).all()
    assert np.abs(vel).max() > 1e-8
