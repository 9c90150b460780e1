"""Unstructured (gmsh) mesh path: parser, numbering, geometry, KLE solves.

Mirrors the reference's gmsh coverage (`src/tests/test_domain.py:41-71`,
node-count assertions on `src/tests/test.msh`) plus solver-level tests the
reference only runs on box meshes.
"""
import numpy as np
import numpy.testing as npt
import jax.numpy as jnp
import pytest

from pynama_tpu.cases import Problem
from pynama_tpu.mesh import BoxMesh, UnstructuredMesh, read_msh
from tests.msh_fixtures import grid_quad_mesh, write_msh22, write_msh41


def make_mesh(ngl=3, nx=4, ny=3, distort=0.0):
    v, q, l = grid_quad_mesh(nx, ny, distort=distort)
    return UnstructuredMesh.create(ngl, v, q, l)


def expected_nodes(nx, ny, ngl):
    V = (nx + 1) * (ny + 1)
    E = nx * (ny + 1) + ny * (nx + 1)
    C = nx * ny
    k = ngl - 2
    return V + E * k + C * k * k


# ------------------------------------------------------------------- parser
@pytest.mark.parametrize("writer", [write_msh22, write_msh41])
def test_msh_roundtrip(tmp_path, writer):
    v, q, l = grid_quad_mesh(3, 2, distort=0.15)
    path = str(tmp_path / "mesh.msh")
    writer(path, v, q, l)
    data = read_msh(path)
    npt.assert_allclose(data.vertices, v, atol=1e-14)
    npt.assert_array_equal(data.quads, q)
    assert set(data.lines) == set(l)
    for name in l:
        npt.assert_array_equal(np.sort(data.lines[name], axis=None),
                               np.sort(l[name], axis=None))


def test_from_gmsh_end_to_end(tmp_path):
    v, q, l = grid_quad_mesh(4, 4, distort=0.1)
    path = str(tmp_path / "m.msh")
    write_msh22(path, v, q, l)
    m = UnstructuredMesh.from_gmsh(path, 3)
    assert m.n_cells == 16
    assert m.n_nodes == expected_nodes(4, 4, 3)


# ---------------------------------------------------------------- numbering
@pytest.mark.parametrize("ngl", [2, 3, 5, 8])
def test_node_counts(ngl):
    """V + E*(ngl-2) + C*(ngl-2)^2 — the per-entity dof counts of
    reference indices.py:22-30 (and the closed-form behind the 153/1688
    assertions of test_domain.py:50,71)."""
    m = make_mesh(ngl=ngl, nx=4, ny=3)
    assert m.n_nodes == expected_nodes(4, 3, ngl)


def test_matches_box_numbering_free_dofs():
    """Same grid as a BoxMesh: same node COUNT (numbering differs)."""
    m = make_mesh(ngl=4, nx=3, ny=3)
    b = BoxMesh.create(4, (3, 3), (0, 0), (1, 1))
    assert m.n_nodes == b.n_nodes
    assert m.n_cells == b.n_cells


def test_coords_consistent_with_bilinear_map():
    """mesh.coords at each cell's nodes == that cell's own bilinear corner
    map at the GLL grid — catches any edge-orientation mistake, because a
    shared edge's nodes must serve BOTH adjacent cells."""
    from pynama_tpu.basis.quadrature import lobatto_points
    m = make_mesh(ngl=5, nx=3, ny=3, distort=0.2)
    N = m.ngl
    t = (lobatto_points(N)[0] + 1) / 2
    t0 = t[:, None, None]
    t1 = t[None, :, None]
    cc = m.cell_corners
    for c in range(m.n_cells):
        local = ((1 - t0) * (1 - t1) * cc[c, 0] + (1 - t0) * t1 * cc[c, 1]
                 + t0 * (1 - t1) * cc[c, 2] + t0 * t1 * cc[c, 3])
        npt.assert_allclose(m.coords[m.cell_nodes[c]].reshape(N, N, 2),
                            local, atol=1e-13)


def test_orientation_canonicalized():
    """A CW-input quad is flipped to positive orientation."""
    v = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    cw = np.array([[0, 3, 2, 1]])     # clockwise
    m = UnstructuredMesh.create(3, v, cw)
    cc = m.cell_corners[0]
    J = np.stack([cc[2] - cc[0], cc[1] - cc[0]], axis=1)  # d/da0, d/da1
    assert np.linalg.det(J) > 0


def test_border_nodes_and_normals():
    m = make_mesh(ngl=4, nx=3, ny=2)
    down = m.border_nodes("down")
    assert (np.abs(m.coords[down][:, 1]) < 1e-14).all()
    assert len(down) == 3 * (4 - 1) + 1
    assert m.border_normal_axis("down") == 1
    assert m.border_normal_axis("left") == 0
    n = m.border_outward_normals("down")
    npt.assert_allclose(n, np.tile([0.0, -1.0], (3, 1)), atol=1e-14)


# ------------------------------------------------------------------ solves
def unstruct_config(path, ngl, bc):
    return {
        "name": "unstruct",
        "material-properties": {"rho": 1, "mu": 0.01},
        "domain": {"ngl": ngl, "gmsh-file": path},
        "boundary-conditions": bc,
        "initial-conditions": {"vorticity": [0]},
    }


TG_BC = {"custom-func": {"name": "taylor_green",
                         "attributes": ["velocity", "vorticity", "alpha"]}}


def test_uniform_flow_distorted(tmp_path):
    """Constant velocity is in the bilinear FE space, so a distorted mesh
    must reproduce it exactly (reference test_solver.py:25 tolerance)."""
    v, q, l = grid_quad_mesh(4, 4, distort=0.2)
    path = str(tmp_path / "d.msh")
    write_msh22(path, v, q, l)
    cfg = unstruct_config(path, 4, {"uniform": {"velocity": [4, 0],
                                                "vorticity": [0]}})
    p = Problem(cfg, solver="direct")
    p.setUp()
    vort = jnp.zeros((p.mesh.n_nodes, 1))
    _, vel = p.solve_kle(vort, p.vel, 0.0)
    exact = np.tile([4.0, 0.0], (p.mesh.n_nodes, 1))
    assert np.linalg.norm(np.asarray(vel) - exact) < 1e-10


def test_taylor_green_unstructured_p_convergence(tmp_path):
    v, q, l = grid_quad_mesh(4, 4, distort=0.12)
    path = str(tmp_path / "tg.msh")
    write_msh41(path, v, q, l)
    cfg = {**unstruct_config(path, 3, TG_BC),
           "initial-conditions": {"custom-func": {"name": "taylor_green"}},
           "tests": {"custom-func": {"name": "taylor_green"}}}
    errs = []
    for ngl in (3, 5, 7):
        p = Problem({**cfg, "domain": {"ngl": ngl, "gmsh-file": path}},
                    solver="direct")
        p.setUp()
        errs.append(p.kle_errors([0.5])[0])
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-4


def test_unstructured_matches_box(tmp_path):
    """Undistorted grid .msh == BoxMesh solution (node orders differ;
    compare fields through coordinate matching)."""
    v, q, l = grid_quad_mesh(4, 4, distort=0.0)
    path = str(tmp_path / "g.msh")
    write_msh22(path, v, q, l)
    cfg = {**unstruct_config(path, 4, TG_BC),
           "tests": {"custom-func": {"name": "taylor_green"}}}
    pu = Problem(cfg, solver="direct")
    pu.setUp()
    pb = Problem({
        "name": "box", "material-properties": {"rho": 1, "mu": 0.01},
        "domain": {"ngl": 4, "box-mesh": {
            "nelem": [4, 4], "lower": [0, 0], "upper": [1, 1]}},
        "boundary-conditions": TG_BC,
        "initial-conditions": {"vorticity": [0]},
        "tests": {"custom-func": {"name": "taylor_green"}}}, solver="direct")
    pb.setUp()

    ev, ew = pu.exact_fields(0.3)
    _, vu = pu.solve_kle(ew, pu.vel, 0.3)
    evb, ewb = pb.exact_fields(0.3)
    _, vb = pb.solve_kle(ewb, pb.vel, 0.3)

    # match nodes by coordinates (round to break float ties consistently)
    cu = pu.mesh.coords
    cb = pb.mesh.coords
    ru, rb = np.round(cu, 10), np.round(cb, 10)
    iu = np.lexsort((ru[:, 1], ru[:, 0]))
    ib = np.lexsort((rb[:, 1], rb[:, 0]))
    npt.assert_allclose(cu[iu], cb[ib], atol=1e-12)
    npt.assert_allclose(np.asarray(vu)[iu], np.asarray(vb)[ib], atol=1e-9)


def test_no_slip_cavity_unstructured(tmp_path):
    """Axis-aligned unstructured boundary carries no-slip walls."""
    v, q, l = grid_quad_mesh(3, 3, distort=0.0)
    path = str(tmp_path / "c.msh")
    write_msh22(path, v, q, l)
    cfg = unstruct_config(path, 3, {"no-slip": {
        "up": [1, 0], "down": [0, 0], "left": [0, 0], "right": [0, 0]}})
    p = Problem(cfg, solver="direct")
    p.setUp()
    p.start_solver(dt0=1e-4)
    vel = np.asarray(p.vel)
    assert np.isfinite(vel).all()
    assert np.abs(vel).max() > 1e-8


def test_engine_transient_distorted(tmp_path):
    """VERDICT r1 #4: gmsh meshes run the element-local ENGINE transient
    (per-element batched matmuls + gather DSS), matching the global-path
    integration on a distorted mesh."""
    v, q, l = grid_quad_mesh(4, 4, distort=0.12)
    path = str(tmp_path / "e.msh")
    write_msh22(path, v, q, l)
    cfg = {**unstruct_config(path, 4, TG_BC),
           "initial-conditions": {"custom-func": {"name": "taylor_green"}},
           "time-solver": {"start-time": 0, "end-time": 0.02,
                           "max-steps": 4},
           "tests": {"custom-func": {"name": "taylor_green"}}}
    runs = {}
    for engine in (True, False):
        p = Problem(cfg, solver="cg", cg_rtol=1e-12, cg_maxiter=4000,
                    engine=engine)
        p.setUp()
        if engine:
            assert p.engine_ops is not None
            assert not p.engine_ops.lay_v.structured
            # unstructured K is sum-factorized by default: the dense
            # per-element KT never ships to the device (ops/sumfact.py)
            assert p.engine_ops.sumfact is not None
            assert p.engine_ops.KT.size == 0
        t, steps = p.start_solver(dt0=1e-3, atol=1e-5, rtol=1e-5)
        runs[engine] = (steps, np.asarray(p.vort), np.asarray(p.vel))
    assert runs[True][0] == runs[False][0] >= 3
    npt.assert_allclose(runs[True][1], runs[False][1], rtol=1e-6,
                        atol=1e-9)
    npt.assert_allclose(runs[True][2], runs[False][2], rtol=1e-6,
                        atol=1e-9)


def test_engine_transient_matches_box(tmp_path):
    """Undistorted gmsh TG transient on the engine == BoxMesh engine
    transient (coordinate-matched fields)."""
    v, q, l = grid_quad_mesh(4, 4, distort=0.0)
    path = str(tmp_path / "b.msh")
    write_msh22(path, v, q, l)
    ts = {"start-time": 0, "end-time": 0.02, "max-steps": 4}
    cfg_u = {**unstruct_config(path, 4, TG_BC),
             "initial-conditions": {"custom-func": {"name": "taylor_green"}},
             "time-solver": ts}
    cfg_b = {
        "name": "box", "material-properties": {"rho": 1, "mu": 0.01},
        "domain": {"ngl": 4, "box-mesh": {
            "nelem": [4, 4], "lower": [0, 0], "upper": [1, 1]}},
        "boundary-conditions": TG_BC,
        "initial-conditions": {"custom-func": {"name": "taylor_green"}},
        "time-solver": ts}
    pu = Problem(cfg_u, solver="cg", cg_rtol=1e-12, cg_maxiter=4000)
    pu.setUp()
    su = pu.start_solver(dt0=1e-3, atol=1e-5, rtol=1e-5)[1]
    pb = Problem(cfg_b, solver="cg", cg_rtol=1e-12, cg_maxiter=4000)
    pb.setUp()
    sb = pb.start_solver(dt0=1e-3, atol=1e-5, rtol=1e-5)[1]
    assert su == sb
    ru = np.round(pu.mesh.coords, 10)
    rb = np.round(np.asarray(pb.mesh.coords), 10)
    iu = np.lexsort((ru[:, 1], ru[:, 0]))
    ib = np.lexsort((rb[:, 1], rb[:, 0]))
    npt.assert_allclose(np.asarray(pu.vort)[iu], np.asarray(pb.vort)[ib],
                        rtol=1e-6, atol=1e-9)


def test_sharded_unstructured_transient(tmp_path):
    """Distorted gmsh mesh through the SHARDED engine: rhs matches the
    single-device engine and the full -ndev transient integrates
    (roadmap #2: unstructured sharded inside adaptive RK)."""
    from pynama_tpu.parallel.sharded_engine import ShardedEngine

    v, q, l = grid_quad_mesh(4, 4, distort=0.1)   # 16 cells -> 4 shards
    path = str(tmp_path / "s.msh")
    write_msh22(path, v, q, l)
    cfg = {**unstruct_config(path, 4, TG_BC),
           "initial-conditions": {"custom-func": {"name": "taylor_green"}},
           "time-solver": {"start-time": 0, "end-time": 0.01,
                           "max-steps": 3}}
    p = Problem(cfg, solver="cg", cg_rtol=1e-12, cg_maxiter=4000)
    p.setUp()
    from pynama_tpu.engine import local_engine as LE
    rng = np.random.default_rng(4)
    vort = rng.standard_normal((p.mesh.n_nodes, 1))
    vel = np.zeros((p.mesh.n_nodes, 2))
    f_ref, _ = LE.rhs_local(p.engine_ops, 0.1, p.to_local(vort),
                            p.to_local(vel))
    f_ref = p.to_global(f_ref, 1)
    sk = ShardedEngine(p, 4)
    rhs = sk.make_rhs()
    vort_s, vel_s = sk.shard_state(vort, vel)
    f_s, _ = rhs(sk.ops_s, 0.1, vort_s, vel_s)
    npt.assert_allclose(sk.gather_state(f_s, 1), f_ref, rtol=1e-8,
                        atol=1e-10)

    # full sharded production transient
    p2 = Problem(cfg, solver="cg", cg_rtol=1e-12, cg_maxiter=4000, ndev=4)
    p2.setUp()
    t, steps = p2.start_solver(dt0=1e-3, atol=1e-4, rtol=1e-4)
    assert steps >= 2      # dt growth clip reaches end-time in 2-3 steps
    p1 = Problem(cfg, solver="cg", cg_rtol=1e-12, cg_maxiter=4000)
    p1.setUp()
    t1, steps1 = p1.start_solver(dt0=1e-3, atol=1e-4, rtol=1e-4)
    assert steps == steps1
    npt.assert_allclose(np.asarray(p2.vort), np.asarray(p1.vort),
                        rtol=1e-6, atol=1e-9)


def test_sharded_dss_interface_exchange(tmp_path):
    """The cross-shard unstructured DSS exchanges ONLY the partition-
    interface rows (ROADMAP #2's halo exchange, in all-reduce form):
    iface is a small surface subset, and the restricted exchange is
    bit-identical to the full-vector psum."""
    import dataclasses as dc

    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    from pynama_tpu.ops import local as L
    from pynama_tpu.parallel.sharded_engine import (AXIS, ShardedEngine)

    v, q, l = grid_quad_mesh(8, 8, distort=0.1)   # 64 cells -> 8 shards
    path = str(tmp_path / "i.msh")
    write_msh22(path, v, q, l)
    cfg = unstruct_config(path, 3, TG_BC)
    p = Problem(cfg, solver="cg", engine=True)
    p.setUp()
    ndev = 8
    sk = ShardedEngine(p, ndev)
    lay_s = sk.ops_s.lay_v
    iface = np.asarray(lay_s.iface[0])
    n_nodes = p.mesh.n_nodes
    # a surface subset: for an 8-slab split of an 8x8 quad grid the
    # interfaces are 7 mesh lines -> well under half the nodes
    assert 0 < iface.size < 0.5 * n_nodes
    # every interface node really is shared between >=2 shards, and no
    # shared node is missing
    cn = np.asarray(p.mesh.cell_nodes)
    E = cn.shape[0]
    shard_of = np.repeat(np.arange(ndev), E // ndev)
    shared = np.zeros(n_nodes, bool)
    for nd in range(n_nodes):
        s = np.unique(shard_of[np.where((cn == nd).any(axis=1))[0]])
        shared[nd] = s.size >= 2
    npt.assert_array_equal(np.sort(iface), np.where(shared)[0])

    # restricted exchange == full psum, bit-identical
    rng = np.random.default_rng(0)
    t = jnp.asarray(p.to_local(rng.standard_normal((n_nodes, 2))))
    t_s = t.reshape(ndev, -1, t.shape[-1])
    mesh = Mesh(np.array(jax.devices()[:ndev]), (AXIS,))
    lay_full = dc.replace(lay_s, iface=None)

    def run(lay):
        def body(lay, ts):
            l0 = jax.tree.map(lambda x: x[0], lay)
            return L.dss(l0, ts[0], axis_name=AXIS)[None]
        f = jax.shard_map(
            body, mesh=mesh, in_specs=(jax.tree.map(lambda _: P(AXIS),
                                                    lay), P(AXIS)),
            out_specs=P(AXIS), check_vma=False)
        return np.asarray(f(lay, t_s))

    got = run(lay_s)
    want = run(lay_full)
    npt.assert_array_equal(got, want)
