"""Element-sharded operator application for unstructured meshes: matches
the single-device apply_op bit-for-bit (up to psum reduction order)."""
import numpy as np
import numpy.testing as npt
import jax
import jax.numpy as jnp
import pytest

from pynama_tpu.cases import Problem
from pynama_tpu.ops.apply import apply_op
from pynama_tpu.parallel.unstructured_sharded import (shard_element_op,
                                                      sharded_apply_op)
from tests.msh_fixtures import grid_quad_mesh, write_msh22


@pytest.fixture(scope="module")
def problem(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("us")
    v, q, l = grid_quad_mesh(5, 4, distort=0.12)
    path = str(tmp / "m.msh")
    write_msh22(path, v, q, l)
    cfg = {"name": "us", "material-properties": {"rho": 1, "mu": 0.01},
           "domain": {"ngl": 4, "gmsh-file": path},
           "boundary-conditions": {"uniform": {"velocity": [1, 0],
                                               "vorticity": [0]}},
           "initial-conditions": {"velocity": [1, 0]}}
    p = Problem(cfg, solver="direct")
    p.setUp()
    return p


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_K_apply_matches(problem, ndev):
    op = problem.kle.K_op
    sop = shard_element_op(op, ndev)
    f = sharded_apply_op(sop)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((op.n_nodes, op.din)))
    npt.assert_allclose(np.asarray(f(x)), np.asarray(apply_op(op, x)),
                        rtol=1e-12, atol=1e-12)


def test_sharded_rectangular_op(problem):
    """Curl (din != dout) with the uneven-E padding path."""
    op = problem.operator.curl_op
    sop = shard_element_op(op, 8)     # 20 cells over 8 devices -> padded
    f = sharded_apply_op(sop)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((op.n_nodes, op.din)))
    npt.assert_allclose(np.asarray(f(x)), np.asarray(apply_op(op, x)),
                        rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_kle_solve_matches(tmp_path, ndev):
    """Full sharded CG KLE solve == single-device solve on an unstructured
    no-slip problem (two-stage path included)."""
    from pynama_tpu.parallel.unstructured_sharded import \
        make_sharded_kle_solver
    v, q, l = grid_quad_mesh(4, 4, distort=0.1)
    path = str(tmp_path / "m.msh")
    write_msh22(path, v, q, l)
    cfg = {"name": "uskle", "material-properties": {"rho": 1, "mu": 0.01},
           "domain": {"ngl": 4, "gmsh-file": path},
           "boundary-conditions": {"no-slip": {
               "up": [1, 0], "down": [0, 0], "left": [0, 0],
               "right": [0, 0]}},
           "initial-conditions": {"vorticity": [0]}}
    p = Problem(cfg, solver="cg", cg_rtol=1e-12, cg_maxiter=3000)
    p.setUp()
    solve, solve_fs = make_sharded_kle_solver(p, ndev)
    assert solve_fs is not None

    rng = np.random.default_rng(0)
    vort = jnp.asarray(rng.standard_normal((p.mesh.n_nodes, 1)))
    t = 0.0
    vort_bc = p.bc.apply_vorticity(vort, t, p.nu)
    vel_bc = p.bc.apply_velocity(p.vel, t, p.nu)

    # reference single-device two-stage solve
    ref_vort, ref_vel = p.solve_kle(vort, p.vel, t)

    # sharded two-stage solve (same BC chain as Problem.solve_kle)
    vel_fs = solve_fs(jnp.asarray(vort_bc), jnp.asarray(vel_bc))
    vel_fs = p.bc.apply_tangential(vel_fs, t, p.nu)
    vort2 = p.operator.curl(jnp.asarray(vel_fs))
    vel2 = solve(vort2, jnp.asarray(vel_bc))

    npt.assert_allclose(np.asarray(vel2), np.asarray(ref_vel),
                        rtol=1e-8, atol=1e-9)
