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
