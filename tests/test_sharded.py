"""Distributed tests on the 8-device virtual CPU mesh — the multi-chip
correctness tests the reference lacks (SURVEY §4: 'no distributed tests')."""
import numpy as np
import numpy.testing as npt
import jax
import pytest

from pynama_tpu.cases import Problem
from pynama_tpu.parallel.slab import make_partition
from pynama_tpu.parallel.sharded import ShardedKLE
from pynama_tpu.mesh import BoxMesh


def tg_config(nelem, ngl):
    return {
        "name": "tg",
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": 0.2, "max-steps": 100},
        "boundary-conditions": {"custom-func": {
            "name": "taylor_green",
            "attributes": ["velocity", "vorticity", "alpha"]}},
        "initial-conditions": {"custom-func": {"name": "taylor_green"}},
        "tests": {"custom-func": {"name": "taylor_green"}},
    }


def test_partition_roundtrip():
    mesh = BoxMesh.create(3, (8, 4), (0, 0), (1, 1))
    part = make_partition(mesh, 4)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((mesh.n_nodes, 2))
    back = part.gather(part.scatter(x))
    npt.assert_allclose(back, x)
    # owned counts sum to the global node count
    assert int(part.owned.sum()) == mesh.n_nodes


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_rhs_matches_global(ndev):
    p = Problem(tg_config((8, 4), 4), solver="cg")
    p.setUp()
    f_g, _ = p.rhs(0.05, p.vort, p.vel)
    sk = ShardedKLE(p, ndev)
    rhs = sk.make_rhs()
    vort_s, vel_s = sk.shard_state(p.vort, p.vel)
    f_s, _ = rhs(0.05, vort_s, vel_s)
    err = np.abs(sk.gather_state(f_s) - np.asarray(f_g)).max()
    assert err < 1e-8, f"sharded/global rhs mismatch {err:.2e}"


def test_sharded_ns_attempt_step():
    cfg = {
        "name": "cavity",
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": 3, "box-mesh": {
            "nelem": [8, 4], "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": 0.05,
                        "max-steps": 100},
        "boundary-conditions": {"no-slip": {
            "up": [2, 0], "down": [0, 0], "left": [0, 0], "right": [0, 0]}},
        "initial-conditions": {"vorticity": [0]},
    }
    p = Problem(cfg, solver="cg")
    p.setUp()
    sk = ShardedKLE(p, 4)
    att = sk.make_attempt()
    vort_s, vel_s = sk.shard_state(p.vort, p.vel)
    y, enorm, aux = att(0.0, 1e-4, vort_s, vel_s)
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(float(enorm))


def test_graft_entry():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out[0])).all()
    ge.dryrun_multichip(8)
