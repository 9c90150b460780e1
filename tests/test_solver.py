"""KLE solver integration tests, reproducing the reference tolerances
(src/tests/test_solver.py:18-37) plus CG/direct cross-validation."""
import numpy as np
import numpy.testing as npt
import jax.numpy as jnp
import pytest

from pynama_tpu.cases import Problem
from pynama_tpu.cases.problem import compute_vtensv


def uniform_config(nelem=(10, 10), ngl=3):
    return {
        "name": "uniform",
        "material-properties": {"rho": 1, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": [0, 0], "upper": [1, 1]}},
        "boundary-conditions": {"uniform": {"velocity": [4, 0],
                                            "vorticity": [0]}},
        "initial-conditions": {"velocity": [4, 0]},
    }


def tg_config(nelem=(10, 10), ngl=5):
    return {
        "name": "taylor-green",
        "material-properties": {"rho": 1, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": [0, 0], "upper": [1, 1]}},
        "boundary-conditions": {"custom-func": {
            "name": "taylor_green",
            "attributes": ["velocity", "vorticity", "alpha"]}},
        "initial-conditions": {"custom-func": {"name": "taylor_green"}},
        "tests": {"custom-func": {"name": "taylor_green"}},
    }


@pytest.mark.parametrize("solver", ["direct", "cg"])
def test_uniform_flow(solver):
    """Uniform flow reproduced to 1e-12 (reference test_solver.py:25)."""
    p = Problem(uniform_config(), solver=solver)
    p.setUp()
    vort = jnp.zeros((p.mesh.n_nodes, 1))
    _, vel = p.solve_kle(vort, p.vel, 0.0)
    exact = np.tile([4.0, 0.0], (p.mesh.n_nodes, 1))
    assert np.linalg.norm(np.asarray(vel) - exact) < 1e-12


@pytest.mark.parametrize("solver", ["direct", "cg"])
def test_taylor_green_t0(solver):
    """TG at t=0, 10x10 ngl=5, error < 1e-5 (reference test_solver.py:37)."""
    p = Problem(tg_config(), solver=solver)
    p.setUp()
    exact_vel, exact_vort = p.exact_fields(0.0)
    _, vel = p.solve_kle(exact_vort, p.vel, 0.0)
    err = np.linalg.norm(np.asarray(vel) - np.asarray(exact_vel))
    assert err < 1e-5


def test_cg_matches_direct():
    pd = Problem(tg_config(nelem=(4, 4), ngl=4), solver="direct")
    pd.setUp()
    pc = Problem(tg_config(nelem=(4, 4), ngl=4), solver="cg")
    pc.setUp()
    ev, ew = pd.exact_fields(0.1)
    _, v1 = pd.solve_kle(ew, pd.vel, 0.1)
    _, v2 = pc.solve_kle(ew, pc.vel, 0.1)
    npt.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-8)


def test_kle_errors_sweep():
    """getKLEError-style sweep: errors stay bounded and small at high p."""
    p = Problem(tg_config(nelem=(4, 4), ngl=7), solver="direct")
    p.setUp()
    errs = p.kle_errors([0.2, 0.5, 0.9])
    assert all(e < 1e-4 for e in errs)


def test_compute_vtensv():
    """Golden check (reference test_solver.py:57-76 computes this for a
    linear field)."""
    vel = jnp.asarray(np.array([[1.0, 2.0], [3.0, -1.0]]))
    out = np.asarray(compute_vtensv(vel, 2))
    npt.assert_allclose(out, [[1, 2, 4], [9, -3, 1]])
    vel3 = jnp.asarray(np.array([[1.0, 2.0, 3.0]]))
    out3 = np.asarray(compute_vtensv(vel3, 3))
    npt.assert_allclose(out3, [[1, 2, 4, 6, 9, 3]])


def test_p_convergence():
    """KLE velocity error decreases monotonically with ngl (the chart
    sweep of run_case.py:48-77 as an assertion)."""
    errs = []
    for ngl in (3, 5, 7):
        p = Problem(tg_config(nelem=(4, 4), ngl=ngl), solver="direct")
        p.setUp()
        errs.append(p.kle_errors([0.5])[0])
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-5
