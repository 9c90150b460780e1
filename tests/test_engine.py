"""Differential tests: element-local engine vs the global-layout path.

The local engine must reproduce the global path bit-for-bit in exact
arithmetic: same BC application, same KLE solves, same RHS chain.
"""
import numpy as np
import pytest

from pynama_tpu.cases import Problem
from pynama_tpu.cases.problem import compute_vtensv
from pynama_tpu.engine import local_engine as E
from pynama_tpu.ops import local as L


def tg_config(ngl=4, nelem=4):
    return {
        "name": "tg",
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": [nelem, nelem], "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": 0.1, "max-steps": 50},
        "boundary-conditions": {"custom-func": {
            "name": "taylor_green",
            "attributes": ["velocity", "vorticity", "alpha"]}},
        "initial-conditions": {"custom-func": {"name": "taylor_green"}},
        "tests": {"custom-func": {"name": "taylor_green"}},
    }


def cavity_config(ngl=3, nelem=6, dim=2):
    zero = [0] * dim
    ns = {"up": [1.0] + [0] * (dim - 1), "down": zero, "left": zero,
          "right": zero}
    if dim == 3:
        ns["back"] = zero
        ns["front"] = zero
    return {
        "name": "cavity",
        "material-properties": {"rho": 1.0, "mu": 0.02},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": [nelem] * dim, "lower": zero, "upper": [1] * dim}},
        "time-solver": {"start-time": 0, "end-time": 0.01, "max-steps": 20},
        "boundary-conditions": {"no-slip": ns},
        "initial-conditions": {"vorticity": [0] * (1 if dim == 2 else 3)},
    }


def _problems(cfg):
    """Same case twice: engine on (cg) and engine off (global cg path)."""
    pe = Problem(cfg, solver="cg", cg_rtol=1e-13, cg_maxiter=4000)
    pe.setUp()
    assert pe.engine_ops is not None
    pg = Problem(cfg, solver="cg", cg_rtol=1e-13, cg_maxiter=4000,
                 engine=False)
    pg.setUp()
    assert pg.engine_ops is None
    return pe, pg


@pytest.mark.parametrize("cfg_fn", [tg_config, cavity_config])
def test_bc_application_matches(cfg_fn):
    pe, pg = _problems(cfg_fn())
    ops = pe.engine_ops
    rng = np.random.default_rng(0)
    vel = rng.standard_normal((pe.mesh.n_nodes, pe.dim))
    vort = rng.standard_normal((pe.mesh.n_nodes, pe.dim_w))
    t = 0.3

    vel_g = np.asarray(pg.bc.apply_velocity(
        np.array(vel), t, pg.nu))
    vel_l = E.apply_velocity_bc(ops, pe.to_local(vel), t)
    np.testing.assert_allclose(pe.to_global(vel_l, pe.dim), vel_g,
                               rtol=1e-12, atol=1e-12)

    vort_g = np.asarray(pg.bc.apply_vorticity(np.array(vort), t, pg.nu))
    vort_l = E.apply_vorticity_bc(ops, pe.to_local(vort), t)
    np.testing.assert_allclose(pe.to_global(vort_l, pe.dim_w), vort_g,
                               rtol=1e-12, atol=1e-12)


def test_vtensv_matches():
    pe, _ = _problems(tg_config())
    rng = np.random.default_rng(1)
    vel = rng.standard_normal((pe.mesh.n_nodes, pe.dim))
    want = np.asarray(compute_vtensv(vel, pe.dim))
    got = pe.to_global(E.vtensv(pe.engine_ops, pe.to_local(vel)), pe.dim_s)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("cfg_fn", [tg_config, cavity_config])
def test_solve_kle_matches(cfg_fn):
    pe, pg = _problems(cfg_fn())
    vort, vel = np.asarray(pe.vort), np.asarray(pe.vel)
    _, vel_e = pe.solve_kle(vort, vel, t=0.0)
    _, vel_g = pg.solve_kle(vort, vel, t=0.0)
    np.testing.assert_allclose(np.asarray(vel_e), np.asarray(vel_g),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("cfg_fn", [tg_config, cavity_config])
def test_rhs_matches(cfg_fn):
    pe, pg = _problems(cfg_fn())
    vort, vel = np.asarray(pe.vort), np.asarray(pe.vel)
    f_l, vel_l = E.rhs_local(pe.engine_ops, 0.0, pe.to_local(vort),
                             pe.to_local(vel))
    f_g, _ = pg.rhs(0.0, vort, vel)
    np.testing.assert_allclose(pe.to_global(f_l, pe.dim_w),
                               np.asarray(f_g), rtol=1e-7, atol=1e-7)


def test_transient_matches():
    """Short adaptive run: engine path tracks the global path."""
    cfg = tg_config(ngl=4, nelem=3)
    cfg["time-solver"]["end-time"] = 0.05
    pe, pg = _problems(cfg)
    te, se = pe.start_solver(atol=1e-8, rtol=1e-8, dt0=1e-3)
    tg_, sg = pg.start_solver(atol=1e-8, rtol=1e-8, dt0=1e-3)
    assert abs(te - tg_) < 1e-12
    np.testing.assert_allclose(np.asarray(pe.vort), np.asarray(pg.vort),
                               rtol=1e-6, atol=1e-8)


def test_3d_rhs_matches():
    pe, pg = _problems(cavity_config(ngl=3, nelem=2, dim=3))
    rng = np.random.default_rng(5)
    vort = rng.standard_normal((pe.mesh.n_nodes, 3))
    vel = np.zeros((pe.mesh.n_nodes, 3))
    f_l, _ = E.rhs_local(pe.engine_ops, 0.0, pe.to_local(vort),
                         pe.to_local(vel))
    f_g, _ = pg.rhs(0.0, vort, vel)
    np.testing.assert_allclose(pe.to_global(f_l, 3), np.asarray(f_g),
                               rtol=1e-6, atol=1e-7)
