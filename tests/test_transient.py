"""End-to-end transient solves: Taylor-Green decay vs analytic, and the
no-slip lid-driven cavity (reference cases taylor-green.yaml /
cavity-2d.yaml at reduced size)."""
import numpy as np
import pytest

from pynama_tpu.cases import Problem
from pynama_tpu.functions import taylor_green as tg


def tg_config(ngl, nelem, tend):
    return {
        "name": "tg",
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": [nelem, nelem], "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": tend,
                        "max-steps": 500},
        "boundary-conditions": {"custom-func": {
            "name": "taylor_green",
            "attributes": ["velocity", "vorticity", "alpha"]}},
        "initial-conditions": {"custom-func": {"name": "taylor_green"}},
        "tests": {"custom-func": {"name": "taylor_green"}},
    }


def test_taylor_green_decay():
    """Integrate the TG vortex and compare vorticity with the analytic
    decaying solution."""
    p = Problem(tg_config(ngl=7, nelem=4, tend=0.2), solver="direct")
    p.setUp()
    t, steps = p.start_solver(atol=1e-7, rtol=1e-7, dt0=1e-3)
    assert abs(t - 0.2) < 1e-12
    a = tg.alpha(p.nu, t)
    w_exact = np.asarray(tg.vorticity(p.mesh.coords, a))
    err = np.abs(np.asarray(p.vort) - w_exact).max()
    scale = np.abs(w_exact).max()
    assert err / scale < 5e-4, f"relative vorticity error {err/scale:.2e}"


def test_cavity_noslip():
    """Short lid-driven cavity run: NS two-stage solve, lid velocity
    enforced, fields bounded."""
    cfg = {
        "name": "cavity",
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": 3, "box-mesh": {
            "nelem": [8, 8], "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": 0.02,
                        "max-steps": 50},
        "boundary-conditions": {"no-slip": {
            "up": [2, 0], "down": [0, 0], "left": [0, 0], "right": [0, 0]}},
        "initial-conditions": {"vorticity": [0]},
    }
    p = Problem(cfg, solver="direct")
    p.setUp()
    assert p.bc.bc_type == "NS" and p.kle.is_ns
    t, steps = p.start_solver(atol=1e-4, rtol=1e-4, dt0=1e-4)
    assert steps > 0
    vel = np.asarray(p.vel)
    up = p.mesh.border_nodes("up")
    interior_lid = up[1:-1]  # corners overwritten by side walls (parity)
    np.testing.assert_allclose(vel[interior_lid, 0], 2.0, atol=1e-10)
    np.testing.assert_allclose(vel[p.mesh.border_nodes("down")], 0.0,
                               atol=1e-10)
    assert np.abs(vel).max() <= 2.0 + 1e-8
    assert np.isfinite(np.asarray(p.vort)).all()


def test_fs_ns_mixed():
    """FS-NS mixed boundary conditions (rejected by the reference,
    base_problem.py:163; supported here): flow over a no-slip bottom with
    free-slip elsewhere runs stably."""
    cfg = {
        "name": "mixed",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {"ngl": 3, "box-mesh": {
            "nelem": [6, 6], "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": 0.01,
                        "max-steps": 20},
        "boundary-conditions": {
            "free-slip": {"up": [1, 0], "left": [1, 0], "right": [1, 0]},
            "no-slip": {"down": [0, 0]}},
        "initial-conditions": {"vorticity": [0]},
    }
    p = Problem(cfg, solver="direct")
    p.setUp()
    assert p.bc.bc_type == "FS-NS"
    t, steps = p.start_solver(atol=1e-4, rtol=1e-4, dt0=1e-4)
    assert steps > 0
    assert np.isfinite(np.asarray(p.vel)).all()
    assert np.isfinite(np.asarray(p.vort)).all()
