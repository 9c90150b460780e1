"""Physics monitors (Problem.diagnostics): validated against the analytic
Taylor-Green integrals on [0,1]^2 — KE = rho/4, enstrophy = 2 pi^2."""
import numpy as np
import pytest

from pynama_tpu.cases import Problem
from tests.test_solver import tg_config


def test_diagnostics_taylor_green():
    p = Problem(tg_config(nelem=(6, 6), ngl=5), solver="direct")
    p.setUp()
    ev, ew = p.exact_fields(0.0)
    _, vel = p.solve_kle(ew, p.vel, 0.0)
    d = p.diagnostics(vel=vel, vort=ew)
    assert d["kinetic_energy"] == pytest.approx(0.25, rel=1e-5)
    assert d["enstrophy"] == pytest.approx(2 * np.pi**2, rel=1e-6)
    # KLE penalty enforces incompressibility weakly
    assert d["div_l2"] < 5e-3


def test_diagnostics_3d():
    from tests.test_3d import tg3_config
    p = Problem(tg3_config(4), solver="direct")
    p.setUp()
    ev, ew = p.exact_fields(0.0)
    _, vel = p.solve_kle(ew, p.vel, 0.0)
    d = p.diagnostics(vel=vel, vort=ew)
    assert d["kinetic_energy"] > 0
    assert d["enstrophy"] > 0
    assert np.isfinite(d["div_l2"])
