"""Global operator convergence tests (the OperatorsTests sweep of
reference base_problem.py:318-340 / run_case.py:80-131 as assertions)."""
import numpy as np
import pytest

from pynama_tpu.cases import Problem


def tg3d_config(nelem=(2, 2, 2), ngl=3):
    return {
        "name": "tg3d",
        "material-properties": {"rho": 1, "mu": 1},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": [0, 0, 0], "upper": [1, 1, 1]}},
        "boundary-conditions": {"custom-func": {
            "name": "taylor_green3d",
            "attributes": ["velocity", "vorticity", "alpha"]}},
        "initial-conditions": {"custom-func": {"name": "taylor_green3d"}},
        "tests": {"custom-func": {"name": "taylor_green3d"}},
    }


def senoidal_config(nelem=(4, 4), ngl=4):
    return {
        "name": "senoidal",
        "material-properties": {"rho": 1, "mu": 1},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": [0, 0], "upper": [1, 1]}},
        "boundary-conditions": {"custom-func": {
            "name": "senoidal",
            "attributes": ["velocity", "vorticity", "alpha"]}},
        "initial-conditions": {"custom-func": {"name": "senoidal"}},
        "tests": {"custom-func": {"name": "senoidal"}},
    }


def test_operators_p_convergence_2d():
    errs = []
    for ngl in (3, 5, 7):
        p = Problem(senoidal_config(ngl=ngl), solver="direct")
        p.setUp()
        errs.append(p.operators_errors(viscous_time=1.0))
    conv = [e[0] for e in errs]
    diff = [e[1] for e in errs]
    curl = [e[2] for e in errs]
    assert conv[0] > conv[-1] and diff[0] > diff[-1] and curl[0] > curl[-1]
    assert curl[-1] < 1e-3


def test_operators_3d():
    p = Problem(tg3d_config(nelem=(2, 2, 2), ngl=4), solver="cg")
    p.setUp()
    e4 = p.operators_errors(viscous_time=1.0)
    p6 = Problem(tg3d_config(nelem=(2, 2, 2), ngl=6), solver="cg")
    p6.setUp()
    e6 = p6.operators_errors(viscous_time=1.0)
    assert all(b < a for a, b in zip(e4, e6))
