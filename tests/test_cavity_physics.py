"""Lid-driven cavity physics: the qualitative steady-state structure at
Re=10 (the reference's flagship production case, cavity-2d.yaml — it has
no published profile data, so the assertions are the classic cavity-flow
invariants: co-moving flow under the lid, return flow at mid-depth,
no-slip respected on the static walls)."""
import numpy as np

from pynama_tpu.cases import Problem


def test_cavity_steady_profile():
    cfg = {
        "name": "cav",
        "material-properties": {"rho": 1.0, "mu": 0.1},
        "domain": {"ngl": 4, "box-mesh": {
            "nelem": [6, 6], "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": 2.0, "max-steps": 400},
        "boundary-conditions": {"no-slip": {
            "up": [1, 0], "down": [0, 0], "left": [0, 0], "right": [0, 0]}},
        "initial-conditions": {"vorticity": [0]},
    }
    p = Problem(cfg, solver="cg")
    p.setUp()
    t, steps = p.start_solver(atol=1e-6, rtol=1e-6)
    assert t >= 1.9
    vel = np.asarray(p.vel)
    assert np.isfinite(vel).all()

    # vertical centerline u-profile (y ascending)
    nodes, ys = p.mesh.nodes_over_line("x", 0.5)
    u = vel[nodes, 0]
    assert u[0] == 0.0                       # no-slip bottom
    assert u[-1] == 1.0                      # lid velocity imposed exactly
    assert u[-2] > 0.3                       # co-moving layer under the lid
    assert u[len(u) // 2] < -0.05            # return flow at mid-depth

    # static walls: tangential velocity zero on left wall
    lnodes = p.mesh.border_nodes("left")
    np.testing.assert_allclose(vel[lnodes, 1], 0.0, atol=1e-10)

    # primary vortex is clockwise: vorticity negative at the cavity center
    center = np.argmin(np.linalg.norm(p.mesh.coords - 0.5, axis=1))
    assert np.asarray(p.vort)[center, 0] < 0.0
