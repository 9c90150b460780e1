"""Every bundled yaml case runs end-to-end (tiny overrides).

The reference ships its case library in `src/cases/*.yaml`; these smoke
tests guarantee each bundled case stays runnable through the real driver
path (load -> setUp -> a few adaptive steps -> viewer output)."""
import os

import numpy as np
import pytest

from pynama_tpu import run_case


FAST_CASES = ["uniform", "taylor-green", "senoidal", "flat-plate",
              "cavity-2d"]


@pytest.mark.parametrize("name", FAST_CASES)
def test_case_runs(name, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = run_case.load_case(name)
    cfg.setdefault("domain", {})["box-mesh"] = {
        "nelem": [3, 3], "lower": [0, 0], "upper": [1, 1]}
    cfg["domain"]["ngl"] = 3
    # keep each case's own start-time (flat-plate's tau = sqrt(4 nu t)
    # boundary layer is singular at t=0, reference custom_func.py:153-180)
    t0 = float(cfg.get("time-solver", {}).get("start-time", 0))
    cfg["time-solver"] = {"start-time": t0, "end-time": t0 + 0.005,
                          "max-steps": 3}
    cfg["save-dir"] = str(tmp_path / "out")
    p = run_case.make_problem(cfg)
    p.setUp()
    p.setup_viewer()
    t, steps = p.run()
    assert steps >= 1
    assert np.isfinite(np.asarray(p.vort)).all()
    # viewer wrote mesh + at least one snapshot + xmf index
    out = tmp_path / "out"
    assert (out / "mesh.h5").exists()
    assert any(f.suffix == ".xmf" for f in out.iterdir())


def test_case_3d_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = run_case.load_case("taylor-green3d")
    cfg["domain"]["box-mesh"] = {"nelem": [2, 2, 2], "lower": [0, 0, 0],
                                 "upper": [1, 1, 1]}
    cfg["domain"]["ngl"] = 3
    cfg["time-solver"] = {"start-time": 0, "end-time": 0.002,
                          "max-steps": 2}
    cfg["save-dir"] = str(tmp_path / "out")
    p = run_case.make_problem(cfg)
    p.setUp()
    p.setup_viewer()
    t, steps = p.run()
    assert steps >= 1


def test_case_2d3d_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = run_case.load_case("taylor-green2d-3d")
    cfg["domain"]["box-mesh"] = {"nelem": [2, 2, 2], "lower": [0, 0, 0],
                                 "upper": [1, 1, 1]}
    cfg["domain"]["ngl"] = 3
    cfg["time-solver"] = {"start-time": 0, "end-time": 0.002,
                          "max-steps": 2}
    cfg["save-dir"] = str(tmp_path / "out")
    p = run_case.make_problem(cfg)
    p.setUp()
    p.setup_viewer()
    t, steps = p.run()
    assert steps >= 1


def test_ibm_static_case_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = run_case.load_case("ibm-static")
    # shrink the domain around the body for speed
    cfg["domain"]["box-mesh"]["nelem"] = [12, 12]
    cfg["domain"]["ngl"] = 3
    cfg["time-solver"] = {"start-time": 0, "end-time": 0.005,
                          "max-steps": 2}
    cfg["save-dir"] = str(tmp_path / "out")
    p = run_case.make_problem(cfg)
    p.setUp()
    assert p.body.n_nodes > 0
    p.run(dt0=1e-4)
    assert np.isfinite(np.asarray(p.vel)).all()


def test_ibm_dynamic_case_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = run_case.load_case("ibm-dynamic")
    cfg["domain"]["box-mesh"]["nelem"] = [12, 12]
    cfg["domain"]["ngl"] = 3
    cfg["time-solver"] = {"start-time": 0, "end-time": 0.002,
                          "max-steps": 2}
    cfg["save-dir"] = str(tmp_path / "out")
    p = run_case.make_problem(cfg)
    assert type(p).__name__ == "ImmersedBoundaryDynamic"
    p.setUp()
    p.run(dt0=1e-4)
    assert np.isfinite(np.asarray(p.vel)).all()


def test_chart_mode_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import argparse
    cfg = run_case.load_case("taylor-green")
    cfg["domain"]["box-mesh"] = {"nelem": [3, 3], "lower": [0, 0],
                                 "upper": [1, 1]}
    args = argparse.Namespace(ngl=None, nelem=[3, 3], solver="direct",
                              max_ngl=4, resume=None, checkpoint=None)
    run_case.generate_chart(cfg, args)
    assert any(f.name.startswith("test-kle") for f in tmp_path.iterdir())


def test_diagonal_cavity_runs(tmp_path, monkeypatch):
    """3D diagonal-lid cavity (reference src/cases/diagonal-cavity.yaml)."""
    monkeypatch.chdir(tmp_path)
    cfg = run_case.load_case("diagonal-cavity")
    cfg["domain"]["box-mesh"]["nelem"] = [2, 2, 2]
    cfg["time-solver"] = {"start-time": 0, "end-time": 0.02,
                          "max-steps": 3}
    cfg["save-dir"] = str(tmp_path / "out")
    p = run_case.make_problem(cfg)
    p.setUp()
    p.setup_viewer()
    t, steps = p.run()
    assert steps >= 3
    # the diagonal lid drives all three vorticity components
    vort = np.asarray(p.vort)
    assert np.isfinite(vort).all()
    assert (np.abs(vort).max(axis=0) > 0).all()


def test_flat_plate_fsns_runs(tmp_path, monkeypatch):
    """Mixed FS-NS flat plate — the configuration the reference rejects
    (base_problem.py:163) but this framework supports."""
    monkeypatch.chdir(tmp_path)
    cfg = run_case.load_case("flat-plate-FSNS")
    cfg["domain"]["box-mesh"]["nelem"] = [3, 3]
    cfg["domain"]["ngl"] = 3
    t0 = float(cfg["time-solver"]["start-time"])
    cfg["time-solver"] = {"start-time": t0, "end-time": t0 + 0.01,
                          "max-steps": 3}
    cfg["save-dir"] = str(tmp_path / "out")
    p = run_case.make_problem(cfg)
    p.setUp()
    assert p.bc.bc_type == "FS-NS"
    p.setup_viewer()
    t, steps = p.run()
    assert steps >= 3
    assert np.isfinite(np.asarray(p.vort)).all()


def test_ibm_sphere_case_runs(tmp_path, monkeypatch):
    """3D sphere IBM case (beyond the reference's 2D/ngl<4 IBM)."""
    monkeypatch.chdir(tmp_path)
    cfg = run_case.load_case("ibm-sphere")
    cfg["domain"]["box-mesh"]["nelem"] = [8, 6, 6]
    cfg["time-solver"] = {"start-time": 0, "end-time": 0.002,
                          "max-steps": 2}
    cfg["save-dir"] = str(tmp_path / "out")
    p = run_case.make_problem(cfg)
    p.setUp()
    assert p.dim == 3 and p.body.n_nodes > 10
    p.run(dt0=1e-4)
    assert np.isfinite(np.asarray(p.vel)).all()
