"""IO subsystem tests: HDF5/XDMF roundtrip, checkpoint/resume, CLI modes."""
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml


def test_viewer_roundtrip(tmp_path):
    import h5py
    from pynama_tpu.io import Paraviewer
    rng = np.random.default_rng(0)
    coords = rng.standard_normal((50, 2))
    vel = rng.standard_normal((50, 2))
    vort = rng.standard_normal((50, 1))

    v = Paraviewer()
    v.configure(2, str(tmp_path / "out"))
    v.save_mesh(coords)
    v.save_data(3, 0.125, velocity=vel, vorticity=vort)
    v.write_xmf("case")

    with h5py.File(tmp_path / "out" / "mesh.h5") as f:
        np.testing.assert_array_equal(f["fields/mesh"][:], coords.ravel())
    with h5py.File(tmp_path / "out" / "vec-data-00003.h5") as f:
        np.testing.assert_array_equal(f["fields/velocity"][:], vel.ravel())
        np.testing.assert_array_equal(f["fields/vorticity"][:], vort.ravel())
    xmf = (tmp_path / "out" / "case.xmf").read_text()
    assert "Polyvertex" in xmf and "JOIN($0, $1)" in xmf
    assert 'Value="0.125"' in xmf


def test_vtk_writer(tmp_path):
    from pynama_tpu.io import Paraviewer
    v = Paraviewer()
    v.configure(2, str(tmp_path))
    coords = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    v.write_vtk("m", coords, step=1, speed=np.array([1.0, 2.0, 3.0]),
                vel=np.array([[1, 0], [0, 1], [1, 1.0]]))
    txt = (tmp_path / "m-00001.vtk").read_text()
    assert "POINTS 3 double" in txt
    assert "SCALARS speed" in txt and "VECTORS vel" in txt


def test_checkpoint_roundtrip(tmp_path):
    from pynama_tpu.io import load_checkpoint, save_checkpoint
    rng = np.random.default_rng(1)
    w, v = rng.standard_normal((20, 1)), rng.standard_normal((20, 2))
    path = str(tmp_path / "ck.h5")
    save_checkpoint(path, w, v, t=0.5, dt=1e-3, step=7,
                    config={"name": "x"})
    ck = load_checkpoint(path)
    np.testing.assert_array_equal(ck["vorticity"], w)
    np.testing.assert_array_equal(ck["velocity"], v)
    assert ck["t"] == 0.5 and ck["step"] == 7
    assert ck["config"]["name"] == "x"


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = ""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_enable_x64', True);"
        "import sys; from pynama_tpu.run_case import main;"
        f"main({args!r})")
    return subprocess.run([sys.executable, "-c", code], cwd=cwd,
                          capture_output=True, text=True, timeout=500,
                          env=env)


def test_cli_production_and_resume(tmp_path):
    cfg = {
        "name": "cli-tg", "save-dir": "out",
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": 3, "box-mesh": {
            "nelem": [4, 4], "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": 0.02, "max-steps": 10},
        "boundary-conditions": {"custom-func": {
            "name": "taylor_green",
            "attributes": ["velocity", "vorticity", "alpha"]}},
        "initial-conditions": {"custom-func": {"name": "taylor_green"}},
        "tests": {"custom-func": {"name": "taylor_green"}},
    }
    case = tmp_path / "case.yaml"
    case.write_text(yaml.dump(cfg))
    r = _run_cli(["-case", str(case), "-solver", "direct",
                  "-checkpoint", "ck.h5"], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "out" / "mesh.h5").exists()
    assert (tmp_path / "out" / "cli-tg.xmf").exists()
    assert (tmp_path / "ck.h5").exists()
    r2 = _run_cli(["-case", str(case), "-solver", "direct",
                   "-resume", "ck.h5"], str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]


def test_cli_kle_mode(tmp_path):
    cfg = {
        "name": "cli-kle", "save-dir": "outk",
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": 4, "box-mesh": {
            "nelem": [4, 4], "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": 1, "max-steps": 10},
        "boundary-conditions": {"custom-func": {
            "name": "taylor_green",
            "attributes": ["velocity", "vorticity", "alpha"]}},
        "initial-conditions": {"custom-func": {"name": "taylor_green"}},
        "tests": {"custom-func": {"name": "taylor_green"}},
    }
    case = tmp_path / "case.yaml"
    case.write_text(yaml.dump(cfg))
    r = _run_cli(["-case", str(case), "-test", "kle", "-solver", "direct"],
                 str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "outk" / "vec-data-00000.h5").exists()


def test_case_library_loads():
    from pynama_tpu.run_case import load_case, CASE_DIR
    names = [f[:-5] for f in os.listdir(CASE_DIR) if f.endswith(".yaml")]
    assert {"taylor-green", "cavity-2d", "ibm-static",
            "taylor-green3d"} <= set(names)
    for n in names:
        cfg = load_case(n)
        assert "material-properties" in cfg and "domain" in cfg
