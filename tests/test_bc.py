"""BoundaryConditions parity tests (reference
`src/tests/test_boundary_conditions.py` + `test_boundary_ns.py`):
classification (FS / NS / FS-NS), uniform + Reynolds specs, custom-func
sides, per-side mixes, dof masks incl. the no-slip corner rule, and value
application semantics.
"""
import math

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from pynama_tpu.bc import BoundaryConditions
from pynama_tpu.mesh import BoxMesh


def mk_mesh(dim=2, n=4, ngl=3):
    return BoxMesh.create(ngl, [n] * dim, [0] * dim, [1] * dim)


def border_set(mesh):
    names = ("up", "down", "left", "right") if mesh.dim == 2 else \
        ("up", "down", "left", "right", "back", "front")
    out = set()
    for nm in names:
        out.update(mesh.border_nodes(nm).tolist())
    return np.array(sorted(out))


def test_uniform_fs_classification():
    """reference test_set_up_onlyFS: uniform spec -> FS on every side,
    all boundary dofs Dirichlet, no FS stage."""
    mesh = mk_mesh()
    bc = BoundaryConditions(mesh, {"uniform": {"velocity": [1.0, 0.5]}})
    assert bc.bc_type == "FS" and not bc.needs_fs_stage
    border = border_set(mesh)
    npt.assert_array_equal(np.where(bc.dirichlet_mask.all(axis=1))[0],
                           border)
    assert not bc.free_main[border].any()
    interior = np.setdiff1d(np.arange(mesh.n_nodes), border)
    assert bc.free_main[interior].all()
    # uniform velocity written verbatim, vorticity zero
    vel = bc.apply_velocity(np.zeros((mesh.n_nodes, 2)))
    npt.assert_allclose(vel[border],
                        np.tile([1.0, 0.5], (border.size, 1)))
    vort = bc.apply_vorticity(np.ones((mesh.n_nodes, 1)))
    npt.assert_allclose(vort[border], 0.0)


def test_uniform_reynolds_spec():
    """reference boundary_conditions.py:87-114: velocity from
    re/mu/rho/Lref/direction."""
    mesh = mk_mesh()
    bc = BoundaryConditions(mesh, {"uniform": {
        "re": 100, "mu": 0.01, "rho": 0.5, "Lref": 2, "direction": 30}})
    vref = 100 * (0.01 / 0.5) / 2
    want = [vref * math.cos(math.radians(30)),
            vref * math.sin(math.radians(30))]
    s = bc.sides[0]
    npt.assert_allclose(s.velocity, want)
    # missing keys raise (reference raises the same way)
    with pytest.raises(ValueError):
        BoundaryConditions(mesh, {"uniform": {"re": 100, "mu": 0.01}})


def test_ns_only_masks_and_corner_rule():
    """reference test_set_up_onlyNS + the corner rule
    (boundary_conditions.py:227-243): where x-normal and y-normal meet,
    the x-normal is dropped (x stays tangential)."""
    mesh = mk_mesh()
    zero = [0.0, 0.0]
    bc = BoundaryConditions(mesh, {"no-slip": {
        "up": [1, 0], "down": zero, "left": zero, "right": zero}})
    assert bc.bc_type == "NS" and bc.needs_fs_stage
    # a left-wall interior node: x (normal) constrained, y tangential
    left = mesh.border_nodes("left")
    down = mesh.border_nodes("down")
    corner = np.intersect1d(left, down)
    assert corner.size == 1
    left_only = np.setdiff1d(left, np.concatenate(
        [mesh.border_nodes("up"), down]))
    assert bc.ns_normal_mask[left_only, 0].all()
    assert bc.ns_tang_mask[left_only, 1].all()
    # corner: y-normal wins, x becomes tangential
    assert not bc.ns_normal_mask[corner, 0].any()
    assert bc.ns_normal_mask[corner, 1].all()
    assert bc.ns_tang_mask[corner, 0].all()
    # FS-stage frees exactly the tangential wall dofs
    extra = bc.free_fs & ~bc.free_main
    npt.assert_array_equal(extra, bc.ns_tang_mask)


def test_fsns_mixed_supported():
    """FS-NS mixed: classified AND fully supported (the reference
    classifies then rejects it at base_problem.py:163)."""
    mesh = mk_mesh()
    bc = BoundaryConditions(mesh, {
        "free-slip": {"left": [1, 0], "right": [1, 0]},
        "no-slip": {"up": [0, 0], "down": [0, 0]}})
    assert bc.bc_type == "FS-NS" and bc.needs_fs_stage
    left = mesh.border_nodes("left")
    up = mesh.border_nodes("up")
    # free-slip side: full Dirichlet; wins over wall masks at shared
    # corners
    assert bc.dirichlet_mask[left].all()
    assert not (bc.ns_normal_mask[left] | bc.ns_tang_mask[left]).any()
    up_only = np.setdiff1d(up, np.concatenate(
        [left, mesh.border_nodes("right")]))
    assert bc.ns_normal_mask[up_only, 1].all()
    assert bc.ns_tang_mask[up_only, 0].all()


def test_custom_func_sides_and_values():
    """reference test_set_up_custom_func: every side gets the analytic
    function; applied values match the library at the border coords."""
    from pynama_tpu.functions import get_function_lib
    mesh = mk_mesh()
    bc = BoundaryConditions(mesh, {"custom-func": {
        "name": "taylor_green", "attributes": ["velocity", "vorticity",
                                               "alpha"]}})
    assert bc.bc_type == "FS"
    assert all(s.func is not None for s in bc.sides)
    lib = get_function_lib("taylor_green")
    t, nu = 0.3, 0.02
    a = lib.alpha(nu, t)
    vel = np.asarray(bc.apply_velocity(jnp.zeros((mesh.n_nodes, 2)),
                                       t=t, nu=nu))
    for s in bc.sides:
        want = np.asarray(lib.velocity(mesh.coords[s.nodes], a))
        npt.assert_allclose(vel[s.nodes], want, rtol=1e-12)


def test_custom_and_uniform_mix():
    """reference test_set_up_custom_and_uniform: per-side mix of
    constant and custom-func values."""
    mesh = mk_mesh()
    bc = BoundaryConditions(mesh, {"free-slip": {
        "left": {"custom-func": {"name": "taylor_green"}},
        "right": [2.0, 0.0], "up": [2.0, 0.0], "down": [2.0, 0.0]}})
    assert bc.bc_type == "FS"
    by_name = {s.name: s for s in bc.sides}
    assert by_name["left"].func is not None
    npt.assert_allclose(by_name["right"].velocity, [2.0, 0.0])


def test_apply_tangential_only_touches_wall_tangentials():
    """setTangentialValuesToVec semantics (boundary_conditions.py:
    262-277): no-slip sides write tangential components only."""
    mesh = mk_mesh()
    bc = BoundaryConditions(mesh, {
        "free-slip": {"left": [9, 9], "right": [9, 9]},
        "no-slip": {"up": [3, 0], "down": [0, 0]}})
    marker = np.full((mesh.n_nodes, 2), -1.0)
    out = np.asarray(bc.apply_tangential(jnp.asarray(marker)))
    up = mesh.border_nodes("up")
    up_only = np.setdiff1d(up, np.concatenate(
        [mesh.border_nodes("left"), mesh.border_nodes("right")]))
    npt.assert_allclose(out[up_only, 0], 3.0)   # tangential written
    npt.assert_allclose(out[up_only, 1], -1.0)  # normal untouched
    left = mesh.border_nodes("left")
    inner_left = np.setdiff1d(left, np.concatenate(
        [up, mesh.border_nodes("down")]))
    npt.assert_allclose(out[inner_left], -1.0)  # FS side untouched


def test_empty_bc_raises():
    mesh = mk_mesh()
    with pytest.raises(ValueError, match="not defined"):
        BoundaryConditions(mesh, {})


def test_3d_classification():
    """3D: six sides, FS stage wiring identical (reference supports 3D
    box borders back/front)."""
    mesh = mk_mesh(dim=3, n=2)
    zero = [0, 0, 0]
    bc = BoundaryConditions(mesh, {"no-slip": {
        "up": [1, 0, 0], "down": zero, "left": zero, "right": zero,
        "back": zero, "front": zero}})
    assert bc.bc_type == "NS" and len(bc.sides) == 6
    assert bc.free_fs.sum() > bc.free_main.sum()
