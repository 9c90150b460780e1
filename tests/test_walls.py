"""No-slip wall bookkeeping (reference src/tests/test_nswalls.py: normals,
static/velocity dof splits, randomized box extents)."""
import numpy as np
import pytest

from pynama_tpu.bc.walls import NoSlipWalls


@pytest.fixture
def rand_box():
    rng = np.random.default_rng(42)
    lo = rng.uniform(-10, 0, 2)
    hi = lo + rng.uniform(0.5, 10, 2)
    return list(lo), list(hi)


def test_walls_created(rand_box):
    lo, hi = rand_box
    w = NoSlipWalls(lo, hi)
    assert len(w) == 4
    assert set(w.get_walls_names()) == {"left", "right", "up", "down"}


def test_exclude(rand_box):
    lo, hi = rand_box
    w = NoSlipWalls(lo, hi, exclude=["up"])
    assert len(w) == 3
    assert "up" not in w.get_walls_names()


def test_normals_from_geometry(rand_box):
    """Normal axis computed via the cross-product rule
    (reference nswalls.py:249-267)."""
    lo, hi = rand_box
    w = NoSlipWalls(lo, hi)
    assert w.get_wall_normal_by_side_name("left") == 0
    assert w.get_wall_normal_by_side_name("right") == 0
    assert w.get_wall_normal_by_side_name("up") == 1
    assert w.get_wall_normal_by_side_name("down") == 1


def test_static_walls_initially(rand_box):
    lo, hi = rand_box
    w = NoSlipWalls(lo, hi)
    assert set(w.get_static_walls()) == {"left", "right", "up", "down"}
    assert w.get_walls_with_velocity() == []
    # every dof static on every wall
    for side in w.get_walls_names():
        assert w.get_static_dofs_by_name(side) == [0, 1]


def test_set_wall_velocity(rand_box):
    """Nonzero components move from static to velocity dofs
    (reference nswalls.py:201-215)."""
    lo, hi = rand_box
    w = NoSlipWalls(lo, hi)
    w.set_wall_velocity("up", [1.5, 0.0])
    vals, dofs = w.get_wall_velocity("up")
    np.testing.assert_allclose(vals, [1.5])
    assert dofs == [0]
    assert w.get_static_dofs_by_name("up") == [1]
    assert w.get_walls_with_velocity() == ["up"]
    assert "up" not in w.get_static_walls()


def test_static_wall_velocity_is_zero(rand_box):
    lo, hi = rand_box
    w = NoSlipWalls(lo, hi)
    vals, dofs = w.get_wall_velocity("down")
    assert list(vals) == [0, 0]
    assert dofs == [0, 1]


def test_invalid_velocity_raises(rand_box):
    lo, hi = rand_box
    w = NoSlipWalls(lo, hi)
    with pytest.raises(ValueError):
        w.get_wall_by_side_name("left").set_wall_velocity([0.0, 0.0])


def test_3d_walls():
    w = NoSlipWalls([0, 0, 0], [1, 2, 3])
    assert len(w) == 6
    assert w.get_wall_normal_by_side_name("back") == 2
    assert w.get_wall_normal_by_side_name("front") == 2
    assert w.get_static_dofs_by_name("left") == [0, 1, 2]
    w.set_wall_velocity("up", [1.0, 0.0, 0.5])
    vals, dofs = w.get_wall_velocity("up")
    np.testing.assert_allclose(vals, [1.0, 0.5])
    assert dofs == [0, 2]
