"""Adaptive RK tests: tableau order conditions and controller behavior."""
import numpy as np
import numpy.testing as npt
import jax.numpy as jnp
import pytest

from pynama_tpu.solver.timestep import get_tableau, adaptive_solve, make_step


@pytest.mark.parametrize("name", ["5bs", "5dp"])
def test_order_conditions(name):
    """Order conditions up to order 5 for b, order 4 for embedded b."""
    tab = get_tableau(name)
    a, b, b2, c = tab.a, tab.b, tab.b_emb, tab.c

    def check(bv, order):
        npt.assert_allclose(bv.sum(), 1.0, atol=1e-13)
        if order >= 2:
            npt.assert_allclose(bv @ c, 1 / 2, atol=1e-13)
        if order >= 3:
            npt.assert_allclose(bv @ c**2, 1 / 3, atol=1e-13)
            npt.assert_allclose(bv @ (a @ c), 1 / 6, atol=1e-13)
        if order >= 4:
            npt.assert_allclose(bv @ c**3, 1 / 4, atol=1e-13)
            npt.assert_allclose((bv * c) @ (a @ c), 1 / 8, atol=1e-13)
            npt.assert_allclose(bv @ (a @ c**2), 1 / 12, atol=1e-13)
            npt.assert_allclose(bv @ (a @ (a @ c)), 1 / 24, atol=1e-13)
        if order >= 5:
            npt.assert_allclose(bv @ c**4, 1 / 5, atol=1e-13)
            npt.assert_allclose((bv * c**2) @ (a @ c), 1 / 10, atol=1e-13)
            npt.assert_allclose(bv @ ((a @ c) ** 2), 1 / 20, atol=1e-13)
            npt.assert_allclose((bv * c) @ (a @ c**2), 1 / 15, atol=1e-13)
            npt.assert_allclose(bv @ (a @ c**3), 1 / 20, atol=1e-13)
            npt.assert_allclose((bv * c) @ (a @ (a @ c)), 1 / 30, atol=1e-13)
            npt.assert_allclose(bv @ ((a * c[None, :]) @ (a @ c)), 1 / 40,
                                atol=1e-13)
            npt.assert_allclose(bv @ (a @ (a @ c**2)), 1 / 60, atol=1e-13)
            npt.assert_allclose(bv @ (a @ (a @ (a @ c))), 1 / 120, atol=1e-13)

    check(b, tab.order)
    check(b2, tab.order_emb)


@pytest.mark.parametrize("name", ["5bs", "5dp"])
def test_scalar_ode_accuracy(name):
    """y' = -y integrated to t=1 hits exp(-1) within controller tolerance."""
    def rhs(t, y, aux):
        return -y, aux

    t, y, _, steps = adaptive_solve(rhs, 0.0, 1.0, jnp.array([1.0]), None,
                                    dt0=0.1, atol=1e-8, rtol=1e-8,
                                    tableau=name, jit=False)
    npt.assert_allclose(t, 1.0, atol=1e-12)
    npt.assert_allclose(float(y[0]), np.exp(-1.0), rtol=1e-7)
    assert steps > 0


def test_matchstep_endpoint():
    """MATCHSTEP: final time is hit exactly, never overshot."""
    times = []

    def rhs(t, y, aux):
        return 0.0 * y, aux

    def post(step, t, dt, y, aux):
        times.append(t)

    t, _, _, _ = adaptive_solve(rhs, 0.0, 0.37, jnp.array([1.0]), None,
                                dt0=0.1, post_step=post, jit=False)
    npt.assert_allclose(t, 0.37, atol=1e-14)
    assert max(times) <= 0.37 + 1e-14


def test_step_convergence_order():
    """Fixed-step error of the 5th-order update scales like dt^5."""
    tab = get_tableau("5bs")

    def rhs(t, y, aux):
        return jnp.array([y[0] * jnp.cos(t)]), aux

    attempt = make_step(rhs, tab, atol=1.0, rtol=0.0)
    errs = []
    for n in (8, 16):
        dt = 1.0 / n
        y = jnp.array([1.0])
        t = 0.0
        for _ in range(n):
            y = attempt(t, dt, y, None).y
            t += dt
        errs.append(abs(float(y[0]) - np.exp(np.sin(1.0))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 4.5, f"observed order {rate}"
