"""The round-4 CG loop optimization must be exactly equivalence-preserving.

local_engine._masked_solve drops the in-loop input mask and `con*v`
passthrough (solver/cg.py pcg A0 parameter) on the argument that every
loop iterate is exactly zero on constrained dofs. These tests pin that
argument numerically: the optimized solve must match the full-masked
solve to f64 round-off, iteration count INCLUDED (same Krylov space =>
same trajectory), on a genuinely mixed free/constrained system.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pynama_tpu.solver.cg import pcg


def _random_spd(n, rng, cond=1e4):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.geomspace(1.0, cond, n)
    return (Q * lam) @ Q.T


@pytest.mark.parametrize("n_con", [0, 7])
def test_a0_split_matches_full_masked_solve(n_con):
    rng = np.random.default_rng(3)
    n = 60
    K = jnp.asarray(_random_spd(n, rng))
    free_np = np.ones(n)
    if n_con:
        free_np[rng.choice(n, size=n_con, replace=False)] = 0.0
    free = jnp.asarray(free_np)
    con = 1.0 - free
    vel = jnp.asarray(rng.standard_normal(n))   # carries bc values
    rhs = jnp.asarray(rng.standard_normal(n))

    vc = con * vel
    b = free * (rhs - K @ vc) + vc
    x0 = free * vel + vc
    diag = jnp.diagonal(K)
    dmask = free * diag + con
    M_inv = lambda r: r / dmask

    def A_full(v):
        return free * (K @ (free * v)) + con * v

    def A_loop(v):
        return free * (K @ v)

    ref = pcg(A_full, b, x0, M_inv=M_inv, rtol=1e-12, maxiter=500)
    opt = pcg(A_loop, b, x0, M_inv=M_inv, rtol=1e-12, maxiter=500,
              A0=A_full)

    assert int(opt.iters) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(opt.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-12)
    # constrained dofs must come out exactly as the boundary values
    np.testing.assert_array_equal(np.asarray(opt.x)[free_np == 0],
                                  np.asarray(vel)[free_np == 0])


def test_loop_iterates_stay_zero_on_constrained():
    """The invariant itself: run the optimized solve and check the final
    residual is zero on constrained dofs (it is a loop-linear combination
    of iterates, so nonzero would falsify the invariant)."""
    rng = np.random.default_rng(5)
    n = 40
    K = jnp.asarray(_random_spd(n, rng))
    free_np = np.ones(n)
    free_np[:9] = 0.0
    free = jnp.asarray(free_np)
    con = 1.0 - free
    vel = jnp.asarray(rng.standard_normal(n))
    rhs = jnp.asarray(rng.standard_normal(n))
    vc = con * vel
    b = free * (rhs - K @ vc) + vc
    x0 = free * vel + vc

    def A_full(v):
        return free * (K @ (free * v)) + con * v

    def A_loop(v):
        return free * (K @ v)

    res = pcg(A_loop, b, x0, rtol=1e-10, maxiter=500, A0=A_full)
    r = np.asarray(b - A_full(res.x))
    assert np.max(np.abs(r[free_np == 0])) == 0.0
