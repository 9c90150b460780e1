"""GMRES unit + integration tests (KSP-GMRES parity, kle_solver.py:54-64)."""
import numpy as np
import numpy.testing as npt
import jax
import jax.numpy as jnp

from pynama_tpu.cases import Problem
from pynama_tpu.solver.gmres import gmres
from tests.test_solver import tg_config, uniform_config


def test_gmres_spd():
    rng = np.random.default_rng(0)
    n = 40
    B = rng.standard_normal((n, n))
    A = B @ B.T + n * np.eye(n)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = gmres(lambda v: Aj @ v, jnp.asarray(b), jnp.zeros(n), rtol=1e-12)
    npt.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                        rtol=1e-8, atol=1e-10)


def test_gmres_nonsymmetric_restarted():
    """Non-symmetric system, forced through multiple restart cycles."""
    rng = np.random.default_rng(1)
    n = 90
    A = np.eye(n) + 0.4 * rng.standard_normal((n, n)) / np.sqrt(n)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = gmres(lambda v: Aj @ v, jnp.asarray(b), jnp.zeros(n),
                rtol=1e-12, restart=20, maxiter=500)
    npt.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                        rtol=1e-7, atol=1e-9)


def test_gmres_preconditioned_2d_shape():
    """Left preconditioning + (n, dim)-shaped unknowns (the KLE layout)."""
    rng = np.random.default_rng(2)
    n = 30
    B = rng.standard_normal((2 * n, 2 * n))
    A = B @ B.T + 2 * n * np.eye(2 * n)
    d = jnp.asarray(np.diag(A))
    b = rng.standard_normal((n, 2))
    Aj = jnp.asarray(A)

    def Af(v):
        return (Aj @ v.ravel()).reshape(n, 2)

    def M_inv(r):
        return (r.ravel() / d).reshape(n, 2)

    res = gmres(Af, jnp.asarray(b), jnp.zeros((n, 2)), M_inv=M_inv,
                rtol=1e-12)
    npt.assert_allclose(np.asarray(res.x).ravel(),
                        np.linalg.solve(A, b.ravel()), rtol=1e-8, atol=1e-10)


def test_gmres_under_jit():
    rng = np.random.default_rng(3)
    n = 24
    B = rng.standard_normal((n, n))
    A = jnp.asarray(B @ B.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))

    @jax.jit
    def solve(A, b):
        return gmres(lambda v: A @ v, b, jnp.zeros(n), rtol=1e-12).x

    npt.assert_allclose(np.asarray(solve(A, b)),
                        np.linalg.solve(np.asarray(A), np.asarray(b)),
                        rtol=1e-8, atol=1e-10)


def test_kle_solver_gmres_uniform():
    """Uniform flow to 1e-10 with solver='gmres' through the full stack."""
    p = Problem(uniform_config(), solver="gmres")
    p.setUp()
    vort = jnp.zeros((p.mesh.n_nodes, 1))
    _, vel = p.solve_kle(vort, p.vel, 0.0)
    exact = np.tile([4.0, 0.0], (p.mesh.n_nodes, 1))
    assert np.linalg.norm(np.asarray(vel) - exact) < 1e-10


def test_kle_solver_gmres_matches_direct():
    pd = Problem(tg_config(nelem=(4, 4), ngl=4), solver="direct")
    pd.setUp()
    pg = Problem(tg_config(nelem=(4, 4), ngl=4), solver="gmres")
    pg.setUp()
    _, ew = pd.exact_fields(0.1)
    _, v1 = pd.solve_kle(ew, pd.vel, 0.1)
    _, v2 = pg.solve_kle(ew, pg.vel, 0.1)
    npt.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-7)
