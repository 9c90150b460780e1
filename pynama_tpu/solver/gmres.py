"""Restarted GMRES(m) under `lax.while_loop` — the KSP-GMRES analog.

The reference's default Krylov method is GMRES with an LU preconditioner
(`src/solver/kle_solver.py:54-64`); CG is the better fit for the SPD KLE
operator (`solver/cg.py`), but GMRES is kept as a first-class method for
non-symmetric systems (e.g. user-supplied operators, future convective
implicit solves) and for KSP parity.

Design notes (fixed shapes, compiler-friendly):
  * left preconditioning; convergence measured in the preconditioned
    residual norm, matching PETSc's left-PC GMRES default.
  * one restart cycle = a `lax.while_loop` over Arnoldi steps (modified
    Gram-Schmidt against a fixed (m+1)-slot basis with an i<=j mask),
    Givens-rotation QR of the Hessenberg column, early exit on convergence.
  * the small (m x m) triangular solve pads unused rows with a unit
    diagonal and zero rhs, so the solve is full-size and static.
  * the inner product is pluggable (`dot=`) so the slab-sharded engine can
    pass its ownership-masked psum dot (same contract as `cg.pcg`).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class GMRESResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    residual: jax.Array


def _vdot(a, b):
    return jnp.vdot(a.ravel(), b.ravel(),
                    precision=jax.lax.Precision.HIGHEST)


def gmres(A: Callable, b: jax.Array, x0: jax.Array,
          M_inv: Callable | None = None, rtol: float = 1e-12,
          atol: float = 0.0, maxiter: int = 1000, restart: int = 30,
          dot: Callable | None = None) -> GMRESResult:
    """Solve A x = b with restarted, left-preconditioned GMRES(m).

    A and M_inv are linear callables on arrays of b's shape. Stopping:
    ||M^-1 r||_2 <= max(rtol * ||M^-1 b||_2, atol), capped at maxiter
    total Arnoldi steps.
    """
    if M_inv is None:
        M_inv = lambda r: r
    if dot is None:
        dot = _vdot

    m = int(restart)
    shape = b.shape
    dtype = b.dtype
    eps = jnp.finfo(dtype).tiny

    bnorm = jnp.sqrt(dot(M_inv(b), M_inv(b)))
    tol = jnp.maximum(rtol * bnorm, atol).astype(dtype)

    def cycle(x, it_total):
        """One GMRES(m) restart cycle from current iterate x."""
        r = M_inv(b - A(x))
        beta = jnp.sqrt(dot(r, r))
        V = jnp.zeros((m + 1,) + shape, dtype)
        V = V.at[0].set(r / jnp.maximum(beta, eps))
        R = jnp.zeros((m + 1, m), dtype)       # rotated Hessenberg columns
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def inner_cond(st):
            V, R, cs, sn, g, j, it = st
            return jnp.logical_and(
                j < m, jnp.logical_and(jnp.abs(g[j]) > tol, it < maxiter))

        def inner_body(st):
            V, R, cs, sn, g, j, it = st
            w = M_inv(A(V[j]))

            # modified Gram-Schmidt against V[0..j] (mask i<=j)
            def mgs(i, carry):
                w, h = carry
                keep = (i <= j).astype(dtype)
                hij = keep * dot(V[i], w)
                return (w - hij * V[i], h.at[i].set(hij))

            h = jnp.zeros(m + 1, dtype)
            w, h = jax.lax.fori_loop(0, m, mgs, (w, h))
            hlast = jnp.sqrt(dot(w, w))
            h = h.at[j + 1].set(hlast)
            V = V.at[j + 1].set(w / jnp.maximum(hlast, eps))

            # apply previous Givens rotations to the new column (mask k<j)
            def rot(k, h):
                keep = k < j
                t1 = cs[k] * h[k] + sn[k] * h[k + 1]
                t2 = -sn[k] * h[k] + cs[k] * h[k + 1]
                return h.at[k].set(jnp.where(keep, t1, h[k])) \
                        .at[k + 1].set(jnp.where(keep, t2, h[k + 1]))

            h = jax.lax.fori_loop(0, m, rot, h)

            # new rotation zeroing h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            c_j = jnp.where(denom > eps, h[j] / jnp.maximum(denom, eps), 1.0)
            s_j = jnp.where(denom > eps, h[j + 1] / jnp.maximum(denom, eps),
                            0.0)
            # on exact breakdown (denom<=eps: Krylov space exhausted) keep
            # the triangular solve nonsingular: unit diagonal, zero rhs so
            # y[j]=0 and x is unchanged by this column.
            ok = denom > eps
            h = h.at[j].set(jnp.where(ok, denom, 1.0)).at[j + 1].set(0.0)
            g = g.at[j + 1].set(-s_j * g[j]) \
                 .at[j].set(jnp.where(ok, c_j * g[j], 0.0))

            R = R.at[:, j].set(h)
            return (V, R.astype(dtype), cs.at[j].set(c_j), sn.at[j].set(s_j),
                    g, j + 1, it + 1)

        st = (V, R, cs, sn, g, jnp.array(0, jnp.int32), it_total)
        V, R, cs, sn, g, j, it = jax.lax.while_loop(inner_cond, inner_body,
                                                    st)

        # pad unused columns with a unit diagonal / zero rhs, solve R y = g
        k = jnp.arange(m)
        used = k < j
        Rsq = jnp.where(used[None, :] | used[:, None], R[:m, :],
                        jnp.eye(m, dtype=dtype))
        gm = jnp.where(used, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rsq, gm, lower=False)
        dx = jnp.tensordot(y, V[:m], axes=1)
        return x + dx, it, jnp.abs(g[j])

    def outer_cond(st):
        x, it, res = st
        return jnp.logical_and(res > tol, it < maxiter)

    def outer_body(st):
        x, it, _ = st
        return cycle(x, it)

    r0 = M_inv(b - A(x0))
    res0 = jnp.sqrt(dot(r0, r0))
    x, it, res = jax.lax.while_loop(
        outer_cond, outer_body,
        (x0, jnp.array(0, jnp.int32), res0.astype(dtype)))
    return GMRESResult(x=x, iters=it, residual=res)
