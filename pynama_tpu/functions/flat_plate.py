"""Impulsively-started flat plate (Stokes' first problem) fields
(reference src/cases/custom_func.py:153-180, flatplate*).

alpha here carries (t, nu) via tau = sqrt(4 nu t); the fields need both, so
alpha(nu, t) returns tau and the fields take tau.
"""
import jax.numpy as jnp
from math import pi

DIM = 2
UREF = 1.0


def alpha(nu, t):
    return jnp.sqrt(4.0 * nu * t)


def velocity(coords, alpha):
    tau = alpha
    vx = UREF * jax_erf(coords[:, 1] / tau)
    vy = jnp.ones_like(vx)
    return jnp.stack([vx, vy], axis=1)


def vorticity(coords, alpha):
    tau = alpha
    w = (-2.0 / (tau * jnp.sqrt(pi))) * jnp.exp(-(coords[:, 1] / tau) ** 2)
    return w[:, None]


def convective(coords, alpha):
    tau = alpha
    c = (4.0 * coords[:, 1] / (jnp.sqrt(pi) * tau**3)) \
        * jnp.exp(-(coords[:, 1] / tau) ** 2)
    return c[:, None]


def diffusive(coords, alpha, nu=1.0):
    tau = alpha
    a = 4.0 / (jnp.sqrt(pi) * tau**3)
    b = 1.0 - 2.0 * coords[:, 1] ** 2 / tau**2
    d = nu * a * b * jnp.exp(-(coords[:, 1] / tau) ** 2)
    return d[:, None]


def jax_erf(x):
    import jax.scipy.special as jsp
    return jsp.erf(x)
