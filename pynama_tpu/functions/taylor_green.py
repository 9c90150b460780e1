"""2D Taylor-Green vortex (reference src/functions/taylor_green.py).

The reference leaves convective/diffusive as `pass` (taylor_green.py:48-52);
they are derived here: for the 2D Taylor-Green vortex the convective term
v . grad(w) vanishes identically, and lap(w) = -8 pi^2 w (Lx = Ly = 1).
"""
import jax.numpy as jnp
from math import pi

DIM = 2
LX = LY = 1.0
UREF = 1.0


def alpha(nu, t):
    return UREF * jnp.exp(-4 * pi**2 * nu * t * (1 / LX**2 + 1 / LY**2))


def velocity(coords, alpha=1.0):
    x = 2 * pi * coords[:, 0] / LX
    y = 2 * pi * coords[:, 1] / LY
    return jnp.stack([jnp.cos(x) * jnp.sin(y) * alpha,
                      -jnp.sin(x) * jnp.cos(y) * alpha], axis=1)


def vorticity(coords, alpha=1.0):
    x = 2 * pi * coords[:, 0] / LX
    y = 2 * pi * coords[:, 1] / LY
    w = -2 * pi * (1 / LX + 1 / LY) * jnp.cos(x) * jnp.cos(y) * alpha
    return w[:, None]


def convective(coords, alpha=1.0):
    """curl(div(v (x) v)) = v . grad(w) = 0 for the 2D TG vortex."""
    return jnp.zeros((coords.shape[0], 1))


def diffusive(coords, alpha=1.0, nu=1.0):
    """nu * lap(w) = -8 pi^2 nu w."""
    return -8 * pi**2 * nu * vorticity(coords, alpha)
