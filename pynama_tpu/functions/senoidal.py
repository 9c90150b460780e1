"""Sinusoidal 2D verification field
(reference src/cases/custom_func.py:116-151, senoidal*)."""
import jax.numpy as jnp
from math import pi

DIM = 2
WREF_X = 4.0
WREF_Y = 2.0


def alpha(nu, t):
    return 1.0


def velocity(coords, alpha=1.0):
    x = WREF_Y * pi * coords[:, 1]
    y = WREF_X * pi * coords[:, 0]
    return jnp.stack([jnp.sin(x), jnp.sin(y)], axis=1)


def vorticity(coords, alpha=1.0):
    x = WREF_Y * pi * coords[:, 1]
    y = WREF_X * pi * coords[:, 0]
    w = WREF_X * pi * jnp.cos(y) - WREF_Y * pi * jnp.cos(x)
    return w[:, None]


def convective(coords, alpha=1.0):
    x = WREF_Y * pi * coords[:, 1]
    y = WREF_X * pi * coords[:, 0]
    c = ((WREF_Y * pi) ** 2 - (WREF_X * pi) ** 2) * jnp.sin(x) * jnp.sin(y)
    return c[:, None]


def diffusive(coords, alpha=1.0, nu=1.0):
    x = WREF_Y * pi * coords[:, 1]
    y = WREF_X * pi * coords[:, 0]
    d = -(WREF_X * pi) ** 3 * jnp.cos(y) + (WREF_Y * pi) ** 3 * jnp.cos(x)
    return nu * d[:, None]
