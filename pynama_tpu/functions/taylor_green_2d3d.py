"""2D Taylor-Green flow embedded in a 3D domain
(reference src/functions/taylor_green_3d.py)."""
import jax.numpy as jnp
from math import pi

DIM = 3
LX = LY = 1.0
UREF = 1.0


def alpha(nu, t):
    return UREF * jnp.exp(-4 * pi**2 * nu * t * (1 / LX**2 + 1 / LY**2))


def velocity(coords, alpha=1.0):
    x = 2 * pi * coords[:, 0] / LX
    y = 2 * pi * coords[:, 1] / LY
    z = jnp.zeros_like(x)
    return jnp.stack([jnp.cos(x) * jnp.sin(y) * LX * alpha,
                      -jnp.sin(x) * jnp.cos(y) * LY * alpha, z], axis=1)


def vorticity(coords, alpha=1.0):
    x = 2 * pi * coords[:, 0] / LX
    y = 2 * pi * coords[:, 1] / LY
    wz = -2 * pi * (LY / LX + LX / LY) * jnp.cos(x) * jnp.cos(y) * alpha
    zero = jnp.zeros_like(wz)
    return jnp.stack([zero, zero, wz], axis=1)


def convective(coords, alpha=1.0):
    return jnp.zeros((coords.shape[0], 3))


def diffusive(coords, alpha=1.0, nu=1.0):
    return -8 * pi**2 * nu * vorticity(coords, alpha)
