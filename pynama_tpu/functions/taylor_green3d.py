"""3D Taylor-Green-like vortex (reference src/functions/taylor_green3d.py)."""
import jax.numpy as jnp
from math import pi

DIM = 3
LX = LY = LZ = 1.0
UREF = 1.0


def alpha(nu, t):
    return UREF * jnp.exp(-4 * pi**2 * nu * t
                          * (1 / LX**2 + 1 / LY**2 + 1 / LZ**2))


def _angles(coords):
    return (2 * pi * coords[:, 0] / LX, 2 * pi * coords[:, 1] / LY,
            2 * pi * coords[:, 2] / LZ)


def velocity(coords, alpha=1.0):
    x, y, z = _angles(coords)
    return jnp.stack([
        jnp.cos(x) * jnp.sin(y) * jnp.sin(z) * LX * alpha,
        jnp.sin(x) * jnp.cos(y) * jnp.sin(z) * LY * alpha,
        -2 * jnp.sin(x) * jnp.sin(y) * jnp.cos(z) * LZ * alpha], axis=1)


def vorticity(coords, alpha=1.0):
    x, y, z = _angles(coords)
    return jnp.stack([
        -2 * pi * (LY / LZ + 2 * LZ / LY) * jnp.sin(x) * jnp.cos(y)
        * jnp.cos(z) * alpha,
        2 * pi * (LX / LZ + 2 * LZ / LX) * jnp.cos(x) * jnp.sin(y)
        * jnp.cos(z) * alpha,
        2 * pi * (LY / LX - LX / LY) * jnp.cos(x) * jnp.cos(y)
        * jnp.sin(z) * alpha], axis=1)


def convective(coords, alpha=1.0):
    x, y, z = _angles(coords)
    k = (2 * pi * alpha) ** 2
    return jnp.stack([
        -2 * (2 * LZ / LY + LY / LZ) * k * jnp.sin(y) * jnp.cos(y)
        * jnp.sin(z) * jnp.cos(z),
        2 * (2 * LZ / LX + LX / LZ) * k * jnp.sin(x) * jnp.cos(x)
        * jnp.sin(z) * jnp.cos(z),
        2 * (2 * LX / LY - 2 * LY / LX) * k * jnp.sin(y) * jnp.cos(y)
        * jnp.sin(x) * jnp.cos(x)], axis=1)


def diffusive(coords, alpha=1.0, nu=1.0):
    """nu * lap(w). The reference's module-level field
    (taylor_green3d.py:50-57) omits the nu factor carried by the solver's
    diffusive operator (base_problem.py:351-360); it is included here."""
    x, y, z = _angles(coords)
    k3 = (2 * pi) ** 3 * alpha * nu
    c1 = (2 * (LZ / (LX * LX * LY) + LZ / (LY**3) + LZ / (LZ * LZ * LY))
          + LY / (LX * LX * LZ) + LY / (LY * LY * LZ) + LY / (LZ**3))
    c2 = (2 * (LZ / (LX**3) + LZ / (LY * LY * LX) + LZ / (LZ * LZ * LX))
          + LX / (LX * LX * LZ) + LX / (LY * LY * LZ) + LX / (LZ**3))
    c3 = (LX / (LX * LX * LY) + LX / (LY**3) + LX / (LZ * LZ * LY)
          - LY / (LX**3) - LY / (LY * LY * LX) - LY / (LZ * LZ * LX))
    return jnp.stack([
        k3 * jnp.sin(x) * jnp.cos(y) * jnp.cos(z) * c1,
        -k3 * jnp.cos(x) * jnp.sin(y) * jnp.cos(z) * c2,
        k3 * jnp.cos(x) * jnp.cos(y) * jnp.sin(z) * c3], axis=1)
