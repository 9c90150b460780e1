"""Analytic solution fields (verification oracles).

Mirrors reference `src/functions/` (taylor_green.py, taylor_green3d.py,
taylor_green_3d.py) plus the senoidal and flat-plate fields embedded in
`src/cases/custom_func.py:116-180`, written with jax.numpy so they can be
evaluated inside jit with a traced time/alpha.

Field signature convention (reference `base_problem.py:193-204`):
  alpha(nu, t) -> scalar decay factor
  velocity(coords, alpha)   -> (n, dim)
  vorticity(coords, alpha)  -> (n, dim_w)
  convective(coords, alpha) -> (n, dim_w)   (where defined)
  diffusive(coords, alpha)  -> (n, dim_w)   (where defined)

Unlike the reference (which flattens), these return (n, comps) arrays to match
the framework's field layout.
"""
from pynama_tpu.functions import (taylor_green, taylor_green3d,
                                  taylor_green_2d3d, senoidal, flat_plate)

REGISTRY = {
    "taylor_green": taylor_green,
    "taylor_green3d": taylor_green3d,
    # reference file name: taylor_green_3d.py (2D flow embedded in 3D)
    "taylor_green_3d": taylor_green_2d3d,
    "taylor_green_2d3d": taylor_green_2d3d,
    "senoidal": senoidal,
    "flat_plate": flat_plate,
}


def get_function_lib(name: str):
    try:
        return REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown analytic function library '{name}'; "
                       f"available: {sorted(REGISTRY)}")
