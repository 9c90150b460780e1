"""Lagrangian<->Eulerian interpolation (the IBM H/S matrices).

TPU-native redesign of the reference's PETSc AIJ machinery
(`src/cases/immersed_boundary.py:170-246`): on the structured GLL grid, each
Lagrangian node's Eulerian support is a FIXED (K x K) window of grid nodes
found by per-axis binary search, so H is a static-shape (L, K^2) index +
weight table instead of a dynamically preallocated sparse matrix. Because H
acts identically on each velocity component, the normal matrix A = H S is
kron(C, I_dim) with a tiny dense (L, L) core C — assembled and
Cholesky-factored on device, so the dynamic case's rebuild-per-step
(`immersed_boundary.py:366-385`) is a fixed-shape jittable recompute, not a
matrix-structure change.

Scalings mirror the reference exactly (`immersed_boundary.py:199-205`):
    H *= h^2,  S = H^T * (dl*h)  =>  C = h^3 * dl * (W W^T overlap sums).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pynama_tpu.ibm.bodies import KERNELS, KERNEL_SUPPORT

#: per-axis window width (covers the 4-cell kernel's [-2h, 2h] support on
#: the uniform ngl<=3 spacing the reference restricts IBM to)
KSIDE = 5


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IBMOps:
    """Static grid-side tables for the interpolation."""
    axis_x: jax.Array        # (npx,) grid coordinates, axis 0
    axis_y: jax.Array        # (npy,)
    h: jax.Array             # node separation (0-d)
    dl: jax.Array            # body arclength spacing (0-d)
    kernel: str = dataclasses.field(metadata=dict(static=True))

    @property
    def n_nodes(self):
        return self.axis_x.shape[0] * self.axis_y.shape[0]


def make_ibm_ops(mesh, dl, kernel="fourGrid", dtype=jnp.float32) -> IBMOps:
    assert mesh.dim == 2, "IBM implemented for 2D (as the reference)"
    ax = [jnp.asarray(a, dtype=dtype) for a in mesh.axis_coords]
    return IBMOps(axis_x=ax[0], axis_y=ax[1],
                  h=jnp.asarray(mesh.node_separation(), dtype=dtype),
                  dl=jnp.asarray(dl, dtype=dtype), kernel=kernel)


def support_tables(ops: IBMOps, body_xy: jax.Array):
    """(L, K^2) Euler node ids + dirac weights for Lagrangian points.

    Pure jnp (jittable) — the dynamic case recomputes this every step with
    the same shapes (reference rebuildMatrix, immersed_boundary.py:379-385).
    """
    phi = KERNELS[ops.kernel]
    half = KSIDE // 2

    def axis_window(axis_coords, x):
        n = axis_coords.shape[0]
        i = jnp.searchsorted(axis_coords, x)
        i0 = jnp.clip(i - half - 1, 0, n - KSIDE)
        idx = i0[:, None] + jnp.arange(KSIDE)[None, :]      # (L, K)
        d = jnp.abs(axis_coords[idx] - x[:, None]) / ops.h
        w = phi(d) / ops.h
        return idx, w

    ix, wx = axis_window(ops.axis_x, body_xy[:, 0])
    iy, wy = axis_window(ops.axis_y, body_xy[:, 1])
    npy = ops.axis_y.shape[0]
    nodes = ix[:, :, None] * npy + iy[:, None, :]           # (L, K, K)
    w = wx[:, :, None] * wy[:, None, :]
    L = body_xy.shape[0]
    return nodes.reshape(L, KSIDE * KSIDE), w.reshape(L, KSIDE * KSIDE)


def interp_H(ops: IBMOps, nodes, w, vel_nodal: jax.Array) -> jax.Array:
    """H . vel: (n_nodes, 2) -> (L, 2), including the h^2 row scaling."""
    ve = vel_nodal[nodes]                 # (L, K2, 2)
    return jnp.einsum("lk,lkc->lc", w, ve,
                      precision=jax.lax.Precision.HIGHEST) * ops.h ** 2


def spread_S(ops: IBMOps, nodes, w, flux: jax.Array,
             n_nodes: int) -> jax.Array:
    """S . flux: (L, 2) -> (n_nodes, 2), including the dl*h column scaling."""
    vals = w[:, :, None] * flux[:, None, :] * (ops.dl * ops.h)
    out = jnp.zeros((n_nodes, 2), dtype=flux.dtype)
    return out.at[nodes.reshape(-1)].add(
        vals.reshape(-1, 2), mode="drop")


def normal_core(ops: IBMOps, nodes, w) -> jax.Array:
    """C (L, L): the per-component core of A = H S = kron(C, I_2).

    C[l,m] = h^3 dl * sum_{k,k'} w_l[k] w_m[k'] [nodes match]."""
    eq = (nodes[:, None, :, None] == nodes[None, :, None, :])
    overlap = jnp.einsum("lk,mj,lmkj->lm", w, w, eq.astype(w.dtype),
                         precision=jax.lax.Precision.HIGHEST)
    return overlap * ops.h ** 3 * ops.dl


def correction(ops: IBMOps, nodes, w, chol, vel_nodal, body_vel, n_nodes):
    """One velocity correction (reference computeVelocityCorrection,
    immersed_boundary.py:162-168): solve C z = -(H v - v_body) per
    component, return (vel_correction, virtual_flux)."""
    rhs = interp_H(ops, nodes, w, vel_nodal) - body_vel
    flux = jax.scipy.linalg.cho_solve((chol, True), -rhs)
    corr = spread_S(ops, nodes, w, flux, n_nodes)
    return corr, flux
