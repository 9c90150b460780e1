"""Grid-structured application of element operators on box meshes.

TPU-native fast path for the matrix-free operator application in
`ops/apply.py`. On a structured box mesh the element gather and the
direct-stiffness summation (the reference's PETSc scatter-add assembly /
MatMult, `src/matrices/mat_fs.py:174-189`, `base_problem.py:123-136`) are
tensor-product reindexings, so both become static strided slices, pads,
concats and reshapes — operations XLA lowers to cheap layout ops — instead
of generic gathers (which Mosaic/XLA lower to slow per-row dynamic gathers
on TPU; measured ~50x slower).

Pipeline per application:

    grid    : x (n_nodes, din) -> (np0, np1[, np2], din)      free reshape
    gather  : overlapping ngl-patches per axis                strided slices
    compute : (E, nnode*din) @ mat.T                          one MXU matmul
    DSS     : per-axis pad + block-reshape + add              no scatter

A node on an element-interface plane receives its neighbors' partial sums
through the per-axis "last local plane" shift-add; interior nodes are a pure
reshape. All shapes static.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridOp:
    """Element-local dense operator on a structured box grid.

    mat layout matches ElementOp: row = a*dout + c_out, col = b*din + c_in
    with a, b tensor-ordered local nodes (axis 0 slowest).
    """
    mat: jax.Array          # (nnode*dout, nnode*din) shared element matrix
    ngl: int = dataclasses.field(metadata=dict(static=True))
    nelem: tuple = dataclasses.field(metadata=dict(static=True))
    din: int = dataclasses.field(metadata=dict(static=True))
    dout: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dim(self):
        return len(self.nelem)

    @property
    def npts(self):
        return tuple(n * (self.ngl - 1) + 1 for n in self.nelem)

    @property
    def n_nodes(self):
        return int(np.prod(self.npts))

    @property
    def n_cells(self):
        return int(np.prod(self.nelem))

    @property
    def nnode_el(self):
        return self.ngl ** self.dim


def make_grid_op(mat, ngl, nelem, din, dout, dtype=None) -> GridOp:
    return GridOp(mat=jnp.asarray(mat, dtype=dtype), ngl=int(ngl),
                  nelem=tuple(int(n) for n in nelem),
                  din=int(din), dout=int(dout))


def _gather_axis(g: jax.Array, axis: int, ne: int, N: int) -> jax.Array:
    """Split overlapping length-N windows (stride N-1) along `axis`.

    g: (..., np_ax, ...) -> (..., ne, N, ...) with window i starting at
    i*(N-1).
    """
    lead = g.shape[:axis]
    trail = g.shape[axis + 1:]
    sl = [slice(None)] * g.ndim
    sl[axis] = slice(0, ne * (N - 1))
    body = g[tuple(sl)].reshape(lead + (ne, N - 1) + trail)
    sl[axis] = slice(N - 1, None, N - 1)
    last = g[tuple(sl)]  # (..., ne, ...) strided slice
    last = last.reshape(lead + (ne, 1) + trail)
    return jnp.concatenate([body, last], axis=axis + 1)


def _dss_axis(t: jax.Array, axis: int, ne: int, N: int) -> jax.Array:
    """Direct-stiffness sum along one axis: (..., ne, N, ...) -> (..., np_ax,
    ...) adding the overlapping window contributions (inverse of
    _gather_axis up to summation of duplicates)."""
    lead = t.shape[:axis]
    trail = t.shape[axis + 2:]
    np_ax = ne * (N - 1) + 1
    sl = [slice(None)] * t.ndim
    sl[axis + 1] = slice(0, N - 1)
    body = t[tuple(sl)]                          # (..., ne, N-1, ...)
    sl[axis + 1] = N - 1
    last = t[tuple(sl)]                          # (..., ne, ...)
    pad_b = [(0, 0)] * t.ndim
    pad_b[axis] = (0, 1)                         # extra block row
    body = jnp.pad(body, pad_b)                  # (..., ne+1, N-1, ...)
    last = last.reshape(lead + (ne, 1) + trail)
    pad_l = [(0, 0)] * t.ndim
    pad_l[axis] = (1, 0)
    pad_l[axis + 1] = (0, N - 2)
    last = jnp.pad(last, pad_l)                  # (..., ne+1, N-1, ...)
    full = (body + last).reshape(lead + ((ne + 1) * (N - 1),) + trail)
    sl2 = [slice(None)] * (len(lead) + 1 + len(trail))
    sl2[axis] = slice(0, np_ax)
    return full[tuple(sl2)]


def grid_gather(op: GridOp, x: jax.Array) -> jax.Array:
    """x (n_nodes, din) -> (E, nnode_el*din) element-local interleaved."""
    N, dim = op.ngl, op.dim
    g = x.reshape(op.npts + (op.din,))
    # interleave axes: gather axis d inserts local axis right after grid
    # axis d; process from the last axis backwards so indices stay valid.
    for d in range(dim - 1, -1, -1):
        g = _gather_axis(g, d, op.nelem[d], N)
    # g: (e0, N, e1, N[, e2, N], din) -> (e0, e1[, e2], N, N[, N], din)
    perm = tuple(2 * d for d in range(dim)) + \
        tuple(2 * d + 1 for d in range(dim)) + (2 * dim,)
    g = g.transpose(perm)
    return g.reshape(op.n_cells, op.nnode_el * op.din)


def grid_dss(op: GridOp, ze: jax.Array) -> jax.Array:
    """ze (E, nnode_el*dout) element contributions -> (n_nodes, dout)."""
    N, dim = op.ngl, op.dim
    g = ze.reshape(op.nelem + (N,) * dim + (op.dout,))
    perm = []
    for d in range(dim):
        perm += [d, dim + d]
    perm.append(2 * dim)
    g = g.transpose(perm)  # (e0, N, e1, N[, e2, N], dout)
    for d in range(dim):
        # collapsing pair d shifts later (ne, N) pairs left by one, so the
        # d-th remaining pair always sits at axis position d
        g = _dss_axis(g, d, op.nelem[d], N)
    return g.reshape(op.n_nodes, op.dout)


def apply_grid_op(op: GridOp, x: jax.Array) -> jax.Array:
    """y = A x for the assembled operator A, grid-structured matrix-free."""
    xe = grid_gather(op, x)
    ze = xe @ op.mat.T
    return grid_dss(op, ze)


def grid_diagonal(op: GridOp) -> jax.Array:
    """Diagonal of the assembled square operator, (n_nodes, dout)."""
    assert op.din == op.dout
    de = jnp.tile(jnp.diagonal(op.mat)[None, :], (op.n_cells, 1))
    return grid_dss(op, de)
