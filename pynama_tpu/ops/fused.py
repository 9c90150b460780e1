"""Fused element-matmul + DSS Pallas kernel for structured box meshes.

The element-local operator application ``y = DSS(x @ matT)`` (the
matrix-free analog of the reference's assembled PETSc MatMult,
`src/matrices/mat_fs.py:131-201`) is HBM-bandwidth bound on TPU: the jnp
path materializes the matmul output plus one full read-modify-write pass
per mesh axis (interface-plane adds + layout rotation), ~6 full-array HBM
passes total. This kernel does the whole thing in ONE pass over HBM:

  * grid over axis-0 element slices; each (ne1*ne2, nnc) block is DMA'd
    to VMEM once and the result written once;
  * the element matmul runs on the MXU per slice;
  * the in-slice exchanges (mesh axes 1..dim-1) are masked circular
    rolls on the VMEM block: a sublane roll moves data between neighbor
    elements, a lane roll moves it between the local node slots
    (a_d = 0 <-> a_d = N-1), and iota masks kill the wrap-around
    artifacts (every circularly wrapped row/column lands outside the
    destination plane by construction);
  * the axis-0 exchange pipelines across grid steps: step i computes
    slice i's partial (axes 1..d-1 assembled) into a ping-pong VMEM
    scratch and FINALIZES slice i-1, which needs its left neighbor's raw
    last plane (kept in a small plane scratch) and its right neighbor's
    raw first plane (just computed). The grid has ne0+1 steps; output
    block i-1 is revisited at steps i-1 and i, so Pallas flushes it to
    HBM only once complete.

The kernel additionally returns the slab's two raw axis-0 boundary planes
(axes 1..d-1 assembled, axis-0 adds NOT applied) — exactly what a
neighboring shard must add under the slab decomposition, so the sharded
path can ppermute them and accumulate (the ICI analog of PETSc's
VecScatter inside a distributed MatMult, SURVEY §2.3).

Numerics match `L.dss(L.emm(t, matT))` up to f.p. summation order; the
matmul uses Precision.HIGHEST like the jnp path (ops/local.py:38-42).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _inblock_axes(nelem: Sequence[int], ngl: int, ncomp: int):
    """Static per-axis exchange parameters for the in-slice axes
    d = 1..dim-1 of the canonical layout (node = a0*N^{dim-1} + ...,
    column = node*ncomp + comp; slice rows = elements (e1[, e2])
    row-major): (d, row_stride, col_shift, ne_d)."""
    dim = len(nelem)
    N = ngl
    out = []
    for d in range(1, dim):
        row_stride = int(np.prod(nelem[d + 1:]))
        col_shift = (N - 1) * (N ** (dim - 1 - d)) * ncomp
        out.append((d, row_stride, col_shift, int(nelem[d])))
    return out


def _axis_masks(R, nnc, nelem, ngl, ncomp, d, dtype):
    """(R, nnc) {0,1} destination masks for the axis-d in-slice exchange:
    (valid neighbor exists) x (destination node plane a_d = N-1 / 0)."""
    dim = len(nelem)
    N = ngl
    row_stride = int(np.prod(nelem[d + 1:]))
    ne_d = int(nelem[d])
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, nnc), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, nnc), 1)
    e_d = (rows // row_stride) % ne_d
    node = cols // ncomp
    a_d = (node // (N ** (dim - 1 - d))) % N
    m_next = ((e_d < ne_d - 1) & (a_d == N - 1)).astype(dtype)
    m_prev = ((e_d > 0) & (a_d == 0)).astype(dtype)
    return m_next, m_prev


def _fused_kernel(nelem, ngl, ncomp_out, dtype,
                  t_ref, m_ref, out_ref, bnd_ref, u_scr, last_scr,
                  mask_scr):
    dim = len(nelem)
    N = ngl
    ne0 = int(nelem[0])
    R = int(np.prod(nelem[1:]))
    nnc = N ** dim * ncomp_out
    plane = (N ** (dim - 1)) * ncomp_out
    i = pl.program_id(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    prev_slot = 1 - slot
    live_axes = [a for a in _inblock_axes(nelem, N, ncomp_out)
                 if a[3] > 1]

    # destination masks once per kernel launch (iota int div/mod is
    # multi-cycle VPU work — 2*dim (R, nnc) buffers beat recomputing
    # them on all ne0 grid steps)
    @pl.when(i == 0)
    def _masks():
        for k, (d, _, _, _) in enumerate(live_axes):
            m_next, m_prev = _axis_masks(R, nnc, nelem, N, ncomp_out,
                                         d, dtype)
            mask_scr[2 * k] = m_next
            mask_scr[2 * k + 1] = m_prev

    @pl.when(i < ne0)
    def _compute():
        u = jnp.dot(t_ref[:], m_ref[:],
                    preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST)
        for k, (d, row_stride, col_shift, ne_d) in enumerate(live_axes):
            # pltpu.roll requires non-negative shifts: normalize mod
            # the axis size (circular semantics are identical; masks
            # kill every wrapped row/column)
            nxt = pltpu.roll(pltpu.roll(u, (R - row_stride) % R, 0),
                             col_shift % nnc, 1)
            prv = pltpu.roll(pltpu.roll(u, row_stride % R, 0),
                             (nnc - col_shift) % nnc, 1)
            u = u + nxt * mask_scr[2 * k] + prv * mask_scr[2 * k + 1]
        u_scr[slot] = u
        # raw first plane of slice 0 = what the LEFT shard neighbor adds
        @pl.when(i == 0)
        def _():
            bnd_ref[0] = u[:, :plane]

    @pl.when(i >= 1)
    def _finalize():
        z = u_scr[prev_slot]                     # u_{i-1}, pre-axis-0
        new_last = z[:, nnc - plane:]            # raw: save before adds
        # left neighbor's raw last plane (only exists for i-1 >= 1)
        zfirst = z[:, :plane] + jnp.where(i >= 2, last_scr[:], 0.0)
        # right neighbor's raw first plane (only exists when computed)
        zlast = new_last + jnp.where(i < ne0, u_scr[slot][:, :plane], 0.0)
        out_ref[:, :plane] = zfirst
        if nnc > 2 * plane:
            out_ref[:, plane:nnc - plane] = z[:, plane:nnc - plane]
        out_ref[:, nnc - plane:] = zlast
        last_scr[:] = new_last
        # raw last plane of the final slice = RIGHT shard neighbor's add
        @pl.when(i == ne0)
        def _():
            bnd_ref[1] = new_last


@functools.partial(jax.jit, static_argnames=("nelem", "ngl", "ncomp_out",
                                             "interpret"))
def fused_apply(t: jax.Array, matT: jax.Array, nelem: tuple, ngl: int,
                ncomp_out: int, interpret: bool = False):
    """y = DSS(t @ matT) on the canonical element-local layout of a box
    mesh, one HBM pass. Returns (y, bnd) with bnd the (2, R, plane) raw
    axis-0 boundary planes for cross-shard accumulation (ignore when
    unsharded: the in-shard axis-0 adds are already applied in y).
    """
    dim = len(nelem)
    ne0 = int(nelem[0])
    R = int(np.prod(nelem[1:]))
    nnc_in = t.shape[1]
    nnc_out = ngl ** dim * ncomp_out
    plane = (ngl ** (dim - 1)) * ncomp_out
    dtype = t.dtype

    kernel = functools.partial(_fused_kernel, tuple(nelem), ngl,
                               ncomp_out, dtype)
    out, bnd = pl.pallas_call(
        kernel,
        grid=(ne0 + 1,),
        in_specs=[
            pl.BlockSpec((R, nnc_in),
                         lambda i: (jnp.minimum(i, ne0 - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nnc_in, nnc_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, nnc_out),
                         lambda i: (jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R, plane), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ne0 * R, nnc_out), dtype),
            jax.ShapeDtypeStruct((2, R, plane), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, R, nnc_out), dtype),
            pltpu.VMEM((R, plane), dtype),
            pltpu.VMEM((max(2 * (dim - 1), 1), R, nnc_out), dtype),
        ],
        interpret=interpret,
    )(t, matT)
    return out, bnd
