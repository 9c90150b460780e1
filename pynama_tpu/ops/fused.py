"""Fused element-matmul + DSS Pallas kernel for structured box meshes.

The element-local operator application ``y = DSS(x @ matT)`` (the
matrix-free analog of the reference's assembled PETSc MatMult,
`src/matrices/mat_fs.py:131-201`) is HBM-bandwidth bound on TPU: the jnp
path materializes the matmul output plus one full read-modify-write pass
per mesh axis (interface-plane adds + layout rotation), ~6 full-array HBM
passes total. This kernel does the whole thing in ONE pass over HBM:

  * grid over BLOCKS of `blk` axis-0 element slices; each (blk*ne1*ne2,
    nnc) block is DMA'd to VMEM once and the result written once. Blocking
    matters: a measured decomposition at 24^3 ngl=4 showed the per-step
    pipeline overhead of slice-sized (576, nnc) steps costing +27 us over
    the XLA matmul — block-sized steps amortize it and feed the MXU
    full-height tiles;
  * the element matmul runs on the MXU per block;
  * ALL in-block exchanges — mesh axes 1..dim-1 AND the axis-0 interfaces
    interior to the block — are masked circular rolls on the VMEM block
    (per-axis DSS passes commute: each sums over a disjoint index
    dimension): a sublane roll moves data between neighbor elements, a
    lane roll between the local node slots (a_d = 0 <-> a_d = N-1). The
    destination masks factor EXACTLY into (rows, 1) x (1, nnc) predicates
    — elements-with-a-neighbor x destination-plane — so they are built
    from two 1D iotas per axis and fused into the accumulate, instead of
    materializing (rows, nnc) mask buffers (which capped the block size
    via VMEM);
  * the cross-block axis-0 exchange pipelines across grid steps: step i
    computes block i's partial (all in-block passes applied) into a
    ping-pong VMEM scratch and FINALIZES block i-1, which needs its left
    neighbor's raw last plane (kept in a small plane scratch) and its
    right neighbor's raw first plane (just computed). The grid has
    nblk+1 steps; output block i-1 is revisited at steps i-1 and i, so
    Pallas flushes it to HBM only once complete.

The kernel additionally returns the slab's two raw axis-0 boundary planes
(all in-slab passes applied, cross-slab adds NOT applied) — exactly what a
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

#: Scoped-VMEM limit Mosaic enforces per kernel (the round-3 bench crash
#: was 27.85 MB vs this 16 MB limit at the flagship 24^3 ngl=4 config)
_VMEM_BUDGET_BYTES = 16 * 2**20


def _pick_block(ne0: int, R: int, nnc_in: int, nnc_out: int,
                itemsize: int = 4) -> int:
    """Largest divisor of ne0 whose block fits the Mosaic scoped-VMEM
    stack model.

    The model `bytes(b) = b*R*itemsize*(8*nnc_in + 5*nnc_out)` is CALIBRATED
    against on-chip v5e compile outcomes at 24^3 ngl=4 f32 (R=576): it
    exactly separates every observed pass/fail —
      nnc 192->192: blocks 1,2 compile, 3+ OOM  (model 11.5 / 17.3 MB)
      nnc 192->384: blocks 1,2 compile, 3+ OOM  (model 15.9 / 23.9 MB)
      nnc 384->192: block 1 compiles,  2+ OOM  (model  9.3 / 18.6 MB)
    Input-width buffers dominate (double-buffered DMA + the matmul's
    operand staging); output-width buffers are the roll-chain temporaries.
    The model is a heuristic; `probe_block` (a real compile on the target
    backend) is the authority and falls back to smaller blocks.

    Among fitting blocks, the pick targets ~0.5-1K rows per grid step:
    interleaved on-chip timing at 24^3 ngl=4 (R=576, min over 10 rounds
    of 3000-apply chains) measured block=1 (576 rows) at 112.8 us vs
    block=2 at 146.8 us and block=4 at 150.3 us — large blocks raise
    VMEM pressure and lose pipelining; small meshes (R=64) DO need
    multi-slice blocks to feed the MXU full-height tiles."""
    best = 1
    for b in range(1, ne0 + 1):
        if ne0 % b != 0:
            continue
        if b > 1 and b * R > 1024:
            continue
        if b * R * itemsize * (8 * nnc_in + 5 * nnc_out) \
                <= _VMEM_BUDGET_BYTES:
            best = b
    return best


#: probe results: (ne0, R, nnc_in, nnc_out, itemsize) -> block (0 = even
#: block=1 fails to compile; caller must turn the fused path off)
_PROBE_CACHE: dict = {}


def _probe_compile(nelem, ngl, nnc_in, ncomp_out, dtype, block):
    """AOT-compile fused_apply at the given block on the default backend;
    raises on compile failure (e.g. Mosaic scoped-VMEM OOM). Split out so
    tests can monkeypatch the compile step."""
    dim = len(nelem)
    E = int(np.prod(nelem))
    nnc_out = ngl ** dim * ncomp_out
    t_s = jax.ShapeDtypeStruct((E, nnc_in), dtype)
    m_s = jax.ShapeDtypeStruct((nnc_in, nnc_out), dtype)
    fused_apply.lower(t_s, m_s, tuple(nelem), ngl, ncomp_out,
                      block=block).compile()


def probe_block(nelem, ngl, nnc_in, ncomp_out, dtype=jnp.float32) -> int:
    """Find the largest axis-0 block that ACTUALLY compiles on this
    backend, starting from the analytic `_pick_block` pick and descending
    through divisors of ne0. Returns 0 if even block=1 fails (caller
    disables the fused path). Results are cached per process — one
    compile per distinct operator shape, amortized across Problems.

    This is the compile-failure guard the round-3 bench lacked: a Pallas
    kernel can fail in the COMPILER (scoped-VMEM OOM), which no CPU
    interpret-mode test can catch; the reference's assembled MatMult has
    no such failure mode (`src/cases/base_problem.py:123-136`), so
    neither may the default TPU path."""
    dim = len(nelem)
    ne0 = int(nelem[0])
    R = int(np.prod(nelem[1:]))
    nnc_out = ngl ** dim * ncomp_out
    dt = jnp.dtype(dtype)
    key = (ne0, R, int(nnc_in), int(nnc_out), dt.itemsize)
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    start = _pick_block(ne0, R, nnc_in, nnc_out, dt.itemsize)
    cands = [b for b in range(start, 0, -1) if ne0 % b == 0]
    got = 0
    for b in cands:
        try:
            _probe_compile(nelem, ngl, nnc_in, ncomp_out, dt, b)
            got = b
            break
        except Exception:  # noqa: BLE001 — any compile failure -> descend
            continue
    _PROBE_CACHE[key] = got
    return got


def _inblock_axes(nelem_blk: Sequence[int], ngl: int, ncomp: int):
    """Static per-axis exchange parameters for ALL in-block axes of the
    canonical layout (node = a0*N^{dim-1} + ..., column = node*ncomp +
    comp; block rows = elements (e0_blk, e1[, e2]) row-major):
    (d, row_stride, col_shift, ne_d). Axis 0 uses the BLOCK's ne0."""
    dim = len(nelem_blk)
    N = ngl
    out = []
    for d in range(dim):
        row_stride = int(np.prod(nelem_blk[d + 1:]))
        col_shift = (N - 1) * (N ** (dim - 1 - d)) * ncomp
        out.append((d, row_stride, col_shift, int(nelem_blk[d])))
    return out


def _axis_mask_factors(rows, nnc, nelem_blk, ngl, ncomp, d, dtype):
    """Factored destination masks for the axis-d in-block exchange:
    (rows, 1) neighbor-exists predicates x (1, nnc) destination-plane
    predicates. Exact: e_d depends on the row only, a_d on the column."""
    dim = len(nelem_blk)
    N = ngl
    row_stride = int(np.prod(nelem_blk[d + 1:]))
    ne_d = int(nelem_blk[d])
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, nnc), 1)
    e_d = (r // row_stride) % ne_d
    a_d = ((c // ncomp) // (N ** (dim - 1 - d))) % N
    rn = (e_d < ne_d - 1).astype(dtype)
    rp = (e_d > 0).astype(dtype)
    cn = (a_d == N - 1).astype(dtype)
    cp = (a_d == 0).astype(dtype)
    return rn, cn, rp, cp


def _fused_kernel(nelem_blk, ngl, ncomp_out, dtype, nblk, R_sl,
                  t_ref, m_ref, out_ref, bnd_ref, u_scr, last_scr):
    dim = len(nelem_blk)
    N = ngl
    Rb = int(np.prod(nelem_blk))        # block rows (blk * ne1 [* ne2])
    nnc = N ** dim * ncomp_out
    plane = (N ** (dim - 1)) * ncomp_out
    i = pl.program_id(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    prev_slot = 1 - slot
    live_axes = [a for a in _inblock_axes(nelem_blk, N, ncomp_out)
                 if a[3] > 1]

    @pl.when(i < nblk)
    def _compute():
        u = jnp.dot(t_ref[:], m_ref[:],
                    preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST)
        for d, row_stride, col_shift, ne_d in live_axes:
            # pltpu.roll requires non-negative shifts: normalize mod the
            # axis size (circular semantics are identical; the factored
            # masks kill every wrapped row/column)
            rn, cn, rp, cp = _axis_mask_factors(Rb, nnc, nelem_blk, N,
                                                ncomp_out, d, dtype)
            nxt = pltpu.roll(pltpu.roll(u, (Rb - row_stride) % Rb, 0),
                             col_shift % nnc, 1)
            prv = pltpu.roll(pltpu.roll(u, row_stride % Rb, 0),
                             (nnc - col_shift) % nnc, 1)
            u = u + nxt * (rn * cn) + prv * (rp * cp)
        u_scr[slot] = u
        # raw first plane of block 0 = what the LEFT shard neighbor adds
        @pl.when(i == 0)
        def _():
            bnd_ref[0] = u[:R_sl, :plane]

    @pl.when(i >= 1)
    def _finalize():
        z = u_scr[prev_slot]                     # u_{i-1}, pre-cross-block
        new_last = z[Rb - R_sl:, nnc - plane:]   # raw: save before adds
        # left neighbor's raw last plane (only exists for i-1 >= 1)
        zfirst = z[:R_sl, :plane] + jnp.where(i >= 2, last_scr[:], 0.0)
        # right neighbor's raw first plane (only exists when computed)
        zlast = new_last + jnp.where(i < nblk,
                                     u_scr[slot][:R_sl, :plane], 0.0)
        out_ref[:R_sl, :plane] = zfirst
        out_ref[:R_sl, plane:] = z[:R_sl, plane:]
        if Rb > 2 * R_sl:
            out_ref[R_sl:Rb - R_sl, :] = z[R_sl:Rb - R_sl, :]
        if Rb > R_sl:
            out_ref[Rb - R_sl:, :nnc - plane] = z[Rb - R_sl:, :nnc - plane]
            out_ref[Rb - R_sl:, nnc - plane:] = zlast
        else:
            out_ref[:, nnc - plane:] = zlast
        last_scr[:] = new_last
        # raw last plane of the final block = RIGHT shard neighbor's add
        @pl.when(i == nblk)
        def _():
            bnd_ref[1] = new_last

    # Rb == R_sl (block = one slice): first and last slice coincide; the
    # two writes above would overlap — handled by the else branch writing
    # the full trailing columns after the leading-plane write.


@functools.partial(jax.jit, static_argnames=("nelem", "ngl", "ncomp_out",
                                             "interpret", "block"))
def fused_apply(t: jax.Array, matT: jax.Array, nelem: tuple, ngl: int,
                ncomp_out: int, interpret: bool = False,
                block: int | None = None):
    """y = DSS(t @ matT) on the canonical element-local layout of a box
    mesh, one HBM pass. Returns (y, bnd) with bnd the (2, R, plane) raw
    axis-0 boundary planes for cross-shard accumulation (ignore when
    unsharded: the in-shard axis-0 adds are already applied in y).

    `block` forces the axis-0 slices-per-grid-step (must divide nelem[0]);
    default picks the largest divisor fitting the VMEM budget.
    """
    dim = len(nelem)
    ne0 = int(nelem[0])
    R = int(np.prod(nelem[1:]))
    nnc_in = t.shape[1]
    nnc_out = ngl ** dim * ncomp_out
    plane = (ngl ** (dim - 1)) * ncomp_out
    dtype = t.dtype
    blk = _pick_block(ne0, R, nnc_in, nnc_out, t.dtype.itemsize) \
        if block is None else int(block)
    if ne0 % blk != 0:
        raise ValueError(f"block {blk} does not divide nelem[0]={ne0}")
    nblk = ne0 // blk
    Rb = blk * R
    nelem_blk = (blk,) + tuple(nelem[1:])

    kernel = functools.partial(_fused_kernel, nelem_blk, ngl,
                               ncomp_out, dtype, nblk, R)
    out, bnd = pl.pallas_call(
        kernel,
        grid=(nblk + 1,),
        in_specs=[
            pl.BlockSpec((Rb, nnc_in),
                         lambda i: (jnp.minimum(i, nblk - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nnc_in, nnc_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Rb, nnc_out),
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
            pltpu.VMEM((2, Rb, nnc_out), dtype),
            pltpu.VMEM((R, plane), dtype),
        ],
        # raise Mosaic's scoped-VMEM stack limit (default 16 MB) to what
        # this block size actually needs: the kernel's measured stack is
        # ~(5 MB + per-block roll-chain temporaries), and v5e has 128 MB
        # of VMEM — the default limit, not capacity, is what crashed the
        # round-3 bench. 2x-margined model, capped well under capacity.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(32 * 2**20,
                    2 * Rb * t.dtype.itemsize * (8 * nnc_in + 5 * nnc_out)),
                100 * 2**20)),
        interpret=interpret,
    )(t, matT)
    return out, bnd
