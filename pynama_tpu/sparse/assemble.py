"""Sparse assembly: element-local dense blocks -> global sparse formats.

Replaces PETSc's preallocated scatter-add assembly (reference
`mat_fs.py:21-113` d_nnz/o_nnz preallocation + `setValues(addv=True)` loops):
element contributions become one COO triplet list whose duplicate (row, col)
pairs are summed by sorting — a static symbolic pass at setup, then a pure
`segment_sum` at runtime when values change but structure doesn't
(dynamic-geometry paths, e.g. the moving-body IBM).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.ops import segment_sum

from pynama_tpu.sparse.formats import BSR, COO, CSR, ELL


def element_triplets(cell_nodes: np.ndarray, din: int, dout: int):
    """Global (row, col) ids for every entry of every element block.

    Returns (rows, cols) each of shape (E, nd_out, nd_in) — the symbolic
    structure of the assembly, independent of values.
    """
    E, nnode = cell_nodes.shape
    rl = np.repeat(np.arange(nnode), dout)
    rc = np.tile(np.arange(dout), nnode)
    cl = np.repeat(np.arange(nnode), din)
    cc = np.tile(np.arange(din), nnode)
    grow = cell_nodes[:, rl] * dout + rc      # (E, nd_out)
    gcol = cell_nodes[:, cl] * din + cc       # (E, nd_in)
    rows = np.broadcast_to(grow[:, :, None],
                           (E, grow.shape[1], gcol.shape[1]))
    cols = np.broadcast_to(gcol[:, None, :],
                           (E, grow.shape[1], gcol.shape[1]))
    return rows, cols


def assemble_coo(mats: np.ndarray, cell_nodes: np.ndarray, din: int,
                 dout: int, n_nodes: int, dedup: bool = True) -> COO:
    """Assemble element matrices (shared or per-element) into COO."""
    E = cell_nodes.shape[0]
    rows, cols = element_triplets(cell_nodes, din, dout)
    vals = np.broadcast_to(mats, (E,) + mats.shape[-2:])
    r = rows.ravel()
    c = cols.ravel()
    v = vals.reshape(-1).astype(np.float64)
    shape = (n_nodes * dout, n_nodes * din)
    if dedup:
        key = r.astype(np.int64) * shape[1] + c
        order = np.argsort(key, kind="stable")
        key_s, r, c, v = key[order], r[order], c[order], v[order]
        uniq, inv = np.unique(key_s, return_inverse=True)
        vsum = np.zeros(len(uniq))
        np.add.at(vsum, inv, v)
        r = (uniq // shape[1]).astype(np.int32)
        c = (uniq % shape[1]).astype(np.int32)
        v = vsum
    return COO(data=jnp.asarray(v), row=jnp.asarray(r, dtype=jnp.int32),
               col=jnp.asarray(c, dtype=jnp.int32), shape=shape)


def coo_to_csr(coo: COO) -> CSR:
    r = np.asarray(coo.row)
    c = np.asarray(coo.col)
    v = np.asarray(coo.data)
    order = np.lexsort((c, r))
    r, c, v = r[order], c[order], v[order]
    indptr = np.zeros(coo.shape[0] + 1, dtype=np.int32)
    np.add.at(indptr, r + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return CSR(data=jnp.asarray(v), indices=jnp.asarray(c, dtype=jnp.int32),
               indptr=jnp.asarray(indptr), shape=coo.shape)


def csr_to_ell(csr: CSR, width: int | None = None,
               pad_to: int | None = None) -> ELL:
    """CSR -> padded ELL. Padding columns point at the virtual zero column
    `ncols` (spmv_ell pads x with one zero row)."""
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    nrows, ncols = csr.shape
    counts = np.diff(indptr)
    w = int(counts.max()) if width is None else width
    if pad_to is not None:
        w = -(-w // pad_to) * pad_to
    ell_d = np.zeros((nrows, w), dtype=data.dtype)
    ell_c = np.full((nrows, w), ncols, dtype=np.int32)
    for k in range(w):
        mask = counts > k
        src = indptr[:-1][mask] + k
        ell_d[mask, k] = data[src]
        ell_c[mask, k] = indices[src]
    return ELL(data=jnp.asarray(ell_d), cols=jnp.asarray(ell_c),
               shape=csr.shape)


def csr_to_bsr(csr: CSR, bs: int) -> BSR:
    """CSR -> block-CSR with dense bs x bs blocks (zero-filled)."""
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    nrows, ncols = csr.shape
    assert nrows % bs == 0 and ncols % bs == 0
    nbr = nrows // bs
    # symbolic: block columns present in each block row
    bindptr = [0]
    bindices = []
    blocks = []
    for br in range(nbr):
        bcols = {}
        for r in range(br * bs, (br + 1) * bs):
            for k in range(indptr[r], indptr[r + 1]):
                bc = indices[k] // bs
                if bc not in bcols:
                    bcols[bc] = np.zeros((bs, bs), dtype=data.dtype)
                bcols[bc][r - br * bs, indices[k] - bc * bs] = data[k]
        for bc in sorted(bcols):
            bindices.append(bc)
            blocks.append(bcols[bc])
        bindptr.append(len(bindices))
    return BSR(data=jnp.asarray(np.stack(blocks)),
               indices=jnp.asarray(bindices, dtype=jnp.int32),
               indptr=jnp.asarray(bindptr, dtype=jnp.int32),
               shape=csr.shape, blocksize=bs)


def assemble_from_elements(mats, cell_nodes, din, dout, n_nodes,
                           fmt: str = "ell", dtype=None, pad_to=8):
    """One-call element->global assembly into the requested format."""
    coo = assemble_coo(np.asarray(mats), np.asarray(cell_nodes), din, dout,
                       n_nodes)
    csr = coo_to_csr(coo)
    if dtype is not None:
        csr = CSR(data=csr.data.astype(dtype), indices=csr.indices,
                  indptr=csr.indptr, shape=csr.shape)
    if fmt == "csr":
        return csr
    if fmt == "ell":
        return csr_to_ell(csr, pad_to=pad_to)
    if fmt == "bsr":
        return csr_to_bsr(csr, bs=dout)
    if fmt == "coo":
        return coo
    raise ValueError(f"unknown format {fmt}")
