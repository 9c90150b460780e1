"""Data-parallel operator application for UNSTRUCTURED meshes.

The box path shards contiguous element slabs with ppermute halo exchange
(`parallel/sharded_engine.py`); general unstructured meshes get the
replicated-vector / element-sharded mode instead: every device holds the
full (n_nodes, d) nodal vector, elements are split across devices, each
device computes its elements' dense contributions and locally assembles a
partial global vector, and ONE `psum` completes the assembly — the direct
analog of PETSc's off-process MatSetValues accumulation (reference
`mat_fs.py:174-189` + assemble), with the collective riding ICI.

Trade-off: O(n_nodes) replicated state and an all-reduce per apply instead
of O(surface) halo traffic — the right v1 for meshes without a structured
slab decomposition; the FLOP-heavy element work scales perfectly.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pynama_tpu.ops.apply import ElementOp

AXIS = "dp"


@dataclasses.dataclass(frozen=True)
class ShardedElementOp:
    """Element-sharded form of an ElementOp (leading device axis)."""
    mat: jax.Array          # (ndev, E_loc, nd_out, nd_in) or (nd_out, nd_in)
    cell_nodes: jax.Array   # (ndev, E_loc, nnode) — padded cells point at
    #                         the sentinel row n_nodes (zero contribution)
    din: int
    dout: int
    n_nodes: int
    ndev: int
    mesh: Mesh


def shard_element_op(op: ElementOp, ndev: int, devices=None
                     ) -> ShardedElementOp:
    devices = devices if devices is not None else jax.devices()[:ndev]
    mesh = Mesh(np.array(devices), (AXIS,))
    E = op.n_cells
    E_loc = -(-E // ndev)
    pad = ndev * E_loc - E
    cn = np.asarray(op.cell_nodes)
    # padded cells gather from the sentinel node (appended zero row) and
    # scatter back to it — zero net contribution
    cn_p = np.concatenate(
        [cn, np.full((pad, cn.shape[1]), op.n_nodes, dtype=cn.dtype)])
    mat = np.asarray(op.mat)
    if mat.ndim == 3:
        mat_p = np.concatenate(
            [mat, np.zeros((pad,) + mat.shape[1:], dtype=mat.dtype)])
        mat_s = jnp.asarray(mat_p.reshape(ndev, E_loc, *mat.shape[1:]))
    else:
        mat_s = jnp.asarray(mat)
    return ShardedElementOp(
        mat=mat_s,
        cell_nodes=jnp.asarray(cn_p.reshape(ndev, E_loc, -1)),
        din=op.din, dout=op.dout, n_nodes=op.n_nodes, ndev=ndev, mesh=mesh)


def sharded_apply_op(sop: ShardedElementOp):
    """jit(shard_map) closure: (x (n_nodes, din) replicated) -> y."""

    def body(mat, cell_nodes, x):
        if mat.ndim == 4:       # per-element mats, sharded: (1, E_loc, a, b)
            mat = mat[0]
        cn = cell_nodes[0]                       # (E_loc, nnode)
        # gather with a sentinel row of zeros
        xp = jnp.concatenate(
            [x, jnp.zeros((1, sop.din), dtype=x.dtype)])
        nnode = cn.shape[1]
        xe = xp[cn].reshape(cn.shape[0], nnode * sop.din)
        if mat.ndim == 2:
            ze = jnp.matmul(xe, mat.T,
                            precision=jax.lax.Precision.HIGHEST)
        else:
            ze = jnp.einsum("eij,ej->ei", mat, xe,
                            precision=jax.lax.Precision.HIGHEST)
        zf = ze.reshape(-1, sop.dout)
        rows = cn.reshape(-1)
        y = jnp.zeros((sop.n_nodes + 1, sop.dout), dtype=x.dtype)
        y = y.at[rows].add(zf)
        return jax.lax.psum(y[:sop.n_nodes], AXIS)

    mat_spec = P(AXIS) if sop.mat.ndim >= 3 else P()
    fn = jax.shard_map(
        body, mesh=sop.mesh,
        in_specs=(mat_spec, P(AXIS), P()),
        out_specs=P(), check_vma=False)

    def apply_(x):
        return fn(sop.mat, sop.cell_nodes, x)

    return jax.jit(apply_)


# --------------------------------------------------------------- KLE solve
def _shard_apply_inner(sop: ShardedElementOp, mat, cn, x):
    """Per-shard element apply + psum (shard_map-internal body)."""
    if mat.ndim == 4:
        mat = mat[0]
    cn = cn[0]
    xp = jnp.concatenate([x, jnp.zeros((1, sop.din), dtype=x.dtype)])
    xe = xp[cn].reshape(cn.shape[0], -1)
    if mat.ndim == 2:
        ze = jnp.matmul(xe, mat.T, precision=jax.lax.Precision.HIGHEST)
    else:
        ze = jnp.einsum("eij,ej->ei", mat, xe,
                        precision=jax.lax.Precision.HIGHEST)
    zf = ze.reshape(-1, sop.dout)
    y = jnp.zeros((sop.n_nodes + 1, sop.dout), dtype=x.dtype)
    y = y.at[cn.reshape(-1)].add(zf)
    return jax.lax.psum(y[:sop.n_nodes], AXIS)


def make_sharded_kle_solver(problem, ndev: int, devices=None):
    """Element-sharded masked KLE solves for unstructured meshes.

    Returns (solve, solve_fs) mirroring `KLESolver.solve/solve_fs`
    (`solver/kle.py`) with the K/Rw applications sharded over the device
    mesh: vectors stay replicated (dots and the CG recurrence run
    identically on every shard), each operator application fans the
    element work out and one psum assembles — the whole CG runs inside a
    single jitted shard_map. BCs are applied by the caller exactly as in
    `Problem.solve_kle`'s global path.
    """
    from pynama_tpu.solver.cg import pcg

    kle = problem.kle
    devices = devices if devices is not None else jax.devices()[:ndev]
    sK = shard_element_op(kle.K_op, ndev, devices)
    sR = shard_element_op(kle.Rw_op, ndev, devices)

    def make(sys):
        free = sys.free
        diag = sys.diag
        con = 1.0 - free
        dmask = free * diag + con

        def body(matK, cnK, matR, cnR, vort, vel):
            applyK = lambda v: _shard_apply_inner(sK, matK, cnK, v)
            applyR = lambda w: _shard_apply_inner(sR, matR, cnR, w)
            vc = con * vel
            b = free * (applyR(vort) - applyK(vc)) + vc
            A = lambda v: free * applyK(free * v) + con * v
            res = pcg(A, b, free * vel + vc, M_inv=lambda r: r / dmask,
                      rtol=sys.cg_rtol, atol=sys.cg_atol,
                      maxiter=sys.cg_maxiter)
            return res.x

        fn = jax.shard_map(
            body, mesh=sK.mesh,
            in_specs=(P(AXIS) if sK.mat.ndim >= 3 else P(), P(AXIS),
                      P(AXIS) if sR.mat.ndim >= 3 else P(), P(AXIS),
                      P(), P()),
            out_specs=P(), check_vma=False)

        @jax.jit
        def solve(vort, vel):
            return fn(sK.mat, sK.cell_nodes, sR.mat, sR.cell_nodes,
                      vort, vel)

        return solve

    solve = make(kle.main)
    solve_fs = make(kle.fs) if kle.fs is not None else None
    return solve, solve_fs
