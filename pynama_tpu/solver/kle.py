"""KLE velocity solver: masked matrix-free K with CG or dense Cholesky.

Replaces the reference's Dirichlet-condensed matrix zoo (K/Krhs/Rw of
`src/matrices/mat_fs.py:131-193`, plus Kfs/Krhsfs/Rwfs of `mat_ns.py:47-146`)
and KSP solve (`src/solver/kle_solver.py:33-41`) with ONE raw assembled-free
operator pair (K_raw, Rw_raw) and per-solve free/constrained dof masks:

    K      x = Rw w + Krhs v_bc      <=>   with c = 1-free:
    [free] A[free,free] x_f = (Rw_raw w)_f - (K_raw c*v_bc)_f ; x_c = v_bc

For no-slip problems the free-slip stage solve (kle_solver.py:39-41) is the
same equation with a wider free mask (interior + wall-tangential dofs), which
is exactly what Kfs/Krhsfs/Rwfs encode entry-by-entry.

Solvers: 'cg' (Jacobi-preconditioned matrix-free PCG), 'gmres' (restarted
Jacobi-preconditioned GMRES(30) — the literal KSP-GMRES analog,
kle_solver.py:54-64), or 'direct' (setup-time dense Cholesky of the masked
operator — the moral twin of the reference's `-ksp_type preonly -pc_type
lu`, makefile:7).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from pynama_tpu.ops.apply import (ElementOp, apply_op,
                                  assembled_diagonal_np, assemble_dense)
from pynama_tpu.solver.cg import pcg
from pynama_tpu.solver.gmres import gmres


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KLESystem:
    """One masked linear system K-masked x = Rw-masked w + bc terms."""
    free: jax.Array                      # (n_nodes, dim) 1.0 free / 0.0 bc
    diag: jax.Array                      # (n_nodes, dim) diag of masked K
    chol: Optional[jax.Array]            # dense Cholesky factor or None
    method: str = dataclasses.field(metadata=dict(static=True))
    cg_rtol: float = dataclasses.field(metadata=dict(static=True))
    cg_atol: float = dataclasses.field(metadata=dict(static=True))
    cg_maxiter: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KLESolver:
    K_op: ElementOp
    Rw_op: ElementOp
    main: KLESystem
    fs: Optional[KLESystem]   # free-slip stage for no-slip problems

    @property
    def is_ns(self) -> bool:
        return self.fs is not None

    # -- solves ------------------------------------------------------------
    def solve(self, vort: jax.Array, vel: jax.Array) -> jax.Array:
        """Main KLE solve (kle_solver.py:33-37). `vel` carries the boundary
        values on constrained dofs and serves as the iterative warm start."""
        return _masked_solve(self.K_op, self.Rw_op, self.main, vort, vel)

    def solve_fs(self, vort: jax.Array, vel: jax.Array) -> jax.Array:
        """Free-slip stage solve for NS problems (kle_solver.py:39-41)."""
        return _masked_solve(self.K_op, self.Rw_op, self.fs, vort, vel)


def _masked_solve(K_op: ElementOp, Rw_op: ElementOp, sys: KLESystem,
                  vort: jax.Array, vel: jax.Array) -> jax.Array:
    free = sys.free
    con = 1.0 - free
    vc = con * vel
    b = free * (apply_op(Rw_op, vort) - apply_op(K_op, vc)) + vc

    if sys.method == "direct":
        n, dim = vel.shape
        x = jax.scipy.linalg.cho_solve((sys.chol, True), b.ravel())
        return x.reshape(n, dim)

    def A0(v):
        """Full condensed operator — initial residual only."""
        return free * apply_op(K_op, free * v) + con * v

    def A(v):
        """In-loop operator: CG loop vectors are exactly zero on the
        constrained dofs (same invariant as local_engine._masked_solve),
        so the input mask and `con*v` passthrough are dropped — two fewer
        HBM passes per iteration, bitwise-identical trajectory."""
        return free * apply_op(K_op, v)

    dmask = free * sys.diag + con

    def M_inv(r):
        return r / dmask

    x0 = free * vel + vc
    if sys.method == "gmres":
        res = gmres(A0, b, x0, M_inv=M_inv, rtol=sys.cg_rtol,
                    atol=sys.cg_atol, maxiter=sys.cg_maxiter)
    else:
        res = pcg(A, b, x0, M_inv=M_inv, rtol=sys.cg_rtol, atol=sys.cg_atol,
                  maxiter=sys.cg_maxiter, A0=A0)
    return res.x


# ---------------------------------------------------------------------------
# setup
# ---------------------------------------------------------------------------

def build_system(K_mat_np: np.ndarray, cell_nodes: np.ndarray,
                 free_mask_np: np.ndarray, K_op: ElementOp, method: str,
                 cg_rtol: float, cg_atol: float, cg_maxiter: int,
                 dtype) -> KLESystem:
    """Build one masked system; for 'direct', assemble + factor on host."""
    n_nodes, dim = free_mask_np.shape
    free = jnp.asarray(free_mask_np.astype(np.float64), dtype=dtype)
    diag = jnp.asarray(
        assembled_diagonal_np(K_mat_np, cell_nodes, n_nodes), dtype=dtype)
    chol = None
    if method == "direct":
        A = assemble_dense(K_mat_np, cell_nodes, dim, dim, n_nodes)
        f = free_mask_np.ravel().astype(bool)
        c = ~f
        A[c, :] = 0.0
        A[:, c] = 0.0
        A[c, c] = 1.0
        cf = scipy.linalg.cholesky(A, lower=True)
        chol = jnp.asarray(cf, dtype=dtype)
    return KLESystem(free=free, diag=diag, chol=chol, method=method,
                     cg_rtol=float(cg_rtol), cg_atol=float(cg_atol),
                     cg_maxiter=int(cg_maxiter))
