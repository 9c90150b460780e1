"""Woodbury-in-quadrature-space test for the FS-stage floor (round 5).

The penalized operator is K = S + B^T B with S the unpenalized separable
vector Laplacian (FDM-exactly invertible on the FS tensor mask) and
B = [sqrt(a_d w_q) D; sqrt(a_w w_q) C] the REDUCED-quadrature div/curl
evaluation maps. Woodbury:

    K^-1 = S^-1 - S^-1 B^T G^-1 B S^-1,   G = I_m + B S^-1 B^T.

The nonzero spectrum of B S^-1 B^T equals that of S^-1 B^T B, so plain CG
on G converges exactly like S^-1-preconditioned CG on K (~230 iters — no
free lunch). The open question this experiment answers: does a DIAGONAL
scaling in QUADRATURE space cluster G where no velocity-space diagonal
could cluster K? If κ(diag(G)^-1 G) collapses, the production FS solve
becomes ~#inner-iters FDM applies with no outer iteration.

Also measures ACTUAL preconditioned-CG iteration counts (not κ bounds) for
K/Jacobi, K/S^-1, G/I, G/diag at rtol 1e-6.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from exp.fs_spectrum import assemble_global_K, cavity_cfg  # noqa: E402
from pynama_tpu.cases import Problem  # noqa: E402
from pynama_tpu.elements.kle import (ALPHA_D, ALPHA_W,  # noqa: E402
                                     compute_kle_matrices, curl_tensor)
from pynama_tpu.basis.tables import make_tensor_basis  # noqa: E402


def assemble_S(p):
    """Global unpenalized vector Laplacian (alphas = 0)."""
    basis = p.basis
    corners = p.mesh.cell_corners[0] if p.mesh.is_uniform \
        else p.mesh.cell_corners
    em = compute_kle_matrices(basis, corners, alpha_w=0.0, alpha_d=0.0)
    mesh = p.mesh
    dim = mesh.dim
    Ke = np.asarray(em.K, dtype=np.float64)
    cell_nodes = np.asarray(mesh.cell_nodes)
    nn = cell_nodes.shape[1]
    n = mesh.n_nodes * dim
    dof = (cell_nodes[:, :, None] * dim
           + np.arange(dim)[None, None, :]).reshape(-1, nn * dim)
    S = np.zeros((n, n))
    for e in range(dof.shape[0]):
        S[np.ix_(dof[e], dof[e])] += Ke if Ke.ndim == 2 else Ke[e]
    return S


def build_B(p):
    """Global (m, n) penalty factor: rows = sqrt(a w_q detJ) x reduced-quad
    div/curl evaluations (mirrors elements/kle.py:216-229)."""
    from pynama_tpu.elements.kle import _geometry

    mesh, basis = p.mesh, p.basis
    dim = mesh.dim
    Tc = curl_tensor(dim)
    dim_w = Tc.shape[0]
    corners = np.asarray(mesh.cell_corners, dtype=np.float64)
    if corners.ndim == 2:
        corners = np.broadcast_to(corners[None], (mesh.n_cells,) +
                                  corners.shape)
    Hxy_r, wdet_r = _geometry(basis.reduced, corners)   # (E,nq,dim,nn),(E,nq)
    E, nqr, _, nn = Hxy_r.shape
    Zi = Hxy_r.transpose(0, 1, 3, 2).reshape(E, nqr, nn * dim)
    Bc = np.einsum('wcd,eqda->eqwac', Tc, Hxy_r,
                   optimize=True).reshape(E, nqr, dim_w, nn * dim)
    sw = np.sqrt(wdet_r)
    rows_d = np.sqrt(ALPHA_D) * sw[:, :, None] * Zi         # (E,nq,nnd)
    rows_c = np.sqrt(ALPHA_W) * sw[:, :, None, None] * Bc   # (E,nq,w,nnd)
    cell_nodes = np.asarray(mesh.cell_nodes)
    n = mesh.n_nodes * dim
    dof = (cell_nodes[:, :, None] * dim
           + np.arange(dim)[None, None, :]).reshape(E, nn * dim)
    m_per = nqr * (1 + dim_w)
    B = np.zeros((E * m_per, n))
    for e in range(E):
        re = np.concatenate([rows_d[e], rows_c[e].reshape(nqr * dim_w, -1)])
        B[e * m_per:(e + 1) * m_per, dof[e]] = re
    return B


def pcg_np(A, b, Minv=None, rtol=1e-6, maxiter=4000):
    n = b.size
    x = np.zeros(n)
    r = b.copy()
    z = Minv(r) if Minv else r.copy()
    p = z.copy()
    gamma = r @ z
    bnorm = np.linalg.norm(b)
    for k in range(maxiter):
        if np.linalg.norm(r) <= rtol * bnorm:
            return x, k
        Ap = A @ p if isinstance(A, np.ndarray) else A(p)
        alpha = gamma / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        z = Minv(r) if Minv else r.copy()
        g2 = r @ z
        p = z + (g2 / gamma) * p
        gamma = g2
    return x, maxiter


def analyze(ne, ngl=4):
    p = Problem(cavity_cfg(ne, ngl), solver="cg", engine=False)
    p.setUp()
    mesh = p.mesh
    print(f"\n=== {ne}^3 ngl={ngl} ===")
    K = assemble_global_K(p)
    S = assemble_S(p)
    B = build_B(p)
    fmask = np.asarray(p.bc.free_fs, dtype=bool).reshape(-1)
    idx = np.where(fmask)[0]
    Kf = K[np.ix_(idx, idx)]
    Sf = S[np.ix_(idx, idx)]
    Bf = B[:, idx]
    err = np.abs(Kf - (Sf + Bf.T @ Bf)).max() / np.abs(Kf).max()
    print(f"K = S + B^T B check: rel err {err:.2e}   "
          f"m = {Bf.shape[0]}, n_free = {Kf.shape[0]}")

    Sinv = np.linalg.inv(Sf)
    G = np.eye(Bf.shape[0]) + Bf @ Sinv @ Bf.T
    lam = np.linalg.eigvalsh(G)
    print(f"G spectrum: min {lam[0]:.3e} max {lam[-1]:.3e} "
          f"kappa {lam[-1]/lam[0]:.1f}")
    dg = np.diag(G)
    s = 1 / np.sqrt(dg)
    lam2 = np.linalg.eigvalsh(s[:, None] * G * s[None, :])
    print(f"diag-scaled G: min {lam2[0]:.3e} max {lam2[-1]:.3e} "
          f"kappa {lam2[-1]/lam2[0]:.1f}")
    q = np.quantile(lam2, [0, .01, .1, .25, .5, .75, .9, .99, 1])
    print("  quantiles:", " ".join(f"{x:.3g}" for x in q))

    rng = np.random.default_rng(0)
    b = rng.standard_normal(Kf.shape[0])
    dK = np.diag(Kf)
    _, itj = pcg_np(Kf, b, Minv=lambda r: r / dK)
    _, its = pcg_np(Kf, b, Minv=lambda r: Sinv @ r)
    bq = rng.standard_normal(G.shape[0])
    _, itg = pcg_np(G, bq)
    _, itgd = pcg_np(G, bq, Minv=lambda r: r / dg)
    print(f"actual CG iters (rtol 1e-6): K/jacobi {itj}, K/Sinv {its}, "
          f"G/I {itg}, G/diag {itgd}")

    # block-diagonal G preconditioners: the quadrature rows come in groups
    # (per qp: 1 div + dim_w curl channels; per element: nqr*(1+dim_w))
    dim_w = curl_tensor(mesh.dim).shape[0]
    nqr = Bf.shape[0] // mesh.n_cells // (1 + dim_w)
    m_per = nqr * (1 + dim_w)

    def block_prec(bs, perm=None):
        """Exact inverse of G's (bs x bs) diagonal blocks (optionally after
        a row permutation grouping related rows together)."""
        Gp = G if perm is None else G[np.ix_(perm, perm)]
        m = Gp.shape[0]
        blocks = Gp.reshape(m // bs, bs, m // bs, bs)
        diagb = np.array([blocks[i, :, i, :] for i in range(m // bs)])
        binv = np.linalg.inv(diagb)

        def M(r):
            rp = r if perm is None else r[perm]
            z = np.einsum('bij,bj->bi', binv, rp.reshape(-1, bs)).ravel()
            if perm is None:
                return z
            out = np.empty_like(z)
            out[perm] = z
            return out
        return M

    # per-qp blocks: rows of one qp are (div q) and (curl q, w=0..dim_w-1),
    # i.e. strided by nqr inside the element's row block
    e_ids = np.repeat(np.arange(mesh.n_cells), m_per)
    q_ids = np.tile(np.concatenate([np.arange(nqr)] * (1 + dim_w)),
                    mesh.n_cells)
    perm_qp = np.lexsort((np.arange(Bf.shape[0]), q_ids, e_ids))
    _, itq = pcg_np(G, bq, Minv=block_prec(1 + dim_w, perm_qp))
    _, ite = pcg_np(G, bq, Minv=block_prec(m_per))
    print(f"G/qp-block({1+dim_w}) {itq}, G/elem-block({m_per}) {ite}")


if __name__ == "__main__":
    for ne in (sys.argv[1:] or ["3", "4"]):
        analyze(int(ne))
