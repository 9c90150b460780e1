"""Dense validation of wall-block corrections for the FS-stage floor.

fs_spectrum.py showed the FS low modes scale with WALL SURFACE (deflation
dead), consistent with near-zero-energy tangential slip patterns living on
the no-slip walls. This tests whether an additive wall-block solve —
M^-1 = (Jacobi or FDM)^-1 + R_w^T (K_ww)^-1 R_w, with K_ww the assembled
operator restricted to wall free dofs — collapses the preconditioned FS
spectrum. If yes, the production form is a per-face 2D fast
diagonalization (K_ww inherits the tensor structure on a box face).

Variants:
  jac            Jacobi alone (baseline)
  fdm            FDM alone (baseline)
  jac+ww         Jacobi + exact wall-block inverse
  fdm+ww         FDM + exact wall-block inverse
  fdm+schur      FDM + exact wall SCHUR complement inverse (the ideal)
  fdm+ww1        wall block widened by 1 interior node layer

Run: python exp/fs_walls.py [sizes...]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from exp.fs_spectrum import (assemble_global_K, cavity_cfg,  # noqa: E402
                             fdm_minv_dense)
from pynama_tpu.cases import Problem  # noqa: E402


def pred_iters(kap):
    return 0.5 * np.sqrt(kap) * np.log(2 / 1e-6)


def spectrum_of(Minv, A):
    Mi = 0.5 * (Minv + Minv.T)
    lamM, V = np.linalg.eigh(Mi)
    lamM = np.maximum(lamM, 1e-300)
    Sq = V * np.sqrt(lamM)[None, :]
    lam = np.linalg.eigvalsh(Sq.T @ A @ Sq)
    return lam


def report(tag, lam):
    kap = lam[-1] / lam[0]
    print(f"  {tag:12s}: min {lam[0]:.3e} max {lam[-1]:.3e} "
          f"kappa {kap:8.1f}  it~{pred_iters(kap):5.0f}")


def wall_dof_sets(p, idx):
    """Boolean masks (over the free-dof index list idx) of wall-plane dofs
    and wall-plane+1-layer dofs."""
    mesh = p.mesh
    dim = mesh.dim
    npts = tuple(mesh.npts)
    masks = {}
    for thick, name in ((0, "ww"), (mesh.ngl - 1, "ww1")):
        g = np.zeros(npts, dtype=bool)
        for d in range(dim):
            sl = [slice(None)] * dim
            sl[d] = slice(0, thick + 1)
            g[tuple(sl)] = True
            sl[d] = slice(npts[d] - thick - 1, None)
            g[tuple(sl)] = True
        masks[name] = np.repeat(g.reshape(-1), dim)[idx]
    return masks


def analyze(ne, ngl=4):
    p = Problem(cavity_cfg(ne, ngl), solver="cg", engine=False)
    p.setUp()
    mesh = p.mesh
    print(f"\n=== {ne}^3 ngl={ngl}: {mesh.n_nodes * mesh.dim} dofs ===")
    K = assemble_global_K(p)
    fmask = np.asarray(p.bc.free_fs, dtype=bool).reshape(-1)
    idx = np.where(fmask)[0]
    A = K[np.ix_(idx, idx)]
    nf = idx.size
    d = np.diag(A)
    Dinv = np.diag(1.0 / d)
    masks = wall_dof_sets(p, idx)
    print(f"free dofs {nf}; wall dofs {int(masks['ww'].sum())} "
          f"({masks['ww'].mean()*100:.0f}%), +1 layer "
          f"{int(masks['ww1'].sum())} ({masks['ww1'].mean()*100:.0f}%)")

    Minv_f = fdm_minv_dense(p, np.asarray(p.bc.free_fs, dtype=np.float64))
    Mf = Minv_f[np.ix_(idx, idx)]

    report("jac", spectrum_of(Dinv, A))
    report("fdm", spectrum_of(Mf, A))

    def wall_inv(mask):
        w = np.where(mask)[0]
        Kww = A[np.ix_(w, w)]
        Kinv = np.linalg.inv(Kww)
        out = np.zeros_like(A)
        out[np.ix_(w, w)] = Kinv
        return out

    Www = wall_inv(masks["ww"])
    report("jac+ww", spectrum_of(Dinv + Www, A))
    report("fdm+ww", spectrum_of(Mf + Www, A))
    report("fdm+ww1", spectrum_of(Mf + wall_inv(masks["ww1"]), A))

    # the ideal: exact wall Schur complement S = Kww - Kwi Kii^-1 Kiw
    w = np.where(masks["ww"])[0]
    i = np.where(~masks["ww"])[0]
    Kii = A[np.ix_(i, i)]
    Kiw = A[np.ix_(i, w)]
    S = A[np.ix_(w, w)] - Kiw.T @ np.linalg.solve(Kii, Kiw)
    Sinv = np.zeros_like(A)
    Sinv[np.ix_(w, w)] = np.linalg.inv(S)
    report("fdm+schur", spectrum_of(Mf + Sinv, A))
    report("jac+schur", spectrum_of(Dinv + Sinv, A))

    # production-shaped variants: one slab PER FACE (overlapping at
    # edges/corners, additive), each wall plane + `thick` interior planes
    dim = mesh.dim
    npts = tuple(mesh.npts)
    free_fs = np.asarray(p.bc.free_fs, dtype=bool).reshape(-1)
    for thick in (ngl - 1, 2 * (ngl - 1)):
        corr_exact = np.zeros_like(A)
        corr_fdm = np.zeros_like(A)
        for dax in range(dim):
            for side in (0, 1):
                g = np.zeros(npts, dtype=bool)
                sl = [slice(None)] * dim
                sl[dax] = slice(0, thick + 1) if side == 0 \
                    else slice(npts[dax] - thick - 1, None)
                g[tuple(sl)] = True
                slab = np.repeat(g.reshape(-1), dim)
                sub = slab[idx] & True
                wf = np.where(sub)[0]
                Kb = A[np.ix_(wf, wf)]
                corr_exact[np.ix_(wf, wf)] += np.linalg.inv(Kb)
                # FDM approximation of the same slab block
                mask_slab = (free_fs & slab).astype(np.float64)
                Mi_slab = fdm_minv_dense(p, mask_slab)
                if Mi_slab is not None:
                    corr_fdm += Mi_slab[np.ix_(idx, idx)]
        report(f"fdm+6sl(t{thick})", spectrum_of(Mf + corr_exact, A))
        report(f"jac+6sl(t{thick})", spectrum_of(Dinv + corr_exact, A))
        report(f"fdm+6slF(t{thick})", spectrum_of(Mf + corr_fdm, A))
        report(f"jac+6slF(t{thick})", spectrum_of(Dinv + corr_fdm, A))


if __name__ == "__main__":
    for ne in (sys.argv[1:] or ["3", "4"]):
        analyze(int(ne))
