"""Spectrum-level analysis of the FS-stage solve floor (round-5 task 1).

The warm two-stage KLE solve is ~99% FS stage (298 iters at 24^3 ngl=4,
conditioning-bound, warm-start-immune — DESIGN.md round-4 CG-loop section).
Before building any new machinery, this experiment answers the structural
question: WHAT does the preconditioned FS spectrum look like?

  * Is the slowness a SMALL cluster of low outliers (deflation / recycling
    would kill it) or a CONTINUUM (nothing subspace-sized will help)?
  * How does the low-mode count scale with mesh size (constant -> deflate;
    ~surface or ~volume -> structural kill note)?

Method: assemble the Dirichlet-condensed FS operator densely (small 3D
no-slip cavity meshes, f64, CPU), eigendecompose under both Jacobi and FDM
preconditioning, and table the effective condition number after dropping
the k lowest modes with the matching predicted-CG-iteration count
  iters(k) ~ 0.5 * sqrt(kappa_k) * ln(2/rtol).

Run: JAX_PLATFORMS='' python exp/fs_spectrum.py  (pure numpy + Problem setup)
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pynama_tpu.cases import Problem  # noqa: E402


def cavity_cfg(ne, ngl):
    zero = [0, 0, 0]
    return {
        "name": "spec", "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": [ne] * 3, "lower": zero, "upper": [1] * 3}},
        "boundary-conditions": {"no-slip": {
            "up": [2, 0, 0], "down": zero, "left": zero, "right": zero,
            "back": zero, "front": zero}},
        "initial-conditions": {"vorticity": zero},
    }


def assemble_global_K(p):
    """Dense assembled K (n_dofs x n_dofs) from the shared element matrix."""
    mesh = p.mesh
    dim = mesh.dim
    Ke = np.asarray(p._em.K, dtype=np.float64)      # (nn*dim, nn*dim) shared
    cell_nodes = np.asarray(mesh.cell_nodes)       # (E, nn)
    nn = cell_nodes.shape[1]
    n = mesh.n_nodes * dim
    # interleaved dof ids per element slot
    dof = (cell_nodes[:, :, None] * dim
           + np.arange(dim)[None, None, :]).reshape(-1, nn * dim)
    K = np.zeros((n, n))
    for e in range(dof.shape[0]):
        K[np.ix_(dof[e], dof[e])] += Ke
    return K


def fdm_minv_dense(p, free):
    """Dense FDM preconditioner inverse on global dofs via fdm_apply."""
    import jax.numpy as jnp
    from pynama_tpu.solver.fdm import build_fdm, fdm_apply
    from pynama_tpu.ops import local as L

    mesh = p.mesh
    dim = mesh.dim
    diag_g = None
    # assembled diagonal for the jleft fallback
    Ke = np.asarray(p._em.K, dtype=np.float64)
    de = np.tile(np.diagonal(Ke)[None, :], (mesh.n_cells, 1))
    dg = L.to_global(mesh, L.dss_np(mesh, de.reshape(mesh.n_cells, -1),
                                    dim), dim)
    f = build_fdm(mesh, free.reshape(mesh.n_nodes, dim), np.float64,
                  diag_global=dg)
    if f is None:
        return None
    n = mesh.n_nodes * dim
    eye = np.eye(n)
    cols = []
    batch = 256
    nelem = tuple(mesh.nelem)
    apply_v = jax.jit(jax.vmap(
        lambda r: fdm_apply(f, r, nelem=nelem, ngl=mesh.ngl)))
    for s in range(0, n, batch):
        X = eye[:, s:s + batch].T.reshape(-1, mesh.n_nodes, dim)
        Xl = np.stack([L.to_local(mesh, x) for x in X])
        Z = np.asarray(apply_v(jnp.asarray(Xl)))
        Zg = np.stack([L.to_global(mesh, z, dim) for z in Z])
        cols.append(Zg.reshape(Zg.shape[0], -1))
    return np.concatenate(cols, 0).T            # (n, n): Minv columns


def effective_kappas(lam, ks=(0, 4, 8, 16, 32, 64, 128, 256, 512)):
    lam = np.sort(lam)
    out = {}
    for k in ks:
        if k >= lam.size:
            break
        kap = lam[-1] / lam[k]
        iters = 0.5 * np.sqrt(kap) * np.log(2 / 1e-6)
        out[k] = (kap, iters)
    return out


def localization(p, idx, A, Sq, nlow=128):
    """Where do the low modes of the preconditioned FS operator live?
    Reports the mass fraction of each of the nlow lowest eigenvectors
    within 1 element layer of a wall (if ~1, deflation vectors can be
    stored wall-sparse at ~surface/volume cost)."""
    mesh = p.mesh
    dim = mesh.dim
    lam, V = np.linalg.eigh(Sq.T @ A @ Sq)
    W = Sq @ V[:, :nlow]                      # back to dof space
    # wall-adjacent node set: within ngl-1 grid planes of any wall
    npts = tuple(mesh.npts)
    g = np.zeros(npts, dtype=bool)
    thick = mesh.ngl - 1                      # one element layer
    for d in range(dim):
        sl = [slice(None)] * dim
        sl[d] = slice(0, thick + 1)
        g[tuple(sl)] = True
        sl[d] = slice(-(thick + 1), None)
        g[tuple(sl)] = True
    wall_dof = np.repeat(g.reshape(-1), dim)[idx]
    frac = (W[wall_dof] ** 2).sum(0) / (W ** 2).sum(0)
    print(f"  low-mode wall-layer mass (1 elem layer, "
          f"{wall_dof.mean()*100:.0f}% of dofs): "
          f"median {np.median(frac):.2f}, min {frac.min():.2f}, "
          f"frac>0.9: {(frac > 0.9).mean():.2f}")
    return lam, W


def analyze(ne, ngl, do_fdm=True):
    p = Problem(cavity_cfg(ne, ngl), solver="cg", engine=False)
    p.setUp()
    mesh, dim = p.mesh, p.mesh.dim
    n = mesh.n_nodes * dim
    print(f"\n=== {ne}^3 ngl={ngl}: {mesh.n_nodes} nodes, {n} dofs ===")
    K = assemble_global_K(p)
    for tag, free in (("FS", p.bc.free_fs), ("MAIN", p.bc.free_main)):
        fmask = np.asarray(free, dtype=bool).reshape(-1)
        idx = np.where(fmask)[0]
        A = K[np.ix_(idx, idx)]
        nf = idx.size
        # Jacobi
        d = np.diag(A)
        S = 1.0 / np.sqrt(d)
        lam_j = np.linalg.eigvalsh(S[:, None] * A * S[None, :])
        print(f"[{tag}] free dofs {nf}; Jacobi spectrum: "
              f"min {lam_j[0]:.3e} max {lam_j[-1]:.3e} "
              f"kappa {lam_j[-1]/lam_j[0]:.1f}")
        tab = effective_kappas(lam_j)
        print("  jacobi  k-drop: " + "  ".join(
            f"k={k}:κ={v[0]:.0f},it≈{v[1]:.0f}" for k, v in tab.items()))
        # low-mode census: how many modes below fractions of the median
        med = np.median(lam_j)
        for frac in (0.01, 0.05, 0.1, 0.25):
            cnt = int((lam_j < frac * med).sum())
            print(f"  jacobi modes < {frac}*median: {cnt} "
                  f"({cnt/nf*100:.2f}% of free)")
        if do_fdm:
            Minv = fdm_minv_dense(p, np.asarray(free, dtype=np.float64))
            if Minv is None:
                print("  (no FDM: no tensor structure)")
                continue
            Mi = Minv[np.ix_(idx, idx)]
            Mi = 0.5 * (Mi + Mi.T)
            lamM, V = np.linalg.eigh(Mi)
            lamM = np.maximum(lamM, 1e-300)
            Sq = V * np.sqrt(lamM)[None, :]     # Mi^(1/2)
            lam_f = np.linalg.eigvalsh(Sq.T @ A @ Sq)
            print(f"  FDM spectrum: min {lam_f[0]:.3e} max {lam_f[-1]:.3e}"
                  f" kappa {lam_f[-1]/lam_f[0]:.1f}")
            tab = effective_kappas(lam_f)
            print("  fdm     k-drop: " + "  ".join(
                f"k={k}:κ={v[0]:.0f},it≈{v[1]:.0f}" for k, v in tab.items()))
            med = np.median(lam_f)
            for frac in (0.01, 0.05, 0.1, 0.25):
                cnt = int((lam_f < frac * med).sum())
                print(f"  fdm modes < {frac}*median: {cnt} "
                      f"({cnt/nf*100:.2f}% of free)")
            # also: high-outlier census (CG suffers from both ends)
            for frac in (4.0, 10.0):
                cnt = int((lam_f > frac * med).sum())
                print(f"  fdm modes > {frac}*median: {cnt}")


if __name__ == "__main__":
    sizes = sys.argv[1:] or ["3", "4", "5"]
    for ne in sizes:
        analyze(int(ne), 4)
