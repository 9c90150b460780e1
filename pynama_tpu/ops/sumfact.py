"""Sum-factorized (matrix-free geometry) application of the element KLE
operator K — the Deville-Fischer-Mund SEM apply, TPU form.

On unstructured/hex meshes every element has its own geometry, so the
engine's dense path stores a per-element K of (nnode·dim)² floats —
147 KB/element at 3D ngl=4, several GB at production cell counts, and every
CG iteration streams all of it from HBM (the reference never faces this:
PETSc assembles one global CSR, `src/matrices/mat_fs.py:131-201`). The
sum-factorized form stores only per-quadrature-point geometry:

    full family:  G[q]  = w_q |J_q| · J_q⁻¹ J_q⁻ᵀ   (dim×dim symmetric)
    reduced:      Jr[q] = J_q⁻¹,  wr[q] = w_q |J_q|

≈ 2.6 KB/element at 3D ngl=4 — 56× less HBM traffic per apply — and applies
K as per-axis 1D contractions (shared Lagrange tables on the MXU) plus
pointwise dim×dim contractions (VPU):

    K u = Σ_r D_rᵀ [ G · (D u) ]                         (stiffness)
        + α_d Σ_r D̃_rᵀ [ Jr wr tr(Jr ∇̃u) ]              (div penalty)
        + α_w Σ_r D̃_rᵀ [ Jr wr (T·(Jr ∇̃u)) ]            (curl penalty)

where D/D̃ are the full/reduced-family tensor-product derivative operators
and T the Levi-Civita curl tensor (elements/kle.py curl_tensor). Exactly
reproduces `elements/kle.py compute_kle_matrices` (same quadrature families,
reference `src/domain/elements/spectral.py:96-160`); the equivalence against
the dense per-element K on random distorted meshes is tested in
`tests/test_sumfact.py`. Wired into the engine for unstructured meshes
(engine flag `sumfact`, on by default there — see
`local_engine.build_engine`).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pynama_tpu.basis.lagrange import lagrange_basis
from pynama_tpu.basis.quadrature import gauss_points, lobatto_points
from pynama_tpu.elements.kle import ALPHA_D, ALPHA_W, curl_tensor

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SumFactK:
    """Per-element geometric factors + shared 1D tables for one mesh."""
    #: (E, nqf, dim, dim) full-family  w|J|·J⁻¹J⁻ᵀ  per quad point
    G: jax.Array
    #: (E, nqr, dim, dim) reduced-family J⁻¹ (matrix-inverse index order
    #: [p, r]: ∂u/∂x_p = Σ_r Jr[p,r] ∂u/∂ξ_r)
    Jr: jax.Array
    #: (E, nqr) reduced-family w|J|
    wr: jax.Array
    #: shared 1D tables: value/derivative of the N nodal Lagrange functions
    #: at the family's 1D points — (nq1, N) each
    Hf: jax.Array
    Df: jax.Array
    Hr: jax.Array
    Dr: jax.Array
    #: curl sign tensor (dim_w, dim, dim)
    Tc: jax.Array
    dim: int = dataclasses.field(metadata=dict(static=True))
    ngl: int = dataclasses.field(metadata=dict(static=True))
    #: full family is GLL-nodal (H = identity, skip interpolation passes)
    nodal_full: bool = dataclasses.field(metadata=dict(static=True))
    alpha_w: float = dataclasses.field(default=ALPHA_W,
                                       metadata=dict(static=True))
    alpha_d: float = dataclasses.field(default=ALPHA_D,
                                       metadata=dict(static=True))


def _family_geometry(DCoo: np.ndarray, weights: np.ndarray,
                     corners: np.ndarray):
    """Jinv (E, nq, dim, dim) and w|J| (E, nq) from corner coords."""
    J = np.einsum('qra,eap->eqrp', DCoo, corners)
    detJ = np.abs(np.linalg.det(J))   # w|J|: orientation-safe
    Jinv = np.linalg.inv(J)
    return Jinv, weights[None, :] * detJ


def build_sumfact(basis, corners: np.ndarray, dtype,
                  alpha_w: float = ALPHA_W,
                  alpha_d: float = ALPHA_D) -> SumFactK:
    """SumFactK from a TensorBasis and (E, 2**dim, dim) corner coords."""
    dim, ngl = basis.dim, basis.ngl
    corners = np.asarray(corners, dtype=np.float64)
    if corners.ndim == 2:
        corners = corners[None]

    Jf, wf = _family_geometry(basis.full.DCoo, basis.full.weights, corners)
    G = np.einsum('eq,eqpr,eqps->eqrs', wf, Jf, Jf)
    Jr, wr = _family_geometry(basis.reduced.DCoo, basis.reduced.weights,
                              corners)

    nodes1d, _ = lobatto_points(ngl)
    if ngl <= 3:
        fq, _ = gauss_points(ngl)
    else:
        fq, _ = lobatto_points(ngl)
    rq, _ = gauss_points(ngl - 1)
    Hf, Df = lagrange_basis(nodes1d, fq)
    Hr, Dr = lagrange_basis(nodes1d, rq)
    nodal = bool(np.allclose(Hf, np.eye(ngl), atol=1e-13))

    j = lambda a: jnp.asarray(a, dtype=dtype)
    return SumFactK(
        G=j(G), Jr=j(Jr), wr=j(wr),
        Hf=j(Hf), Df=j(Df), Hr=j(Hr), Dr=j(Dr),
        Tc=j(curl_tensor(dim)),
        dim=dim, ngl=ngl, nodal_full=nodal,
        alpha_w=float(alpha_w), alpha_d=float(alpha_d))


def _axpass(z: jax.Array, A: jax.Array, d: int) -> jax.Array:
    """Contract tensor axis 1+d of z (E, n0.., c) with A (m, n): the 1D
    sum-factorization pass. Axis moved to position 1 so the matmul keeps a
    large trailing flat axis (full MXU lanes)."""
    z = jnp.moveaxis(z, 1 + d, 1)
    sh = z.shape
    y = _mm(A, z.reshape(sh[0], sh[1], -1))
    y = y.reshape((sh[0], A.shape[0]) + sh[2:])
    return jnp.moveaxis(y, 1, 1 + d)


def _gradients(z, H, D, dim, nodal):
    """Reference-space gradients at the family's tensor points: list over
    derivative axis r of (E, nq0.., c) tensors. Shares the axis-0
    interpolation between the r=1,2 passes."""
    if nodal:
        return [_axpass(z, D, r) for r in range(dim)]
    if dim == 2:
        t0 = _axpass(z, H, 0)
        return [_axpass(_axpass(z, D, 0), H, 1), _axpass(t0, D, 1)]
    t0 = _axpass(z, H, 0)
    g0 = _axpass(_axpass(_axpass(z, D, 0), H, 1), H, 2)
    g1 = _axpass(_axpass(t0, D, 1), H, 2)
    g2 = _axpass(_axpass(t0, H, 1), D, 2)
    return [g0, g1, g2]


def _gradients_t(s_list, H, D, dim, nodal):
    """Transpose of _gradients: scatter per-axis cotangents back to nodes
    (Σ_r D_rᵀ s_r). Per-axis transforms commute, so each term applies the
    transposed tables in any order."""
    Ht, Dt = H.T, D.T
    out = None
    for r, s in enumerate(s_list):
        y = s
        for ax in range(dim):
            if nodal and ax != r:
                continue
            y = _axpass(y, Dt if ax == r else Ht, ax)
        out = y if out is None else out + y
    return out


def apply_sumfact_k(sf: SumFactK, t: jax.Array) -> jax.Array:
    """y = t @ K_eᵀ per element, (E, nnode·dim) -> (E, nnode·dim): the
    un-assembled element product (caller DSSes, as with the dense path)."""
    dim, N = sf.dim, sf.ngl
    E = t.shape[0]
    z = t.reshape((E,) + (N,) * dim + (dim,))

    # ---- stiffness (full family): Σ_r D_rᵀ [G · ∇̂u]
    g = _gradients(z, sf.Hf, sf.Df, dim, sf.nodal_full)
    qsh = g[0].shape[1:-1]                          # full-family point grid
    gs = jnp.stack([x.reshape(E, -1, dim) for x in g], axis=2)  # (E,q,r,c)
    s = jnp.einsum('eqrp,eqrc->eqpc', sf.G, gs)
    s_list = [s[:, :, r, :].reshape((E,) + qsh + (dim,)) for r in range(dim)]
    y = _gradients_t(s_list, sf.Hf, sf.Df, dim, sf.nodal_full)

    # ---- penalties (reduced family)
    gr = _gradients(z, sf.Hr, sf.Dr, dim, False)
    rsh = gr[0].shape[1:-1]
    grs = jnp.stack([x.reshape(E, -1, dim) for x in gr], axis=2)
    gp = jnp.einsum('eqpr,eqrc->eqpc', sf.Jr, grs)   # physical ∇u
    div = jnp.einsum('eqcc->eq', gp)
    curl = jnp.einsum('wcd,eqdc->eqw', sf.Tc, gp)
    # cotangent of the physical gradient: α_d w div δ_pc + α_w w Σ T curl
    eye = jnp.eye(dim, dtype=t.dtype)
    sp = (sf.alpha_d * (sf.wr * div)[:, :, None, None] * eye
          + sf.alpha_w * sf.wr[:, :, None, None]
          * jnp.einsum('wcp,eqw->eqpc', sf.Tc, curl))
    sr = jnp.einsum('eqpr,eqpc->eqrc', sf.Jr, sp)    # back to reference
    sr_list = [sr[:, :, r, :].reshape((E,) + rsh + (dim,))
               for r in range(dim)]
    y = y + _gradients_t(sr_list, sf.Hr, sf.Dr, dim, False)

    return y.reshape(E, N**dim * dim)
