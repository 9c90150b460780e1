"""Element-local KLE matrices and nodal operators.

Re-derivation of reference `src/domain/elements/spectral.py:92-228`
(`getElemKLEMatrices`, `getElemKLEOperators`) in vectorized tensor form, with
local dofs in plain tensor order (axis 0 slowest) and interleaved components
(dof = node*dim + comp). Supports a single element geometry or a batch of
element geometries (leading E axis) — on a uniform box mesh every element
shares one geometry, so a single set of matrices serves the whole mesh.

The KLE ("kinematic Laplacian") element system is
  K  = integral grad(v):grad(v)                     (full quadrature)
       + alpha_d * div(v) div(v) + alpha_w * curl(v).curl(v)   (reduced quad)
  Rw = integral v . curl(w)      (full)  + alpha_w curl(v).w   (reduced)
  Rd = -integral v . grad(.)     (full)  + alpha_d div-term    (reduced)
with alpha_w = 1e2, alpha_d = 1e3 (spectral.py:96-97).

Nodal operators (GLL nodal quadrature, spectral.py:162-228): SrT (velocity ->
symmetric strain components), DivSrT (strain -> velocity), Curl (velocity ->
vorticity), and the lumped weight vector used for row scaling.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from pynama_tpu.basis.tables import QuadFamily, TensorBasis

ALPHA_W = 1.0e2
ALPHA_D = 1.0e3


# ---------------------------------------------------------------------------
# sign/index tensors (the ind* tables of spectral.py:26-33 in dense form)
# ---------------------------------------------------------------------------

def curl_tensor(dim: int) -> np.ndarray:
    """T[w, c, d] with (curl v)_w = sum_{c,d} T[w,c,d] d_d v_c.

    2D: scalar curl  w_z = dv_y/dx - dv_x/dy   (dim_w = 1)
    3D: standard Levi-Civita curl              (dim_w = 3)
    """
    if dim == 2:
        T = np.zeros((1, 2, 2))
        T[0, 1, 0] = 1.0
        T[0, 0, 1] = -1.0
        return T
    T = np.zeros((3, 3, 3))
    for w in range(3):
        for d in range(3):
            for c in range(3):
                T[w, c, d] = _eps(w, d, c)
    return T


def _eps(i, j, k):
    return ((i - j) * (j - k) * (k - i)) / 2.0


def vorticity_curl_tensor(dim: int) -> np.ndarray:
    """T[c, e, d] with (curl w)_c = sum_{e,d} T[c,e,d] d_d w_e.

    2D: curl of scalar w -> (dw/dy, -dw/dx); 3D: standard curl.
    (reference indWCurl, spectral.py:26,31)
    """
    if dim == 2:
        T = np.zeros((2, 1, 2))
        T[0, 0, 1] = 1.0
        T[1, 0, 0] = -1.0
        return T
    T = np.zeros((3, 3, 3))
    for c in range(3):
        for e in range(3):
            for d in range(3):
                T[c, e, d] = _eps(c, d, e)
    return T


def srt_tensor(dim: int) -> np.ndarray:
    """T[s, c, d] with strain component s = sum T[s,c,d] d_d v_c.

    Reduced symmetric components (reference B_srt, spectral.py:199-217):
    2D: [du/dx, (du/dy+dv/dx)/2, dv/dy]
    3D: [du/dx, (u_y+v_x)/2, dv/dy, (v_z+w_y)/2, dw/dz, (u_z+w_x)/2]
    """
    if dim == 2:
        T = np.zeros((3, 2, 2))
        T[0, 0, 0] = 1.0
        T[2, 1, 1] = 1.0
        T[1, 1, 0] = 0.5
        T[1, 0, 1] = 0.5
        return T
    T = np.zeros((6, 3, 3))
    T[0, 0, 0] = 1.0
    T[2, 1, 1] = 1.0
    T[4, 2, 2] = 1.0
    for s, c, d in [(1, 1, 0), (1, 0, 1), (3, 2, 1), (3, 1, 2),
                    (5, 2, 0), (5, 0, 2)]:
        T[s, c, d] = 0.5
    return T


def div_srt_tensor(dim: int) -> np.ndarray:
    """T[c, s, d] with (div sigma)_c = sum T[c,s,d] d_d sigma_s.

    Uses the symmetric-component index map indBdiv (spectral.py:28,33):
    2D [[0,1],[1,2]]; 3D [[0,1,5],[1,2,3],[5,3,4]] with rows indexed by the
    derivative axis and columns by the velocity component.
    """
    ind = [[0, 1], [1, 2]] if dim == 2 else [[0, 1, 5], [1, 2, 3], [5, 3, 4]]
    dim_s = 3 if dim == 2 else 6
    T = np.zeros((dim, dim_s, dim))
    for d in range(dim):
        for c in range(dim):
            T[c, ind[d][c], d] = 1.0
    return T


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _geometry(fam: QuadFamily, corners: np.ndarray):
    """Physical derivatives and weighted Jacobian determinant.

    corners: (..., 2**dim, dim). Returns (Hxy, wdet):
      Hxy:  (..., nq, dim, nnode)   d h_a / d x_p at each quad point
      wdet: (..., nq)               w_q * det J_q
    """
    # J[..., q, r, p] = sum_a DCoo[q, r, a] corners[..., a, p]
    J = np.einsum('qra,...ap->...qrp', fam.DCoo, corners, optimize=True)
    detJ = np.linalg.det(J)
    Jinv = np.linalg.inv(J)  # (..., q, p, r) inverse as matrix
    Hxy = np.einsum('...qpr,qra->...qpa', Jinv, fam.D, optimize=True)
    wdet = fam.weights * detJ
    return Hxy, wdet


def _interleave_quad(M: np.ndarray, dims: tuple[int, int]) -> np.ndarray:
    """(..., a, c, b, e) -> (..., a*dc + c, b*de + e)."""
    dc, de = dims
    sh = M.shape
    return M.reshape(sh[:-4] + (sh[-4] * dc, sh[-2] * de))


# ---------------------------------------------------------------------------
# element matrices
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ElementMatrices:
    """K, Rw, Rd with interleaved dof layout; possibly batched over elements."""
    K: np.ndarray    # (..., nnode*dim, nnode*dim)
    Rw: np.ndarray   # (..., nnode*dim, nnode*dim_w)
    Rd: np.ndarray   # (..., nnode*dim, nnode)


@dataclasses.dataclass(frozen=True)
class ElementOperators:
    SrT: np.ndarray     # (..., nnode*dim_s, nnode*dim)
    DivSrT: np.ndarray  # (..., nnode*dim, nnode*dim_s)
    Curl: np.ndarray    # (..., nnode*dim_w, nnode*dim)
    weight: np.ndarray  # (..., nnode) lumped weights (w_q * detJ at nodes)


def compute_kle_matrices(basis: TensorBasis, corners: np.ndarray,
                         alpha_w: float = ALPHA_W,
                         alpha_d: float = ALPHA_D) -> ElementMatrices:
    """Element K/Rw/Rd (reference getElemKLEMatrices, spectral.py:92-160).

    The quadratic forms run as explicit batched GEMMs: at 1000 distinct
    3D ngl=4 geometries the original 5-index einsums cost 254 s of host
    time (the curl penalty alone 29 s even with optimize=True); the GEMM
    forms build the same matrices in ~2 s. Row/column flattening is the
    interleaved dof order (node*dim + comp) throughout, so no transposed
    interleave pass is needed on the big outputs.
    """
    dim = basis.dim
    Tc = curl_tensor(dim)        # (dim_w, dim, dim)
    Tw = vorticity_curl_tensor(dim)  # (dim, dim_w, dim)
    dim_w = Tc.shape[0]
    eye = np.eye(dim)
    corners = np.asarray(corners, dtype=np.float64)
    if corners.ndim not in (2, 3):
        raise ValueError(
            f"corners must be (n_corners, dim) or (E, n_corners, dim); "
            f"got ndim={corners.ndim} (arbitrary leading batch dims are "
            "not supported by the batched-GEMM forms)")
    batched = corners.ndim == 3
    C = corners if batched else corners[None]
    E = C.shape[0]

    # --- full quadrature: vector Laplacian, Rw, Rd main terms
    Hxy, wdet = _geometry(basis.full, C)       # (E, nq, dim, nn), (E, nq)
    H = basis.full.H                           # (nq, nn)
    nqf, nn = H.shape
    # scalar Laplacian L[a,b] = sum_{q,d} w Hxy[q,d,a] Hxy[q,d,b]
    Xf = Hxy.reshape(E, nqf * dim, nn)
    L = np.matmul((wdet[:, :, None, None] * Hxy)
                  .reshape(E, nqf * dim, nn).transpose(0, 2, 1), Xf)
    K = _interleave_quad(
        L[:, :, None, :, None] * eye[None, :, None, :], (dim, dim))

    # shared full-family mixed form M[d,a,b] = sum_q (w H)[q,a] Hxy[q,d,b]
    wH = wdet[:, :, None] * H[None]
    M = np.einsum('eqa,eqdb->edab', wH, Hxy, optimize=True)

    # Rw full: [(a,c),(b,f)] = sum_d Tw[c,f,d] M[d,a,b]
    Rw = _interleave_quad(
        np.einsum('cfd,edab->eacbf', Tw, M, optimize=True),
        (dim, basis.dim_w))

    # Rd full: [(a,c), b] = -M[c,a,b]
    Rd = -M.transpose(0, 2, 1, 3).reshape(E, nn * dim, nn)

    # --- reduced quadrature penalties
    Hxy_r, wdet_r = _geometry(basis.reduced, C)
    H_r = basis.reduced.H
    nqr = H_r.shape[0]
    # div penalty: rows/cols directly in interleaved (a*dim + c) order
    Zi = Hxy_r.transpose(0, 1, 3, 2).reshape(E, nqr, nn * dim)
    wZi = wdet_r[:, :, None] * Zi
    K = K + alpha_d * np.matmul(wZi.transpose(0, 2, 1), Zi)
    # curl penalty: Bc rows (q,w), cols (a,c) interleaved
    Bc = np.einsum('wcd,eqda->eqwac', Tc, Hxy_r, optimize=True)
    Bf = Bc.reshape(E, nqr * dim_w, nn * dim)
    wBf = (wdet_r[:, :, None, None, None] * Bc) \
        .reshape(E, nqr * dim_w, nn * dim)
    K = K + alpha_w * np.matmul(wBf.transpose(0, 2, 1), Bf)
    # Rw penalty: [(a,c),(b,e)] = sum_q (w Bc)[q,e,a,c] H_r[q,b]
    wBq = (wdet_r[:, :, None, None, None] * Bc).reshape(E, nqr, -1)
    Npen = np.matmul(wBq.transpose(0, 2, 1), H_r) \
        .reshape(E, dim_w, nn, dim, nn)            # [e, a, c, b]
    Rw = Rw + alpha_w * Npen.transpose(0, 2, 3, 4, 1) \
        .reshape(E, nn * dim, nn * dim_w)
    # Rd penalty: [(a,c), b] = alpha_d sum_q w Hxy_r[q,c,a] H_r[q,b]
    Rd = Rd + alpha_d * np.matmul(wZi.transpose(0, 2, 1), H_r)

    if not batched:
        K, Rw, Rd = K[0], Rw[0], Rd[0]
    return ElementMatrices(K=K, Rw=Rw, Rd=Rd)


def compute_operators(basis: TensorBasis, corners: np.ndarray
                      ) -> ElementOperators:
    """Nodal SrT/DivSrT/Curl/weights (reference getElemKLEOperators,
    spectral.py:162-228)."""
    dim = basis.dim
    fam = basis.operator
    corners = np.asarray(corners, dtype=np.float64)
    if corners.ndim not in (2, 3):
        raise ValueError(
            f"corners must be (n_corners, dim) or (E, n_corners, dim); "
            f"got ndim={corners.ndim}")
    batched = corners.ndim == 3
    C = corners if batched else corners[None]
    Hxy, wdet = _geometry(fam, C)
    H = fam.H
    Ts = srt_tensor(dim)
    Td = div_srt_tensor(dim)
    Tc = curl_tensor(dim)

    # shared mixed form M[d,a,b] = sum_q (w H)[q,a] Hxy[q,d,b]: ONE batched
    # GEMM feeds all three operators (the per-operator 4-factor einsums
    # re-contracted it three times and cost most of the unstructured
    # setup at production cell counts)
    wH = wdet[:, :, None] * H[None]
    M = np.einsum('eqa,eqdb->edab', wH, Hxy, optimize=True)

    SrT = _interleave_quad(
        np.einsum('scd,edab->easbc', Ts, M, optimize=True),
        (basis.dim_s, dim))
    DivSrT = _interleave_quad(
        np.einsum('csd,edab->eacbs', Td, M, optimize=True),
        (dim, basis.dim_s))
    Curl = _interleave_quad(
        np.einsum('wcd,edab->eawbc', Tc, M, optimize=True),
        (basis.dim_w, dim))
    # partition of unity: row sums of the weight matrix reduce to w_q detJ
    # projected on the nodal basis (spectral.py:225-227)
    weight = np.einsum('eqa->ea', wH, optimize=True)
    if not batched:
        SrT, DivSrT, Curl, weight = SrT[0], DivSrT[0], Curl[0], weight[0]
    return ElementOperators(SrT=SrT, DivSrT=DivSrT, Curl=Curl, weight=weight)
