"""Element matrix tests: differential testing against an independent
loop-based construction (the reference models this pattern by testing its
vectorized Spectral against the legacy elemutils, src/tests/test_element.py).
"""
import numpy as np
import numpy.testing as npt
import pytest

from pynama_tpu.basis import make_tensor_basis
from pynama_tpu.elements import (compute_kle_matrices, compute_operators,
                                 curl_tensor, vorticity_curl_tensor,
                                 srt_tensor, div_srt_tensor)
from pynama_tpu.elements.kle import ALPHA_D, ALPHA_W, _geometry


def _slow_kle(basis, corners):
    """Naive per-quad-point, per-entry construction of K/Rw/Rd."""
    dim, nn = basis.dim, basis.nnode
    dim_w = basis.dim_w
    Tc, Tw = curl_tensor(dim), vorticity_curl_tensor(dim)
    K = np.zeros((nn * dim, nn * dim))
    Rw = np.zeros((nn * dim, nn * dim_w))
    Rd = np.zeros((nn * dim, nn))

    Hxy, wdet = _geometry(basis.full, corners)
    H = basis.full.H
    for q in range(len(wdet)):
        for a in range(nn):
            for b in range(nn):
                g = sum(Hxy[q, d, a] * Hxy[q, d, b] for d in range(dim))
                for c in range(dim):
                    K[a * dim + c, b * dim + c] += wdet[q] * g
                for c in range(dim):
                    for e in range(dim_w):
                        s = sum(Tw[c, e, d] * Hxy[q, d, b]
                                for d in range(dim))
                        Rw[a * dim + c, b * dim_w + e] += \
                            wdet[q] * H[q, a] * s
                for c in range(dim):
                    Rd[a * dim + c, b] -= wdet[q] * H[q, a] * Hxy[q, c, b]

    Hxy, wdet = _geometry(basis.reduced, corners)
    H = basis.reduced.H
    for q in range(len(wdet)):
        for a in range(nn):
            for b in range(nn):
                for c in range(dim):
                    for e in range(dim):
                        K[a * dim + c, b * dim + e] += ALPHA_D * wdet[q] * \
                            Hxy[q, c, a] * Hxy[q, e, b]
                        cc = sum(
                            sum(Tc[w, c, d] * Hxy[q, d, a]
                                for d in range(dim))
                            * sum(Tc[w, e, d] * Hxy[q, d, b]
                                  for d in range(dim))
                            for w in range(basis.dim_w))
                        K[a * dim + c, b * dim + e] += \
                            ALPHA_W * wdet[q] * cc
                for c in range(dim):
                    for e in range(dim_w):
                        s = sum(Tc[e, c, d] * Hxy[q, d, a]
                                for d in range(dim))
                        Rw[a * dim + c, b * dim_w + e] += \
                            ALPHA_W * wdet[q] * s * H[q, b]
                    Rd[a * dim + c, b] += ALPHA_D * wdet[q] * \
                        Hxy[q, c, a] * H[q, b]
    return K, Rw, Rd


@pytest.mark.parametrize("dim,ngl", [(2, 3), (2, 4), (3, 3)])
def test_kle_matrices_differential(dim, ngl):
    basis = make_tensor_basis(ngl, dim)
    rng = np.random.default_rng(0)
    # mildly distorted element to exercise general geometry
    import itertools
    corners = np.array(list(itertools.product((0.0, 1.0), repeat=dim)))
    corners = corners + 0.05 * rng.standard_normal(corners.shape)
    em = compute_kle_matrices(basis, corners)
    K, Rw, Rd = _slow_kle(basis, corners)
    npt.assert_allclose(em.K, K, atol=1e-10)
    npt.assert_allclose(em.Rw, Rw, atol=1e-10)
    npt.assert_allclose(em.Rd, Rd, atol=1e-10)


@pytest.mark.parametrize("dim,ngl", [(2, 3), (2, 5), (3, 3)])
def test_kle_matrix_spd(dim, ngl):
    """K is symmetric positive semi-definite (PD after Dirichlet BC)."""
    basis = make_tensor_basis(ngl, dim)
    import itertools
    corners = np.array(list(itertools.product((0.0, 0.5), repeat=dim)))
    em = compute_kle_matrices(basis, corners)
    npt.assert_allclose(em.K, em.K.T, atol=1e-10)
    eig = np.linalg.eigvalsh(em.K)
    assert eig.min() > -1e-8 * abs(eig.max())


@pytest.mark.parametrize("dim,ngl", [(2, 4), (3, 3)])
def test_operators_polynomial_exactness(dim, ngl):
    """Element SrT/DivSrT/Curl applied to linear fields reproduce the exact
    constant derivatives after weight scaling (single element, no BC)."""
    basis = make_tensor_basis(ngl, dim)
    import itertools
    corners = np.array(list(itertools.product((0.0, 1.0), repeat=dim)))
    eo = compute_operators(basis, corners)
    nn = basis.nnode

    # nodal coordinates of the element
    from pynama_tpu.basis.lagrange import lagrange_basis
    pts = basis.operator.points
    coords = basis.operator.HCoo @ corners  # (nq=nn, dim)

    rng = np.random.default_rng(1)
    G = rng.standard_normal((dim, dim))  # v = G x (linear velocity field)
    v = coords @ G.T                     # (nn, dim)
    vflat = v.reshape(-1)

    w = eo.weight
    curl = (eo.Curl @ vflat).reshape(nn, basis.dim_w) / w[:, None]
    Tc = curl_tensor(dim)
    expect_curl = np.einsum("wcd,cd->w", Tc, G)
    npt.assert_allclose(curl, np.tile(expect_curl, (nn, 1)), atol=1e-10)

    srt = (eo.SrT @ vflat).reshape(nn, basis.dim_s) / w[:, None]
    Ts = srt_tensor(dim)
    expect_srt = np.einsum("scd,cd->s", Ts, G)
    npt.assert_allclose(srt, np.tile(expect_srt, (nn, 1)), atol=1e-10)
