"""Quadrature and basis golden-value tests.

Golden values follow the reference suite (src/tests/test_element.py:181-229):
exact Gauss/Lobatto nodes & weights for small N, plus mathematical property
checks (partition of unity, derivative exactness).
"""
import math

import numpy as np
import numpy.testing as npt
import pytest

from pynama_tpu.basis import (gauss_points, lobatto_points, lagrange_basis,
                              make_tensor_basis)


def test_gauss_n2():
    x, w = gauss_points(2)
    npt.assert_allclose(x, [-1 / math.sqrt(3), 1 / math.sqrt(3)], atol=1e-15)
    npt.assert_allclose(w, [1.0, 1.0], atol=1e-15)


def test_gauss_n3():
    x, w = gauss_points(3)
    npt.assert_allclose(x, [-math.sqrt(3 / 5), 0.0, math.sqrt(3 / 5)],
                        atol=1e-14)
    npt.assert_allclose(w, [5 / 9, 8 / 9, 5 / 9], atol=1e-14)


def test_lobatto_small_n():
    for n, (xe, we) in {
        2: ([-1, 1], [1, 1]),
        3: ([-1, 0, 1], [1 / 3, 4 / 3, 1 / 3]),
        4: ([-1, -1 / math.sqrt(5), 1 / math.sqrt(5), 1],
            [1 / 6, 5 / 6, 5 / 6, 1 / 6]),
    }.items():
        x, w = lobatto_points(n)
        npt.assert_allclose(x, xe, atol=1e-14)
        npt.assert_allclose(w, we, atol=1e-14)


@pytest.mark.parametrize("n", range(2, 11))
def test_quadrature_exactness(n):
    """Gauss(n) integrates degree 2n-1 exactly, GLL(n) degree 2n-3."""
    for pts, wts, maxdeg in [(*gauss_points(n), 2 * n - 1),
                             (*lobatto_points(n), max(2 * n - 3, 1))]:
        for d in range(maxdeg + 1):
            exact = 2.0 / (d + 1) if d % 2 == 0 else 0.0
            npt.assert_allclose(np.sum(wts * pts**d), exact, atol=1e-12)


@pytest.mark.parametrize("n", range(2, 9))
def test_lagrange_properties(n):
    nodes, _ = lobatto_points(n)
    xq = np.linspace(-1, 1, 17)
    h, dh = lagrange_basis(nodes, xq)
    # partition of unity and its derivative
    npt.assert_allclose(h.sum(1), 1.0, atol=1e-12)
    npt.assert_allclose(dh.sum(1), 0.0, atol=1e-11)
    # cardinal property at the nodes
    hn, _ = lagrange_basis(nodes, nodes)
    npt.assert_allclose(hn, np.eye(n), atol=1e-12)
    # exact for polynomials up to degree n-1
    for d in range(n):
        vals = h @ nodes**d
        npt.assert_allclose(vals, xq**d, atol=1e-10)
        dvals = dh @ nodes**d
        npt.assert_allclose(dvals, d * xq ** max(d - 1, 0) if d else 0 * xq,
                            atol=1e-9)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("ngl", [3, 4])
def test_tensor_basis(dim, ngl):
    b = make_tensor_basis(ngl, dim)
    for fam in (b.full, b.reduced, b.operator):
        npt.assert_allclose(fam.H.sum(1), 1.0, atol=1e-12)
        npt.assert_allclose(fam.D.sum(-1), 0.0, atol=1e-11)
        npt.assert_allclose(fam.weights.sum(), 2.0**dim, atol=1e-12)
        npt.assert_allclose(fam.HCoo.sum(1), 1.0, atol=1e-12)
    # operator family is nodal: H must be identity
    npt.assert_allclose(b.operator.H, np.eye(ngl**dim), atol=1e-12)
