"""SpMM (multi-vector) and SpGEMM coverage (the PETSc MatMatMult analog,
used by the reference IBM at `immersed_boundary.py:199-206`)."""
import numpy as np
import numpy.testing as npt
import jax.numpy as jnp

from pynama_tpu.sparse import COO, CSR, spmv, spgemm
from pynama_tpu.sparse.assemble import coo_to_csr


def rand_sparse(rng, n, m, density=0.15):
    mask = rng.random((n, m)) < density
    dense = np.where(mask, rng.standard_normal((n, m)), 0.0)
    r, c = np.nonzero(dense)
    return dense, COO(data=jnp.asarray(dense[r, c]),
                      row=jnp.asarray(r.astype(np.int32)),
                      col=jnp.asarray(c.astype(np.int32)), shape=(n, m))


def test_spmm_multivector():
    rng = np.random.default_rng(0)
    dense, A = rand_sparse(rng, 30, 20)
    Ac = coo_to_csr(A)
    X = rng.standard_normal((20, 5))
    npt.assert_allclose(np.asarray(spmv(Ac, jnp.asarray(X))), dense @ X,
                        rtol=1e-12, atol=1e-12)
    npt.assert_allclose(np.asarray(spmv(A, jnp.asarray(X))), dense @ X,
                        rtol=1e-12, atol=1e-12)


def test_spgemm_matches_dense():
    rng = np.random.default_rng(1)
    dA, A = rand_sparse(rng, 25, 40)
    dB, B = rand_sparse(rng, 40, 18)
    C = spgemm(coo_to_csr(A), coo_to_csr(B))
    dense_C = np.zeros((25, 18))
    for i in range(25):
        for k in range(C.indptr[i], C.indptr[i + 1]):
            dense_C[i, C.indices[k]] = C.data[k]
    npt.assert_allclose(dense_C, dA @ dB, rtol=1e-12, atol=1e-12)


def test_spgemm_coo_inputs_and_duplicates():
    rng = np.random.default_rng(2)
    dA, A = rand_sparse(rng, 12, 12, density=0.4)
    C = spgemm(A, A)
    dense_C = np.zeros((12, 12))
    for i in range(12):
        for k in range(C.indptr[i], C.indptr[i + 1]):
            dense_C[i, C.indices[k]] = C.data[k]
    npt.assert_allclose(dense_C, dA @ dA, rtol=1e-12, atol=1e-12)
    # columns sorted within rows
    for i in range(12):
        seg = C.indices[C.indptr[i]:C.indptr[i + 1]]
        assert (np.diff(seg) > 0).all()
