"""Equivalence of the sum-factorized K (ops/sumfact.py) with the dense
per-element K (elements/kle.py compute_kle_matrices) on random distorted
meshes, plus the engine-level wiring for unstructured meshes."""
import numpy as np
import pytest

import jax.numpy as jnp

from pynama_tpu.basis import make_tensor_basis
from pynama_tpu.elements import compute_kle_matrices
from pynama_tpu.ops.sumfact import apply_sumfact_k, build_sumfact


def _distorted_corners(rng, dim, n_elem, jitter=0.15):
    """Random parallelepiped-ish elements: unit cube corners + jitter,
    random affine stretch per element (keeps orientation positive)."""
    base = np.array(np.meshgrid(*[[0.0, 1.0]] * dim,
                                indexing="ij")).reshape(dim, -1).T
    if dim == 3:  # corner order (z fastest in meshgrid 'ij' -> match kle)
        pass
    out = np.zeros((n_elem, 2 ** dim, dim))
    for e in range(n_elem):
        A = np.eye(dim) + 0.2 * rng.standard_normal((dim, dim))
        while np.linalg.det(A) < 0.3:
            A = np.eye(dim) + 0.2 * rng.standard_normal((dim, dim))
        out[e] = base @ A.T + jitter * rng.standard_normal(base.shape) \
            + rng.standard_normal(dim)
    return out


@pytest.mark.parametrize("dim,ngl", [(2, 3), (2, 5), (3, 3), (3, 4)])
def test_sumfact_matches_dense_k(dim, ngl):
    rng = np.random.default_rng(11)
    n_elem = 5
    corners = _distorted_corners(rng, dim, n_elem)
    basis = make_tensor_basis(ngl, dim)
    em = compute_kle_matrices(basis, corners)          # (E, nnc, nnc)
    sf = build_sumfact(basis, corners, jnp.float64)
    nnc = ngl ** dim * dim
    t = jnp.asarray(rng.standard_normal((n_elem, nnc)))
    dense = jnp.einsum("ei,eoi->eo", t, jnp.asarray(em.K))
    got = apply_sumfact_k(sf, t)
    scale = float(jnp.max(jnp.abs(dense)))
    assert float(jnp.max(jnp.abs(got - dense))) / scale < 1e-12


def test_sumfact_negative_orientation_abs_det():
    """A mirrored element must contribute with w|J|, not w·det(J)."""
    rng = np.random.default_rng(3)
    dim, ngl = 2, 4
    corners = _distorted_corners(rng, dim, 1)
    flipped = corners[:, :, ::-1].copy()      # swap x/y: det < 0
    basis = make_tensor_basis(ngl, dim)
    sf_pos = build_sumfact(basis, corners, jnp.float64)
    sf_neg = build_sumfact(basis, flipped, jnp.float64)
    assert float(jnp.min(sf_neg.wr)) > 0
    assert float(jnp.min(sf_pos.wr)) > 0


def test_engine_sumfact_default_on_unstructured(tmp_path):
    """Unstructured meshes get the sum-factorized K by default; the dense
    KT never ships to the device; apply_K and the KLE solve agree with
    the dense path."""
    from pynama_tpu.cases import Problem
    from pynama_tpu.engine import local_engine as E
    from tests.msh_fixtures import grid_quad_mesh, write_msh22

    v, q, l = grid_quad_mesh(4, 3, distort=0.12)
    path = str(tmp_path / "sf.msh")
    write_msh22(path, v, q, l)
    cfg = {
        "name": "sf-gmsh",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {"ngl": 4, "gmsh-file": path},
        "boundary-conditions": {"free-slip": {
            "up": [1, 0], "down": [1, 0], "left": [1, 0], "right": [1, 0]}},
        "initial-conditions": {"vorticity": [0.0]},
    }
    p_sf = Problem(cfg, solver="cg", cg_rtol=1e-11, cg_maxiter=600)
    p_sf.setUp()
    p_dn = Problem(cfg, solver="cg", cg_rtol=1e-11, cg_maxiter=600,
                   sumfact=False)
    p_dn.setUp()
    assert p_sf.engine_ops.sumfact is not None
    assert p_sf.engine_ops.KT.size == 0
    assert p_dn.engine_ops.sumfact is None

    rng = np.random.default_rng(5)
    v = jnp.asarray(p_sf.to_local(rng.standard_normal(
        (p_sf.mesh.n_nodes, p_sf.dim))), dtype=p_sf.dtype)
    a = E.apply_K(p_sf.engine_ops, v)
    b = E.apply_K(p_dn.engine_ops, v)
    scale = float(jnp.max(jnp.abs(b))) + 1e-30
    assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-11

    w = E.curl(p_dn.engine_ops, v)
    _, vel_sf = E.solve_kle_local(p_sf.engine_ops, w,
                                  jnp.zeros_like(v), 0.0)
    _, vel_dn = E.solve_kle_local(p_dn.engine_ops, w,
                                  jnp.zeros_like(v), 0.0)
    err = float(jnp.max(jnp.abs(vel_sf - vel_dn)))
    assert err < 1e-7 * (1 + float(jnp.max(jnp.abs(vel_dn)))), err
