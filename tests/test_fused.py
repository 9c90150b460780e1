"""Equivalence tests for the fused matmul+DSS Pallas kernel (ops/fused.py).

The kernel must reproduce `L.dss(L.emm(t, matT))` (the jnp reference path)
to f32 round-off on every structured-mesh configuration, including the
engine-level operator applications and the sharded slab decomposition
(raw-boundary-plane ppermute accumulation).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pynama_tpu.mesh import BoxMesh
from pynama_tpu.ops import local as L
from pynama_tpu.ops.fused import fused_apply

CONFIGS = [
    ((3, 4, 5), 4, 3, 3),
    ((3, 4, 5), 4, 3, 6),     # strain-family output (ncomp_out != in)
    ((2, 3), 5, 2, 3),        # 2D
    ((2, 3), 3, 2, 1),        # 2D scalar vorticity
    ((1, 2, 2), 3, 3, 1),     # degenerate axis-0 extent
    ((4, 1, 2), 4, 3, 3),     # degenerate in-slice extent
    ((2, 2, 2), 2, 3, 3),     # ngl=2 (planes cover every column)
]


@pytest.mark.parametrize("nelem,ngl,cin,cout", CONFIGS)
def test_fused_matches_jnp_dss(nelem, ngl, cin, cout):
    dim = len(nelem)
    mesh = BoxMesh.create(ngl, list(nelem), [0] * dim, [1] * dim)
    lay = L.make_local_layout(mesh, cout, dtype=jnp.float32)
    nn = ngl ** dim
    rng = np.random.default_rng(7)
    t = jnp.asarray(rng.standard_normal((mesh.n_cells, nn * cin)),
                    dtype=jnp.float32)
    matT = jnp.asarray(rng.standard_normal((nn * cin, nn * cout)),
                       dtype=jnp.float32)
    ref = L.dss(lay, L.emm(t, matT))
    got, bnd = fused_apply(t, matT, tuple(nelem), ngl, cout,
                           interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 1e-5
    # raw boundary planes: axes 1..d-1 assembled, NO axis-0 adds — equal
    # to the single-slice DSS of the boundary slices' matmul output
    z = L.emm(t, matT)
    trail = int(np.prod(nelem[1:]))
    nnc, plane = lay.nnc, lay.plane_cols
    sub = dataclasses.replace(
        lay, nelem=(1,) + tuple(nelem[1:]),
        inv_mult=jnp.zeros((trail, nnc), dtype=jnp.float32))
    first = L.dss(sub, z[:trail])[:, :plane]
    last = L.dss(sub, z[-trail:])[:, nnc - plane:]
    assert float(jnp.max(jnp.abs(bnd[0] - first))) / scale < 1e-5
    assert float(jnp.max(jnp.abs(bnd[1] - last))) / scale < 1e-5


@pytest.mark.parametrize("block", [1, 2, 3, 6])
def test_fused_block_sizes(block):
    """Every axis-0 blocking factor (1 slice .. whole mesh per grid step)
    reproduces the jnp DSS — the in-block axis-0 exchange (masked sublane
    roll) and the cross-block pipeline must agree for any split."""
    nelem, ngl, cin, cout = (6, 3, 2), 3, 3, 3
    dim = len(nelem)
    mesh = BoxMesh.create(ngl, list(nelem), [0] * dim, [1] * dim)
    lay = L.make_local_layout(mesh, cout, dtype=jnp.float32)
    nn = ngl ** dim
    rng = np.random.default_rng(11)
    t = jnp.asarray(rng.standard_normal((mesh.n_cells, nn * cin)),
                    dtype=jnp.float32)
    matT = jnp.asarray(rng.standard_normal((nn * cin, nn * cout)),
                       dtype=jnp.float32)
    ref = L.dss(lay, L.emm(t, matT))
    got, bnd = fused_apply(t, matT, tuple(nelem), ngl, cout,
                           interpret=True, block=block)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 1e-5
    # boundary planes are block-size invariant
    got1, bnd1 = fused_apply(t, matT, tuple(nelem), ngl, cout,
                             interpret=True, block=1)
    assert float(jnp.max(jnp.abs(bnd - bnd1))) / scale < 1e-5


def _tiny_problem(fused, nelem=(4, 3, 3), ngl=3):
    from pynama_tpu.cases import Problem
    dim = len(nelem)
    zero = [0] * dim
    cfg = {
        "name": "fused-test",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": zero, "upper": [1] * dim}},
        "boundary-conditions": {"no-slip": {
            s: ([1, 0, 0] if s == "up" else zero) for s in
            ("up", "down", "left", "right", "back", "front")[:2 * dim]}},
        "initial-conditions": {"vorticity": zero[:1] * (1 if dim == 2
                                                        else 3)},
    }
    p = Problem(cfg, solver="cg", cg_rtol=1e-10, cg_maxiter=400,
                fused=fused)
    p.setUp()
    return p


def test_engine_fused_equivalence():
    """apply_K / curl / srt / the full two-stage KLE solve agree between
    the fused-kernel engine (interpret mode on CPU) and the jnp engine."""
    from pynama_tpu.engine import local_engine as E
    pj = _tiny_problem(fused=False)
    pf = _tiny_problem(fused=True)
    assert pf.engine_ops.fused and pf.engine_ops.fused_interpret
    rng = np.random.default_rng(3)
    v = jnp.asarray(pj.to_local(rng.standard_normal(
        (pj.mesh.n_nodes, pj.dim))), dtype=pj.dtype)
    for name in ("apply_K", "curl", "srt"):
        a = getattr(E, name)(pj.engine_ops, v)
        b = getattr(E, name)(pf.engine_ops, v)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-8 * float(
                                       jnp.max(jnp.abs(a)) + 1))
    w = E.curl(pj.engine_ops, v)
    _, velj = E.solve_kle_local(pj.engine_ops, w, jnp.zeros_like(v), 0.0)
    _, velf = E.solve_kle_local(pf.engine_ops, w, jnp.zeros_like(v), 0.0)
    err = float(jnp.max(jnp.abs(velj - velf)))
    assert err < 1e-6 * (1 + float(jnp.max(jnp.abs(velj)))), err


def test_sharded_fused_equivalence():
    """The fused kernel's raw-plane ppermute path under shard_map matches
    the single-device fused application."""
    ndev = min(4, len(jax.devices()))
    if ndev < 2:
        pytest.skip("needs >=2 devices")
    from pynama_tpu.engine import local_engine as E
    from pynama_tpu.parallel.sharded_engine import (AXIS,
                                                    build_sharded_ops)
    from jax.sharding import Mesh, PartitionSpec as P

    p = _tiny_problem(fused=True, nelem=(4, 2, 2), ngl=3)
    ops = p.engine_ops
    rng = np.random.default_rng(5)
    v = jnp.asarray(p.to_local(rng.standard_normal(
        (p.mesh.n_nodes, p.dim))), dtype=p.dtype)
    ref = E.apply_K(ops, v)

    ops_s = build_sharded_ops(ops, ndev)
    assert ops_s.fused and ops_s.fused_interpret
    mesh = Mesh(np.array(jax.devices()[:ndev]), (AXIS,))
    spec_ops = jax.tree.map(lambda _: P(AXIS), ops_s)

    def body(ops_s, t):
        o = jax.tree.map(lambda x: x[0], ops_s)
        return E.apply_K(o, t[0])[None]

    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec_ops, P(AXIS)),
                       out_specs=P(AXIS), check_vma=False)
    got = fn(ops_s, v.reshape((ndev, -1, v.shape[-1])))
    got = np.asarray(got).reshape(ref.shape)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=0,
                               atol=1e-8 * float(jnp.max(jnp.abs(ref))
                                                 + 1))


# ---------------------------------------------------------------------------
# compile-probe fallback (VERDICT r3 #1: a block that fails Mosaic's
# scoped-VMEM check must degrade, never ship)
# ---------------------------------------------------------------------------

def test_pick_block_returns_divisor():
    from pynama_tpu.ops.fused import _pick_block
    for ne0 in (1, 3, 8, 24):
        for ci, co in ((192, 192), (192, 384), (384, 192)):
            b = _pick_block(ne0, 576, ci, co)
            assert b >= 1 and ne0 % b == 0


def test_probe_block_descends_on_compile_failure(monkeypatch):
    """probe_block must fall back through smaller divisors when the
    compile fails (the round-3 VMEM OOM scenario), and report 0 when
    even block=1 cannot compile."""
    from pynama_tpu.ops import fused as F

    calls = []

    def fake_compile(nelem, ngl, nnc_in, ncomp_out, dtype, block):
        calls.append(block)
        if block > 1:
            raise RuntimeError("Scoped allocation exceeded (simulated)")

    monkeypatch.setattr(F, "_probe_compile", fake_compile)
    monkeypatch.setattr(F, "_PROBE_CACHE", {})
    # (8,8,8) ngl=4: R=64, so the analytic pick is a multi-slice block
    b = F.probe_block((8, 8, 8), 4, 192, 3)
    assert b == 1
    assert calls[0] > 1 and calls[-1] == 1     # started high, descended
    # cached: no new compile calls
    n = len(calls)
    assert F.probe_block((8, 8, 8), 4, 192, 3) == 1 and len(calls) == n

    monkeypatch.setattr(F, "_PROBE_CACHE", {})
    monkeypatch.setattr(F, "_probe_compile",
                        lambda *a: (_ for _ in ()).throw(RuntimeError()))
    assert F.probe_block((8, 8, 8), 4, 192, 3) == 0


def test_probe_fused_blocks_disables_on_total_failure(monkeypatch):
    """build_engine's shape sweep returns None (-> fused off) when any
    shape fails even at block=1, and honors a forced block."""
    from pynama_tpu.engine import local_engine as E
    from pynama_tpu.ops import fused as F

    monkeypatch.setattr(F, "probe_block", lambda *a, **k: 0)
    assert E.probe_fused_blocks((24, 24, 24), 4, 3, 3, 6,
                                jnp.float32) is None

    monkeypatch.setattr(F, "probe_block", lambda *a, **k: 2)
    got = E.probe_fused_blocks((24, 24, 24), 4, 3, 3, 6, jnp.float32)
    assert dict(got) == {(192, 192): 2, (192, 384): 2, (384, 192): 2}

    forced = E.probe_fused_blocks((24, 24, 24), 4, 3, 3, 6, jnp.float32,
                                  forced_block=3)
    assert all(b == 3 for _, b in forced)


def test_engine_uses_probed_blocks():
    """_apply_mat routes the per-shape block from ops.fused_blocks into
    fused_apply (interpret mode), and the result still matches jnp."""
    from pynama_tpu.engine import local_engine as E
    p = _tiny_problem(fused=True)
    ops = p.engine_ops
    nv = ops.ngl ** ops.dim * ops.dim
    ns = ops.ngl ** ops.dim * ops.dim_s
    ops_b = dataclasses.replace(
        ops, fused_blocks=(((nv, nv), 2), ((nv, ns), 1), ((ns, nv), 1),))
    rng = np.random.default_rng(9)
    v = jnp.asarray(p.to_local(rng.standard_normal(
        (p.mesh.n_nodes, p.dim))), dtype=p.dtype)
    a = E.apply_K(ops, v)
    b = E.apply_K(ops_b, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                               atol=1e-8 * float(jnp.max(jnp.abs(a)) + 1))
