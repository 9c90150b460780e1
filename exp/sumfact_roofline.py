"""Sum-factorized hex apply: roofline + on-chip phase decomposition (r5).

The r4 verdict (weak #4): sumfact measures 787 us at 1000 hexes ngl=4 vs
a ~10 us data floor — find where it goes and close part of the gap.

Roofline (E=1000, ngl=4, dim=3, f32):
  essentials/apply = t(768K) + y(768K) + Gt_sym(1.5M) + Jrt(0.97M)
                   + wr(0.11M) ~= 4.2 MB  -> 5.1 us at 819 GB/s
  MXU: 4 matmuls (E*dim, nn) @ (nn, dim*nq) ~= 0.21 GFLOP -> 3.2 us at
  65.7 TF/s (f32 = bf16_3x)
  => floor ~= 10 us; measured 787 us = 80x off.

Suspects: (a) lane underutilization — every sliced intermediate has a
trailing dim of nq=64 (full family, 50% of the 128 lane tile) or nqr=27
(reduced, 21%); (b) the ~40 small elementwise ops materializing (E,c,nq)
intermediates; (c) gather/stack relayouts.

Phases timed interleaved on the chip (same protocol as bench.py):
  P0 gather + both gradient matmuls (returns gf sum)
  P1 P0 + stiffness contraction + its scatter matmul (no penalties)
  P2 full apply
Differences localize the cost. Run on the real chip:
  python exp/sumfact_roofline.py [E] [ngl]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from pynama_tpu.ops import sumfact as SF

_mm = SF._mm


def phase0(sf, t):
    E = t.shape[0]
    dim, N = sf.dim, sf.ngl
    nn = N ** dim
    zc = t[:, sf.v2cm].reshape(E * dim, nn)
    gf = _mm(zc, sf.Df_flat)
    gr = _mm(zc, sf.Dr_flat)
    return gf.sum() + gr.sum()


def phase1(sf, t):
    E = t.shape[0]
    dim, N = sf.dim, sf.ngl
    nn = N ** dim
    nqf = sf.nqf
    zc = t[:, sf.v2cm].reshape(E * dim, nn)
    gf = _mm(zc, sf.Df_flat).reshape(E, dim, dim, nqf)
    s_p = []
    for p in range(dim):
        acc = None
        for r in range(dim):
            term = sf.Gt[:, r, p, :][:, None, :] * gf[:, :, r, :]
            acc = term if acc is None else acc + term
        s_p.append(acc)
    sf_stack = jnp.stack(s_p, axis=2).reshape(E * dim, dim * nqf)
    y = _mm(sf_stack, sf.Df_flat.T)
    return y.reshape(E, dim * nn)[:, sf.cm2v]


def main():
    E1d = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ngl = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    # E1d^3 distorted hexes
    nx = E1d
    xs = np.linspace(0, 1, nx + 1)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    verts = np.stack([X, Y, Z], -1)
    verts += rng.uniform(-0.12 / nx, 0.12 / nx, verts.shape) \
        * (verts > 0).all(-1, keepdims=True) * (verts < 1).all(-1, keepdims=True)
    corners = np.zeros((nx, nx, nx, 8, 3))
    off = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
           (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    for k, (i, j, l) in enumerate(off):
        corners[:, :, :, k] = verts[i:nx + i or None, j:nx + j or None,
                                    l:nx + l or None]
    corners = corners.reshape(-1, 8, 3)
    E = corners.shape[0]

    from pynama_tpu.basis.tables import make_tensor_basis
    basis = make_tensor_basis(ngl, 3)
    sf = SF.build_sumfact(basis, corners, jnp.float32)
    t = jnp.asarray(rng.standard_normal((E, 3 * ngl**3)), dtype=jnp.float32)

    dev = jax.devices()[0]
    print(f"device {dev.platform}, E={E}, ngl={ngl}")

    def chain_of(fn):
        @jax.jit
        def _f(sf_, t_, nit):
            def body(i, x):
                y = fn(sf_, x)
                return y.reshape(t_.shape) / (1.0 + jnp.max(jnp.abs(y))) \
                    if y.shape == t_.shape else \
                    t_ * (1.0 / (1.0 + jnp.abs(y.sum())))
            return jax.lax.fori_loop(0, nit, body, t_)
        return _f

    f0 = chain_of(lambda s_, x: phase0(s_, x))
    f1 = chain_of(phase1)
    f2 = chain_of(SF.apply_sumfact_k)

    sys.path.insert(0, ".")
    from bench import interleaved_slopes
    specs = [("P0_grad_matmuls", lambda n: (lambda s_, t_: f0(s_, t_, n)),
              (sf, t)),
             ("P1_plus_stiffness", lambda n: (lambda s_, t_: f1(s_, t_, n)),
              (sf, t)),
             ("P2_full", lambda n: (lambda s_, t_: f2(s_, t_, n)),
              (sf, t))]
    res = interleaved_slopes(specs, n1=100, target_s=1.0, rounds=6)
    for k, (per, floor) in res.items():
        print(f"{k:20s}: {per*1e6:8.1f} us  (short-chain floor "
              f"{floor*1e3:.1f} ms)")
    p0 = res["P0_grad_matmuls"][0]
    p1 = res["P1_plus_stiffness"][0]
    p2 = res["P2_full"][0]
    print(f"\ndecomposition: gradient matmuls {p0*1e6:.1f}, "
          f"stiffness FMA+scatter {(p1-p0)*1e6:.1f}, "
          f"penalty chain {(p2-p1)*1e6:.1f} us")


if __name__ == "__main__":
    main()
