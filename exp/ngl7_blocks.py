"""Fused-kernel block sweep at the high-order config (8^3 ngl=7, K shape
1029->1029) — the COMPUTE-bound regime (DESIGN.md section 7: arithmetic
intensity 126 FLOP/B > ridge; MXU floor ~16.5 us; bench r4 measured
48.9 us = 33.8% MFU at the probed block=4).

Interleaved min-over-rounds protocol, host-fetch sync (see
exp/solve_overhead.py note on the axon backend).
"""
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, ".")
from pynama_tpu.ops import fused as F
from pynama_tpu.ops import local as L


def main():
    ne, ngl = 8, 7
    nelem = (ne, ne, ne)
    dim, ncomp = 3, 3
    nnc = ngl ** dim * ncomp
    E = ne ** 3
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal((E, nnc)), dtype=jnp.float32)
    matT = jnp.asarray(rng.standard_normal((nnc, nnc)) / nnc,
                       dtype=jnp.float32)
    lay = L.LocalLayout(perms=L._make_perms(ngl, dim, ncomp),
                        inv_mult=jnp.zeros((1, 1)), ngl=ngl,
                        nelem=nelem, ncomp=ncomp)

    def chain(fn):
        @jax.jit
        def c(t, m, nit):
            def body(i, x):
                y = fn(x, m)
                return y / (1.0 + jnp.max(jnp.abs(y)))
            return jax.lax.fori_loop(0, nit, body, t)
        return c

    variants = {"jnp_full": chain(lambda x, m: L.dss(lay, L.mm(x, m)))}
    for b in (1, 2, 4, 8):
        try:
            F._probe_compile(nelem, ngl, nnc, ncomp, jnp.float32, b)
        except Exception as e:  # noqa: BLE001
            print(f"block={b}: does not compile "
                  f"({' '.join(str(e).split())[:120]})", flush=True)
            continue
        variants[f"blk{b}"] = chain(
            lambda x, m, b=b: F.fused_apply(x, m, nelem, ngl, ncomp,
                                            block=b)[0])

    def run(c, n):
        return float(np.asarray(c(t0, matT, n)).ravel()[0])

    for name, c in variants.items():
        tw = time.time()
        run(c, 50)
        print(f"compiled {name} ({time.time()-tw:.1f}s)", flush=True)

    nit = 4000
    best = {k: np.inf for k in variants}
    for r in range(8):
        for name, c in variants.items():
            t1 = time.perf_counter()
            run(c, nit)
            best[name] = min(best[name], (time.perf_counter() - t1) / nit)
        print(f"round {r}: " + "  ".join(
            f"{k}={best[k]*1e6:.1f}us" for k in variants), flush=True)

    flops = 2.0 * E * nnc * nnc
    print("\n=== ngl=7 block sweep ===")
    for k, v in best.items():
        print(f"{k:9s}: {v*1e6:6.1f} us  "
              f"(MFU {flops/v/(197e12/3)*100:.1f}%)")


if __name__ == "__main__":
    main()
