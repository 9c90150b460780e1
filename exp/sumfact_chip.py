"""On-chip dense vs sum-factorized hex K apply (round-4 rewrite check).

The r3 tensor-pass sumfact measured 2731 us/apply at 10^3 hexes ngl=4 on
the v5e (per-axis length-N contractions + moveaxis relayouts — TPU
hostile); the round-4 flat-quadrature rewrite is 4 shared MXU matmuls +
pointwise geometry FMAs. This measures both against the dense per-element
path (HBM floor: (nn*dim)^2 floats/element/apply).

Usage: python exp/sumfact_chip.py [nx] (default 10, i.e. 1000 hexes)
"""
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _write_hex_msh
from pynama_tpu.cases import Problem
from pynama_tpu.engine import local_engine as E


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ngl = 4
    path = _write_hex_msh(nx, nx, nx, distort=0.12)
    cfg = {"name": "sfchip",
           "material-properties": {"rho": 1.0, "mu": 0.01},
           "domain": {"ngl": ngl, "gmsh-file": path},
           "boundary-conditions": {"uniform": {"velocity": [1, 0, 0],
                                               "vorticity": [0, 0, 0]}},
           "initial-conditions": {"velocity": [1, 0, 0]}}

    probs = {}
    for name, sf_on in (("sumfact", True), ("dense", False)):
        t0 = time.time()
        q = Problem(cfg, solver="cg", cg_rtol=1e-6, cg_maxiter=500,
                    engine=True, sumfact=sf_on)
        q.setUp()
        probs[name] = q
        print(f"setup {name}: {time.time()-t0:.1f}s "
              f"({q.mesh.n_cells} cells)", flush=True)

    q0 = probs["dense"]
    rng = np.random.default_rng(1)
    v = jnp.asarray(q0.to_local(rng.standard_normal(
        (q0.mesh.n_nodes, 3))), dtype=q0.dtype)

    # equivalence on chip (f32): sumfact vs dense apply
    ya = np.asarray(E.apply_K(probs["sumfact"].engine_ops, v))
    yb = np.asarray(E.apply_K(probs["dense"].engine_ops, v))
    scale = np.abs(yb).max()
    print(f"on-chip f32 agreement: max abs diff {np.abs(ya-yb).max():.3e} "
          f"(scale {scale:.3e})", flush=True)

    def chain(ops):
        @jax.jit
        def c(ops_, v, nit):
            def body(i, x):
                y = E.apply_K(ops_, x)
                return y / (1.0 + jnp.max(jnp.abs(y)))
            return jax.lax.fori_loop(0, nit, body, v)
        return c

    def run(c, ops, n):
        return float(np.asarray(c(ops, v, n)).ravel()[0])

    chains = {k: chain(p.engine_ops) for k, p in probs.items()}
    for k, c in chains.items():
        tw = time.time()
        run(c, probs[k].engine_ops, 50)
        print(f"compiled {k} ({time.time()-tw:.1f}s)", flush=True)

    nit_l, nit_s = 2000, 200
    mins = {k: {"l": np.inf, "s": np.inf} for k in chains}
    for r in range(6):
        for k, c in chains.items():
            for tag, n in (("l", nit_l), ("s", nit_s)):
                t1 = time.perf_counter()
                run(c, probs[k].engine_ops, n)
                mins[k][tag] = min(mins[k][tag], time.perf_counter() - t1)
        line = []
        for k in chains:
            per = (mins[k]["l"] - mins[k]["s"]) / (nit_l - nit_s)
            line.append(f"{k}={per*1e6:.0f}us")
        print(f"round {r}: " + "  ".join(line), flush=True)

    E_cells = q0.mesh.n_cells
    dense_mb = E_cells * (192 * 192) * 4 / 2**20
    print(f"\ndense K streams {dense_mb:.0f} MB/apply "
          f"(HBM floor {dense_mb/2**10/819*1e6:.0f} us)")


if __name__ == "__main__":
    main()
