"""Fused-vs-unfused A/B at 24^3 ngl=4 (round-5 default decision).

The r4 CG-loop change (25df248) made the in-loop operator `free*K(v)` —
leaner surroundings may have changed XLA's fusion for the unfused path.
The r5 interleaved bench measured fused LOSING (162.8 vs 133.4 us) where
the r4 builder protocol had it winning (112.8 vs 147.4). This is the
dedicated tie-breaker: N independent processes, interleaved within each,
min-over-everything per variant + per-window ratios.

Run: python exp/fused_ab.py [rounds]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from bench import interleaved_slopes
from pynama_tpu.cases import Problem
from pynama_tpu.engine import local_engine as E


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nelem, ngl = (24, 24, 24), 4
    zero = [0, 0, 0]
    cfg = {
        "name": "ab", "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": zero, "upper": [1, 1, 1]}},
        "boundary-conditions": {"no-slip": {
            "up": [2, 0, 0], "down": zero, "left": zero, "right": zero,
            "back": zero, "front": zero}},
        "initial-conditions": {"vorticity": zero},
    }
    p = Problem(cfg, solver="cg", cg_rtol=1e-6, cg_maxiter=1000)
    p.setUp()
    ops = p.engine_ops
    import dataclasses as dc
    ops_nf = dc.replace(ops, fused=False)
    rng = np.random.default_rng(0)
    v = jnp.asarray(p.to_local(rng.standard_normal(
        (p.mesh.n_nodes, p.dim))), dtype=p.dtype)

    @jax.jit
    def _k_f(ops_, v, nit):
        def body(i, x):
            y = E.apply_K(ops_, x)
            return y / (1.0 + jnp.max(jnp.abs(y)))
        return jax.lax.fori_loop(0, nit, body, v)

    def k_chain(nit):
        return lambda o_, v_: _k_f(o_, v_, nit)

    res = interleaved_slopes(
        [("fused", k_chain, (ops, v)), ("unfused", k_chain, (ops_nf, v))],
        n1=400, target_s=1.0, rounds=rounds)
    tf, tu = res["fused"][0], res["unfused"][0]
    print(f"fused {tf*1e6:.1f} us, unfused {tu*1e6:.1f} us, "
          f"speedup {tu/tf:.3f}x (floor {res['fused'][1]*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
