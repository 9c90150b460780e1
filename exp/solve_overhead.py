"""On-chip CG per-iteration overhead measurement at 24^3 ngl=4 f32.

Reports the warm two-stage KLE solve time, the fused K-apply time, and
their ratio (solve time in units of applies — contention-insensitive:
shared-chip window swings scale both the same way). Protocol = bench.py's
timed_slope chains.

Context (round 4): pcg carries ||r||^2 in state (cond reads scalars, no
extra pass) and the in-loop condensed operator drops the input mask +
`con*v` passthrough (bitwise-identical, two fewer HBM passes per
iteration) — this script records the effect.
"""
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, ".")
from pynama_tpu.cases import Problem
from pynama_tpu.engine import local_engine as E


def main():
    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ngl = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nelem = (ne, ne, ne)
    zero = [0] * 3
    cfg = {
        "name": "exp", "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": zero, "upper": [1] * 3}},
        "boundary-conditions": {"no-slip": {
            "up": [2, 0, 0], "down": zero, "left": zero, "right": zero,
            "back": zero, "front": zero}},
        "initial-conditions": {"vorticity": [0, 0, 0]},
    }
    p = Problem(cfg, solver="cg", cg_rtol=1e-6, cg_maxiter=1000)
    p.setUp()
    ops = p.engine_ops
    print(f"fused={ops.fused} blocks={ops.fused_blocks}", flush=True)

    rng = np.random.default_rng(0)
    v = jnp.asarray(p.to_local(rng.standard_normal(
        (p.mesh.n_nodes, p.dim))), dtype=p.dtype)
    vort = E.curl(ops, v)
    vel0 = jnp.zeros_like(v)

    def k_chain(nit):
        @jax.jit
        def f(ops_, v):
            def body(i, x):
                y = E.apply_K(ops_, x)
                return y / (1.0 + jnp.max(jnp.abs(y)))
            return jax.lax.fori_loop(0, nit, body, v)
        return f

    def solve_chain(nit):
        @jax.jit
        def f(ops_, w, u):
            def body(i, u):
                _, u2 = E.solve_kle_local(ops_, w, u, 0.0)
                return u2 * (1.0 - 1e-6) + 1e-7 * i
            return jax.lax.fori_loop(0, nit, body, u)
        return f

    # count iterations once (warm-started from previous velocity)
    from pynama_tpu.solver.cg import pcg  # noqa: F401

    # compile both chains. Protocol: min over rounds of EACH chain length
    # separately, then slope of the mins — per-round slopes go negative
    # when queue jitter exceeds the chain-length difference (observed:
    # 373 ms single-call floors in contended windows).
    KL, KS, SL, SS = 20000, 2000, 20, 2
    k_s, k_l = k_chain(KS), k_chain(KL)
    s_s, s_l = solve_chain(SS), solve_chain(SL)

    def run(c, a):
        # host fetch = the ONLY hard sync on the tunneled axon backend
        # (block_until_ready returns immediately there — measured)
        return float(np.asarray(c(*a)).ravel()[0])

    for c, a in ((k_s, (ops, v)), (k_l, (ops, v)),
                 (s_s, (ops, vort, vel0)), (s_l, (ops, vort, vel0))):
        run(c, a)
    print("compiled", flush=True)

    mins = {"kl": np.inf, "ks": np.inf, "sl": np.inf, "ss": np.inf}
    for r in range(6):
        for key, c, a in (("kl", k_l, (ops, v)), ("ks", k_s, (ops, v)),
                          ("sl", s_l, (ops, vort, vel0)),
                          ("ss", s_s, (ops, vort, vel0))):
            t1 = time.perf_counter()
            run(c, a)
            mins[key] = min(mins[key], time.perf_counter() - t1)
        t_apply = (mins["kl"] - mins["ks"]) / (KL - KS)
        t_solve = (mins["sl"] - mins["ss"]) / (SL - SS)
        print(f"round {r}: apply {t_apply*1e6:.1f} us, warm solve "
              f"{t_solve*1e3:.2f} ms, ratio "
              f"{t_solve/max(t_apply,1e-9):.0f}", flush=True)

    print(f"\nFINAL: apply {t_apply*1e6:.1f} us | warm two-stage solve "
          f"{t_solve*1e3:.2f} ms | solve/apply {t_solve/t_apply:.0f}")


if __name__ == "__main__":
    main()
