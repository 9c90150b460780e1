"""On-target smoke: compile + run the flagship configs on THIS backend.

Run `make smoke` after ANY commit that touches a Pallas kernel, an engine
default, or a preconditioner — rounds 2 and 3 both shipped their biggest
defect in an end-of-round commit that was never executed on the real chip
(r2: an untested kernel claim; r3: a Mosaic scoped-VMEM OOM that crashed
every production TPU run and the driver bench). A CPU pytest run CANNOT
catch that class of failure: Pallas tests run in interpret mode, which
does not model VMEM.

Covers, at the driver-bench flagship configs:
  * 24^3 ngl=4: engine build (incl. fused compile probe), one K apply,
    one full RHS eval (exercises all 5 fused operator shapes + both CG
    stages) — values fetched to host (hard sync).
  * 8^3 ngl=7: one K apply (the high-order bench config).
Exits non-zero on any failure; prints one OK line per stage.
"""
import sys
import time

import numpy as np


def stage(name, t0):
    print(f"smoke OK: {name} ({time.time() - t0:.1f}s)", flush=True)
    return time.time()


def main():
    import jax
    # persistent compilation cache: repeated smoke/bench runs must not
    # re-pay remote compiles (observed: the shared compile service swings
    # from 2 s to >10 min per kernel between windows)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from pynama_tpu.cases import Problem
    from pynama_tpu.engine import local_engine as E

    dev = jax.devices()[0]
    print(f"smoke device: {dev.platform} "
          f"{getattr(dev, 'device_kind', '?')}", flush=True)

    for nelem, ngl in [((24, 24, 24), 4), ((8, 8, 8), 7)]:
        zero = [0] * 3
        cfg = {
            "name": "smoke", "material-properties": {"rho": 0.5, "mu": 0.01},
            "domain": {"ngl": ngl, "box-mesh": {
                "nelem": list(nelem), "lower": zero, "upper": [1] * 3}},
            "boundary-conditions": {"no-slip": {
                "up": [2, 0, 0], "down": zero, "left": zero, "right": zero,
                "back": zero, "front": zero}},
            "initial-conditions": {"vorticity": [0, 0, 0]},
        }
        t0 = time.time()
        p = Problem(cfg, solver="cg", cg_rtol=1e-6, cg_maxiter=1000)
        p.setUp()
        ops = p.engine_ops
        t0 = stage(f"setup {nelem} ngl={ngl} fused={ops.fused} "
                   f"blocks={ops.fused_blocks}", t0)

        rng = np.random.default_rng(0)
        v = jnp.asarray(p.to_local(rng.standard_normal(
            (p.mesh.n_nodes, p.dim))), dtype=p.dtype)
        y = E.apply_K(ops, v)
        assert np.isfinite(np.asarray(y)).all()
        t0 = stage(f"K apply {nelem} ngl={ngl}", t0)

        if ngl == 4:
            vort = E.curl(ops, v)
            f, vel = jax.jit(E.rhs_local)(ops, 0.0, vort,
                                          jnp.zeros_like(v))
            assert np.isfinite(np.asarray(f)).all()
            t0 = stage(f"full RHS (two-stage KLE) {nelem}", t0)

    print("smoke PASSED", flush=True)


if __name__ == "__main__":
    main()
