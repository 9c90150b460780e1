"""Worker script for the true multi-process test (tests/test_multihost.py).

Launched as N separate OS processes (the honest analog of the reference's
`mpiexec -n N python src/run_case.py`, reference makefile:2-7): each process
owns ONE CPU device, `jax.distributed` connects them, and the SAME
single-program code (`multihost.initialize` + `ShardedEngine`) runs a
2-shard RHS evaluation. Process 0 writes the gathered result to OUT_PATH
for the parent test to compare against a single-process run.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id> <out>
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def cavity_config(nelem=(8, 8), ngl=3):
    return {
        "name": "mh-cavity",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": [0, 0], "upper": [1, 1]}},
        "time-solver": {"start-time": 0, "end-time": 1.0, "max-steps": 5},
        "boundary-conditions": {"no-slip": {
            "up": [1.0, 0.0], "down": [0, 0], "left": [0, 0],
            "right": [0, 0]}},
        "initial-conditions": {"vorticity": [0.0]},
    }


def random_state(p):
    rng = np.random.default_rng(11)
    vort = rng.standard_normal((p.mesh.n_nodes, p.dim_w))
    vel = rng.standard_normal((p.mesh.n_nodes, p.dim))
    return vort, vel


def sharded_transient_global(nproc: int, n_steps=3):
    """Run a whole N-step adaptive transient across the global device mesh
    — every process executes the identical host-side stepping loop on
    replicated scalars (dt control), and each accepted step runs the full
    two-stage KLE CG (cross-process psum dots every iteration). This is
    the reference's whole-cavity `mpiexec -n N` reality (makefile:2-7),
    not a single RHS."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pynama_tpu.cases import Problem
    from pynama_tpu.parallel import ShardedEngine

    cfg = cavity_config()
    cfg["time-solver"]["max-steps"] = n_steps
    p = Problem(cfg, solver="cg", cg_rtol=1e-12, cg_maxiter=3000)
    p.setUp()
    se = ShardedEngine(p, ndev=nproc, devices=jax.devices())
    vort_s, vel_s = se.shard_state(np.asarray(p.vort), np.asarray(p.vel))
    t, vort_s, vel_s, steps = se.start_solver(
        vort_s, vel_s, p.start_time, p.end_time, n_steps,
        dt0=1e-3, atol=1e-6, rtol=1e-6, tableau="5bs")

    rep = jax.jit(lambda x: x, out_shardings=NamedSharding(se.mesh, P()))
    w = np.asarray(rep(vort_s).addressable_data(0))
    v = np.asarray(rep(vel_s).addressable_data(0))
    w_g = p.to_global(w.reshape(-1, w.shape[-1]), p.dim_w)
    v_g = p.to_global(v.reshape(-1, v.shape[-1]), p.dim)
    return t, steps, w_g, v_g


def sharded_rhs_global(nproc: int):
    """Build the problem, evaluate one sharded RHS over all global devices,
    and return the (host-replicated) global-layout results."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pynama_tpu.cases import Problem
    from pynama_tpu.parallel import ShardedEngine

    p = Problem(cavity_config(), solver="cg", cg_rtol=1e-12,
                cg_maxiter=3000)
    p.setUp()
    se = ShardedEngine(p, ndev=nproc, devices=jax.devices())
    vort_g, vel_g = random_state(p)
    vort_s, vel_s = se.shard_state(vort_g, vel_g)
    rhs = se.make_rhs()
    f_s, v_s = rhs(se.ops_s, 0.0, vort_s, vel_s)

    # replicate across the mesh so every process holds the full arrays
    rep = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(se.mesh, P()))
    f_full = np.asarray(rep(f_s).addressable_data(0))
    v_full = np.asarray(rep(v_s).addressable_data(0))
    f_g = p.to_global(f_full.reshape(-1, f_full.shape[-1]), p.dim_w)
    v_g = p.to_global(v_full.reshape(-1, v_full.shape[-1]), p.dim)
    return f_g, v_g


def main():
    coord, nproc, pid, out_path = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "rhs"
    from pynama_tpu.parallel.multihost import initialize, is_primary

    info = initialize(coordinator_address=coord, num_processes=nproc,
                      process_id=pid)
    assert info["process_count"] == nproc, info
    assert info["global_devices"] == nproc, info
    assert info["local_devices"] == 1, info

    if mode == "transient":
        t, steps, w_g, v_g = sharded_transient_global(nproc)
        if is_primary():
            np.savez(out_path, t=t, steps=steps, w=w_g, v=v_g)
    else:
        f_g, v_g = sharded_rhs_global(nproc)
        if is_primary():
            np.savez(out_path, f=f_g, v=v_g)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
