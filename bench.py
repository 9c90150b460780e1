"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: effective SpMV throughput (assembled-matrix GNNZ/s) of the
matrix-free KLE operator application on one chip. `vs_baseline` is the ratio
against the speed-of-light of a CLASSICAL assembled-CSR SpMV on this chip's
HBM bandwidth (8 bytes/nnz at f32: value + column index) — i.e. how much
faster the TPU-native matrix-free design is than a perfectly
bandwidth-bound PETSc-style SpMV could ever be on the same silicon.

Secondary numbers (stderr): full RHS eval time, KLE CG solve time per
timestep at fixed residual, per BASELINE.md.
"""
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def assembled_nnz(mesh) -> int:
    """Exact nnz of the assembled KLE operator K (dim x dim dense blocks,
    stencil = union of element node ranges per axis)."""
    total_per_axis = []
    ngl = mesh.ngl
    for d in range(mesh.dim):
        npd = mesh.npts[d]
        ne = mesh.nelem[d]
        i = np.arange(npd, dtype=np.int64)
        e_hi = np.minimum(i // (ngl - 1), ne - 1)
        e_lo = np.maximum(-(-(i - ngl + 1) // (ngl - 1)), 0)
        total_per_axis.append((e_hi - e_lo) * (ngl - 1) + ngl)
    if mesh.dim == 2:
        grid = total_per_axis[0][:, None] * total_per_axis[1][None, :]
    else:
        grid = (total_per_axis[0][:, None, None]
                * total_per_axis[1][None, :, None]
                * total_per_axis[2][None, None, :])
    return int(grid.sum()) * mesh.dim * mesh.dim


def timeit(fn, *args, reps=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp
    from pynama_tpu.cases import Problem
    from pynama_tpu.ops.apply import apply_op

    size = os.environ.get("PYNAMA_BENCH", "default")
    if size == "small":
        nelem, ngl = (8, 8, 8), 4
    elif size == "large":
        nelem, ngl = (32, 32, 32), 4
    else:
        nelem, ngl = (24, 24, 24), 4

    dim = len(nelem)
    zero = [0] * dim
    cfg = {
        "name": "bench-cavity3d",
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": ngl, "box-mesh": {
            "nelem": list(nelem), "lower": zero, "upper": [1] * dim}},
        "time-solver": {"start-time": 0, "end-time": 1.0, "max-steps": 10},
        "boundary-conditions": {"no-slip": {
            "up": [2, 0, 0], "down": zero, "left": zero, "right": zero,
            "back": zero, "front": zero}},
        "initial-conditions": {"vorticity": [0, 0, 0]},
    }
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    t0 = time.time()
    f64 = jax.config.jax_enable_x64
    p = Problem(cfg, solver="cg", cg_rtol=1e-12 if f64 else 1e-6,
                cg_maxiter=1000)
    p.setUp()
    log(f"setup {time.time()-t0:.1f}s: {p.mesh.n_nodes} nodes, "
        f"{p.mesh.n_cells} cells, ngl={ngl}, dtype={p.dtype}")

    nnz = assembled_nnz(p.mesh)
    log(f"assembled K nnz: {nnz/1e9:.3f} G")

    # --- SpMV-equivalent: one masked K application
    free = p.kle.main.free
    K_op = p.kle.K_op

    @jax.jit
    def k_apply(v):
        return free * apply_op(K_op, free * v) + (1.0 - free) * v

    v = jnp.asarray(np.random.default_rng(0).standard_normal(
        (p.mesh.n_nodes, p.dim)), dtype=p.dtype)
    t_apply = timeit(k_apply, v)
    gnnz_s = nnz / t_apply / 1e9
    log(f"K apply: {t_apply*1e3:.3f} ms -> {gnnz_s:.1f} GNNZ/s effective")

    # --- CSR speed-of-light on this chip (f32: 4B value + 4B colidx per nnz)
    hbm_gbps = {"TPU v5 lite": 819.0, "TPU v5e": 819.0,
                "TPU v4": 1228.0, "TPU v6 lite": 1640.0}
    kind = getattr(dev, "device_kind", "")
    bw = next((v for k, v in hbm_gbps.items() if k in kind), 819.0)
    csr_sol_gnnz = bw / 8.0
    vs = gnnz_s / csr_sol_gnnz

    # --- KLE solve per timestep at fixed residual
    vort = p.operator.curl(v)

    @jax.jit
    def kle_solve(w, vel):
        return p.kle.solve(w, vel)

    t_solve = timeit(kle_solve, vort, 0.0 * v, reps=5, warmup=2)
    log(f"KLE CG solve (rtol={p.kle.main.cg_rtol:g}): {t_solve*1e3:.2f} ms")

    # --- full RHS evaluation
    rhs = jax.jit(p.rhs)
    t_rhs = timeit(rhs, 0.0, vort, 0.0 * v, reps=5, warmup=2)
    log(f"full RHS eval: {t_rhs*1e3:.2f} ms")

    print(json.dumps({
        "metric": "spmv_effective_gnnz_per_s",
        "value": round(gnnz_s, 2),
        "unit": "GNNZ/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "kle_solve_ms": round(t_solve * 1e3, 3),
            "rhs_eval_ms": round(t_rhs * 1e3, 3),
            "k_apply_ms": round(t_apply * 1e3, 4),
            "nnz": nnz,
            "nodes": p.mesh.n_nodes,
            "csr_speed_of_light_gnnz_per_s": round(csr_sol_gnnz, 1),
            "config": f"3D cavity {nelem} ngl={ngl} {p.dtype}",
        },
    }))


if __name__ == "__main__":
    main()
