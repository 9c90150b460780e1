"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: effective SpMV throughput (assembled-matrix GNNZ/s) of the
element-local matrix-free KLE operator application on one chip. The
`vs_baseline` ratio compares against the speed-of-light of a CLASSICAL
assembled-CSR SpMV on this chip's HBM bandwidth (8 bytes/nnz at f32:
value + column index) — i.e. how the TPU-native matrix-free design compares
with the best any PETSc-style assembled SpMV could do on the same silicon.

Methodology notes:
  * All operator pytrees are passed as jit ARGUMENTS (closure-captured
    constants trigger pathological XLA compiles and per-call re-uploads on
    some platforms).
  * The K apply is timed as a chain of NIT applications inside one jit
    (lax.fori_loop) with a final host fetch — robust against dispatch
    latency/noise on tunneled devices.

Secondary numbers (stderr): KLE CG solve time at fixed residual, full RHS
evaluation time, per BASELINE.md.
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


def bench_scaling():
    """Weak-scaling efficiency over all visible devices (BASELINE.md:
    '>=75% nnz/s scaling efficiency'). Shards the K-apply chain over a 1D
    mesh with nelem[0] proportional to device count and compares per-device
    throughput against the 1-device run. On a multi-chip slice the axis-0
    DSS rides ICI ppermutes; with one chip this reports 1 device."""
    import jax
    import jax.numpy as jnp
    from pynama_tpu.cases import Problem
    from pynama_tpu.parallel.sharded_engine import ShardedEngine
    from pynama_tpu.engine import local_engine as E

    ndev_all = len(jax.devices())
    base = (4, 12, 12)
    ngl = 4
    results = {}
    for ndev in [d for d in (1, 2, 4, 8, 16) if d <= ndev_all]:
        nelem = (base[0] * ndev, base[1], base[2])
        cfg = {
            "name": "scale", "material-properties": {"rho": 0.5, "mu": 0.01},
            "domain": {"ngl": ngl, "box-mesh": {
                "nelem": list(nelem), "lower": [0] * 3, "upper": [1] * 3}},
            "boundary-conditions": {"no-slip": {
                s: [0, 0, 0] for s in
                ("up", "down", "left", "right", "back", "front")}},
            "initial-conditions": {"vorticity": [0, 0, 0]},
        }
        p = Problem(cfg, solver="cg", cg_rtol=1e-5, cg_maxiter=50)
        p.setUp()
        sk = ShardedEngine(p, ndev)
        rhs = sk.make_rhs()
        vort_s, vel_s = sk.shard_state(
            np.zeros((p.mesh.n_nodes, p.mesh.dim_w)),
            np.zeros((p.mesh.n_nodes, p.mesh.dim)))
        jax.block_until_ready(rhs(sk.ops_s, 0.0, vort_s, vel_s))
        reps = 3
        best = np.inf
        for _ in range(reps):
            t1 = time.perf_counter()
            jax.block_until_ready(rhs(sk.ops_s, 0.0, vort_s, vel_s))
            best = min(best, time.perf_counter() - t1)
        nnz = assembled_nnz(p.mesh)
        results[ndev] = nnz / best / 1e9
        log(f"scaling ndev={ndev}: {results[ndev]:.2f} GNNZ/s "
            f"({results[ndev]/ndev:.2f}/dev)")
    eff = (results[max(results)] / max(results)) / results[1] \
        if len(results) > 1 else 1.0
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 3), "unit": "ratio", "vs_baseline": round(eff / 0.75, 3),
        "detail": {str(k): round(v, 2) for k, v in results.items()}}))


def main():
    import jax
    import jax.numpy as jnp
    from pynama_tpu.cases import Problem
    from pynama_tpu.engine import local_engine as E

    if os.environ.get("PYNAMA_BENCH") == "scaling":
        return bench_scaling()

    size = os.environ.get("PYNAMA_BENCH", "default")
    if size == "small":
        nelem, ngl = (8, 8, 8), 4
    elif size == "large":
        nelem, ngl = (32, 32, 32), 4
    elif size == "highorder":
        # BASELINE.md "high-order N=6-8 single-host refinement" config
        nelem, ngl = (8, 8, 8), 7
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
    ops = p.engine_ops
    assert ops is not None
    log(f"setup {time.time()-t0:.1f}s: {p.mesh.n_nodes} nodes, "
        f"{p.mesh.n_cells} cells, ngl={ngl}, dtype={p.dtype}")

    nnz = assembled_nnz(p.mesh)
    log(f"assembled K nnz: {nnz/1e9:.3f} G")

    rng = np.random.default_rng(0)
    v = jnp.asarray(p.to_local(rng.standard_normal(
        (p.mesh.n_nodes, p.dim))), dtype=p.dtype)

    def best_of(fn, *args, reps=5):
        float(np.asarray(fn(*args)).ravel()[0])    # compile + sync
        best = np.inf
        for _ in range(reps):
            t1 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(out).ravel()[0])      # host fetch = hard sync
            best = min(best, time.perf_counter() - t1)
        return best

    def timed_slope(make_chain, *args, n1=None, n2=None, reps=5):
        """Per-iteration device time from the slope between two chain
        lengths. On tunneled devices a single call carries O(10 ms) of
        dispatch+fetch latency; the difference cancels it exactly, so the
        slope is pure device time per iteration."""
        t1 = best_of(make_chain(n1), *args, reps=reps)
        t2 = best_of(make_chain(n2), *args, reps=reps)
        return max((t2 - t1) / (n2 - n1), 1e-9), t1

    def k_chain(nit):
        @jax.jit
        def f(ops_, v):
            def body(i, x):
                y = E.apply_K(ops_, x)
                return y / (1.0 + jnp.max(jnp.abs(y)))
            return jax.lax.fori_loop(0, nit, body, v)
        return f

    t_apply, t_call = timed_slope(k_chain, ops, v, n1=50, n2=1650, reps=7)
    gnnz_s = nnz / t_apply / 1e9
    log(f"K apply (chain-slope 50->1650): {t_apply*1e6:.1f} us "
        f"-> {gnnz_s:.1f} GNNZ/s effective "
        f"(single-call latency floor {t_call*1e3:.1f} ms)")

    # --- MFU + phase split (matmul vs DSS vs layout rotations)
    from pynama_tpu.ops import local as L
    flops = 2.0 * p.mesh.n_cells * (p.mesh.nnode_el * p.dim) ** 2
    # f32-effective matmul peak: bf16 peak / 3 (Precision.HIGHEST = bf16_3x)
    bf16_peak_tf = {"TPU v5 lite": 197.0, "TPU v5e": 197.0,
                    "TPU v4": 275.0, "TPU v6 lite": 918.0,
                    "TPU v6e": 918.0}
    kind = getattr(dev, "device_kind", "")
    peak = next((x for k, x in bf16_peak_tf.items() if k in kind),
                197.0) / 3.0
    mfu = flops / t_apply / (peak * 1e12)

    def mm_chain(nit):
        @jax.jit
        def f(ops_, v):
            def body(i, x):
                y = L.mm(x, ops_.KT)
                return y / (1.0 + jnp.max(jnp.abs(y)))
            return jax.lax.fori_loop(0, nit, body, v)
        return f

    def rot_chain(nit):
        @jax.jit
        def f(ops_, v):
            def body(i, x):
                for d in range(len(ops_.nelem)):
                    x = x[:, ops_.lay_v.perms[d]]
                return x / (1.0 + jnp.max(jnp.abs(x)))
            return jax.lax.fori_loop(0, nit, body, v)
        return f

    t_mm, _ = timed_slope(mm_chain, ops, v, n1=50, n2=1650, reps=5)
    t_rot, _ = timed_slope(rot_chain, ops, v, n1=50, n2=1650, reps=5)
    t_dss = max(t_apply - t_mm, 0.0)
    log(f"phase split: matmul {t_mm*1e6:.1f} us ({flops/t_mm/1e12:.1f} "
        f"TFLOP/s, {mfu*100:.1f}% of f32-effective peak), "
        f"DSS(incl rot) {t_dss*1e6:.1f} us, rotations {t_rot*1e6:.1f} us")

    # --- CSR speed-of-light on this chip (f32: 4B value + 4B colidx per nnz)
    hbm_gbps = {"TPU v5 lite": 819.0, "TPU v5e": 819.0,
                "TPU v4": 1228.0, "TPU v6 lite": 1640.0, "TPU v6e": 1640.0}
    bw = next((v for k, v in hbm_gbps.items() if k in kind), 819.0)
    csr_sol_gnnz = bw / 8.0
    vs = gnnz_s / csr_sol_gnnz

    # --- KLE solve per timestep at fixed residual (chained full solves:
    # each iteration re-runs both CG stages warm-started on the previous
    # velocity, so the slope is one full two-stage solve)
    vort = E.curl(ops, v)
    vel0 = jnp.zeros_like(v)

    def solve_chain(nit):
        @jax.jit
        def f(ops_, w, u):
            def body(i, u):
                _, u2 = E.solve_kle_local(ops_, w, u, 0.0)
                return u2 * (1.0 - 1e-6) + 1e-7 * i  # defeat loop hoisting
            return jax.lax.fori_loop(0, nit, body, u)
        return f

    t_solve, _ = timed_slope(solve_chain, ops, vort, vel0, n1=2, n2=10,
                             reps=3)
    log(f"KLE solve (two-stage NS, rtol={ops.cg_rtol:g}): "
        f"{t_solve*1e3:.2f} ms")

    # --- full RHS evaluation
    def rhs_chain(nit):
        @jax.jit
        def f(ops_, w, u):
            def body(i, w):
                f_, _ = E.rhs_local(ops_, 0.0, w, u)
                return w + 1e-9 * f_
            return jax.lax.fori_loop(0, nit, body, w)
        return f

    t_rhs, _ = timed_slope(rhs_chain, ops, vort, vel0, n1=2, n2=10, reps=3)
    log(f"full RHS eval: {t_rhs*1e3:.2f} ms")

    # --- KLE solve under the FDM preconditioner (DESIGN.md §4)
    t_solve_fdm = None
    if size in ("default", "large"):
        p2 = Problem(cfg, solver="cg", cg_rtol=1e-12 if f64 else 1e-6,
                     cg_maxiter=1000, pc="fdm")
        p2.setUp()
        if p2.engine_ops.pc == "fdm":
            t_solve_fdm, _ = timed_slope(
                solve_chain, p2.engine_ops, vort, vel0, n1=2, n2=10, reps=3)
            log(f"KLE solve (pc=fdm): {t_solve_fdm*1e3:.2f} ms")

    # --- high-order series (BASELINE.md N=6-8 refinement), default run only
    ho = None
    if size == "default":
        cfg_ho = dict(cfg)
        cfg_ho["domain"] = {"ngl": 7, "box-mesh": {
            "nelem": [8] * dim, "lower": zero, "upper": [1] * dim}}
        ph = Problem(cfg_ho, solver="cg", cg_rtol=1e-12 if f64 else 1e-6,
                     cg_maxiter=1000)
        ph.setUp()
        vh = jnp.asarray(ph.to_local(rng.standard_normal(
            (ph.mesh.n_nodes, ph.dim))), dtype=ph.dtype)
        t_ho, _ = timed_slope(k_chain, ph.engine_ops, vh, n1=20, n2=420,
                              reps=5)
        nnz_ho = assembled_nnz(ph.mesh)
        flops_ho = 2.0 * ph.mesh.n_cells * (ph.mesh.nnode_el * ph.dim) ** 2
        ho = {"gnnz_per_s": round(nnz_ho / t_ho / 1e9, 1),
              "mfu": round(flops_ho / t_ho / (peak * 1e12), 4),
              "k_apply_us": round(t_ho * 1e6, 1),
              "config": f"{tuple(cfg_ho['domain']['box-mesh']['nelem'])} "
                        f"ngl=7"}
        log(f"highorder ngl=7: {ho['gnnz_per_s']} GNNZ/s, "
            f"mfu {ho['mfu']*100:.1f}%")

    print(json.dumps({
        "metric": "spmv_effective_gnnz_per_s",
        "value": round(gnnz_s, 2),
        "unit": "GNNZ/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "kle_solve_ms": round(t_solve * 1e3, 3),
            "kle_solve_fdm_ms": None if t_solve_fdm is None
            else round(t_solve_fdm * 1e3, 3),
            "rhs_eval_ms": round(t_rhs * 1e3, 3),
            "k_apply_ms": round(t_apply * 1e3, 4),
            "mfu": round(mfu, 4),
            "phase_us": {"matmul": round(t_mm * 1e6, 1),
                         "dss_incl_rot": round(t_dss * 1e6, 1),
                         "rotations": round(t_rot * 1e6, 1)},
            "highorder": ho,
            "nnz": nnz,
            "nodes": p.mesh.n_nodes,
            "csr_speed_of_light_gnnz_per_s": round(csr_sol_gnnz, 1),
            "config": f"3D cavity {nelem} ngl={ngl} {p.dtype}",
        },
    }))


if __name__ == "__main__":
    main()
