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


#: milestones recorded as the run progresses — the hard-timeout watchdog
#: (see __main__) emits these when the measurement thread stalls beyond
#: the wall budget (observed failure mode: the shared chip's execution
#: queue can hang a large-array result fetch indefinitely; no in-thread
#: guard can interrupt a blocked C++ fetch call)
PARTIAL = {}


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
    '>=75% nnz/s scaling efficiency'). Shards the full RHS over a 1D mesh
    with nelem[0] proportional to device count.

    Efficiency definition depends on what the devices ARE:
      * real chips (tpu): T(N) / (N * T(1)) — the classic weak-scaling
        ratio; the axis-0 DSS rides ICI ppermutes.
      * VIRTUAL devices (cpu host platform): all N "devices" share one
        physical CPU, so per-device throughput falls ~1/N by
        construction and T(N)/(N*T(1)) measures silicon sharing, not the
        framework. The honest signal there is T(N) / T(1) — total
        throughput of the N-way SHARDED run (with its ppermutes/psums
        and duplicated shared operands) against the unsharded run of
        the base problem on the same silicon: 1.0 = sharding adds zero
        overhead; this bounds the comm+duplication cost the real-chip
        run would amortize against N x the FLOPs."""
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
    shared = jax.devices()[0].platform == "cpu"
    nmax = max(results)
    if len(results) == 1:
        eff = 1.0
    elif shared:
        eff = results[nmax] / results[1]
    else:
        eff = (results[nmax] / nmax) / results[1]
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 3), "unit": "ratio",
        "vs_baseline": round(eff / 0.75, 3),
        "detail": {"gnnz_per_s": {str(k): round(v, 2)
                                  for k, v in results.items()},
                   "devices": ("virtual-cpu (shared silicon: efficiency "
                               "= T(N)/T(1), the sharding+comm overhead "
                               "bound)" if shared else "real chips: "
                               "efficiency = T(N)/(N*T(1))"),
                   "ndev_max": nmax}}))


def bench_hex():
    """Hex-mesh (unstructured) K apply: sum-factorized vs dense
    per-element matrices. The dense path streams (nn*dim)^2 floats per
    element per CG iteration (147 KB at ngl=4 f32); SumFactK streams
    ~2.6 KB/element — this records the HBM win on real hardware."""
    import tempfile
    import time as _t

    import jax
    import jax.numpy as jnp
    from pynama_tpu.engine import local_engine as E
    from pynama_tpu.cases import Problem

    nx = ny = nz = 10
    ngl = 4
    path = _write_hex_msh(nx, ny, nz, distort=0.12)
    cfg = {"name": "bench-hex",
           "material-properties": {"rho": 1.0, "mu": 0.01},
           "domain": {"ngl": ngl, "gmsh-file": path},
           "boundary-conditions": {"uniform": {"velocity": [1, 0, 0],
                                               "vorticity": [0, 0, 0]}},
           "initial-conditions": {"velocity": [1, 0, 0]}}

    # wall-clock budget: this section must DEGRADE (emit whatever was
    # measured) on a slow remote-compile window, not die with no JSON
    # line (observed: one window spent >580 s inside the first chain
    # compile)
    budget_s = float(os.environ.get("PYNAMA_BENCH_BUDGET", 520))
    hex_t0 = _t.time()
    res = {}
    errors = []
    mesh = None
    for sf_on in (True, False):
        name = "sumfact" if sf_on else "dense"
        if _t.time() - hex_t0 > budget_s:
            errors.append(f"{name}: skipped (budget)")
            continue
        try:
            q = Problem(cfg, solver="cg", cg_rtol=1e-6, cg_maxiter=500,
                        engine=True, sumfact=sf_on)
            q.setUp()
            mesh = q.mesh
            ops = q.engine_ops
            assert (ops.sumfact is not None) == sf_on
            rngv = np.random.default_rng(1)
            v = jnp.asarray(q.to_local(rngv.standard_normal(
                (mesh.n_nodes, 3))), dtype=q.dtype)

            @jax.jit
            def chain(ops_, v, nit):
                def body(i, x):
                    y = E.apply_K(ops_, x)
                    return y / (1.0 + jnp.max(jnp.abs(y)))
                return jax.lax.fori_loop(0, nit, body, v)

            def best(n, reps=5):
                float(np.asarray(chain(ops, v, n)).ravel()[0])
                b = np.inf
                for _ in range(reps):
                    t1 = _t.perf_counter()
                    o = chain(ops, v, n)
                    float(np.asarray(o).ravel()[0])
                    b = min(b, _t.perf_counter() - t1)
                return b
            rough = best(100, reps=2) / 100
            n2 = int(min(max(1.0 / rough, 1000), 100000))
            per = (best(n2) - best(100)) / (n2 - 100)
            res[name] = per
            log(f"hex K apply ({name}): {per*1e6:.1f} us")
        except Exception as e:  # noqa: BLE001 — degrade, never die
            errors.append(f"{name}: {type(e).__name__}: "
                          + " ".join(str(e).split())[:200])
            log(f"hex section FAILED (degrading): {errors[-1]}")

    speedup = res["dense"] / res["sumfact"] \
        if "dense" in res and "sumfact" in res else None
    us = lambda k: None if k not in res else round(res[k] * 1e6, 1)
    print(json.dumps({
        "metric": "hex_sumfact_speedup",
        "value": 0.0 if speedup is None else round(speedup, 2),
        "unit": "x",
        "vs_baseline": 0.0 if speedup is None else round(speedup, 2),
        "detail": {"k_apply_sumfact_us": us("sumfact"),
                   "k_apply_dense_us": us("dense"),
                   "cells": None if mesh is None else mesh.n_cells,
                   "ngl": ngl,
                   "dense_bytes_per_cell": (ngl**3 * 3) ** 2 * 4,
                   "errors": errors,
                   "config": f"distorted hex {nx}x{ny}x{nz} ngl={ngl}"}}))


def _write_hex_msh(nx, ny, nz, distort=0.0):
    """Distorted structured hex grid as a temp MSH 2.2 file (the bench
    analog of the tests' gmsh fixtures)."""
    import tempfile

    xs = [np.linspace(0, 1, n + 1) for n in (nx, ny, nz)]
    X, Y, Z = np.meshgrid(*xs, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)
    rng = np.random.default_rng(0)
    interior = np.all((verts > 1e-12) & (verts < 1 - 1e-12), axis=1)
    verts[interior] += (rng.uniform(-1, 1, (int(interior.sum()), 3))
                        * distort / nx)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    hexes = [[vid(i, j, k), vid(i + 1, j, k), vid(i + 1, j + 1, k),
              vid(i, j + 1, k), vid(i, j, k + 1), vid(i + 1, j, k + 1),
              vid(i + 1, j + 1, k + 1), vid(i, j + 1, k + 1)]
             for i in range(nx) for j in range(ny) for k in range(nz)]
    names = ["down", "right", "up", "left", "back", "front"]
    quads = {
        "down": [[vid(i, 0, k), vid(i + 1, 0, k), vid(i + 1, 0, k + 1),
                  vid(i, 0, k + 1)] for i in range(nx) for k in range(nz)],
        "up": [[vid(i, ny, k), vid(i + 1, ny, k), vid(i + 1, ny, k + 1),
                vid(i, ny, k + 1)] for i in range(nx) for k in range(nz)],
        "left": [[vid(0, j, k), vid(0, j + 1, k), vid(0, j + 1, k + 1),
                  vid(0, j, k + 1)] for j in range(ny) for k in range(nz)],
        "right": [[vid(nx, j, k), vid(nx, j + 1, k), vid(nx, j + 1, k + 1),
                   vid(nx, j, k + 1)] for j in range(ny) for k in range(nz)],
        "back": [[vid(i, j, 0), vid(i + 1, j, 0), vid(i + 1, j + 1, 0),
                  vid(i, j + 1, 0)] for i in range(nx) for j in range(ny)],
        "front": [[vid(i, j, nz), vid(i + 1, j, nz), vid(i + 1, j + 1, nz),
                   vid(i, j + 1, nz)] for i in range(nx) for j in range(ny)],
    }
    f = tempfile.NamedTemporaryFile("w", suffix=".msh", delete=False)
    f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n$PhysicalNames\n"
            f"{len(names) + 1}\n")
    for t, n in enumerate(names):
        f.write(f'2 {t + 1} "{n}"\n')
    f.write(f'3 {len(names) + 1} "volume"\n$EndPhysicalNames\n$Nodes\n'
            f"{len(verts)}\n")
    for i, v in enumerate(verts):
        f.write(f"{i + 1} {v[0]} {v[1]} {v[2]}\n")
    f.write("$EndNodes\n$Elements\n")
    n_el = sum(len(v) for v in quads.values()) + len(hexes)
    f.write(f"{n_el}\n")
    eid = 1
    for t, n in enumerate(names):
        for q in quads[n]:
            f.write(f"{eid} 3 2 {t + 1} {t + 1} "
                    + " ".join(str(x + 1) for x in q) + "\n")
            eid += 1
    for h in hexes:
        f.write(f"{eid} 5 2 {len(names) + 1} {len(names) + 1} "
                + " ".join(str(x + 1) for x in h) + "\n")
        eid += 1
    f.write("$EndElements\n")
    f.close()
    return f.name


def main():
    import jax
    # persistent compilation cache (see smoke.py: the shared remote
    # compile service swings 2 s -> >10 min per kernel between windows)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from pynama_tpu.cases import Problem
    from pynama_tpu.engine import local_engine as E

    if os.environ.get("PYNAMA_BENCH") == "scaling":
        return bench_scaling()
    if os.environ.get("PYNAMA_BENCH") == "hex":
        return bench_hex()

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
    # wall-clock budget: optional sections are skipped once the deadline
    # nears so the JSON line ALWAYS prints (the shared chip's throughput
    # swings >10x between windows; a slow window must degrade the report,
    # not kill it)
    budget_s = float(os.environ.get("PYNAMA_BENCH_BUDGET", 540))
    bench_t0 = time.time()

    def time_left():
        return budget_s - (time.time() - bench_t0)

    # every section is guarded: a failure records an error string and the
    # report DEGRADES (fused -> unfused, optional sections -> null) instead
    # of dying — the round-3 bench was killed by one kernel compile error
    # and recorded zero numbers for the whole round
    errors = []

    def guard(name, fn, *args, **kw):
        try:
            return fn(*args, **kw)
        except Exception as e:  # noqa: BLE001 — degrade, never die
            msg = f"{name}: {type(e).__name__}: " \
                  + " ".join(str(e).split())[:300]
            errors.append(msg)
            log(f"SECTION FAILED (degrading): {msg}")
            return None

    t0 = time.time()
    f64 = jax.config.jax_enable_x64
    p = Problem(cfg, solver="cg", cg_rtol=1e-12 if f64 else 1e-6,
                cg_maxiter=1000)
    try:
        p.setUp()
    except Exception as e:  # noqa: BLE001 — retry with the fused path off
        errors.append(f"setup: {type(e).__name__}: "
                      + " ".join(str(e).split())[:300])
        log(f"setup FAILED ({e}); retrying with fused=False")
        p = Problem(cfg, solver="cg", cg_rtol=1e-12 if f64 else 1e-6,
                    cg_maxiter=1000, fused=False)
        p.setUp()
    ops = p.engine_ops
    assert ops is not None
    setup_s = time.time() - t0
    log(f"setup {setup_s:.1f}s: {p.mesh.n_nodes} nodes, "
        f"{p.mesh.n_cells} cells, ngl={ngl}, dtype={p.dtype}, "
        f"fused={ops.fused} blocks={ops.fused_blocks}")
    log(f"setup phases: "
        f"{ {k: round(v, 2) for k, v in p.setup_phases.items()} }")

    nnz = assembled_nnz(p.mesh)
    log(f"assembled K nnz: {nnz/1e9:.3f} G")
    PARTIAL.update(
        setup_s=round(setup_s, 1),
        setup_phases_s={k: round(v, 2) for k, v in p.setup_phases.items()},
        fused=bool(ops.fused), nnz=nnz, last_milestone="setup")

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

    def timed_slope(make_chain, *args, n1=None, n2=None, reps=5,
                    target_s=None):
        """Per-iteration device time from the slope between two chain
        lengths. On tunneled devices a single call carries O(10 ms) of
        dispatch+fetch latency AND tens of ms of jitter; the difference
        cancels the constant part, and target_s sizes the long chain so
        the measured signal dwarfs the jitter (the fused kernel is fast
        enough that fixed short chains drown in noise). The shared chip's
        throughput itself swings >10x between windows, so the long chain
        is budgeted by the MEASURED rough rate (never 10*n1 blindly —
        that turned a 550 s budget into a timeout in one slow window)."""
        if target_s is not None:
            rough = best_of(make_chain(n1), *args, reps=2)
            per = max(rough / n1, 1e-7)
            n2 = int(np.clip(target_s / per, 2 * n1, 200000))
            # never let one timed call exceed ~2.5 s even when the rough
            # estimate was taken in a fast window
            n2 = min(n2, max(int(2.5 / per), 2 * n1))
        t1 = best_of(make_chain(n1), *args, reps=reps)
        t2 = best_of(make_chain(n2), *args, reps=min(reps, 3))
        slope = (t2 - t1) / (n2 - n1)
        if slope <= 0:
            # jitter swamped the short chain (contended windows show
            # 100s-of-ms latency floors); fall back to the long chain's
            # amortized rate — an upper bound, never 0
            slope = t2 / n2
        return max(slope, 1e-9), t1

    # every chain takes nit as a TRACED argument: ONE compile per chain
    # type and shape set, reused for both slope lengths. The axon AOT
    # path does not hit jax's persistent cache across processes, so each
    # bench run pays its compiles fresh — and the remote compile service
    # swings 2 s -> >10 min per program between windows; halving the
    # program count is the one mitigation that always works.
    @jax.jit
    def _k_f(ops_, v, nit):
        def body(i, x):
            y = E.apply_K(ops_, x)
            return y / (1.0 + jnp.max(jnp.abs(y)))
        return jax.lax.fori_loop(0, nit, body, v)

    def k_chain(nit):
        return lambda ops_, v: _k_f(ops_, v, nit)

    import dataclasses as _dc
    res = guard("k_apply", timed_slope, k_chain, ops, v, n1=400, reps=7,
                target_s=1.0)
    if res is None and ops.fused:
        # the compile-probe in build_engine should make this unreachable;
        # belt-and-braces: fall back to the jnp path and keep benching
        ops = _dc.replace(ops, fused=False)
        res = guard("k_apply_fallback", timed_slope, k_chain, ops, v,
                    n1=400, reps=7, target_s=1.0)
    if res is None:
        # nothing timeable at all: emit what we recorded and stop — the
        # errors list (the root cause) must survive into the artifact
        print(json.dumps({
            "metric": "spmv_effective_gnnz_per_s", "value": 0.0,
            "unit": "GNNZ/s", "vs_baseline": 0.0,
            "detail": {"setup_s": round(setup_s, 1),
                       "setup_phases_s": {k: round(v2, 2) for k, v2
                                          in p.setup_phases.items()},
                       "fused": bool(ops.fused), "errors": errors}}))
        return
    t_apply, t_call = res
    gnnz_s = nnz / t_apply / 1e9
    log(f"K apply (fused={ops.fused}): {t_apply*1e6:.1f} us "
        f"-> {gnnz_s:.1f} GNNZ/s effective "
        f"(single-call latency floor {t_call*1e3:.1f} ms)")
    PARTIAL.update(gnnz_s=round(gnnz_s, 2),
                   k_apply_ms=round(t_apply * 1e3, 4),
                   last_milestone="k_apply")

    # unfused (jnp dss) comparator: same chain on a fused=False ops copy
    t_apply_nf = None
    if ops.fused and time_left() > 90:
        ops_nf = _dc.replace(ops, fused=False)
        r = guard("k_apply_unfused", timed_slope, k_chain, ops_nf, v,
                  n1=400, reps=5, target_s=1.0)
        if r is not None:
            t_apply_nf = r[0]
            log(f"K apply (unfused jnp path): {t_apply_nf*1e6:.1f} us "
                f"(fused speedup {t_apply_nf/t_apply:.2f}x)")

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

    @jax.jit
    def _mm_f(ops_, v, nit):
        def body(i, x):
            y = L.mm(x, ops_.KT)
            return y / (1.0 + jnp.max(jnp.abs(y)))
        return jax.lax.fori_loop(0, nit, body, v)

    def mm_chain(nit):
        return lambda ops_, v: _mm_f(ops_, v, nit)

    @jax.jit
    def _rot_f(ops_, v, nit):
        def body(i, x):
            for d in range(len(ops_.nelem)):
                x = x[:, ops_.lay_v.perms[d]]
            return x / (1.0 + jnp.max(jnp.abs(x)))
        return jax.lax.fori_loop(0, nit, body, v)

    def rot_chain(nit):
        return lambda ops_, v: _rot_f(ops_, v, nit)

    t_mm = t_rot = t_dss = None
    if time_left() > 90:
        r1 = guard("phase_matmul", timed_slope, mm_chain, ops, v, n1=400,
                   reps=5, target_s=1.0)
        r2 = guard("phase_rot", timed_slope, rot_chain, ops, v, n1=400,
                   reps=5, target_s=0.5)
        if r1 is not None and r2 is not None:
            t_mm, t_rot = r1[0], r2[0]
            t_dss = max(t_apply - t_mm, 0.0)
            log(f"phase split: matmul {t_mm*1e6:.1f} us "
                f"({flops/t_mm/1e12:.1f} "
                f"TFLOP/s, {mfu*100:.1f}% of f32-effective peak), "
                f"DSS-overhead {t_dss*1e6:.1f} us "
                f"({t_dss/t_apply*100:.0f}% of apply), "
                f"jnp-path rotations {t_rot*1e6:.1f} us")

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

    @jax.jit
    def _solve_f(ops_, w, u, nit):
        def body(i, u):
            _, u2 = E.solve_kle_local(ops_, w, u, 0.0)
            return u2 * (1.0 - 1e-6) + 1e-7 * i  # defeat loop hoisting
        return jax.lax.fori_loop(0, nit, body, u)

    def solve_chain(nit):
        return lambda ops_, w, u: _solve_f(ops_, w, u, nit)

    # a COLD chain: every iteration restarts from a ~zero initial guess
    # (the i-dependence defeats hoisting without warming the start vector)
    @jax.jit
    def _cold_f(ops_, w, u0, nit):
        def body(i, u):
            _, u2 = E.solve_kle_local(ops_, w, u * (1e-20 * i), 0.0)
            return u0 + 1e-30 * u2
        return jax.lax.fori_loop(0, nit, body, u0)

    def cold_chain(nit):
        return lambda ops_, w, u0: _cold_f(ops_, w, u0, nit)

    r = guard("kle_solve", timed_slope, solve_chain, ops, vort, vel0,
              n1=2, n2=10, reps=3)
    t_solve = None if r is None else r[0]
    if t_solve is not None:
        log(f"KLE solve (two-stage NS, pc={ops.pc}, rtol={ops.cg_rtol:g}): "
            f"{t_solve*1e3:.2f} ms warm-started")
    r = guard("kle_cold", timed_slope, cold_chain, ops, vort, vel0,
              n1=2, n2=6, reps=3)
    t_cold = None if r is None else r[0]
    if t_cold is not None:
        log(f"KLE solve (pc={ops.pc}, cold start): {t_cold*1e3:.2f} ms")

    # --- full RHS evaluation
    @jax.jit
    def _rhs_f(ops_, w, u, nit):
        def body(i, w):
            f_, _ = E.rhs_local(ops_, 0.0, w, u)
            return w + 1e-9 * f_
        return jax.lax.fori_loop(0, nit, body, w)

    def rhs_chain(nit):
        return lambda ops_, w, u: _rhs_f(ops_, w, u, nit)

    r = guard("rhs_eval", timed_slope, rhs_chain, ops, vort, vel0,
              n1=2, n2=10, reps=3)
    t_rhs = None if r is None else r[0]
    if t_rhs is not None:
        log(f"full RHS eval: {t_rhs*1e3:.2f} ms")

    # --- KLE solve under the FDM preconditioner (DESIGN.md §4), warm + cold
    t_solve_fdm = t_cold_fdm = None
    if size in ("default", "large") and time_left() > 200:
        def fdm_section():
            t1 = time.time()
            p2 = Problem(cfg, solver="cg", cg_rtol=1e-12 if f64 else 1e-6,
                         cg_maxiter=1000, pc="fdm")
            p2.setUp()
            log(f"fdm setup {time.time()-t1:.1f}s, phases "
                f"{ {k: round(v, 2) for k, v in p2.setup_phases.items()} }")
            if p2.engine_ops.pc != "fdm":
                return None
            a, _ = timed_slope(solve_chain, p2.engine_ops, vort, vel0,
                               n1=2, n2=10, reps=3)
            log(f"KLE solve (pc=fdm): {a*1e3:.2f} ms warm-started")
            b, _ = timed_slope(cold_chain, p2.engine_ops, vort, vel0,
                               n1=2, n2=6, reps=3)
            log(f"KLE solve (pc=fdm, cold start): {b*1e3:.2f} ms")
            return a, b
        r = guard("fdm", fdm_section)
        if r is not None:
            t_solve_fdm, t_cold_fdm = r

    # --- high-order series (BASELINE.md N=6-8 refinement), default run only
    ho = None
    if size == "default" and time_left() > 150:
        def ho_section():
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
            flops_ho = 2.0 * ph.mesh.n_cells \
                * (ph.mesh.nnode_el * ph.dim) ** 2
            out = {"gnnz_per_s": round(nnz_ho / t_ho / 1e9, 1),
                   "mfu": round(flops_ho / t_ho / (peak * 1e12), 4),
                   "k_apply_us": round(t_ho * 1e6, 1),
                   "fused": bool(ph.engine_ops.fused),
                   "config": f"{tuple(cfg_ho['domain']['box-mesh']['nelem'])}"
                             f" ngl=7"}
            log(f"highorder ngl=7: {out['gnnz_per_s']} GNNZ/s, "
                f"mfu {out['mfu']*100:.1f}%")
            return out
        ho = guard("highorder", ho_section)

    ms = lambda t: None if t is None else round(t * 1e3, 3)
    print(json.dumps({
        "metric": "spmv_effective_gnnz_per_s",
        "value": round(gnnz_s, 2),
        "unit": "GNNZ/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "kle_solve_ms": ms(t_solve),
            "kle_solve_jacobi_ms": ms(t_solve),
            "kle_solve_fdm_ms": ms(t_solve_fdm),
            "kle_cold_jacobi_ms": ms(t_cold),
            "kle_cold_fdm_ms": ms(t_cold_fdm),
            "setup_s": round(setup_s, 1),
            "setup_phases_s": {k: round(v, 2)
                               for k, v in p.setup_phases.items()},
            "rhs_eval_ms": ms(t_rhs),
            "k_apply_ms": round(t_apply * 1e3, 4),
            "k_apply_unfused_ms": None if t_apply_nf is None
            else round(t_apply_nf * 1e3, 4),
            "fused": bool(ops.fused),
            "fused_blocks": [[list(k), b] for k, b in ops.fused_blocks],
            "mfu": round(mfu, 4),
            "phase_us": None if t_mm is None else {
                "matmul": round(t_mm * 1e6, 1),
                "dss_incl_rot": round(t_dss * 1e6, 1),
                "rotations": round(t_rot * 1e6, 1)},
            "highorder": ho,
            "nnz": nnz,
            "nodes": p.mesh.n_nodes,
            "csr_speed_of_light_gnnz_per_s": round(csr_sol_gnnz, 1),
            "errors": errors,
            "config": f"3D cavity {nelem} ngl={ngl} {p.dtype}",
        },
    }))


#: serializes the worker's final JSON line against the watchdog's partial
#: line: whoever prints first wins, the other stays silent (the driver
#: parses the LAST stdout line, so two lines in either order are a hazard)
_EMIT_LOCK = None


def _run_for_watchdog(done):
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the JSON line ALWAYS prints
        import traceback
        traceback.print_exc(file=sys.stderr)
        with _EMIT_LOCK:
            if not done.is_set():
                print(json.dumps({
                    "metric": "spmv_effective_gnnz_per_s", "value": 0.0,
                    "unit": "GNNZ/s", "vs_baseline": 0.0,
                    "detail": {"errors": [f"fatal: {type(e).__name__}: "
                                          + " ".join(str(e).split())[:300]],
                               **PARTIAL}}))
    finally:
        sys.stdout.flush()
        done.set()


if __name__ == "__main__":
    # the axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
    # honor it explicitly (the scaling bench runs on virtual CPU devices)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    # HARD wall-clock watchdog: the measurement runs in a worker thread;
    # if it stalls past the budget (observed: the shared chip's execution
    # queue hung a 10 MB result fetch for >9 minutes across three runs in
    # one window — a blocked C++ call that no try/except or in-thread
    # budget check can preempt), the main thread emits the JSON line with
    # the milestones recorded so far and hard-exits. The driver gets a
    # parseable artifact naming the stall instead of a timeout kill.
    import threading
    _EMIT_LOCK = threading.Lock()
    done = threading.Event()
    th = threading.Thread(target=_run_for_watchdog, args=(done,),
                          daemon=True)
    t0 = time.time()
    th.start()
    hard_s = float(os.environ.get("PYNAMA_BENCH_HARD_TIMEOUT", 560))
    if not done.wait(hard_s):
        # re-check done INSIDE the lock: if the worker unblocked and
        # printed its real JSON line in the same instant, the stale
        # partial line must NOT follow it (the driver parses the last
        # line)
        with _EMIT_LOCK:
            if done.is_set():
                os._exit(0)
            print(json.dumps({
                "metric": "spmv_effective_gnnz_per_s",
                "value": PARTIAL.get("gnnz_s", 0.0),
                "unit": "GNNZ/s", "vs_baseline": 0.0,
                "detail": {"errors": [
                    f"hard-stall after {time.time()-t0:.0f}s at milestone "
                    f"'{PARTIAL.get('last_milestone', 'startup')}' (device "
                    "execution/fetch hung — saturated shared chip window)"],
                    **PARTIAL}}), flush=True)
            os._exit(0)
