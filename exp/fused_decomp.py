"""On-chip decomposition of the fused kernel's time at 24^3 ngl=4.

Where do the ~105 us (clean window) of the fused K apply go, given the
26 us HBM floor and ~16 us MXU floor (docs/DESIGN.md section 7 roofline)?
Candidate sinks: (1) the in-VMEM masked roll chain (4 pltpu.rolls + 2
broadcast FMAs per live axis), (2) the cross-block finalize machinery
(ping-pong scratch, +1 grid step, revisited output blocks), (3) the
matmul itself at HIGHEST precision, (4) irreducible pipeline overhead.

Variants (identical chain loop, interleaved round-robin, min over rounds
so shared-chip contention hits all variants equally):

  fused      : production kernel (ops/fused.py), probed block
  nodss      : same kernel, roll chain deleted (matmul + finalize only)
  plainmm    : minimal Pallas pipeline — grid=nblk, direct out, no
               scratch/bnd/finalize (pure DMA-pipelined matmul)
  jnp_mm     : XLA matmul alone (no DSS)
  jnp_full   : XLA matmul + jnp DSS (the unfused engine path)

  fused-nodss   = roll-chain cost
  nodss-plainmm = finalize/ping-pong cost
  plainmm-jnp_mm = Pallas-vs-XLA pipeline quality on the bare matmul

Usage: python exp/fused_decomp.py [nelem ngl] (default 24 4)
"""
import functools
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from pynama_tpu.ops import fused as F
from pynama_tpu.ops import local as L


def _variant_kernel(nelem_blk, ngl, ncomp_out, dtype, nblk, R_sl, do_rolls,
                    t_ref, m_ref, out_ref, bnd_ref, u_scr, last_scr):
    """ops/fused.py _fused_kernel with the roll chain optional."""
    dim = len(nelem_blk)
    N = ngl
    Rb = int(np.prod(nelem_blk))
    nnc = N ** dim * ncomp_out
    plane = (N ** (dim - 1)) * ncomp_out
    i = pl.program_id(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    prev_slot = 1 - slot
    live_axes = [a for a in F._inblock_axes(nelem_blk, N, ncomp_out)
                 if a[3] > 1]

    @pl.when(i < nblk)
    def _compute():
        u = jnp.dot(t_ref[:], m_ref[:], preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST)
        if do_rolls:
            for d, row_stride, col_shift, ne_d in live_axes:
                rn, cn, rp, cp = F._axis_mask_factors(
                    Rb, nnc, nelem_blk, N, ncomp_out, d, dtype)
                nxt = pltpu.roll(pltpu.roll(u, (Rb - row_stride) % Rb, 0),
                                 col_shift % nnc, 1)
                prv = pltpu.roll(pltpu.roll(u, row_stride % Rb, 0),
                                 (nnc - col_shift) % nnc, 1)
                u = u + nxt * (rn * cn) + prv * (rp * cp)
        u_scr[slot] = u

        @pl.when(i == 0)
        def _():
            bnd_ref[0] = u[:R_sl, :plane]

    @pl.when(i >= 1)
    def _finalize():
        z = u_scr[prev_slot]
        new_last = z[Rb - R_sl:, nnc - plane:]
        zfirst = z[:R_sl, :plane] + jnp.where(i >= 2, last_scr[:], 0.0)
        zlast = new_last + jnp.where(i < nblk,
                                     u_scr[slot][:R_sl, :plane], 0.0)
        out_ref[:R_sl, :plane] = zfirst
        out_ref[:R_sl, plane:] = z[:R_sl, plane:]
        if Rb > 2 * R_sl:
            out_ref[R_sl:Rb - R_sl, :] = z[R_sl:Rb - R_sl, :]
        if Rb > R_sl:
            out_ref[Rb - R_sl:, :nnc - plane] = z[Rb - R_sl:, :nnc - plane]
            out_ref[Rb - R_sl:, nnc - plane:] = zlast
        else:
            out_ref[:, nnc - plane:] = zlast
        last_scr[:] = new_last

        @pl.when(i == nblk)
        def _():
            bnd_ref[1] = new_last


@functools.partial(jax.jit, static_argnames=("nelem", "ngl", "ncomp_out",
                                             "block", "do_rolls"))
def variant_apply(t, matT, nelem, ngl, ncomp_out, block, do_rolls=True):
    dim = len(nelem)
    ne0 = int(nelem[0])
    R = int(np.prod(nelem[1:]))
    nnc_in = t.shape[1]
    nnc_out = ngl ** dim * ncomp_out
    plane = (ngl ** (dim - 1)) * ncomp_out
    dtype = t.dtype
    blk = int(block)
    nblk = ne0 // blk
    Rb = blk * R
    nelem_blk = (blk,) + tuple(nelem[1:])
    kernel = functools.partial(_variant_kernel, nelem_blk, ngl, ncomp_out,
                               dtype, nblk, R, do_rolls)
    out, bnd = pl.pallas_call(
        kernel,
        grid=(nblk + 1,),
        in_specs=[
            pl.BlockSpec((Rb, nnc_in), lambda i: (jnp.minimum(i, nblk - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nnc_in, nnc_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Rb, nnc_out), lambda i: (jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R, plane), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ne0 * R, nnc_out), dtype),
            jax.ShapeDtypeStruct((2, R, plane), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Rb, nnc_out), dtype),
            pltpu.VMEM((R, plane), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(32 * 2**20,
                    2 * Rb * t.dtype.itemsize * (8 * nnc_in + 5 * nnc_out)),
                100 * 2**20)),
    )(t, matT)
    return out


def _plainmm_kernel(t_ref, m_ref, out_ref):
    out_ref[:] = jnp.dot(t_ref[:], m_ref[:],
                         preferred_element_type=t_ref.dtype,
                         precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("block",))
def plainmm_apply(t, matT, block):
    E, nnc_in = t.shape
    nnc_out = matT.shape[1]
    Rb = block
    nblk = E // Rb
    return pl.pallas_call(
        _plainmm_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((Rb, nnc_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nnc_in, nnc_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, nnc_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, nnc_out), t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )(t, matT)


def main():
    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ngl = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nelem = (ne, ne, ne)
    dim = 3
    ncomp = 3
    nn = ngl ** dim
    nnc = nn * ncomp
    E = ne ** 3
    R = ne * ne

    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal((E, nnc)), dtype=jnp.float32)
    matT = jnp.asarray(rng.standard_normal((nnc, nnc)) / nnc,
                       dtype=jnp.float32)

    class _M:
        pass
    mesh = _M()
    mesh.is_box = True
    mesh.dim = dim
    mesh.ngl = ngl
    mesh.nelem = nelem
    mesh.n_nodes = int(np.prod([n * (ngl - 1) + 1 for n in nelem]))
    # cell_nodes only needed for inv_mult; fake it cheaply
    lay = L.LocalLayout(perms=L._make_perms(ngl, dim, ncomp),
                        inv_mult=jnp.zeros((1, 1)), ngl=ngl,
                        nelem=nelem, ncomp=ncomp)

    blk = F.probe_block(nelem, ngl, nnc, ncomp)
    print(f"probed block: {blk}", flush=True)

    def chain(fn):
        @jax.jit
        def c(t, m, nit):
            def body(i, x):
                y = fn(x, m)
                return y / (1.0 + jnp.max(jnp.abs(y)))
            return jax.lax.fori_loop(0, nit, body, t)
        return c

    variants = {
        "fused": chain(lambda x, m: F.fused_apply(
            x, m, nelem, ngl, ncomp, block=blk)[0]),
        "nodss": chain(lambda x, m: variant_apply(
            x, m, nelem, ngl, ncomp, block=blk, do_rolls=False)),
        "plainmm": chain(lambda x, m: plainmm_apply(x, m, block=blk * R)),
        "jnp_mm": chain(lambda x, m: L.mm(x, m)),
        "jnp_full": chain(lambda x, m: L.dss(lay, L.mm(x, m))),
    }

    nit = 2000
    n_warm = 100

    def run(c, n):
        # host fetch = the only hard sync on the tunneled axon backend
        return float(np.asarray(c(t0, matT, n)).ravel()[0])

    # compile + warm
    for name, c in variants.items():
        tw = time.time()
        run(c, n_warm)
        print(f"compiled {name} ({time.time()-tw:.1f}s)", flush=True)

    best = {k: np.inf for k in variants}
    rounds = 10
    for r in range(rounds):
        for name, c in variants.items():
            t1 = time.perf_counter()
            run(c, nit)
            dt = (time.perf_counter() - t1 - 0.0) / nit
            best[name] = min(best[name], dt)
        print(f"round {r}: " + "  ".join(
            f"{k}={best[k]*1e6:.1f}us" for k in variants), flush=True)

    print("\n=== decomposition (min over rounds) ===")
    for k in variants:
        print(f"{k:9s}: {best[k]*1e6:7.1f} us")
    print(f"roll-chain cost    : {(best['fused']-best['nodss'])*1e6:7.1f} us")
    print(f"finalize machinery : {(best['nodss']-best['plainmm'])*1e6:7.1f} us")
    print(f"pallas-vs-xla mm   : {(best['plainmm']-best['jnp_mm'])*1e6:7.1f} us")
    print(f"fused win vs jnp   : {(best['jnp_full']-best['fused'])*1e6:7.1f} us")


if __name__ == "__main__":
    main()
