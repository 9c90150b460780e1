"""Does Mosaic lower Precision.HIGHEST to more MXU passes than XLA?

exp/fused_decomp.py measured the Pallas matmul pipeline 20.4 us behind
XLA's own matmul on the same shapes (24^3 ngl=4: (13824,192)@(192,192)).
One candidate cause: XLA's HIGHEST is the bf16_3x decomposition while
Mosaic's jnp.dot(precision=HIGHEST) may emit bf16_6x. Test: a fused-
kernel variant whose matmul is an EXPLICIT 3-pass split
    a = hi(a) + lo(a);  u = hi(a)@hi(m) + hi(a)@lo(m) + lo(a)@hi(m)
with DEFAULT precision (single MXU pass each, f32 accumulate), checked
for numerical agreement against the HIGHEST product.
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


def _mm3x(a, m, dtype):
    a_hi = a.astype(jnp.bfloat16).astype(dtype)
    a_lo = (a - a_hi).astype(jnp.bfloat16)
    m_hi = m.astype(jnp.bfloat16).astype(dtype)
    m_lo = (m - m_hi).astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, preferred_element_type=dtype)
    return (d(a_hi.astype(jnp.bfloat16), m_hi.astype(jnp.bfloat16))
            + d(a_hi.astype(jnp.bfloat16), m_lo)
            + d(a_lo, m_hi.astype(jnp.bfloat16)))


def _kernel3x(nelem_blk, ngl, ncomp_out, dtype, nblk, R_sl,
              t_ref, m_ref, out_ref, bnd_ref, u_scr, last_scr):
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
        u = _mm3x(t_ref[:], m_ref[:], dtype)
        for d, row_stride, col_shift, ne_d in live_axes:
            rn, cn, rp, cp = F._axis_mask_factors(Rb, nnc, nelem_blk, N,
                                                  ncomp_out, d, dtype)
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
                                             "block"))
def fused3x_apply(t, matT, nelem, ngl, ncomp_out, block):
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
    kernel = functools.partial(_kernel3x, nelem_blk, ngl, ncomp_out,
                               dtype, nblk, R)
    out, bnd = pl.pallas_call(
        kernel,
        grid=(nblk + 1,),
        in_specs=[
            pl.BlockSpec((Rb, nnc_in),
                         lambda i: (jnp.minimum(i, nblk - 1), 0),
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


def main():
    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ngl = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nelem = (ne, ne, ne)
    dim, ncomp = 3, 3
    nnc = ngl ** dim * ncomp
    E = ne ** 3
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal((E, nnc)), dtype=jnp.float32)
    matT = jnp.asarray(rng.standard_normal((nnc, nnc)) / nnc,
                       dtype=jnp.float32)

    blk = F.probe_block(nelem, ngl, nnc, ncomp)
    print(f"probed block: {blk}", flush=True)

    # numerics: explicit 3x vs production HIGHEST
    y_ref = np.asarray(F.fused_apply(t0, matT, nelem, ngl, ncomp,
                                     block=blk)[0])
    y_3x = np.asarray(fused3x_apply(t0, matT, nelem, ngl, ncomp, block=blk))
    rel = np.abs(y_3x - y_ref) / (np.abs(y_ref) + 1e-30)
    scale = np.abs(y_ref).max()
    print(f"3x vs HIGHEST: max abs diff {np.abs(y_3x-y_ref).max():.3e} "
          f"(scale {scale:.3e}), max rel {rel.max():.3e}", flush=True)

    def chain(fn):
        @jax.jit
        def c(t, m, nit):
            def body(i, x):
                y = fn(x, m)
                return y / (1.0 + jnp.max(jnp.abs(y)))
            return jax.lax.fori_loop(0, nit, body, t)
        return c

    variants = {
        "fused_HI": chain(lambda x, m: F.fused_apply(
            x, m, nelem, ngl, ncomp, block=blk)[0]),
        "fused_3x": chain(lambda x, m: fused3x_apply(
            x, m, nelem, ngl, ncomp, block=blk)),
        "jnp_mm_HI": chain(lambda x, m: L.mm(x, m)),
    }

    def run(c, n):
        return float(np.asarray(c(t0, matT, n)).ravel()[0])

    for name, c in variants.items():
        tw = time.time()
        run(c, 100)
        print(f"compiled {name} ({time.time()-tw:.1f}s)", flush=True)

    nit = 2000
    best = {k: np.inf for k in variants}
    for r in range(8):
        for name, c in variants.items():
            t1 = time.perf_counter()
            run(c, nit)
            best[name] = min(best[name], (time.perf_counter() - t1) / nit)
        print(f"round {r}: " + "  ".join(
            f"{k}={best[k]*1e6:.1f}us" for k in variants), flush=True)


if __name__ == "__main__":
    main()
