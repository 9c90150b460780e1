"""Unstructured gather-DSS: row-gather vs trailing-axis-gather forms (r5).

exp/sumfact_roofline.py showed the hex 'K apply' cost is NOT the sumfact
math (48 us at 1000 hexes ngl=4) but the gather-DSS around it (~740 us):
`_dss_gather` does a (n_nodes, kmax) ROW gather from a (E*nn, c) operand
(c=3 trailing — 2.3% lane utilization) plus a row scatter-back. DESIGN §2
measured trailing-axis column gathers 4.6x faster than matmuls for the
box rotations; this tests the same trick here:

    x_cm = x.T                      (c, E*nn)
    g    = x_cm[:, inc_kmaj]        (c, kmax*n_nodes)  trailing gather
    s    = g.reshape(c, kmax, n).sum(1)                full-lane reduce
    out  = s[:, cell_nodes_flat].T  trailing gather + transpose back

Run on the chip: python exp/dss_gather_opt.py [E1d] [ngl]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from pynama_tpu.ops import local as L


def main():
    E1d = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ngl = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from bench import _write_hex_msh, interleaved_slopes
    from pynama_tpu.mesh import mesh_from_gmsh
    path = _write_hex_msh(E1d, E1d, E1d, distort=0.12)
    mesh = mesh_from_gmsh(path, ngl)
    c = 3
    lay = L.make_local_layout(mesh, c, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    E, nn = mesh.n_cells, mesh.nnode_el
    t = jnp.asarray(rng.standard_normal((E, nn * c)), dtype=jnp.float32)

    # --- variant B tables: kmax-major flat incidence + flat cell_nodes
    inc = np.asarray(mesh.incidence)            # (n_nodes, kmax) into E*nn
    n_nodes, kmax = inc.shape
    pad = E * nn                                # pad id -> a zero slot
    inc_kmaj = jnp.asarray(inc.T.reshape(-1).astype(np.int32))
    cn_flat = jnp.asarray(np.asarray(mesh.cell_nodes)
                          .reshape(-1).astype(np.int32))

    def dss_cm(x):
        xf = x.reshape(E * nn, c)
        xf = jnp.concatenate([xf, jnp.zeros((1, c), dtype=x.dtype)])
        x_cm = xf.T                              # (c, E*nn+1)
        g = x_cm[:, inc_kmaj]                    # (c, kmax*n_nodes)
        s = g.reshape(c, kmax, n_nodes).sum(axis=1)
        out = s[:, cn_flat]                      # (c, E*nn)
        return out.T.reshape(E, nn * c)

    # equivalence
    ref = np.asarray(L.dss(lay, t))
    new = np.asarray(jax.jit(dss_cm)(t))
    err = np.abs(ref - new).max()
    print(f"equivalence max err: {err:.2e}")

    @jax.jit
    def chain_a(t_, nit):
        def body(i, x):
            y = L.dss(lay, x)
            return y / (1.0 + jnp.max(jnp.abs(y)))
        return jax.lax.fori_loop(0, nit, body, t_)

    @jax.jit
    def chain_b(t_, nit):
        def body(i, x):
            y = dss_cm(x)
            return y / (1.0 + jnp.max(jnp.abs(y)))
        return jax.lax.fori_loop(0, nit, body, t_)

    res = interleaved_slopes(
        [("row_gather", lambda n: (lambda t_: chain_a(t_, n)), (t,)),
         ("cm_trailing", lambda n: (lambda t_: chain_b(t_, n)), (t,))],
        n1=100, target_s=0.8, rounds=6)
    for k, (per, fl) in res.items():
        print(f"{k:14s}: {per*1e6:8.1f} us (floor {fl*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
