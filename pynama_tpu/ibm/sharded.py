"""Slab-sharded IBM velocity correction (domain-decomposed H/S).

The reference runs IBM cases under ``mpiexec -n N`` like every case
(`src/cases/immersed_boundary.py` is rank-aware through PETSc's distributed
H/S AIJ matrices). TPU-native form: the correction is

    H-gather   : (L, dim) = sum over Euler support nodes   (tiny output)
    (L,L) solve: replicated dense Cholesky                  (tiny)
    S-scatter  : add w * z * dl * h onto the support nodes

so under the slab decomposition of `parallel/sharded_engine.py` the H/S
tables are expressed in LOCAL SLOT ids of each shard's element-local state
(exactly how `FuncSide` boundary scatters shard, sharded_engine.py:104-119):
each shard gathers its partial contribution of H·v with ownership-corrected
weights (w / slot-multiplicity), one `psum` replicates the full (L, dim)
interpolation, the dense solve is computed redundantly on every device, and
each shard scatters the correction onto the slots it owns — keeping the
local state consistent (all slots of a node receive the same add).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_ibm_shard_tables(mesh, nodes_tab, w_tab, ndev: int):
    """Per-shard local-slot tables for the H/S application.

    Returns (slots, gw, sw): each (ndev, L, S) with S = K^dim * max-slot-
    multiplicity. `slots` holds LOCAL slot ids into the shard's flattened
    (E_loc*nn) node axis (pad/out-of-shard = E_loc*nn, dropped by OOB
    gather/scatter modes); `gw` are H-gather weights w/mult (summing a
    node's slots over ALL shards reproduces the nodal value once); `sw` are
    S-scatter weights w (every slot of a node receives the full add)."""
    cn = np.asarray(mesh.cell_nodes)
    E, nn = cn.shape
    if E % ndev != 0:
        raise ValueError(f"n_cells={E} not divisible by {ndev} devices")
    E_loc = E // ndev
    n_nodes = mesh.n_nodes
    counts = np.bincount(cn.ravel(), minlength=n_nodes)
    maxm = int(counts.max())

    # node -> global slot ids table (pad = E*nn)
    order = np.argsort(cn.ravel(), kind="stable")
    flat = cn.ravel()[order]
    starts = np.r_[0, np.cumsum(counts[:-1])]
    within = np.arange(flat.size) - starts[flat]
    slots_of = np.full((n_nodes, maxm), E * nn, dtype=np.int64)
    slots_of[flat, within] = order

    nodes = np.asarray(nodes_tab)                       # (L, Kd)
    w = np.asarray(w_tab, dtype=np.float64)             # (L, Kd)
    L, Kd = nodes.shape
    gslots = slots_of[nodes]                            # (L, Kd, maxm)
    valid = gslots < E * nn
    gw_g = np.where(valid, (w / counts[nodes])[..., None], 0.0)
    sw_g = np.where(valid, w[..., None], 0.0)

    S = Kd * maxm
    pad_loc = E_loc * nn
    slots = np.full((ndev, L, S), pad_loc, dtype=np.int32)
    gw = np.zeros((ndev, L, S))
    sw = np.zeros((ndev, L, S))
    fslots = gslots.reshape(L, S)
    for d in range(ndev):
        lo, hi = d * pad_loc, (d + 1) * pad_loc
        m = (fslots >= lo) & (fslots < hi)
        slots[d][m] = (fslots[m] - lo).astype(np.int32)
        gw[d][m] = gw_g.reshape(L, S)[m]
        sw[d][m] = sw_g.reshape(L, S)[m]
    return slots, gw, sw


def correction_local(slots, gw, sw, chol, scale, vel_l, body_vel,
                     axis_name: str):
    """Shard-local velocity correction on the element-local state.

    vel_l: (E_loc, nn*dim) canonical local layout. Returns (corrected
    vel_l, flux) with flux the replicated (L, dim) virtual flux — identical
    on every shard after the psum."""
    L = slots.shape[0]
    dim = body_vel.shape[1]
    vf = vel_l.reshape(-1, dim)
    vfp = jnp.concatenate([vf, jnp.zeros((1, dim), dtype=vf.dtype)])
    hv = jnp.einsum("ls,lsc->lc", gw, vfp[slots],
                    precision=jax.lax.Precision.HIGHEST)
    hv = jax.lax.psum(hv, axis_name)
    flux = jax.scipy.linalg.cho_solve((chol, True), body_vel - hv)
    vals = sw[:, :, None] * flux[:, None, :] * scale
    corr = jnp.zeros_like(vf).at[slots.reshape(-1)].add(
        vals.reshape(-1, dim), mode="drop")
    return (vf + corr).reshape(vel_l.shape), flux
