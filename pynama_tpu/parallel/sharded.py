"""shard_map execution of the KLE solver over a 1D device mesh.

One operator application = local gather/matmul/fanin-sum on the slab +
one bidirectional `ppermute` exchange of interface-plane partial sums
(`halo_combine`). Krylov dots and RK error norms are ownership-masked psums.
This is the ICI analog of PETSc's distributed MatMult/VecDot
(SURVEY §2.3, §5 "long-context analog").

Everything per-shard-constant (element matrices, connectivity, incidence) is
a closure constant — identical on all shards because the slab sub-meshes are
congruent. Everything per-shard-variable (coordinates, BC masks, ownership)
is a stacked operand sharded on the leading device axis.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pynama_tpu.ops.apply import apply_op, make_element_op
from pynama_tpu.parallel.slab import SlabPartition, make_partition
from pynama_tpu.solver.cg import pcg
from pynama_tpu.solver.timestep import get_tableau
from pynama_tpu.cases.problem import compute_vtensv

AXIS = "dp"


def halo_combine(y: jax.Array, npx_loc: int, axis: str = AXIS) -> jax.Array:
    """Add neighbor shards' partial sums on the two interface planes.

    y: (n_loc, c) local fanin result. Sends this shard's plane-0 partial to
    the left neighbor and plane-(-1) partial to the right neighbor; receives
    symmetrically. After this, both copies of every interface plane hold the
    complete assembled value.
    """
    c = y.shape[-1]
    y3 = y.reshape(npx_loc, -1, c)
    ndev = jax.lax.axis_size(axis)
    if ndev == 1:
        return y
    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]
    from_left = jax.lax.ppermute(y3[-1], axis, fwd)   # left nbr's last plane
    from_right = jax.lax.ppermute(y3[0], axis, bwd)   # right nbr's 0 plane
    y3 = y3.at[0].add(from_left).at[-1].add(from_right)
    return y3.reshape(-1, c)


@dataclasses.dataclass
class _SideData:
    mask: np.ndarray            # (ndev, n_loc, 1)
    kind: str
    normal_axis: int
    velocity: Optional[np.ndarray]
    vorticity: Optional[np.ndarray]
    func: Optional[object]


class ShardedKLE:
    """Sharded runtime for a Problem: builds slab-local operators and the
    jitted shard_map step/rhs functions."""

    def __init__(self, problem, ndev: int, devices=None):
        self.p = problem
        self.part = make_partition(problem.mesh, ndev)
        self.ndev = ndev
        devices = devices if devices is not None else jax.devices()[:ndev]
        self.mesh = Mesh(np.array(devices), (AXIS,))
        self.dtype = problem.dtype
        self._build()

    # ------------------------------------------------------------------ build
    def _build(self):
        p, part = self.p, self.part
        lm = part.local_mesh
        dt = self.dtype
        mk = lambda m, din, dout: make_element_op(
            m, lm.cell_nodes, lm.incidence, din, dout, lm.n_nodes, dtype=dt)
        em, eo = p._em, None
        self.K_op = mk(em.K, p.dim, p.dim)
        self.Rw_op = mk(em.Rw, p.dim_w, p.dim)
        self.curl_op = mk(np.asarray(p.operator.curl_op.mat), p.dim, p.dim_w)
        self.srt_op = mk(np.asarray(p.operator.srt_op.mat), p.dim, p.dim_s)
        self.div_op = mk(np.asarray(p.operator.div_op.mat), p.dim_s, p.dim)

        sc = lambda a: jnp.asarray(part.scatter(np.asarray(a)), dtype=dt)
        self.winv_s = sc(p.operator.winv)
        self.diag_s = sc(p.kle.main.diag)
        self.free_main_s = sc(p.bc.free_main.astype(np.float64))
        self.free_fs_s = sc(p.bc.free_fs.astype(np.float64))
        self.owned_s = jnp.asarray(part.owned, dtype=dt)
        self.coords_s = jnp.asarray(part.coords, dtype=dt)

        self.sides = []
        for s in p.bc.sides:
            gm = np.zeros((p.mesh.n_nodes, 1))
            gm[s.nodes] = 1.0
            self.sides.append(_SideData(
                mask=sc(gm), kind=s.kind, normal_axis=s.normal_axis,
                velocity=None if s.velocity is None else np.asarray(
                    s.velocity, dtype=np.float64),
                vorticity=None if s.vorticity is None else np.asarray(
                    s.vorticity, dtype=np.float64),
                func=s.func))

        self._n_owned = float(part.owned.sum())
        self.cfg = dict(rtol=p.kle.main.cg_rtol, atol=p.kle.main.cg_atol,
                        maxiter=p.kle.main.cg_maxiter)

    # ------------------------------------------------------- local primitives
    def _apply(self, op, x):
        return halo_combine(apply_op(op, x), self.part.npx_loc)

    def _dot(self, own):
        def dot(a, b):
            return jax.lax.psum(jnp.sum(a * b * own), AXIS)
        return dot

    def _bc_values(self, side_idx, attr, coords, t):
        s = self.sides[side_idx]
        if s.func is not None:
            a = s.func.alpha(self.p.nu, t)
            return getattr(s.func, attr)(coords, a).astype(coords.dtype)
        val = s.velocity if attr == "velocity" else s.vorticity
        n = coords.shape[0]
        return jnp.broadcast_to(jnp.asarray(val, dtype=coords.dtype),
                                (n, len(val)))

    def _apply_vel_bc(self, vel, masks, coords, t):
        for i in range(len(self.sides)):
            vals = self._bc_values(i, "velocity", coords, t)
            vel = jnp.where(masks[i] > 0, vals, vel)
        return vel

    def _apply_vort_bc(self, vort, masks, coords, t):
        for i in range(len(self.sides)):
            vals = self._bc_values(i, "vorticity", coords, t)
            vort = jnp.where(masks[i] > 0, vals, vort)
        return vort

    def _apply_tang_bc(self, vel, masks, coords, t):
        dim = self.p.dim
        for i, s in enumerate(self.sides):
            if s.kind != "no-slip":
                continue
            vals = self._bc_values(i, "velocity", coords, t)
            tang_cols = jnp.asarray(
                [1.0 if d != s.normal_axis else 0.0 for d in range(dim)],
                dtype=vel.dtype)
            vel = jnp.where((masks[i] > 0) & (tang_cols[None, :] > 0),
                            vals, vel)
        return vel

    # ------------------------------------------------------------- the solves
    def _masked_solve(self, vort, vel, free, diag, own):
        con = 1.0 - free
        vc = con * vel
        b = free * (self._apply(self.Rw_op, vort)
                    - self._apply(self.K_op, vc)) + vc

        def A(v):
            return free * self._apply(self.K_op, free * v) + con * v

        dmask = free * diag + con
        res = pcg(A, b, free * vel + vc, M_inv=lambda r: r / dmask,
                  rtol=self.cfg["rtol"], atol=self.cfg["atol"],
                  maxiter=self.cfg["maxiter"], dot=self._dot(own))
        return res.x

    def _rhs_local(self, t, vort, vel, consts):
        """Full evalRHS on the slab (base_problem.py:111-137)."""
        p = self.p
        (winv, diag, free_main, free_fs, own, coords, *masks) = consts
        vort = self._apply_vort_bc(vort, masks, coords, t)
        vel = self._apply_vel_bc(vel, masks, coords, t)
        if p.bc.needs_fs_stage:
            vel_fs = self._masked_solve(vort, vel, free_fs, diag, own)
            vel_fs = self._apply_tang_bc(vel_fs, masks, coords, t)
            vort = self._apply(self.curl_op, vel_fs) * winv
        vel = self._masked_solve(vort, vel, free_main, diag, own)
        vtensv = compute_vtensv(vel, p.dim)
        aux1 = 2.0 * p.mu * self._apply(self.srt_op, vel) * winv \
            - p.rho * vtensv
        rhs_v = self._apply(self.div_op, aux1) * winv / p.rho
        f = self._apply(self.curl_op, rhs_v) * winv
        return f, vel

    def _consts(self):
        return (self.winv_s, self.diag_s, self.free_main_s, self.free_fs_s,
                self.owned_s, self.coords_s,
                *[s.mask for s in self.sides])

    # --------------------------------------------------------- public: jitted
    def make_rhs(self):
        """jit(shard_map(rhs)): (t, vort_s, vel_s) -> (f_s, vel_s)."""
        spec3 = P(AXIS, None, None)

        def body(t, vort, vel, *consts):
            c = [x[0] for x in consts]
            f, v = self._rhs_local(t, vort[0], vel[0], c)
            return f[None], v[None]

        n_c = 6 + len(self.sides)
        fn = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(),) + (spec3,) * (2 + n_c),
            out_specs=(spec3, spec3), check_vma=False)

        def rhs(t, vort_s, vel_s):
            return fn(t, vort_s, vel_s, *self._consts())

        return jax.jit(rhs)

    def make_attempt(self, tableau="5bs", atol=1e-4, rtol=1e-4):
        """jit(shard_map(RK attempt)): one full adaptive-RK trial step —
        the 'training step' of this framework (8 stages x KLE solve)."""
        from pynama_tpu.solver.timestep import make_step
        tab = get_tableau(tableau)
        spec3 = P(AXIS, None, None)

        def body(t, dt, vort, vel, *consts):
            c = [x[0] for x in consts]
            own = c[4]

            def rhs(tt, y, aux):
                return self._rhs_local(tt, y, aux, c)

            def err_norm(e):
                ss = jax.lax.psum(jnp.sum(e * e * own), AXIS)
                return jnp.sqrt(ss / self._n_owned)

            att = make_step(rhs, tab, atol, rtol, err_norm=err_norm)
            res = att(t, dt, vort[0], vel[0])
            return res.y[None], res.enorm, res.aux[None]

        n_c = 6 + len(self.sides)
        fn = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P()) + (spec3,) * (2 + n_c),
            out_specs=(spec3, P(), spec3), check_vma=False)

        def attempt(t, dt, vort_s, vel_s):
            return fn(t, dt, vort_s, vel_s, *self._consts())

        return jax.jit(attempt)

    # ------------------------------------------------------------- data utils
    def shard_state(self, vort, vel):
        sh = NamedSharding(self.mesh, P(AXIS, None, None))
        vort_s = jax.device_put(
            jnp.asarray(self.part.scatter(np.asarray(vort)),
                        dtype=self.dtype), sh)
        vel_s = jax.device_put(
            jnp.asarray(self.part.scatter(np.asarray(vel)),
                        dtype=self.dtype), sh)
        return vort_s, vel_s

    def gather_state(self, x_s):
        return self.part.gather(np.asarray(x_s))
