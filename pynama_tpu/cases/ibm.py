"""Immersed-boundary flow cases (direct forcing).

Functional port of reference `src/cases/immersed_boundary.py`:

  ImmersedBoundaryStatic  — fixed body; interpolation tables built once
                            (`immersed_boundary.py:19-55, 181-207`)
  ImmersedBoundaryDynamic — prescribed body motion; tables + normal-system
                            factor recomputed every step — here a
                            fixed-shape jitted recompute instead of a PETSc
                            matrix rebuild (`immersed_boundary.py:286-385`)

Per accepted time step (startSolver loop, `immersed_boundary.py:56-113`):
    1. one adaptive-RK step of the vorticity transport
    2. KLE solve (BCs + velocity from vorticity)
    3. velocity correction: solve C z = -(H v - v_body); v += S z
    4. vorticity <- curl(v); continue from the corrected state
Drag/lift histories from the virtual flux go to <case>.yaml
(`immersed_boundary.py:325-348`).
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from pynama_tpu.cases.problem import Problem
from pynama_tpu.ibm.bodies import BodiesContainer
from pynama_tpu.ibm import interpolation as I
from pynama_tpu.solver.timestep import AdaptiveStepper
from pynama_tpu.utils import Timer

logger = logging.getLogger("pynama_tpu.ibm")


class ImmersedBoundaryStatic(Problem):
    def setUp(self):
        super().setUp()
        # the reference restricts IBM to 2D and ngl<4
        # (immersed_boundary.py:36); the quadrature-weighted interpolation
        # (ibm/interpolation.py) lifts both: any ngl, 2D and 3D.
        # gmsh meshes may declare h-min explicitly (reference
        # immersed_boundary.py:40: nodeSeparation = h-min / (ngl-1))
        hmin = self.config.get("domain", {}).get("h-min")
        self.h = (float(hmin) / (self.ngl - 1) if hmin is not None
                  else self.mesh.node_separation())
        self.U_ref = self._free_stream_velocity()
        self.body = BodiesContainer(self.config["bodies"], dim=self.dim)
        self.body.create_bodies(self.h)
        self.body.set_vel_ref(self.U_ref)
        logger.info("Node separation: %g, body nodes: %d", self.h,
                    self.body.n_nodes)
        self.ibm_ops = I.make_ibm_ops(self.mesh, self.body.dl,
                                      dtype=self.dtype)
        self._jit_correction = jax.jit(I.correction, static_argnames="n_nodes")
        self._jit_tables = jax.jit(I.support_tables)
        self._build_interpolation()

    def _free_stream_velocity(self) -> float:
        """|u| of the uniform boundary condition (reference
        getFreeStreamVelocity via `boundary_conditions.py:87-114`)."""
        for s in self.bc.sides:
            if s.velocity is not None:
                return float(np.linalg.norm(s.velocity))
        return 1.0

    def _build_interpolation(self):
        xy = jnp.asarray(self.body.coordinates(), dtype=self.dtype)
        self.nodes_tab, self.w_tab = self._jit_tables(self.ibm_ops, xy)
        # the jittable eq-tensor core is O(L^2 K^{2 dim}) memory — fine in
        # 2D, prohibitive for large 3D K^3 supports; those assemble C = W Wᵀ
        # on host through sparse/spgemm.py (vectorized SpGEMM, the PETSc
        # H.matMult(S) analog)
        L, K = self.nodes_tab.shape
        if L * L * K * K <= 2 ** 27:
            C = I.normal_core(self.ibm_ops, self.nodes_tab, self.w_tab)
        else:
            C = jnp.asarray(I.normal_core_spgemm(
                self.ibm_ops, self.nodes_tab, self.w_tab),
                dtype=self.dtype)
        self.chol = jnp.linalg.cholesky(C)

    # ----------------------------------------------------------- correction
    def velocity_correction(self, vel, t):
        """v += S C^-1 (v_body - H v); returns (vel, virtual_flux)."""
        body_vel = jnp.asarray(self.body.velocities(), dtype=self.dtype)
        corr, flux = self._jit_correction(
            self.ibm_ops, self.nodes_tab, self.w_tab, self.chol,
            jnp.asarray(vel), body_vel, n_nodes=self.mesh.n_nodes)
        return jnp.asarray(vel) + corr, flux

    # -------------------------------------------------------------- running
    def start_solver(self, post_step=None, dt0=None, atol=1e-4, rtol=1e-4,
                     tableau="5bs"):
        ndev = int(self.opts.get("ndev", 1))
        if ndev > 1:
            return self._start_solver_sharded_ibm(
                ndev, post_step=post_step, dt0=dt0, atol=atol, rtol=rtol,
                tableau=tableau)
        if dt0 is None:
            dt0 = (self.end_time - self.start_time) / (10 * self.max_steps)
        save_every = int(self.config.get("save-n-steps", 10))
        force_every = max(1, save_every // 10)

        stepper = AdaptiveStepper(self.rhs, atol=atol, rtol=rtol,
                                  tableau=tableau)
        stepper.dt = float(dt0)

        # initial condition (computeInitialCondition,
        # immersed_boundary.py:131-141) — through _per_step_correction:
        # the reference's dynamic override updates the body kinematics at
        # t0 there too (immersed_boundary.py:366-368 called from :140)
        t = self.start_time
        vort, vel = self.solve_kle(self.vort, self.vel, t)
        vel, flux = self._per_step_correction(vel, t)
        vort = self.operator.curl(vel)

        hist = {"times": [], "cd": [], "cl": [], "dt": [], "steps": [],
                "elapsedTimes": [], "cd_phys": [], "cl_phys": []}
        timer = Timer()
        step = 0
        while step < self.max_steps and t < self.end_time - 1e-14:
            timer.tic()
            t, vort, vel = stepper.step(t, vort, vel, t_max=self.end_time)
            step += 1
            vort, vel = self.solve_kle(vort, vel, t)
            vel_pre = vel
            vel, flux = self._per_step_correction(vel, t)
            vort = self.operator.curl(vel)
            dt = stepper.dt
            logger.info("Converged: Step %4d | Time %.4e | DT: %.4e",
                        step, t, dt)
            if self.viewer is not None and step % save_every == 0:
                self._save_step(step, t, vort, vel)
            if step % force_every == 0:
                denom = 0.5 * self.U_ref**2
                fx, fy = self.body.compute_force(np.asarray(flux),
                                                 denom * dt)
                # physical force coefficients from the momentum the
                # correction imparts to the fluid per unit time:
                # F = rho * integral(dv) dV / dt with the lumped node
                # areas; cd = F_x / (0.5 rho U^2 Lref). The reference's
                # computeDragForce sums raw flux components
                # (immersed_boundary.py:115-120) — a resolution-scaled
                # trace kept above as `cd` for parity.
                corr = np.asarray(vel) - np.asarray(vel_pre)
                wl = np.asarray(self.operator.weight).reshape(-1)
                cphys = (corr * wl[:, None]).sum(axis=0) \
                    / (dt * denom * self.body.ref_length)
                hist["times"].append(float(t))
                hist["cd"].append(fx)
                hist["cl"].append(fy)
                hist["cd_phys"].append(float(cphys[0]))
                hist["cl_phys"].append(float(cphys[1]))
                hist["dt"].append(float(dt))
                hist["steps"].append(step)
                hist["elapsedTimes"].append(timer.toc())
                if self.viewer is not None:
                    self.viewer.write_yaml(self.case_name, {
                        "dh": self.h, "dl": self.body.dl,
                        "lagPoints": self.body.n_nodes,
                        "eulerNodes": self.mesh.n_nodes * self.dim_w,
                        "ngl": self.ngl, **hist})
            if post_step is not None:
                post_step(step, t, dt, vort, vel)
        self.vort, self.vel = vort, vel
        self.history = hist
        return t, step

    def _per_step_correction(self, vel, t):
        return self.velocity_correction(vel, t)

    # ------------------------------------------------------ sharded running
    def _start_solver_sharded_ibm(self, ndev, post_step=None, dt0=None,
                                  atol=1e-4, rtol=1e-4, tableau="5bs"):
        """Domain-decomposed IBM transient (`-ndev N`): RK step, KLE solve,
        velocity correction and curl all run as shard_map programs over the
        device mesh; only the scalar error norm and the tiny replicated
        virtual flux cross to host per step (the reference runs IBM under
        mpiexec like every case, `immersed_boundary.py` via PETSc)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pynama_tpu.engine import local_engine as E
        from pynama_tpu.ibm.sharded import (build_ibm_shard_tables,
                                            build_node_slot_map,
                                            correction_cg_local,
                                            correction_local,
                                            dynamic_tables_local)
        from pynama_tpu.parallel import ShardedEngine
        from pynama_tpu.parallel.sharded_engine import AXIS

        if dt0 is None:
            dt0 = (self.end_time - self.start_time) / (10 * self.max_steps)
        save_every = int(self.config.get("save-n-steps", 10))
        force_every = max(1, save_every // 10)

        se = ShardedEngine(self, ndev,
                           overlap_dss=bool(self.opts.get("overlap_dss",
                                                          False)))
        sh = NamedSharding(se.mesh, P(AXIS))
        L = self.body.n_nodes
        scale = float(self.ibm_ops.dl * self.ibm_ops.h)
        dyn = self.body.is_moving

        if not dyn:
            slots, gw, sw = build_ibm_shard_tables(
                self.mesh, self.nodes_tab, self.w_tab, ndev)
            slots = jax.device_put(jnp.asarray(slots), sh)
            gw = jax.device_put(jnp.asarray(gw, dtype=self.dtype), sh)
            sw = jax.device_put(jnp.asarray(sw, dtype=self.dtype), sh)
            chol = jax.device_put(
                jnp.broadcast_to(self.chol[None], (ndev, L, L)), sh)
            body_vel = jnp.asarray(self.body.velocities(),
                                   dtype=self.dtype)

            def _accept(ops_s, sl, g, s, ch, bv, t, vort, vel):
                """solve KLE + correct velocity + re-derive vorticity, on
                one shard (the sharded form of the single-device
                accepted-step chain above)."""
                ops = jax.tree.map(lambda x: x[0], ops_s)
                vort2, vel2 = E.solve_kle_local(ops, vort[0], vel[0], t)
                vel2, flux = correction_local(sl[0], g[0], s[0], ch[0],
                                              scale, vel2, bv, AXIS)
                vort2 = E.curl(ops, vel2)
                return vort2[None], vel2[None], flux

            accept_sm = jax.jit(jax.shard_map(
                _accept, mesh=se.mesh,
                in_specs=(se._spec_ops, P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                          P(), P(), P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P(AXIS), P()), check_vma=False))

            def accept(t, vort, vel):
                return accept_sm(se.ops_s, slots, gw, sw, chol, body_vel,
                                 t, vort, vel)
        else:
            # MOVING body under domain decomposition (VERDICT r3 #7): the
            # per-step support-table rebuild runs IN-JIT per shard in
            # local slot ids (position-independent node->slot map +
            # range test), and the correction is the matrix-free CG with
            # one psum per C application — the sharded analog of the
            # single-device dynamic path (reference: dynamic IBM runs
            # rank-parallel like everything, immersed_boundary.py:286-385)
            slots_of_np, counts_np = build_node_slot_map(self.mesh, ndev)
            slots_of = jnp.asarray(slots_of_np)
            counts = jnp.asarray(counts_np, dtype=self.dtype)
            nloc = (self.mesh.n_cells // ndev) * self.mesh.nnode_el
            corr_rtol = 1e-12 if self.dtype == jnp.float64 else 1e-7
            flux_rep = jnp.zeros((L, self.dim), dtype=self.dtype)

            def _accept_dyn(ops_s, iops, so, cnt, xy, bv, flux0, t,
                            vort, vel):
                ops = jax.tree.map(lambda x: x[0], ops_s)
                vort2, vel2 = E.solve_kle_local(ops, vort[0], vel[0], t)
                nodes, w = I.support_tables(iops, xy)
                sl, g, s = dynamic_tables_local(
                    so, cnt, nodes, w, nloc, jax.lax.axis_index(AXIS))
                vel2, flux, stats = correction_cg_local(
                    sl, g, s, scale, vel2, bv, flux0, AXIS,
                    rtol=corr_rtol)
                vort2 = E.curl(ops, vel2)
                return vort2[None], vel2[None], flux, stats

            accept_dyn_sm = jax.jit(jax.shard_map(
                _accept_dyn, mesh=se.mesh,
                in_specs=(se._spec_ops, P(), P(), P(), P(), P(), P(),
                          P(), P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P(AXIS), P(), P()), check_vma=False))

            def accept(t, vort, vel):
                nonlocal flux_rep
                self.body.update_parameters(t)
                xy = jnp.asarray(self.body.coordinates(),
                                 dtype=self.dtype)
                self._xy = xy            # _save_step visualization refresh
                bv = jnp.asarray(self.body.velocities(), dtype=self.dtype)
                vort, vel, flux_rep, stats = accept_dyn_sm(
                    se.ops_s, self.ibm_ops, slots_of, counts, xy, bv,
                    flux_rep, t, vort, vel)
                relres = float(stats[1])
                if relres > 10 * corr_rtol:
                    logger.warning(
                        "sharded IBM correction CG stalled: %d iters, "
                        "relres %.2e at t=%g", int(stats[0]), relres, t)
                return vort, vel, flux_rep

        att = se.make_attempt(tableau=tableau, atol=atol, rtol=rtol)

        def attempt(t, dt, y, aux):
            from pynama_tpu.solver.timestep import StepResult
            y2, enorm, aux2 = att(se.ops_s, t, dt, y, aux)
            return StepResult(y=y2, enorm=enorm, aux=aux2)

        stepper = AdaptiveStepper(None, atol=atol, rtol=rtol,
                                  tableau=tableau, attempt=attempt)
        stepper.dt = float(dt0)

        # initial condition: sharded solve + correction + curl
        t = self.start_time
        vort_s, vel_s = se.shard_state(self.vort, self.vel)
        vort_s, vel_s, flux = accept(t, vort_s, vel_s)

        hist = {"times": [], "cd": [], "cl": [], "dt": [], "steps": [],
                "elapsedTimes": [], "cd_phys": [], "cl_phys": []}
        timer = Timer()
        step = 0
        while step < self.max_steps and t < self.end_time - 1e-14:
            timer.tic()
            t, vort_s, vel_s = stepper.step(t, vort_s, vel_s,
                                            t_max=self.end_time)
            step += 1
            vort_s, vel_s, flux = accept(t, vort_s, vel_s)
            dt = stepper.dt
            logger.info("Converged: Step %4d | Time %.4e | DT: %.4e",
                        step, t, dt)
            if self.viewer is not None and step % save_every == 0:
                self._save_step(step, t,
                                se.gather_state(vort_s, self.dim_w),
                                se.gather_state(vel_s, self.dim))
            if step % force_every == 0:
                denom = 0.5 * self.U_ref**2
                fx, fy = self.body.compute_force(np.asarray(flux),
                                                 denom * dt)
                # physical coefficients (see the single-device loop): the
                # replicated flux is spread through the GLOBAL static
                # tables on host; the dynamic sharded case rebuilds its
                # tables per shard in-jit, so cd_phys is skipped there
                if getattr(self, "nodes_tab", None) is not None:
                    corr = np.asarray(I.spread_S(
                        self.ibm_ops, self.nodes_tab, self.w_tab,
                        jnp.asarray(np.asarray(flux)), self.mesh.n_nodes))
                    wl = np.asarray(self.operator.weight).reshape(-1)
                    cphys = (corr * wl[:, None]).sum(axis=0) \
                        / (dt * denom * self.body.ref_length)
                    hist["cd_phys"].append(float(cphys[0]))
                    hist["cl_phys"].append(float(cphys[1]))
                hist["times"].append(float(t))
                hist["cd"].append(fx)
                hist["cl"].append(fy)
                hist["dt"].append(float(dt))
                hist["steps"].append(step)
                hist["elapsedTimes"].append(timer.toc())
                if self.viewer is not None:
                    # same force-history yaml artifact as the
                    # single-device path writes above
                    self.viewer.write_yaml(self.case_name, {
                        "dh": self.h, "dl": self.body.dl,
                        "lagPoints": self.body.n_nodes,
                        "eulerNodes": self.mesh.n_nodes * self.dim_w,
                        "ngl": self.ngl, **hist})
            if post_step is not None:
                post_step(step, t, dt,
                          se.gather_state(vort_s, self.dim_w),
                          se.gather_state(vel_s, self.dim))
        self.vort = jnp.asarray(se.gather_state(vort_s, self.dim_w))
        self.vel = jnp.asarray(se.gather_state(vel_s, self.dim))
        self.history = hist
        return t, step

    def _save_step(self, step, t, vort, vel):
        zone = np.zeros((self.mesh.n_nodes, 1))
        zone[np.unique(np.asarray(self.nodes_tab))] = 1.0
        aff = np.zeros((self.mesh.n_nodes, 1))
        aff[np.unique(np.asarray(self.nodes_tab)[
            np.asarray(self.w_tab) > 0])] = 1.0
        self.viewer.save_data(step, t, vorticity=np.asarray(vort),
                              velocity=np.asarray(vel),
                              ibm_zone=zone.ravel(),
                              affected_nodes=aff.ravel())
        self.viewer.write_xmf(self.case_name)

    def run(self, atol=1e-4, rtol=1e-4, dt0=None, tableau="5bs",
            log_diagnostics=False, fast_io=False):
        return self.start_solver(atol=atol, rtol=rtol, dt0=dt0,
                                 tableau=tableau)


class ImmersedBoundaryDynamic(ImmersedBoundaryStatic):
    """Moving body: per step, ONE jitted device program recomputes the
    fixed-shape support tables and solves C z = -(H v - v_body) MATRIX-FREE
    (CG on z -> H(S z), warm-started from the previous flux) — no normal
    matrix is ever formed, vs the reference's full PETSc matrix/KSP rebuild
    per step (`immersed_boundary.py:366-385`). This removes the host
    O(sum fanin^2) assembly the large-3D static path needs, so moving 3D
    bodies step at device speed.

    Note: the inherited PUBLIC `velocity_correction` (Cholesky on
    `self.chol`) reflects the body at t0 — the per-step hot path is
    `_per_step_correction` (matrix-free, current position); `_save_step`
    refreshes the visualization tables to the current position."""

    def setUp(self):
        super().setUp()
        self._flux = jnp.zeros((self.body.n_nodes, self.dim),
                               dtype=self.dtype)

        self._corr_rtol = 1e-12 if self.dtype == jnp.float64 else 1e-7

        def _step_corr(ops, xy, vel, body_vel, flux0):
            nodes, w = I.support_tables(ops, xy)
            corr, flux, stats = I.correction_cg(
                ops, nodes, w, vel, body_vel, flux0,
                n_nodes=self.mesh.n_nodes, rtol=self._corr_rtol)
            return corr, flux, stats

        self._jit_step_corr = jax.jit(_step_corr)

    def _per_step_correction(self, vel, t):
        self.body.update_parameters(t)           # host O(L) kinematics only
        xy = jnp.asarray(self.body.coordinates(), dtype=self.dtype)
        self._xy = xy                             # for _save_step refresh
        body_vel = jnp.asarray(self.body.velocities(), dtype=self.dtype)
        corr, flux, stats = self._jit_step_corr(
            self.ibm_ops, xy, jnp.asarray(vel), body_vel, self._flux)
        self._flux = flux
        relres = float(stats[1])
        if relres > 10 * self._corr_rtol:
            logger.warning(
                "IBM correction CG stalled: %d iters, relres %.2e "
                "(rigid-body constraint under-enforced at t=%g)",
                int(stats[0]), relres, t)
        return jnp.asarray(vel) + corr, flux

    def _save_step(self, step, t, vort, vel):
        """Refresh the host-side support tables to the CURRENT body
        position before writing ibm_zone/affected_nodes (the hot path
        never materializes them for a moving body; without this the
        visualization markers would stay frozen at t0)."""
        if getattr(self, "_xy", None) is not None:
            self.nodes_tab, self.w_tab = self._jit_tables(self.ibm_ops,
                                                          self._xy)
        super()._save_step(step, t, vort, vel)
