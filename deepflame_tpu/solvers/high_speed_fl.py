"""Density-based (dfHighSpeedFoam) solver on the face-list backend.

Role parity: the reference's dfHighSpeedFoam runs on ARBITRARY fvMesh
(/root/reference/applications/solvers/dfHighSpeedFoam/dfHighSpeedFoam.C:67-225
— any polyMesh + AMR; per-face Riemann fluxes through the runtime-selected
fluxScheme, RK2/RK3-SSP stepping, operator-split chemistry), while this
framework's structured HighSpeedSolver (solvers/high_speed.py) covers uniform
blocks only. This solver carries the same algorithm over FaceListMesh
owner/neighbour connectivity, so blockMesh wedges / graded boxes / polyMesh
imports run the density-based path (VERDICT r3 item 6).

TPU-first: the per-face math of ops/riemann.py is already connectivity-
agnostic (whole-face-array functions); reconstruction uses the unstructured
MUSCL ratio r = 2 (grad_up . d)/(q_nei - q_own) - 1 (Darwish & Moukalled),
which reduces EXACTLY to the structured far-cell form on uniform interior
cells; face tangent frames are built per face; divergence accumulation is
the plan-aware scatter (shift slices on blockMesh-family connectivity).

Viscous terms follow the structured solver's default (inviscid Euler +
chemistry — the detonation/shock cases' regime; HighSpeedConfig.viscous is
likewise unused there).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..constants import GAS_CONSTANT
from ..chemistry.integrator import rosenbrock_integrate
from ..chemistry.reactor import constant_volume_rhs
from ..mesh.facelist import FaceListMesh
from ..ops.fv_facelist import grad_fl
from ..ops.riemann import FLUX_SCHEMES
from .high_speed import HighSpeedConfig, _limiter

__all__ = ["HighSpeedFLState", "HighSpeedSolverFL"]


class HighSpeedFLState(NamedTuple):
    rho: jax.Array          # (n,)
    rhoU: jax.Array         # (n, 3)
    rhoE: jax.Array         # (n,) total energy density, absolute [J/m^3]
    rhoY: jax.Array         # (n, ns)
    T: jax.Array            # (n,) cached temperature (Newton warm start)
    time: jax.Array


def _face_tangents(normal: jax.Array):
    """Orthonormal (t1, t2) per face, deterministic from the normal."""
    n = normal
    pick_x = jnp.abs(n[:, 0]) < 0.9
    a = jnp.where(pick_x[:, None],
                  jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], n.dtype),
                                   n.shape),
                  jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], n.dtype),
                                   n.shape))
    t1 = a - jnp.sum(a * n, axis=1, keepdims=True) * n
    t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1, axis=1, keepdims=True))
    t2 = jnp.cross(n, t1)
    return t1, t2


@dataclasses.dataclass(frozen=True)
class HighSpeedSolverFL:
    """Per-field FaceListMesh instances carry the boundary coefficients
    over shared geometry (same contract as LowMachSolverFL)."""
    m_rho: FaceListMesh
    m_p: FaceListMesh
    m_Y: FaceListMesh
    m_U: tuple              # (3,) per velocity component
    thermo: Any
    kinetics: Any
    config: HighSpeedConfig = HighSpeedConfig()

    @property
    def mesh(self) -> FaceListMesh:
        return self.m_rho

    # ------------------------------------------------------------- state IO
    def initial_state(self, p, T, Y, U=None, time=0.0) -> HighSpeedFLState:
        """p, T: (n,); Y: (n, ns); U: (n, 3)."""
        dtype = T.dtype
        n = T.shape[0]
        if U is None:
            U = jnp.zeros((n, 3), dtype)
        rho = self.thermo.rho(p, T, Y)
        e = self.thermo.e_mass(T, Y)
        K = 0.5 * jnp.sum(U * U, axis=1)
        return HighSpeedFLState(rho=rho, rhoU=rho[:, None] * U,
                                rhoE=rho * (e + K), rhoY=rho[:, None] * Y,
                                T=T, time=jnp.asarray(time, dtype))

    def primitives(self, s: HighSpeedFLState):
        rho = jnp.maximum(s.rho, 1e-10)
        U = s.rhoU / rho[:, None]
        Y = jnp.clip(s.rhoY / rho[:, None], 0.0, 1.0)
        Y = Y / jnp.sum(Y, axis=1, keepdims=True)
        K = 0.5 * jnp.sum(U * U, axis=1)
        e = s.rhoE / rho - K
        T = self.thermo.T_from_e(e, Y, s.T)
        p = rho / self.thermo.psi(T, Y)
        return rho, U, p, T, Y

    # ------------------------------------------------------ reconstruction
    def _face_lr(self, m_q: FaceListMesh, q: jax.Array, d_vec: jax.Array):
        """Face states (qL, qR) on interior faces: unstructured MUSCL, or
        WENO5-Z on ShiftPlan (lattice) meshes (config.limiter == 'WENO5' —
        the WENOEXT arbitrary-fvMesh role, reference README.md:37; VERDICT
        r4 item 6). Off-plan WENO5 falls back to vanLeer MUSCL."""
        m = self.m_rho
        qo, qn = m.gather_own(q), m.gather_nei(q)
        if self.config.limiter == "none":
            return qo, qn
        lim = self.config.limiter
        if lim == "WENO5":
            if m.plan is not None:
                return self._face_lr_weno_plan(q, m_q, qo, qn, d_vec)
            lim = "vanLeer"
        g = grad_fl(m_q, q)                              # (n, 3) cell grads
        gO = jnp.sum(m.gather_own(g) * d_vec, axis=1)
        gN = jnp.sum(m.gather_nei(g) * d_vec, axis=1)
        dq = qn - qo
        eps = jnp.asarray(1e-30, q.dtype)
        safe = jnp.where(jnp.abs(dq) > eps, dq, eps)
        rL = 2.0 * gO / safe - 1.0
        rR = 2.0 * gN / safe - 1.0
        qL = qo + 0.5 * _limiter(rL, lim) * dq
        qR = qn - 0.5 * _limiter(rR, lim) * dq
        return qL, qR

    def _face_lr_weno_plan(self, q, m_q, qo, qn, d_vec):
        """WENO5-Z face states on a plan (tensor-product) mesh: the lattice
        view gives the structured 5-cell stencils directly via rolls (exact
        on cyclic axes, including the wrap face). Faces within 2 cells of a
        PHYSICAL (non-cyclic) boundary lack the full stencil and keep the
        unstructured MUSCL (vanLeer) value."""
        from ..mesh.facelist import _plan_segments
        from .high_speed import _weno5_core
        m = self.m_rho
        pl = m.plan

        # MUSCL fallback (also the boundary-adjacent value)
        g = grad_fl(m_q, q)
        gO = jnp.sum(m.gather_own(g) * d_vec, axis=1)
        gN = jnp.sum(m.gather_nei(g) * d_vec, axis=1)
        dq = qn - qo
        eps = jnp.asarray(1e-30, q.dtype)
        safe = jnp.where(jnp.abs(dq) > eps, dq, eps)
        qL = qo + 0.5 * _limiter(2.0 * gO / safe - 1.0, "vanLeer") * dq
        qR = qn - 0.5 * _limiter(2.0 * gN / safe - 1.0, "vanLeer") * dq

        Xl = q.reshape(pl.shape)
        wrap_of = {ax: wrap for ax, wrap, _, _ in pl.families}
        for ax, is_wrap, start, count in _plan_segments(pl):
            n_ax = pl.shape[ax]
            if n_ax < 5:
                continue                      # stencil never fits
            roll = lambda k: jnp.roll(Xl, -k, axis=ax)
            s = [roll(k) for k in (-2, -1, 0, 1, 2, 3)]
            fL = _weno5_core(s[0], s[1], s[2], s[3], s[4])   # face (i, i+1)
            fR = _weno5_core(s[5], s[4], s[3], s[2], s[1])
            sl = [slice(None)] * 3
            sl[ax] = (slice(n_ax - 1, n_ax) if is_wrap
                      else slice(0, n_ax - 1))
            segL = fL[tuple(sl)].reshape(-1)
            segR = fR[tuple(sl)].reshape(-1)
            if not wrap_of[ax] and not is_wrap:
                # physical-boundary axis: rolls wrap garbage into faces
                # i < 2 or i > n-4 — keep MUSCL there
                ii = jax.lax.broadcasted_iota(
                    jnp.int32, tuple(fL[tuple(sl)].shape), ax).reshape(-1)
                ok = (ii >= 2) & (ii <= n_ax - 4)
                segL = jnp.where(ok, segL, jax.lax.dynamic_slice_in_dim(
                    qL, start, count))
                segR = jnp.where(ok, segR, jax.lax.dynamic_slice_in_dim(
                    qR, start, count))
            qL = jax.lax.dynamic_update_slice_in_dim(qL, segL, start, 0)
            qR = jax.lax.dynamic_update_slice_in_dim(qR, segR, start, 0)
        return qL, qR

    def _face_state(self, rho_, u_, v_, w_, p_, Y_):
        W = 1.0 / jnp.einsum("...s,s->...", Y_, self.thermo.inv_W)
        T_ = p_ * W / (rho_ * GAS_CONSTANT)
        e_ = self.thermo.e_mass(T_, Y_)
        cp = self.thermo.cp_mass(T_, Y_)
        gamma = cp / (cp - GAS_CONSTANT / W)
        a_ = jnp.sqrt(gamma * p_ / rho_)
        E_ = e_ + 0.5 * (u_ ** 2 + v_ ** 2 + w_ ** 2)
        return dict(rho=rho_, u=u_, v=v_, w=w_, p=p_, E=E_, a=a_, Y=Y_)

    # ------------------------------------------------------------ RHS L(U)
    def _flux_divergence(self, s: HighSpeedFLState):
        m = self.m_rho
        rho, U, p, T, Y = self.primitives(s)
        ns = Y.shape[1]
        flux_fn = FLUX_SCHEMES[self.config.flux]
        nrm = m.normal
        t1v, t2v = _face_tangents(nrm)
        d_vec = m.gather_nei(m.centers) - m.gather_own(m.centers)

        rhoL, rhoR = self._face_lr(self.m_rho, rho, d_vec)
        pL, pR = self._face_lr(self.m_p, p, d_vec)
        UL = jnp.stack([self._face_lr(self.m_U[c], U[:, c], d_vec)[0]
                        for c in range(3)], axis=1)
        UR = jnp.stack([self._face_lr(self.m_U[c], U[:, c], d_vec)[1]
                        for c in range(3)], axis=1)
        Ys = [self._face_lr(self.m_Y, Y[:, i], d_vec) for i in range(ns)]
        YL = jnp.stack([a for a, _ in Ys], axis=-1)
        YR = jnp.stack([b for _, b in Ys], axis=-1)
        YL = YL / jnp.maximum(jnp.sum(YL, -1, keepdims=True), 1e-12)
        YR = YR / jnp.maximum(jnp.sum(YR, -1, keepdims=True), 1e-12)
        rhoL = jnp.maximum(rhoL, 1e-10)
        rhoR = jnp.maximum(rhoR, 1e-10)
        pL = jnp.maximum(pL, 1.0)
        pR = jnp.maximum(pR, 1.0)

        def proj(Uv):
            return (jnp.sum(Uv * nrm, axis=1), jnp.sum(Uv * t1v, axis=1),
                    jnp.sum(Uv * t2v, axis=1))

        uL, vL, wL = proj(UL)
        uR, vR, wR = proj(UR)
        Lst = self._face_state(rhoL, uL, vL, wL, pL, YL)
        Rst = self._face_state(rhoR, uR, vR, wR, pR, YR)
        mass, momn, momt1, momt2, ener, Yflux = flux_fn(Lst, Rst)

        # back-rotate momentum flux into Cartesian components
        Fmom = (momn[:, None] * nrm + momt1[:, None] * t1v
                + momt2[:, None] * t2v)

        # packed divergence: one scatter over [mass, mom(3), ener, Y(ns)]
        pack = jnp.concatenate([mass[:, None], Fmom, ener[:, None], Yflux],
                               axis=1) * m.mag_sf[:, None]
        acc = m.scatter_faces(pack)                       # (n, 5 + ns)

        # boundary patches
        for ip, pch in enumerate(self.m_rho.patches):
            if pch.owner.shape[0] == 0:
                continue
            accb = self._boundary_flux(ip, pch, rho, U, p, Y)
            acc = acc + jax.ops.segment_sum(accb, pch.owner,
                                            num_segments=m.n_cells)

        inv_v = 1.0 / m.volumes
        d = -acc * inv_v[:, None]
        L = dict(rho=d[:, 0], rhoU=d[:, 1:4], rhoE=d[:, 4],
                 rhoY=d[:, 5:])
        if self.config.chemistry == "direct":
            from ..chemistry.kinetics import production_rates
            wdot = production_rates(self.kinetics, self.thermo, T, rho, Y)
            mask = (T > self.config.T_threshold)[:, None]
            L["rhoY"] = L["rhoY"] + jnp.where(mask, wdot * self.kinetics.W,
                                              0.0)
        return L

    def _boundary_flux(self, ip: int, pch, rho, U, p, Y):
        """Outward flux (times area) through one boundary patch.

        symmetry/wedge/empty/slip: pure pressure flux (reflective wall);
        otherwise: build the ghost face state from each field's affine
        coefficients (zeroGradient -> transmissive owner state; fixedValue
        -> prescribed inlet state) and take its physical flux."""
        m = self.m_rho
        nrm = pch.normal
        ob = pch.owner
        if pch.kind in ("symmetry", "wedge", "empty", "slip"):
            p_o = p[ob]
            zero = jnp.zeros_like(p_o)
            Fm = p_o[:, None] * nrm
            pack = jnp.concatenate(
                [zero[:, None], Fm, zero[:, None],
                 jnp.zeros((ob.shape[0], Y.shape[1]), p_o.dtype)], axis=1)
            return pack * pch.mag_sf[:, None]

        def ghost_face(pm, q):
            pc = pm.patches[ip]
            qo = q[ob]
            return 0.5 * (qo + pc.a * qo + pc.b)

        rho_b = jnp.maximum(ghost_face(self.m_rho, rho), 1e-10)
        p_b = jnp.maximum(ghost_face(self.m_p, p), 1.0)
        U_b = jnp.stack([ghost_face(self.m_U[c], U[:, c])
                         for c in range(3)], axis=1)
        Y_b = jnp.stack([ghost_face(self.m_Y, Y[:, i])
                         for i in range(Y.shape[1])], axis=1)
        Y_b = Y_b / jnp.maximum(jnp.sum(Y_b, axis=1, keepdims=True), 1e-12)
        t1v, t2v = _face_tangents(nrm)
        u_b = jnp.sum(U_b * nrm, axis=1)
        v_b = jnp.sum(U_b * t1v, axis=1)
        w_b = jnp.sum(U_b * t2v, axis=1)
        st = self._face_state(rho_b, u_b, v_b, w_b, p_b, Y_b)
        mass = st["rho"] * st["u"]
        momn = mass * st["u"] + st["p"]
        momt1 = mass * st["v"]
        momt2 = mass * st["w"]
        ener = st["u"] * (st["rho"] * st["E"] + st["p"])
        Fm = momn[:, None] * nrm + momt1[:, None] * t1v + momt2[:, None] * t2v
        pack = jnp.concatenate([mass[:, None], Fm, ener[:, None],
                                st["Y"] * mass[:, None]], axis=1)
        return pack * pch.mag_sf[:, None]

    def _apply(self, s, L, coef_old, coef_new, dt, s_old):
        def upd(old, cur, dL, per_cell_cols=False):
            d = dt
            if jnp.ndim(dt) > 0 and dL.ndim > 1:
                d = dt[:, None]
            return coef_old * old + coef_new * (cur + d * dL)
        return HighSpeedFLState(
            rho=upd(s_old.rho, s.rho, L["rho"]),
            rhoU=upd(s_old.rhoU, s.rhoU, L["rhoU"]),
            rhoE=upd(s_old.rhoE, s.rhoE, L["rhoE"]),
            rhoY=upd(s_old.rhoY, s.rhoY, L["rhoY"]),
            T=s.T, time=s.time)

    # ---------------------------------------------------------------- step
    def step(self, s: HighSpeedFLState, dt):
        cfg = self.config
        s0 = s
        if cfg.rk_order == 1:
            s = self._apply(s, self._flux_divergence(s), 0.0, 1.0, dt, s0)
        elif cfg.rk_order == 2:
            s1 = self._apply(s, self._flux_divergence(s), 0.0, 1.0, dt, s0)
            s = self._apply(s1, self._flux_divergence(s1), 0.5, 0.5, dt, s0)
        elif cfg.rk_order == 3:
            s1 = self._apply(s, self._flux_divergence(s), 0.0, 1.0, dt, s0)
            s2 = self._apply(s1, self._flux_divergence(s1), 0.75, 0.25,
                             dt, s0)
            s = self._apply(s2, self._flux_divergence(s2), 1.0 / 3.0,
                            2.0 / 3.0, dt, s0)
        else:
            raise ValueError(cfg.rk_order)

        if cfg.chemistry == "ode":
            s = self._chemistry_split(s, dt)

        rho, U, p, T, Y = self.primitives(s)
        dt_clock = jnp.min(jnp.asarray(dt)) if jnp.ndim(dt) > 0 else dt
        s = s._replace(T=T, time=s.time + dt_clock)
        diag = dict(T_max=jnp.max(T), p_max=jnp.max(p),
                    u_max=jnp.max(jnp.abs(U)))
        return s, diag

    def _chemistry_split(self, s: HighSpeedFLState, dt):
        rho, U, p, T, Y = self.primitives(s)
        st0 = jnp.concatenate([T[:, None], Y], axis=1)
        active = T > self.config.T_threshold
        dt_arr = jnp.asarray(dt, T.dtype)
        dt_flat = dt_arr if dt_arr.ndim > 0 else jnp.broadcast_to(
            dt_arr, T.shape)
        t_ends = jnp.where(active, dt_flat, 0.0)

        def one_cell(state, rho_c, t_end):
            rhs = constant_volume_rhs(self.thermo, self.kinetics, rho_c)
            return rosenbrock_integrate(rhs, state, t_end,
                                        self.config.ode_opts)

        st1 = jax.vmap(one_cell)(st0, rho, t_ends)
        Y1 = jnp.clip(st1[:, 1:], 0.0, 1.0)
        Y1 = Y1 / jnp.sum(Y1, axis=1, keepdims=True)
        return s._replace(rhoY=Y1 * rho[:, None])

    def acoustic_courant(self, s: HighSpeedFLState, dt):
        rho, U, p, T, Y = self.primitives(s)
        a = self.thermo.sound_speed(T, Y)
        m = self.m_rho
        u_mag = jnp.sqrt(jnp.sum(U * U, axis=1))
        h = m.volumes ** (1.0 / 3.0)
        return jnp.max((u_mag + a) * dt / h)
