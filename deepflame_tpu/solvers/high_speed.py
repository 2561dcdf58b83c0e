"""Density-based fully-compressible reacting solver (dfHighSpeedFoam parity).

Role parity: /root/reference/applications/solvers/dfHighSpeedFoam/
dfHighSpeedFoam.C:67-218 — conservative variables (rho, rhoU, rhoY_i, rhoE),
runtime-selectable Riemann fluxes, RK2SSP/RK3SSP explicit stepping
(createFieldsSave.H:36-44), operator-split chemistry (`combustion->correct()`)
or direct rates inside RK stages (`chemistry->calculateW()`, rhoYEqn.H:33-41),
viscous terms (rhoUEqn.H tauMC), detonation-capable (the 1979.33 m/s 1D H2
detonation CI anchor, test/corrtest.cpp:47-49).

TPU-first: MUSCL reconstruction and the Riemann solve are whole-face-array
VPU operations per axis (vs the reference's per-face virtual calls,
fluxScheme.H:81); a full RK stage is one fused XLA computation; the total
energy carries absolute (chemical) internal energy so operator-split chemistry
needs no explicit heat-release source — burning at fixed (rho, e) simply
raises T at the next conservative decode.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..chemistry.kinetics import KineticsData, production_rates
from ..chemistry.thermo import ThermoData
from ..chemistry.integrator import RosenbrockOptions, rosenbrock_integrate
from ..chemistry.reactor import constant_volume_rhs
from ..mesh.structured import StructuredMesh, extend_padded, pad_field
from ..ops.fv import _face_diff, face_pair
from ..ops.riemann import FLUX_SCHEMES

__all__ = ["HighSpeedState", "HighSpeedConfig", "HighSpeedSolver"]


class HighSpeedState(NamedTuple):
    rho: jax.Array          # (nx, ny, nz)
    rhoU: jax.Array         # (3, nx, ny, nz)
    rhoE: jax.Array         # total energy density, absolute [J/m^3]
    rhoY: jax.Array         # (ns, nx, ny, nz)
    T: jax.Array            # cached temperature (Newton warm start)
    time: jax.Array


@dataclasses.dataclass(frozen=True)
class HighSpeedConfig:
    flux: str = "HLLC"             # HLLC | HLLCP | AUSMDV | Kurganov | Tadmor
    rk_order: int = 2              # 1 | 2 | 3 (SSP)
    limiter: str = "vanLeer"       # vanLeer | minmod | none (1st order)
    viscous: bool = False
    chemistry: str = "ode"         # 'ode' (split) | 'direct' | 'none'
    ode_opts: RosenbrockOptions = RosenbrockOptions(rtol=1e-6, atol=1e-12)
    T_threshold: float = 500.0     # freeze chemistry below (unReactT parity)

    def __post_init__(self):
        # a typo like 'od' must not silently disable chemistry
        if self.chemistry not in ("ode", "direct", "none"):
            raise ValueError(
                f"chemistry must be 'ode'|'direct'|'none', got "
                f"{self.chemistry!r}")


def _limiter(r, kind):
    if kind == "vanLeer":
        return (r + jnp.abs(r)) / (1.0 + jnp.abs(r))
    if kind == "minmod":
        return jnp.clip(r, 0.0, 1.0)
    raise ValueError(kind)


@dataclasses.dataclass(frozen=True)
class HighSpeedSolver:
    mesh: StructuredMesh
    thermo: ThermoData
    kinetics: KineticsData
    bcs_rho: Any
    bcs_U: tuple           # per-component FieldBCs
    bcs_p: Any
    bcs_Y: Any             # shared FieldBCs for species
    config: HighSpeedConfig = HighSpeedConfig()

    # ------------------------------------------------------------- state IO
    def initial_state(self, p, T, Y, U=None, time=0.0) -> HighSpeedState:
        dtype = T.dtype
        sh = self.mesh.shape
        if U is None:
            U = jnp.zeros((3,) + sh, dtype)
        Yt = jnp.moveaxis(Y, 0, -1)
        rho = self.thermo.rho(p, T, Yt)
        e = self.thermo.e_mass(T, Yt)
        K = 0.5 * jnp.sum(U * U, axis=0)
        return HighSpeedState(rho=rho, rhoU=rho * U, rhoE=rho * (e + K),
                              rhoY=rho * Y, T=T,
                              time=jnp.asarray(time, dtype))

    def primitives(self, s: HighSpeedState):
        rho = jnp.maximum(s.rho, 1e-10)
        U = s.rhoU / rho
        Y = jnp.clip(s.rhoY / rho, 0.0, 1.0)
        Y = Y / jnp.sum(Y, axis=0, keepdims=True)
        K = 0.5 * jnp.sum(U * U, axis=0)
        e = s.rhoE / rho - K
        Yt = jnp.moveaxis(Y, 0, -1)
        T = self.thermo.T_from_e(e, Yt, s.T)
        p = rho / self.thermo.psi(T, Yt)
        return rho, U, p, T, Y

    # ------------------------------------------------------ reconstruction
    def _reconstruct(self, q, bcs, axis):
        """Face states (qL, qR) along axis from a cell field: MUSCL/TVD
        (vanLeer/minmod), 5th-order WENO-Z (WENOEXT-submodule parity), or
        piecewise-constant."""
        if self.config.limiter == "WENO5":
            return _weno5_faces(q, bcs, self.mesh, axis)
        P = pad_field(q, bcs, self.mesh)
        Pm, Pp = extend_padded(P, axis, bcs)
        own, nei = face_pair(P, axis)
        if self.config.limiter == "none":
            return own, nei
        t = _trim_other(Pm, axis)
        nf = t.shape[axis]
        far_own = jax.lax.slice_in_dim(t, 0, nf - 2, axis=axis)
        tp = _trim_other(Pp, axis)
        far_nei = jax.lax.slice_in_dim(tp, 2, nf, axis=axis)
        d = nei - own
        eps = jnp.asarray(1e-30, P.dtype)
        safe = jnp.where(jnp.abs(d) > eps, d, eps)
        rL = (own - far_own) / safe
        rR = (far_nei - nei) / safe
        phiL = _limiter(rL, self.config.limiter)
        phiR = _limiter(rR, self.config.limiter)
        qL = own + 0.5 * phiL * d
        qR = nei - 0.5 * phiR * d
        return qL, qR

    # ------------------------------------------------------------ RHS L(U)
    def _flux_divergence(self, s: HighSpeedState, want_flux_x: bool = False):
        """-div of Riemann fluxes for all conservative variables.

        want_flux_x also returns the raw x-face flux arrays (per unit
        area), keyed like the state fields with the x-face axis at -3:
        rho (nfx,ny,nz), rhoU (3,nfx,ny,nz), rhoE (nfx,ny,nz),
        rhoY (ns,nfx,ny,nz) — the Berger-Colella refluxing input
        (patch_amr coarse-fine interface correction)."""
        rho, U, p, T, Y = self.primitives(s)
        flux_fn = FLUX_SCHEMES[self.config.flux]
        ns = Y.shape[0]
        flux_x = None
        d_rho = 0.0
        d_rhoU = [0.0, 0.0, 0.0]
        d_rhoE = 0.0
        d_rhoY = 0.0
        for ax in range(3):
            if self.mesh.shape[ax] == 1:
                continue
            t1, t2 = [(1, 2), (0, 2), (0, 1)][ax]
            rhoL, rhoR = self._reconstruct(rho, self.bcs_rho, ax)
            uL, uR = self._reconstruct(U[ax], self.bcs_U[ax], ax)
            vL, vR = self._reconstruct(U[t1], self.bcs_U[t1], ax)
            wL, wR = self._reconstruct(U[t2], self.bcs_U[t2], ax)
            pL, pR = self._reconstruct(p, self.bcs_p, ax)
            Ys = []
            for i in range(ns):
                Ys.append(self._reconstruct(Y[i], self.bcs_Y, ax))
            YL = jnp.stack([a for a, _ in Ys], axis=-1)
            YR = jnp.stack([b for _, b in Ys], axis=-1)
            YL = YL / jnp.maximum(jnp.sum(YL, -1, keepdims=True), 1e-12)
            YR = YR / jnp.maximum(jnp.sum(YR, -1, keepdims=True), 1e-12)
            rhoL = jnp.maximum(rhoL, 1e-10)
            rhoR = jnp.maximum(rhoR, 1e-10)
            pL = jnp.maximum(pL, 1.0)
            pR = jnp.maximum(pR, 1.0)

            def face_state(rho_, u_, v_, w_, p_, Y_):
                W = 1.0 / jnp.einsum("...s,s->...", Y_, self.thermo.inv_W)
                from ..constants import GAS_CONSTANT
                T_ = p_ * W / (rho_ * GAS_CONSTANT)
                e_ = self.thermo.e_mass(T_, Y_)
                cp = self.thermo.cp_mass(T_, Y_)
                gamma = cp / (cp - GAS_CONSTANT / W)
                a_ = jnp.sqrt(gamma * p_ / rho_)
                E_ = e_ + 0.5 * (u_**2 + v_**2 + w_**2)
                return dict(rho=rho_, u=u_, v=v_, w=w_, p=p_, E=E_, a=a_, Y=Y_)

            Lst = face_state(rhoL, uL, vL, wL, pL, YL)
            Rst = face_state(rhoR, uR, vR, wR, pR, YR)
            mass, momn, momt1, momt2, ener, Yflux = flux_fn(Lst, Rst)
            if want_flux_x and ax == 0:
                flux_x = dict(rho=mass,
                              rhoU=jnp.stack([momn, momt1, momt2]),
                              rhoE=ener,
                              rhoY=jnp.moveaxis(Yflux, -1, 0))
            h = self.mesh.spacing[ax]
            d_rho = d_rho - _face_diff(mass, ax) / h
            d_rhoU[ax] = d_rhoU[ax] - _face_diff(momn, ax) / h
            d_rhoU[t1] = d_rhoU[t1] - _face_diff(momt1, ax) / h
            d_rhoU[t2] = d_rhoU[t2] - _face_diff(momt2, ax) / h
            d_rhoE = d_rhoE - _face_diff(ener, ax) / h
            d_rhoY = d_rhoY - jnp.moveaxis(
                _face_diff(Yflux, ax), -1, 0) / h

        zeros = jnp.zeros_like(s.rho)
        d_rhoU = jnp.stack([c + zeros for c in d_rhoU])
        L = dict(rho=d_rho + zeros, rhoU=d_rhoU, rhoE=d_rhoE + zeros,
                 rhoY=d_rhoY + jnp.zeros_like(s.rhoY))

        if self.config.chemistry == "direct":
            Yt = jnp.moveaxis(Y, 0, -1)
            wdot = production_rates(self.kinetics, self.thermo, T, rho, Yt)
            mask = (T > self.config.T_threshold)[..., None]
            RR = jnp.moveaxis(jnp.where(mask, wdot * self.kinetics.W, 0.0), -1, 0)
            L["rhoY"] = L["rhoY"] + RR
        if want_flux_x:
            return L, flux_x
        return L

    def _apply(self, s: HighSpeedState, L, coef_old, coef_new, dt,
               s_old: HighSpeedState):
        """SSP convex update: coef_old * s_old + coef_new * (s + dt L(s))."""
        def upd(old, cur, dL):
            return coef_old * old + coef_new * (cur + dt * dL)
        return HighSpeedState(
            rho=upd(s_old.rho, s.rho, L["rho"]),
            rhoU=upd(s_old.rhoU, s.rhoU, L["rhoU"]),
            rhoE=upd(s_old.rhoE, s.rhoE, L["rhoE"]),
            rhoY=upd(s_old.rhoY, s.rhoY, L["rhoY"]),
            T=s.T, time=s.time)

    # ---------------------------------------------------------------- step
    def step(self, s: HighSpeedState, dt) -> tuple[HighSpeedState, dict]:
        cfg = self.config
        s0 = s
        # SSP Runge-Kutta transport
        if cfg.rk_order == 1:
            s = self._apply(s, self._flux_divergence(s), 0.0, 1.0, dt, s0)
        elif cfg.rk_order == 2:
            s1 = self._apply(s, self._flux_divergence(s), 0.0, 1.0, dt, s0)
            s = self._apply(s1, self._flux_divergence(s1), 0.5, 0.5, dt, s0)
        elif cfg.rk_order == 3:
            s1 = self._apply(s, self._flux_divergence(s), 0.0, 1.0, dt, s0)
            s2 = self._apply(s1, self._flux_divergence(s1), 0.75, 0.25, dt, s0)
            s = self._apply(s2, self._flux_divergence(s2), 1.0 / 3.0,
                            2.0 / 3.0, dt, s0)
        else:
            raise ValueError(cfg.rk_order)

        # operator-split chemistry at constant (rho, e): rhoE unchanged
        if cfg.chemistry == "ode":
            s = self._chemistry_split(s, dt)

        rho, U, p, T, Y = self.primitives(s)
        # LTS (per-cell dt field): pseudo-time — advance the clock by the
        # smallest local step (dfHighSpeedFoam LTS is steady-state marching)
        dt_clock = jnp.min(jnp.asarray(dt)) if jnp.ndim(dt) > 0 else dt
        s = s._replace(T=T, time=s.time + dt_clock)
        diag = dict(T_max=jnp.max(T), p_max=jnp.max(p),
                    u_max=jnp.max(jnp.abs(U)))
        return s, diag

    def step_with_flux_x(self, s: HighSpeedState, dt):
        """step() that ALSO returns the RK-effective x-face fluxes —
        the per-area fluxes F such that the transport update is exactly
        q^{n+1} = q^n - dt (F_{i+1} - F_i)/dx (+ y/z terms): the time-
        integrated interface flux Berger-Colella refluxing needs.
        SSP weights: rk1 [1]; rk2 [1/2,1/2]; rk3 [1/6,1/6,2/3]."""
        cfg = self.config
        s0 = s
        if cfg.rk_order == 1:
            L0, F0 = self._flux_divergence(s, True)
            s = self._apply(s, L0, 0.0, 1.0, dt, s0)
            Fx = F0
        elif cfg.rk_order == 2:
            L0, F0 = self._flux_divergence(s, True)
            s1 = self._apply(s, L0, 0.0, 1.0, dt, s0)
            L1, F1 = self._flux_divergence(s1, True)
            s = self._apply(s1, L1, 0.5, 0.5, dt, s0)
            Fx = {k: 0.5 * (F0[k] + F1[k]) for k in F0}
        elif cfg.rk_order == 3:
            L0, F0 = self._flux_divergence(s, True)
            s1 = self._apply(s, L0, 0.0, 1.0, dt, s0)
            L1, F1 = self._flux_divergence(s1, True)
            s2 = self._apply(s1, L1, 0.75, 0.25, dt, s0)
            L2, F2 = self._flux_divergence(s2, True)
            s = self._apply(s2, L2, 1.0 / 3.0, 2.0 / 3.0, dt, s0)
            Fx = {k: (F0[k] + F1[k] + 4.0 * F2[k]) / 6.0 for k in F0}
        else:
            raise ValueError(cfg.rk_order)
        if cfg.chemistry == "ode":
            s = self._chemistry_split(s, dt)
        rho, U, p, T, Y = self.primitives(s)
        dt_clock = jnp.min(jnp.asarray(dt)) if jnp.ndim(dt) > 0 else dt
        s = s._replace(T=T, time=s.time + dt_clock)
        diag = dict(T_max=jnp.max(T), p_max=jnp.max(p),
                    u_max=jnp.max(jnp.abs(U)))
        return s, diag, Fx

    def _chemistry_split(self, s: HighSpeedState, dt):
        rho, U, p, T, Y = self.primitives(s)
        sh = self.mesh.shape
        ns = Y.shape[0]
        Tf = T.reshape(-1)
        rhof = rho.reshape(-1)
        Yf = jnp.moveaxis(Y, 0, -1).reshape(-1, ns)
        st0 = jnp.concatenate([Tf[:, None], Yf], axis=1)
        active = Tf > self.config.T_threshold
        dt_arr = jnp.asarray(dt, Tf.dtype)
        # LTS: per-cell dt field (localEulerDdt role) — flatten to lanes
        dt_flat = dt_arr.reshape(-1) if dt_arr.ndim > 0 else dt_arr
        t_ends = jnp.where(active, dt_flat, 0.0)

        def one_cell(state, rho_c, t_end):
            rhs = constant_volume_rhs(self.thermo, self.kinetics, rho_c)
            return rosenbrock_integrate(rhs, state, t_end, self.config.ode_opts)

        st1 = jax.vmap(one_cell)(st0, rhof, t_ends)
        Y1 = jnp.clip(st1[:, 1:], 0.0, 1.0)
        Y1 = Y1 / jnp.sum(Y1, axis=-1, keepdims=True)
        rhoY = jnp.moveaxis(Y1.reshape(sh + (ns,)), -1, 0) * rho
        # constant-volume burn: rho, rhoU, rhoE unchanged; T re-decoded later
        return s._replace(rhoY=rhoY)

    def acoustic_courant(self, s: HighSpeedState, dt):
        rho, U, p, T, Y = self.primitives(s)
        Yt = jnp.moveaxis(Y, 0, -1)
        a = self.thermo.sound_speed(T, Yt)
        co = 0.0
        for ax, h in enumerate(self.mesh.spacing):
            if self.mesh.shape[ax] > 1:
                co = jnp.maximum(co, jnp.max((jnp.abs(U[ax]) + a)) * dt / h)
        return co


def _trim_other(f, axis):
    sl = [slice(1, -1)] * 3
    sl[axis] = slice(None)
    return f[tuple(sl)]


def _weno5_core(s0, s1, s2, s3, s4):
    """WENO5-Z reconstruction at the right face of the center cell (s2) from
    the 5-point stencil (s0..s4) = q_{i-2}..q_{i+2} (Borges et al. 2008)."""
    eps = 1e-12
    b0 = (13.0 / 12.0) * (s0 - 2 * s1 + s2) ** 2 \
        + 0.25 * (s0 - 4 * s1 + 3 * s2) ** 2
    b1 = (13.0 / 12.0) * (s1 - 2 * s2 + s3) ** 2 + 0.25 * (s1 - s3) ** 2
    b2 = (13.0 / 12.0) * (s2 - 2 * s3 + s4) ** 2 \
        + 0.25 * (3 * s2 - 4 * s3 + s4) ** 2
    tau = jnp.abs(b0 - b2)
    a0 = 0.1 * (1.0 + (tau / (b0 + eps)) ** 2)
    a1 = 0.6 * (1.0 + (tau / (b1 + eps)) ** 2)
    a2 = 0.3 * (1.0 + (tau / (b2 + eps)) ** 2)
    w = a0 + a1 + a2
    p0 = (2 * s0 - 7 * s1 + 11 * s2) / 6.0
    p1 = (-s1 + 5 * s2 + 2 * s3) / 6.0
    p2 = (2 * s2 + 5 * s3 - s4) / 6.0
    return (a0 * p0 + a1 * p1 + a2 * p2) / w


def _weno5_faces(q, bcs, mesh, axis):
    """5th-order WENO-Z left/right face states along `axis`."""
    from ..mesh.structured import pad_n
    P = pad_n(q, bcs, mesh, 3)           # n+6 along every axis
    t = _trim3_other(P, axis)
    n = mesh.shape[axis]

    def sl(k):
        # cell (face_own + k) for faces 0..n: padded index (f + 2 + k)
        return jax.lax.slice_in_dim(t, k + 2, k + 2 + n + 1, axis=axis)

    qL = _weno5_core(sl(-2), sl(-1), sl(0), sl(1), sl(2))
    qR = _weno5_core(sl(3), sl(2), sl(1), sl(0), sl(-1))
    return qL, qR


def _trim3_other(f, axis):
    sl = [slice(3, -3)] * 3
    sl[axis] = slice(None)
    return f[tuple(sl)]
