"""Flamelet-generated-manifold low-Mach solver (flareFGM parity).

Role parity: dfLowMachFoam + the FGM combustion-model family —
`baseFGM` scalar transport (/root/reference/src/dfCombustionModels/FGM/
baseFGM/baseFGM.C:478-700: Z, Zvar, c, cvar (+ Zcvar) equations with
mut/Sct + mu/Sc diffusivity, gradient production 2 mut/Sct |grad Z|^2 and
dissipation 2 rho chi) and `flareFGM` table lookups (/root/reference/src/
dfCombustionModels/FGM/flareFGM/flareFGM.C:239-345: normalized variances
gz = Zvar/(Z(1-Z)), gc = cvar/(c(1-c)), correlation gzc, then 6-D lookups of
omega_c, T, mwt, cp, nu, ...).

Instead of transporting ns species + energy + stiff chemistry, the solver
transports 5 control scalars and reads the thermochemistry from the table —
the manifold replaces both the chemistry engine and correctThermo. Momentum
and pressure blocks are shared with LowMachSolver (SURVEY.md §3.1 loop).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..constants import GAS_CONSTANT
from ..mesh.structured import pad_field
from ..ops.fv import (fvm_ddt, fvm_div, fvm_laplacian, grad, div_flux,
                      interpolate)
from ..ops.linsolve import solve_fvmatrix
from .low_mach import LowMachSolver, LowMachConfig
from ..combustion.fgm.table import FlameletTable, lookup

__all__ = ["FGMState", "FGMConfig", "FGMSolver"]


class FGMState(NamedTuple):
    rho: jax.Array
    U: jax.Array
    p: jax.Array
    Z: jax.Array        # mixture fraction
    Zvar: jax.Array
    c: jax.Array        # (scaled) progress variable
    cvar: jax.Array
    Zcvar: jax.Array    # Z-c covariance
    T: jax.Array
    He: jax.Array       # transported enthalpy (baseFGM He_; adiabatic
                        # Z*(Hfu-Hox)+Hox when solveEnthalpy is off)
    phi: tuple
    dpdt: jax.Array
    time: jax.Array


@dataclasses.dataclass(frozen=True)
class FGMConfig(LowMachConfig):
    Sc: float = 0.7           # laminar Schmidt (baseFGM Sc_)
    Sc_t: float = 0.7         # turbulent Schmidt (Sct_)
    Cd: float = 2.0           # scalar dissipation constant: chi = Cd eps/k var
    solve_cvar: bool = True
    solve_zcvar: bool = False # Z-c covariance equation (baseFGM ZcvarEqn)
    solve_enthalpy: bool = False  # transport He and look up with the
                                  # enthalpy-loss coordinate (baseFGM.C:47,
                                  # 694-733; flareFGM.C:191-195 hLoss)
    combustion_on: bool = True


@dataclasses.dataclass(frozen=True)
class FGMSolver(LowMachSolver):
    """Reuses LowMachSolver's momentum/pressure blocks; `combustion`,
    `bcs_Y`, `bcs_h` fields are unused; `table` drives thermochemistry."""
    table: FlameletTable = None
    bcs_Z: Any = None
    deepfgm: Any = None    # DeepFGM network replaces table lookups when set

    def fgm_initial_state(self, p, Z, c, U=None, time=0.0) -> FGMState:
        dtype = p.dtype
        sh = self.mesh.shape
        if U is None:
            U = jnp.zeros((3,) + sh, dtype)
        zeros = jnp.zeros(sh, dtype)
        He = self._adiabatic_enthalpy(Z)
        T, W, cp, nu, _ = self._lookup_state(Z, zeros, c, zeros, He=He)
        rho = p * W / (GAS_CONSTANT * T)
        phi = self._face_flux(rho, U)
        return FGMState(rho=rho, U=U, p=p, Z=Z, Zvar=zeros, c=c, cvar=zeros,
                        Zcvar=zeros, T=T, He=He, phi=phi, dpdt=zeros,
                        time=jnp.asarray(time, dtype))

    def _adiabatic_enthalpy(self, Z):
        """He = Z (Hfu - Hox) + Hox (flareFGM.C:138)."""
        tb = self.table
        if tb is None:
            return jnp.zeros_like(Z)
        return Z * (tb.H_fuel - tb.H_ox) + tb.H_ox

    def _lookup_state(self, Z, Zvar, c, cvar, Zcvar=None, He=None):
        """Table (flareFGM.C:239-345) or NN (DeePFGM.C) thermochemistry at
        the current control-variable state."""
        small = 1e-6
        gz = Zvar / jnp.maximum(Z * (1.0 - Z), small)
        gc = cvar / jnp.maximum(c * (1.0 - c), small)
        if self.deepfgm is not None:
            out = self.deepfgm.query(Z, c, gz, gc)
            return out["Tf"], out["mwt"], out["cp"], out["nu"], out["omgc"]
        # correlation coordinate gzc = Zcvar/sqrt(Zvar cvar) (cal_gcor)
        gzc = None
        if Zcvar is not None and len(self.table.axes[5]) > 1:
            gzc = jnp.clip(Zcvar / jnp.maximum(
                jnp.sqrt(Zvar * cvar), small), -1.0, 1.0)
        # enthalpy-loss coordinate hLoss = h_adiabatic(Z) - He, clipped to
        # the table's h axis (flareFGM.C:191-195)
        hloss = None
        if He is not None and len(self.table.axes[0]) > 1:
            h_ax = jnp.asarray(self.table.axes[0], Z.dtype)
            hloss = jnp.clip(self._adiabatic_enthalpy(Z) - He,
                             h_ax[0], h_ax[-1])
        coords = (hloss, Z, c, gz, gc, gzc)
        tb = self.table
        T = lookup(tb, "Tf", coords)
        W = lookup(tb, "mwt", coords)
        cp = lookup(tb, "cp", coords)
        nu = lookup(tb, "nu", coords)
        omgc = lookup(tb, "omgc", coords)
        return T, W, cp, nu, omgc

    def step(self, s: FGMState, dt, sources=None):
        """sources: optional spray coupling dict (Srho, SU, Sh) — the
        evaporated-mass source enters the Z/c/cvar/Zcvar equations
        (baseFGM.C:501-514, 589-592, 627-630, 660-663: SZ.source +=
        spray.rhoTrans/deltaT, evaporating vapor carries mixture fraction)
        and the enthalpy equation (baseFGM.C:697-706)."""
        cfg = self.config
        mesh = self.mesh
        dtype = s.p.dtype
        src_rho = sources["Srho"] if sources else 0.0
        src_h = sources["Sh"] if sources else 0.0

        rho_old, U_old, p_old = s.rho, s.U, s.p
        Z_old, Zvar_old, c_old, cvar_old = s.Z, s.Zvar, s.c, s.cvar
        Zcvar_old, He_old = s.Zcvar, s.He
        rho, U, p, phi, dpdt, T = s.rho, s.U, s.p, s.phi, s.dpdt, s.T
        Z, Zvar, c, cvar, Zcvar, He = s.Z, s.Zvar, s.c, s.cvar, s.Zcvar, s.He
        diag = {}
        bz = self.bcs_Z

        for outer in range(cfg.n_outer):
            # rhoEqn (+ spray mass source, rhoEqn.H:38)
            rho = rho_old - dt * div_flux(phi, mesh) + dt * src_rho

            # table thermo-transport coefficients
            T_tab, W_tab, cp_tab, nu_tab, omgc = self._lookup_state(
                Z, Zvar, c, cvar, Zcvar, He)
            mu = rho * nu_tab
            mu_t = jnp.zeros_like(mu)
            if self.turbulence is not None:
                mu_t = self.turbulence.mu_t(rho, U, self.bcs_U, mesh)
                k_sgs, eps_sgs = self.turbulence.sgs_k_epsilon(mu_t, rho, mesh)
            else:
                k_sgs = jnp.zeros_like(mu)
                eps_sgs = jnp.ones_like(mu)
            mu_eff = mu + mu_t

            # momentum (shared block)
            U, HbyA, rAU = self._momentum(rho, rho_old, U, U_old, phi, p,
                                          mu_eff, dt,
                                          SU=sources["SU"] if sources
                                          else None)

            # ===== FGM scalar transport (baseFGM.C:478-700)
            D_scalar = mu_t / cfg.Sc_t + mu / cfg.Sc
            D_f = tuple(interpolate(
                pad_field(D_scalar, self.bcs_coeff, mesh), ax)
                        for ax in range(3))

            def transport(q, q_old, source, q_min=0.0, q_max=1.0):
                eqn = (fvm_ddt(rho, q_old, dt, mesh, bz, coeff_old=rho_old)
                       + fvm_div(phi, q, mesh, bz, cfg.div_scheme)
                       + fvm_laplacian(D_f, mesh, bz, dtype=dtype, sign=-1.0))
                eqn = eqn.with_source(source)
                r = solve_fvmatrix(eqn, q, tol=cfg.y_tol,
                                   max_iter=cfg.max_iter_u)
                return jnp.clip(r.x, q_min, q_max)

            zeros = jnp.zeros(mesh.shape, dtype)
            Z = transport(Z, Z_old, zeros + src_rho)
            gZ = grad(Z, bz, mesh)
            magsq_gZ = sum(gZ[ax] ** 2 for ax in range(3))
            chi_Z = cfg.Cd * (eps_sgs / jnp.maximum(k_sgs, 1e-10)) * Zvar * 0.5
            Zvar = transport(Zvar, Zvar_old,
                             2.0 * (mu_t / cfg.Sc_t) * magsq_gZ
                             - 2.0 * rho * chi_Z, 0.0, 0.25)
            if cfg.combustion_on:
                omega_c = rho * omgc
                c = transport(c, c_old, omega_c + src_rho)
                if cfg.solve_cvar:
                    gC = grad(c, bz, mesh)
                    magsq_gC = sum(gC[ax] ** 2 for ax in range(3))
                    chi_c = cfg.Cd * (eps_sgs / jnp.maximum(k_sgs, 1e-10)) \
                        * cvar * 0.5
                    # production + dissipation + chemistry correlation term
                    cOc = lookup(self.table, "cOc",
                                 (None, Z, c,
                                  Zvar / jnp.maximum(Z * (1 - Z), 1e-6),
                                  cvar / jnp.maximum(c * (1 - c), 1e-6), None))
                    cvar = transport(cvar, cvar_old,
                                     2.0 * (mu_t / cfg.Sc_t) * magsq_gC
                                     - 2.0 * rho * chi_c
                                     + 2.0 * rho * (cOc - c * omgc)
                                     + src_rho, 0.0, 0.25)
                if cfg.solve_zcvar:
                    # ZcvarEqn: cross production + dissipation + chemistry
                    # correlation (baseFGM ZcvarEqn; ZOc lookup)
                    gC2 = grad(c, bz, mesh)
                    cross = sum(gZ[ax] * gC2[ax] for ax in range(3))
                    chi_zc = cfg.Cd * (eps_sgs / jnp.maximum(k_sgs, 1e-10)) \
                        * Zcvar * 0.5
                    ZOc = lookup(self.table, "ZOc",
                                 (None, Z, c,
                                  Zvar / jnp.maximum(Z * (1 - Z), 1e-6),
                                  cvar / jnp.maximum(c * (1 - c), 1e-6),
                                  None))
                    Zcvar = transport(
                        Zcvar, Zcvar_old,
                        2.0 * (mu_t / cfg.Sc_t) * cross
                        - 2.0 * rho * chi_zc
                        + rho * (ZOc - Z * omgc) + src_rho, -0.25, 0.25)

            # ===== enthalpy (baseFGM.C:694-733 HEqn: ddt + div - laplacian
            # (mut/Sct + mu/Sc) = dpdt; adiabatic relation otherwise,
            # flareFGM.C:136-139)
            if cfg.solve_enthalpy:
                eqn_h = (fvm_ddt(rho, He_old, dt, mesh, bz,
                                 coeff_old=rho_old)
                         + fvm_div(phi, He, mesh, bz, cfg.div_scheme)
                         + fvm_laplacian(D_f, mesh, bz, dtype=dtype,
                                         sign=-1.0))
                eqn_h = eqn_h.with_source(dpdt + src_h)
                He = solve_fvmatrix(eqn_h, He, tol=cfg.h_tol,
                                    max_iter=cfg.max_iter_u).x
            else:
                He = self._adiabatic_enthalpy(Z)

            # ===== table thermo update (flareFGM correctThermo analogue)
            T, W_tab, cp_tab, nu_tab, omgc = self._lookup_state(
                Z, Zvar, c, cvar, Zcvar, He)
            psi = W_tab / (GAS_CONSTANT * T)

            # ===== pressure correctors (shared block)
            rho_fn = lambda pp: pp * psi
            p, phi, U, dpdt, rho, p_res = self._pressure_loop(
                p, p_old, psi, rho_fn, HbyA, rAU, dt, rho_old=rho_old,
                phi_old=s.phi, rhoU_old_f=self._face_flux(rho_old, U_old))
            diag[f"p_res_{outer}"] = p_res

        diag["T_min"] = jnp.min(T)
        diag["T_max"] = jnp.max(T)
        diag["c_max"] = jnp.max(c)
        return FGMState(rho=rho, U=U, p=p, Z=Z, Zvar=Zvar, c=c, cvar=cvar,
                        Zcvar=Zcvar, T=T, He=He, phi=phi, dpdt=dpdt,
                        time=s.time + dt), diag
