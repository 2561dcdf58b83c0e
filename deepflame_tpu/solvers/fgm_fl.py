"""Flamelet-generated-manifold solver on the face-list (unstructured) backend.

Role parity: the same baseFGM/flareFGM algorithm as solvers/fgm.py
(/root/reference/src/dfCombustionModels/FGM/baseFGM/baseFGM.C:478-700
control-variable transport; flareFGM.C:239-345 table lookups), discretized
through FaceListMesh gather/scatter so the REAL reference meshes run — in
particular the 6-block graded axisymmetric wedge of
examples/dfLowMachFoam/fgm/twoD_SandiaD_flareFGM (mesh/blockmesh.py).

Includes a k-epsilon RAS closure on the face-list backend (the Sandia D
case's constant/turbulenceProperties model): production from grad_fl velocity
gradients, implicit (k, eps) transports through the same FvMatrixFL
machinery (coefficients per turbulence/ras.py::KEpsilon).

Momentum and pressure blocks are inherited from LowMachSolverFL.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..combustion.fgm.table import FlameletTable, lookup
from ..constants import GAS_CONSTANT
from ..mesh.facelist import FaceListMesh
from ..ops.fv_facelist import (div_flux_fl, fvm_ddt_fl, fvm_div_fl,
                               fvm_laplacian_fl,
                               fvm_laplacian_corrected_fl,
                               fvm_source_implicit_fl,
                               grad_fl, _boundary_face_value)
from ..ops.linsolve import solve_fvmatrix
from .fgm import FGMConfig
from .low_mach_fl import LowMachSolverFL, _face_product

__all__ = ["FGMFLState", "FGMSolverFL"]


class FGMFLState(NamedTuple):
    rho: jax.Array          # (n,)
    U: jax.Array            # (n, 3)
    p: jax.Array
    Z: jax.Array
    Zvar: jax.Array
    c: jax.Array
    cvar: jax.Array
    Zcvar: jax.Array
    T: jax.Array
    He: jax.Array
    k: jax.Array            # RAS turbulent kinetic energy
    eps: jax.Array          # RAS dissipation
    phi: jax.Array          # (nf,)
    phi_b: tuple
    dpdt: jax.Array
    time: jax.Array


@dataclasses.dataclass(frozen=True)
class FGMSolverFL(LowMachSolverFL):
    """Per-field FaceListMesh instances as in LowMachSolverFL. The unused
    inherited slots are aliased: m_h = He BCs, m_Y = Z BCs. Additional
    per-scalar BC carriers: m_c (progress variable), m_var (variances,
    shared), m_k / m_eps (RAS pair)."""
    table: FlameletTable = None
    m_c: FaceListMesh = None
    m_var: FaceListMesh = None
    deepfgm: Any = None
    # m_k / m_eps / wall_fns and the k-epsilon coefficients are inherited
    # from LowMachSolverFL (shared _keps_advance)

    @property
    def m_Z(self) -> FaceListMesh:
        return self.m_Y

    @property
    def m_He(self) -> FaceListMesh:
        return self.m_h

    # ------------------------------------------------------------- lookups
    def _adiabatic_enthalpy(self, Z):
        tb = self.table
        if tb is None:
            return jnp.zeros_like(Z)
        return Z * (tb.H_fuel - tb.H_ox) + tb.H_ox

    def _lookup_state(self, Z, Zvar, c, cvar, Zcvar=None, He=None):
        """flareFGM.C:239-345 normalized-variance lookups (shared math with
        solvers/fgm.py::FGMSolver._lookup_state)."""
        small = 1e-6
        gz = Zvar / jnp.maximum(Z * (1.0 - Z), small)
        gc = cvar / jnp.maximum(c * (1.0 - c), small)
        if self.deepfgm is not None:
            out = self.deepfgm.query(Z, c, gz, gc)
            return out["Tf"], out["mwt"], out["cp"], out["nu"], out["omgc"]
        gzc = None
        if Zcvar is not None and len(self.table.axes[5]) > 1:
            gzc = jnp.clip(Zcvar / jnp.maximum(
                jnp.sqrt(Zvar * cvar), small), -1.0, 1.0)
        hloss = None
        if He is not None and len(self.table.axes[0]) > 1:
            h_ax = jnp.asarray(self.table.axes[0], Z.dtype)
            hloss = jnp.clip(self._adiabatic_enthalpy(Z) - He,
                             h_ax[0], h_ax[-1])
        coords = (hloss, Z, c, gz, gc, gzc)
        tb = self.table
        return (lookup(tb, "Tf", coords), lookup(tb, "mwt", coords),
                lookup(tb, "cp", coords), lookup(tb, "nu", coords),
                lookup(tb, "omgc", coords))

    def fgm_initial_state(self, p, Z, c, U=None, k0=1e-3, eps0=1e-2,
                          time=0.0) -> FGMFLState:
        dtype = p.dtype
        n = p.shape[0]
        if U is None:
            U = jnp.zeros((n, 3), dtype)
        zeros = jnp.zeros(n, dtype)
        He = self._adiabatic_enthalpy(Z)
        T, W, _, _, _ = self._lookup_state(Z, zeros, c, zeros, He=He)
        rho = p * W / (GAS_CONSTANT * T)
        phi, phi_b = self._face_flux(rho, U)
        return FGMFLState(rho=rho, U=U, p=p, Z=Z, Zvar=zeros, c=c,
                          cvar=zeros, Zcvar=zeros, T=T, He=He,
                          k=jnp.full(n, k0, dtype),
                          eps=jnp.full(n, eps0, dtype),
                          phi=phi, phi_b=phi_b, dpdt=zeros,
                          time=jnp.asarray(time, dtype))

    # ------------------------------------------------------------ helpers
    def _transport(self, mbc, rho, rho_old, phi, phi_b, q, q_old, D_f, D_b,
                   src, dt, qmin, qmax, tol, iters):
        dtype = q.dtype
        eqn = (fvm_ddt_fl(mbc, rho, rho_old, q_old, dt, dtype)
               + fvm_div_fl(mbc, phi, list(phi_b), self.config.div_scheme,
                            dtype, x_now=q)
               + fvm_laplacian_corrected_fl(mbc, D_f, D_b, q, dtype,
                                            sign=-1.0)
               ).with_source(src)
        res = solve_fvmatrix(eqn, q, tol=tol, max_iter=iters)
        return jnp.clip(res.x, qmin, qmax)

    # _keps_advance is inherited from LowMachSolverFL

    # ---------------------------------------------------------------- step
    def step(self, s: FGMFLState, dt, sources=None):
        cfg: FGMConfig = self.config
        m = self.m_p
        dtype = s.p.dtype
        n = s.p.shape[0]
        diag = {}
        src_rho = sources["Srho"] if sources else 0.0
        src_h = sources["Sh"] if sources else 0.0

        rho_old, U_old, p_old = s.rho, s.U, s.p
        Z_old, Zvar_old, c_old, cvar_old = s.Z, s.Zvar, s.c, s.cvar
        Zcvar_old, He_old = s.Zcvar, s.He
        rho, U, p, dpdt, T = s.rho, s.U, s.p, s.dpdt, s.T
        Z, Zvar, c, cvar, Zcvar, He = s.Z, s.Zvar, s.c, s.cvar, s.Zcvar, s.He
        k, eps = s.k, s.eps
        phi, phi_b = s.phi, s.phi_b

        for outer in range(cfg.n_outer):
            # ===== rhoEqn
            rho = rho_old - dt * div_flux_fl(m, phi, phi_b) + dt * src_rho

            # ===== table transport coefficients
            _, _, _, nu_tab, omgc = self._lookup_state(Z, Zvar, c, cvar,
                                                       Zcvar, He)
            mu = rho * nu_tab

            # ===== RAS closure (m_k None => laminar: mu_t = 0, as the
            # structured FGMSolver with turbulence=None)
            if self.m_k is not None:
                k, eps, mu_t = self._keps_advance(k, eps, rho, rho_old, phi,
                                                  phi_b, U, mu, dt)
            else:
                mu_t = jnp.zeros_like(mu)
            mu_eff = mu + mu_t
            mu_f, mu_bf = _face_product(m, mu_eff)

            # ===== momentum (inherited block)
            U, HbyA, rAU = self._momentum(rho, rho_old, U, U_old, phi, phi_b,
                                          p, mu_eff, mu_f, mu_bf, dt, diag)

            # ===== FGM scalar transport (baseFGM.C:478-700)
            D_scalar = mu_t / cfg.Sc_t + mu / cfg.Sc
            D_f, D_b = _face_product(m, D_scalar)
            zeros = jnp.zeros(n, dtype)

            Z = self._transport(self.m_Z, rho, rho_old, phi, phi_b, Z, Z_old,
                                D_f, D_b, zeros + src_rho, dt, 0.0, 1.0,
                                cfg.y_tol, cfg.max_iter_u)
            gZ = grad_fl(self.m_Z, Z)
            magsq_gZ = jnp.sum(gZ * gZ, axis=1)
            if self.m_k is not None:
                chi_fac = cfg.Cd * (eps / jnp.maximum(k, 1e-10)) * 0.5
            else:
                # laminar parity with the structured solver's turbulence=None
                # branch (k_sgs = 0, eps_sgs = 1)
                chi_fac = cfg.Cd * (jnp.ones_like(Z) / 1e-10) * 0.5
            Zvar = self._transport(
                self.m_var, rho, rho_old, phi, phi_b, Zvar, Zvar_old,
                D_f, D_b, 2.0 * (mu_t / cfg.Sc_t) * magsq_gZ
                - 2.0 * rho * chi_fac * Zvar, dt, 0.0, 0.25,
                cfg.y_tol, cfg.max_iter_u)
            if cfg.combustion_on:
                c = self._transport(self.m_c, rho, rho_old, phi, phi_b,
                                    c, c_old, D_f, D_b, rho * omgc + src_rho,
                                    dt, 0.0, 1.0, cfg.y_tol, cfg.max_iter_u)
                if cfg.solve_cvar:
                    gC = grad_fl(self.m_c, c)
                    magsq_gC = jnp.sum(gC * gC, axis=1)
                    cOc = lookup(self.table, "cOc",
                                 (None, Z, c,
                                  Zvar / jnp.maximum(Z * (1 - Z), 1e-6),
                                  cvar / jnp.maximum(c * (1 - c), 1e-6),
                                  None))
                    cvar = self._transport(
                        self.m_var, rho, rho_old, phi, phi_b, cvar, cvar_old,
                        D_f, D_b, 2.0 * (mu_t / cfg.Sc_t) * magsq_gC
                        - 2.0 * rho * chi_fac * cvar
                        + 2.0 * rho * (cOc - c * omgc) + src_rho,
                        dt, 0.0, 0.25, cfg.y_tol, cfg.max_iter_u)
                if cfg.solve_zcvar:
                    gC2 = grad_fl(self.m_c, c)
                    cross = jnp.sum(gZ * gC2, axis=1)
                    ZOc = lookup(self.table, "ZOc",
                                 (None, Z, c,
                                  Zvar / jnp.maximum(Z * (1 - Z), 1e-6),
                                  cvar / jnp.maximum(c * (1 - c), 1e-6),
                                  None))
                    Zcvar = self._transport(
                        self.m_var, rho, rho_old, phi, phi_b, Zcvar,
                        Zcvar_old, D_f, D_b,
                        2.0 * (mu_t / cfg.Sc_t) * cross
                        - 2.0 * rho * chi_fac * Zcvar
                        + rho * (ZOc - Z * omgc) + src_rho,
                        dt, -0.25, 0.25, cfg.y_tol, cfg.max_iter_u)

            # ===== enthalpy (baseFGM.C:694-733)
            if cfg.solve_enthalpy:
                eqn_h = (fvm_ddt_fl(self.m_He, rho, rho_old, He_old, dt,
                                    dtype)
                         + fvm_div_fl(self.m_He, phi, list(phi_b),
                                      cfg.div_scheme, dtype, x_now=He)
                         + fvm_laplacian_corrected_fl(self.m_He, D_f,
                                                      D_b, He, dtype,
                                                      sign=-1.0)
                         ).with_source(dpdt + src_h)
                He = solve_fvmatrix(eqn_h, He, tol=cfg.h_tol,
                                    max_iter=cfg.max_iter_u).x
            else:
                He = self._adiabatic_enthalpy(Z)

            # ===== table thermo (flareFGM correctThermo analogue)
            T, W_tab, _, _, _ = self._lookup_state(Z, Zvar, c, cvar, Zcvar,
                                                   He)
            psi = W_tab / (GAS_CONSTANT * T)

            # ===== pressure correctors (inherited block)
            rho_fn = lambda pp: pp * psi
            p_prev, U_prev = p, U
            rhoU_old = self._face_flux(rho_old, U_old)
            p, phi, phi_b, U, dpdt, rho, p_res = self._pressure_loop(
                p, p_old, psi, rho_fn, HbyA, rAU, dt, rho_old,
                (s.phi, s.phi_b), rhoU_old, diag)
            diag[f"p_res_{outer}"] = p_res
            if outer < cfg.n_outer - 1:
                p = p_prev + cfg.p_relax * (p - p_prev)
                U = U_prev + cfg.u_relax * (U - U_prev)
                rho = rho_fn(p)
                dpdt = (p - p_old) / dt

        diag["T_min"] = jnp.min(T)
        diag["T_max"] = jnp.max(T)
        diag["c_max"] = jnp.max(c)
        return FGMFLState(rho=rho, U=U, p=p, Z=Z, Zvar=Zvar, c=c, cvar=cvar,
                          Zcvar=Zcvar, T=T, He=He, k=k, eps=eps, phi=phi,
                          phi_b=phi_b, dpdt=dpdt, time=s.time + dt), diag
