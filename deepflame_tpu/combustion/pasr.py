"""Partially Stirred Reactor turbulence-chemistry interaction model.

Role parity: /root/reference/src/dfCombustionModels/PaSR/PaSR.C —
kappa = tc/(tc + tmix) (PaSR.C:393) applied to the laminar reaction rate
(:403). Mixing timescale types (PaSR.C:225-243):
  globalScale:       tmix = Cmix k/eps            (Cmix default 0.1, :172)
  kolmogorovScale:   tmix = sqrt(nu/eps)
  geometriMeanScale: tmix = sqrt( (k/eps) sqrt(nu/eps) )
  dynamicScale:      tmix = clip(Zvar/(Chi+small), dt, 0.1)   (PaSR.C:240-243)
    with the model transporting its own mixture fraction Z, variance Zvar
    (production 2 mut |grad Z|^2, dissipation rho Chi; PaSR.C:463-489) and
    scalar dissipation rate Chi via one of three closures (ChiType,
    PaSR.C:495-560): constAlgebraic Chi = eps/k Zvar; dynAlgebraic with a
    laminar-flame-speed correlation Su(eqR,T,p); or a full Chi transport
    equation with production/destruction terms Cp1/Cp2/Cd1/Cd2.
Chemistry timescale types (:256-377):
  globalConvertion: max over {fuel, oxidizer, CO2, H2} of rho Y_s / |RR_s|
  formationRate:    total concentration over total formation rate
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .basic import CombustionModel
from ..chemistry.reactor import solve_chemistry, ChemistryResult
from ..mesh.structured import pad_field
from ..ops.fv import fvm_ddt, fvm_div, fvm_laplacian, grad, interpolate
from ..ops.linsolve import solve_fvmatrix

__all__ = ["PaSR"]


@dataclasses.dataclass(frozen=True)
class PaSR(CombustionModel):
    mixing_scale: str = "globalScale"       # globalScale | kolmogorovScale |
                                            # geometriMeanScale | dynamicScale
    chemistry_scale: str = "formationRate"  # formationRate | globalConvertion
    Cmix: float = 0.1
    fuel_index: int | None = None           # for globalConvertion
    oxidizer_index: int | None = None
    tmix_max: float = 0.1
    # --- dynamicScale closure (PaSR.C:170-187 mixingScaleCoeffs defaults)
    chi_type: str = "constAlgebraic"  # constAlgebraic | dynAlgebraic | transport
    Sc_t: float = 0.7
    max_chi: float = 5000.0
    Zst: float = 0.054
    # dynAlgebraic laminar-speed correlation Su = W eqR^eta exp(-xi (eqR-1.075)^2)
    # * (T/300)^alpha (p/1.013e5)^beta (PaSR.C:506-524)
    su_W: float = 0.422
    su_eta: float = 0.15
    su_xi: float = 5.18
    su_alpha: float = 2.0
    su_beta: float = -0.5
    # Chi transport closure constants (PaSR.C:176-179)
    Cd1: float = 1.5604
    Cd2: float = 1.1854
    Cp1: float = 1.6053
    Cp2: float = 1.1978

    @property
    def n_aux(self) -> int:
        """Number of model-owned transported fields carried in solver state
        (Z, Zvar, Chi for dynamicScale; reference fields PaSR.H:96-122)."""
        return 3 if self.mixing_scale == "dynamicScale" else 0

    def aux_init(self, shape, dtype, Z0=None):
        zeros = jnp.zeros(shape, dtype)
        Z = zeros if Z0 is None else jnp.asarray(Z0, dtype)
        return (Z, zeros, jnp.full(shape, 1e-8, dtype))

    def aux_advance(self, aux, rho, rho_old, phi, U, T, p, mu_eff, mu_t,
                    k, eps, dt, mesh, bcs_Z, bcs_U, bcs_coeff,
                    div_scheme="upwind", tol=1e-9, max_iter=100):
        """Advance the dynamicScale (Z, Zvar, Chi) fields one step
        (PaSR.C:440-560). muEff diffuses both Z and Zvar like the reference
        (fvm::laplacian(muEff, ...), PaSR.C:466,480)."""
        Z, Zvar, Chi = aux
        dtype = Z.dtype
        small = 1e-30
        smallK = 1e-15
        D_f = tuple(interpolate(pad_field(mu_eff, bcs_coeff, mesh), ax)
                    for ax in range(3))

        def transport(q, source, lo, hi):
            eqn = (fvm_ddt(rho, q, dt, mesh, bcs_Z, coeff_old=rho_old)
                   + fvm_div(phi, q, mesh, bcs_Z, div_scheme)
                   + fvm_laplacian(D_f, mesh, bcs_Z, dtype=dtype, sign=-1.0))
            eqn = eqn.with_source(source)
            r = solve_fvmatrix(eqn, q, tol=tol, max_iter=max_iter)
            return jnp.clip(r.x, lo, hi)

        Z = transport(Z, jnp.zeros_like(Z), 0.0, 1.0)
        gZ = grad(Z, bcs_Z, mesh)
        magsq_gZ = sum(gZ[ax] ** 2 for ax in range(3))
        Zvar = transport(Zvar, 2.0 * mu_t * magsq_gZ - rho * Chi, 0.0, 0.25)

        inv_tau = eps / (k + smallK)
        if self.chi_type == "constAlgebraic":
            Chi = inv_tau * Zvar                              # PaSR.C:497
        elif self.chi_type == "dynAlgebraic":                 # PaSR.C:502-527
            eqR = jnp.maximum(Z / ((1.0 - Z) + small)
                              * (1.0 - self.Zst) / self.Zst, 0.0)
            Su_ref = self.su_W * jnp.power(jnp.maximum(eqR, small),
                                           self.su_eta) \
                * jnp.exp(-self.su_xi * (eqR - 1.075) ** 2)
            Su = Su_ref * (T / 300.0) ** self.su_alpha \
                * (p / 1.013e5) ** self.su_beta
            Chi = (0.21 * inv_tau * Zvar
                   + (2.0 / 3.0) * (0.1 * Su / jnp.sqrt(k + smallK))
                   * 0.21 * inv_tau * Zvar)
        elif self.chi_type == "transport":                    # PaSR.C:532-560
            D1 = self.Cd1 * rho * Chi ** 2 / (Zvar + small)
            D2 = self.Cd2 * rho * inv_tau * Chi
            P1 = 2.0 * self.Cp1 * inv_tau * (mu_t / self.Sc_t) * magsq_gZ
            gU = [grad(U[c], bcs_U[c], mesh) for c in range(3)]
            divU = gU[0][0] + gU[1][1] + gU[2][2]
            # grad(U) && dev(twoSymm(grad U))
            GS = 0.0
            for i in range(3):
                for j in range(3):
                    tw = gU[i][j] + gU[j][i]
                    if i == j:
                        tw = tw - (2.0 / 3.0) * divU
                    GS = GS + gU[i][j] * tw
            P2 = self.Cp2 * mu_t * Chi / (k + smallK) * GS
            DChi_f = tuple(interpolate(
                pad_field(mu_eff / self.Sc_t, bcs_coeff, mesh), ax)
                for ax in range(3))
            eqn = (fvm_ddt(rho, Chi, dt, mesh, bcs_Z, coeff_old=rho_old)
                   + fvm_div(phi, Chi, mesh, bcs_Z, div_scheme)
                   + fvm_laplacian(DChi_f, mesh, bcs_Z, dtype=dtype,
                                   sign=-1.0))
            eqn = eqn.with_source(P1 + P2 - D1 - D2)
            Chi = solve_fvmatrix(eqn, Chi, tol=tol, max_iter=max_iter).x
        else:
            raise ValueError(self.chi_type)
        Chi = jnp.clip(Chi, 1e-8, self.max_chi)
        return (Z, Zvar, Chi)

    def correct(self, T, p, Y, dt, turb=None, dt_start=None) -> ChemistryResult:
        if turb is None:
            raise ValueError("PaSR requires turbulence quantities (k, epsilon, nu)")
        k = turb["k"]
        eps = jnp.maximum(turb["epsilon"], 1e-30)
        nu = turb["nu"]

        if self.mixing_scale == "globalScale":
            tmix = self.Cmix * k / eps
        elif self.mixing_scale == "kolmogorovScale":
            tmix = jnp.sqrt(nu / eps)
        elif self.mixing_scale == "geometriMeanScale":
            tmix = jnp.sqrt((k / eps) * jnp.sqrt(nu / eps))
        elif self.mixing_scale == "dynamicScale":
            # tmix = clip(Zvar/(Chi+small), deltaT, 0.1) (PaSR.C:240-243);
            # Zvar/Chi are the model-owned fields advanced by aux_advance.
            tmix = jnp.clip(turb["Zvar"] / (turb["Chi"] + 1e-30),
                            dt, self.tmix_max)
        else:
            raise ValueError(self.mixing_scale)
        tmix = jnp.clip(tmix, 0.0, self.tmix_max)

        res = solve_chemistry(self.thermo, self.kinetics, T, p, Y, dt,
                              dt_start=dt_start,
                              opts=self.ode_opts, T_threshold=self.T_threshold)

        rho = self.thermo.rho(p, T, Y)
        small = 1e-30
        if self.chemistry_scale == "formationRate":
            # total moles over total formation rate: tc = sum c_i / sum max(wdot,0)
            c = rho[..., None] * Y * self.kinetics.inv_W
            wdot = jnp.maximum(res.RR * self.kinetics.inv_W, 0.0)
            tc = jnp.sum(c, -1) / jnp.maximum(jnp.sum(wdot, -1), small)
        elif self.chemistry_scale == "globalConvertion":
            tc = jnp.zeros_like(T)
            for idx in (self.fuel_index, self.oxidizer_index):
                if idx is not None:
                    ts = rho * Y[..., idx] / jnp.maximum(
                        jnp.abs(res.RR[..., idx]), small)
                    tc = jnp.maximum(tc, ts)
        else:
            raise ValueError(self.chemistry_scale)
        tc = jnp.clip(tc, 0.0, 1e3)

        kappa = jnp.where((tmix > small) & (tc > small),
                          tc / (tc + tmix), 1.0)
        return res._replace(RR=res.RR * kappa[..., None],
                            Qdot=res.Qdot * kappa)
