"""Partially Stirred Reactor turbulence-chemistry interaction model.

Role parity: /root/reference/src/dfCombustionModels/PaSR/PaSR.C —
kappa = tc/(tc + tmix) (PaSR.C:393) applied to the laminar reaction rate
(:403). Mixing timescale types (PaSR.C:225-243):
  globalScale:       tmix = Cmix k/eps            (Cmix default 0.1, :172)
  kolmogorovScale:   tmix = sqrt(nu/eps)
  geometriMeanScale: tmix = sqrt( (k/eps) sqrt(nu/eps) )
  (dynamicScale needs the Zvar/Chi transport pair — FGM coupling; the
   mixture-fraction machinery lives in combustion/fgm/)
Chemistry timescale types (:256-377):
  globalConvertion: max over {fuel, oxidizer, CO2, H2} of rho Y_s / |RR_s|
  formationRate:    total concentration over total formation rate
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .basic import CombustionModel
from ..chemistry.reactor import solve_chemistry, ChemistryResult

__all__ = ["PaSR"]


@dataclasses.dataclass(frozen=True)
class PaSR(CombustionModel):
    mixing_scale: str = "globalScale"       # globalScale | kolmogorovScale | geometriMeanScale
    chemistry_scale: str = "formationRate"  # formationRate | globalConvertion
    Cmix: float = 0.1
    fuel_index: int | None = None           # for globalConvertion
    oxidizer_index: int | None = None
    tmix_max: float = 0.1

    def correct(self, T, p, Y, dt, turb=None) -> ChemistryResult:
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
        else:
            raise ValueError(self.mixing_scale)
        tmix = jnp.clip(tmix, 0.0, self.tmix_max)

        res = solve_chemistry(self.thermo, self.kinetics, T, p, Y, dt,
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
