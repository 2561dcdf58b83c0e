"""Combustion model layer: base API + laminar (no-TCI) model.

Role parity: /root/reference/src/dfCombustionModels/ — the runtime-selectable
`CombustionModel` hierarchy. `laminar.correct()` calls the chemistry engine
and `R(Yi)` exposes the reaction source (laminar.C:106,146-156). EDC/PaSR
subclasses scale the source by a reacting fraction kappa (EDC.C / PaSR.C:401);
they live in edc.py / pasr.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..chemistry.kinetics import KineticsData
from ..chemistry.thermo import ThermoData
from ..chemistry.reactor import solve_chemistry, ChemistryResult
from ..chemistry.integrator import RosenbrockOptions

__all__ = ["CombustionModel", "Laminar", "NoCombustion"]


@dataclasses.dataclass(frozen=True)
class CombustionModel:
    """Base: owns the chemistry engine handles (thermo + kinetics)."""
    thermo: ThermoData
    kinetics: KineticsData
    ode_opts: RosenbrockOptions = RosenbrockOptions(rtol=1e-6, atol=1e-12)
    T_threshold: float = 280.0
    # load-balance bin count for the batched integrator (solve_chemistry):
    # more bins shorten the stiffest-lane drain per while_loop at the cost
    # of serialized launches — 32 measured optimal at ~1e5 cells, 64 at
    # ~1e6 (v5e). sort="dt" groups lanes by the warm-started controller
    # step (a direct stiffness measure) instead of temperature.
    n_bins: int = 32
    sort: str = "T"
    # cross-device chemistry load balancing (reference DLB parity,
    # LoadBalancer.C:124-232): stratified all_to_all lane exchange under an
    # active shard axis so a front concentrated in one shard's slab does
    # not gate the whole pod (reactor._stratified_cross_shard)
    dlb_cross_shard: bool = False

    def correct(self, T, p, Y, dt, turb=None, dt_start=None) -> ChemistryResult:
        raise NotImplementedError

    def kappa(self, turb) -> Any:
        """Reacting fraction applied to R(Yi); 1 for laminar."""
        return 1.0


@dataclasses.dataclass(frozen=True)
class Laminar(CombustionModel):
    """No turbulence-chemistry interaction: RR straight from the integrator."""

    def correct(self, T, p, Y, dt, turb=None, dt_start=None) -> ChemistryResult:
        return solve_chemistry(self.thermo, self.kinetics, T, p, Y, dt,
                               opts=self.ode_opts,
                               T_threshold=self.T_threshold,
                               n_bins=self.n_bins, sort=self.sort,
                               dt_start=dt_start,
                               cross_shard=self.dlb_cross_shard)


@dataclasses.dataclass(frozen=True)
class NoCombustion(CombustionModel):
    """Chemistry disabled (the reference's noCombustion stub)."""

    def correct(self, T, p, Y, dt, turb=None, dt_start=None) -> ChemistryResult:
        zeros = jnp.zeros_like(Y)
        return ChemistryResult(T=T, Y=Y, RR=zeros, Qdot=jnp.zeros_like(T))
