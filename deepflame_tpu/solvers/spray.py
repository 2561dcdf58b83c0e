"""Euler-Lagrangian spray combustion solver (dfSprayFoam parity).

Role parity: /root/reference/applications/solvers/dfSprayFoam/dfSprayFoam.C:
68-210 — the dfLowMachFoam PIMPLE loop plus `parcels.evolve()` and the spray
mass/momentum/energy/species sources (createClouds.H:2-9). The aachenBomb
n-heptane case is the anchor family (test/aachenBomb_2D).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lagrangian.cloud import CloudState, SprayCloud
from .low_mach import LowMachSolver, LowMachState

__all__ = ["SprayState", "SpraySolver"]


class SprayState(NamedTuple):
    gas: LowMachState
    cloud: CloudState


@dataclasses.dataclass(frozen=True)
class SpraySolver:
    """Couples a SprayCloud to a LowMachSolver. fuel_index: gas-phase species
    receiving the evaporated vapor (SYi)."""
    gas_solver: LowMachSolver
    cloud: SprayCloud
    fuel_index: int

    def initial_state(self, p, T, Y, U=None, key=None) -> SprayState:
        gas = self.gas_solver.initial_state(p, T, Y, U)
        if key is None:
            key = jax.random.PRNGKey(0)
        return SprayState(gas=gas, cloud=self.cloud.init(key, dtype=T.dtype))

    def initial_state_fgm(self, p, Z, c, U=None, key=None) -> SprayState:
        """Spray + FGM gas phase (FGMLiquidEvaporationBoil coupling,
        /root/reference/src/dfCombustionModels/FGM/FGMLiquidEvaporationBoil +
        baseFGM.C:501-514 spray source into the manifold scalars)."""
        gas = self.gas_solver.fgm_initial_state(p, Z, c, U)
        if key is None:
            key = jax.random.PRNGKey(0)
        return SprayState(gas=gas, cloud=self.cloud.init(key, dtype=p.dtype))

    def step(self, s: SprayState, dt):
        gas = s.gas
        # gas fields sampled by parcels (parcels.evolve(), dfLowMachFoam.C:276)
        if isinstance(gas, LowMachState):
            Yt = jnp.moveaxis(gas.Y, 0, -1)
            X = self.gas_solver.thermo.mole_fractions(Yt)
            mu = self.gas_solver.transport.mu_mix(gas.T, X)
            Yv = gas.Y[self.fuel_index]
        else:
            # FGM gas phase: viscosity from the manifold, vapor mass
            # fraction carried by the mixture fraction (vapor is pure fuel)
            _, _, _, nu_tab, _ = self.gas_solver._lookup_state(
                gas.Z, gas.Zvar, gas.c, gas.cvar, gas.Zcvar, gas.He)
            mu = gas.rho * nu_tab
            Yv = gas.Z
        gas_fields = dict(rho=gas.rho, U=gas.U, T=gas.T, mu=mu, p=gas.p,
                          Yv=Yv)
        cloud, src = self.cloud.evolve(s.cloud, gas_fields, dt, gas.time)
        sources = dict(Srho=src.Srho, SU=src.SU, Sh=src.Sh, SY=src.SY,
                       SY_index=self.fuel_index)
        gas_new, diag = self.gas_solver.step(gas, dt, sources=sources)
        stats = self.cloud.stats(cloud)
        diag.update({f"cloud_{k}": v for k, v in stats.items()})
        return SprayState(gas=gas_new, cloud=cloud), diag
