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

__all__ = ["SprayState", "SpraySolver", "HighSpeedSprayState",
           "HighSpeedSpraySolver", "SprayFLState", "SprayFLSolver"]


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
            # carrier cp/kappa at the parcels (the Bird htc correction and
            # the boiling Spalding number need the ACTUAL carrier
            # properties, LiquidEvaporationBoil.C:180-197)
            cp_c = self.gas_solver.thermo.cp_mass(gas.T, Yt)
            kappa_c = self.gas_solver.transport.lambda_mix(gas.T, X)
            extra = dict(cp=cp_c, kappa=kappa_c)
        else:
            # FGM gas phase: viscosity from the manifold, vapor mass
            # fraction carried by the mixture fraction (vapor is pure fuel)
            _, _, _, nu_tab, _ = self.gas_solver._lookup_state(
                gas.Z, gas.Zvar, gas.c, gas.cvar, gas.Zcvar, gas.He)
            mu = gas.rho * nu_tab
            Yv = gas.Z
            extra = {}
        gas_fields = dict(rho=gas.rho, U=gas.U, T=gas.T, mu=mu, p=gas.p,
                          Yv=Yv, **extra)
        cloud, src = self.cloud.evolve(s.cloud, gas_fields, dt, gas.time)
        sources = dict(Srho=src.Srho, SU=src.SU, Sh=src.Sh, SY=src.SY,
                       SY_index=self.fuel_index)
        gas_new, diag = self.gas_solver.step(gas, dt, sources=sources)
        stats = self.cloud.stats(cloud)
        diag.update({f"cloud_{k}": v for k, v in stats.items()})
        return SprayState(gas=gas_new, cloud=cloud), diag


class HighSpeedSprayState(NamedTuple):
    gas: "HighSpeedState"       # deepflame_tpu.solvers.high_speed
    cloud: CloudState


@dataclasses.dataclass(frozen=True)
class HighSpeedSpraySolver:
    """Two-phase density-based solver: Lagrangian droplets in the
    dfHighSpeedFoam loop.

    Role parity: /root/reference/applications/solvers/dfHighSpeedFoam/
    createClouds.H + the water-mist detonation examples
    (examples/dfHighSpeedFoam/oneD_detH2WaterMist: manualInjection 5 um
    water parcels in [0.6, 1.4] m, sphereDrag + RanzMarshall +
    liquidEvaporationBoil, attenuating the detonation).

    Coupling: parcels evolve on the start-of-step gas state; their
    mass/momentum/energy/species sources enter the conservative update
    explicitly after transport+chemistry:
        rho  += dt Srho,  rhoU += dt SU,  rhoY_v += dt SY,
        rhoE += dt (Sh + 0.5 |U_gas|^2 Srho)
    (the kinetic-energy term carries the added vapor mass at the local gas
    velocity; the p dV work difference between the ha-based source and the
    conservative-E equation is O(p/rho h) and absorbed in Sh's convention).
    transport: a TransportData for the gas viscosity the drag law samples.
    """
    gas_solver: "HighSpeedSolver"
    cloud: SprayCloud
    transport: object
    vapor_index: int            # gas species receiving the evaporated mass

    def initial_state(self, p, T, Y, U=None, key=None) -> HighSpeedSprayState:
        gas = self.gas_solver.initial_state(p, T, Y, U)
        if key is None:
            key = jax.random.PRNGKey(0)
        return HighSpeedSprayState(gas=gas,
                                   cloud=self.cloud.init(key, dtype=T.dtype))

    def step(self, s: HighSpeedSprayState, dt):
        gas = s.gas
        rho, U, p, T, Y = self.gas_solver.primitives(gas)
        Yt = jnp.moveaxis(Y, 0, -1)
        X = self.gas_solver.thermo.mole_fractions(Yt)
        mu = self.transport.mu_mix(T, X)
        gas_fields = dict(rho=rho, U=U, T=T, mu=mu, p=p,
                          Yv=Y[self.vapor_index])
        cloud, src = self.cloud.evolve(s.cloud, gas_fields, dt, gas.time)
        gas2, diag = self.gas_solver.step(gas, dt)
        # explicit source update on the conservative state
        ke = 0.5 * jnp.sum(U * U, axis=0)
        rhoY = gas2.rhoY.at[self.vapor_index].add(dt * src.SY)
        gas2 = gas2._replace(
            rho=gas2.rho + dt * src.Srho,
            rhoU=gas2.rhoU + dt * src.SU,
            rhoE=gas2.rhoE + dt * (src.Sh + ke * src.Srho),
            rhoY=rhoY)
        # re-decode T after the source kick (keeps the Newton warm start hot)
        _, _, _, T_new, _ = self.gas_solver.primitives(gas2)
        gas2 = gas2._replace(T=T_new)
        stats = self.cloud.stats(cloud)
        diag.update({f"cloud_{k}": v for k, v in stats.items()})
        return HighSpeedSprayState(gas=gas2, cloud=cloud), diag


class SprayFLState(NamedTuple):
    gas: "LowMachFLState"       # deepflame_tpu.solvers.low_mach_fl
    cloud: CloudState


@dataclasses.dataclass(frozen=True)
class SprayFLSolver:
    """Euler-Lagrangian spray on a GENERAL (face-list/unstructured) mesh.

    Role parity: dfSprayFoam on arbitrary polyhedral meshes — the reference
    tracks parcels through the unstructured mesh by face-walking
    (src/lagrangian/basic particle::trackToFace); here parcels live on a
    uniform background overlay grid (lagrangian/overlay.py) while the gas
    runs the face-list PIMPLE solver. The sydneySprayBurner ethanol case
    (examples/dfSprayFoam/sydneySprayBurner) is the anchor family.

    gas_solver: LowMachSolverFL. cloud: OverlaySprayCloud built over the
    gas mesh's cell centres/volumes. fuel_index: gas species receiving the
    evaporated vapor.
    """
    gas_solver: object
    cloud: object               # OverlaySprayCloud
    fuel_index: int

    def initial_state(self, p, T, Y, U=None, key=None,
                      **gas_kw) -> SprayFLState:
        gas = self.gas_solver.initial_state(p, T, Y, U, **gas_kw)
        if key is None:
            key = jax.random.PRNGKey(0)
        return SprayFLState(gas=gas, cloud=self.cloud.init(key,
                                                           dtype=T.dtype))

    def step(self, s: SprayFLState, dt):
        gas = s.gas
        X = self.gas_solver.thermo.mole_fractions(gas.Y)
        mu = self.gas_solver.transport.mu_mix(gas.T, X)
        # carrier cp/kappa at the parcels — the Bird htc correction and the
        # boiling Spalding number need the ACTUAL carrier properties
        # (LiquidEvaporationBoil.C:180-197); the structured SpraySolver has
        # passed these since the round-3 phase-change parity work, and the
        # two backends must feed the cloud identically
        cp_c = self.gas_solver.thermo.cp_mass(gas.T, gas.Y)
        kappa_c = self.gas_solver.transport.lambda_mix(gas.T, X)
        gas_fields = dict(rho=gas.rho, U=gas.U, T=gas.T, mu=mu, p=gas.p,
                          Yv=gas.Y[:, self.fuel_index],
                          cp=cp_c, kappa=kappa_c)
        if gas.turb:
            # RAS k for stochastic (DRW) turbulent dispersion
            gas_fields["k_turb"] = gas.turb[0]
        cloud, src = self.cloud.evolve(s.cloud, gas_fields, dt, gas.time)
        sources = dict(Srho=src.Srho, SU=src.SU, Sh=src.Sh, SY=src.SY,
                       SY_index=self.fuel_index)
        gas_new, diag = self.gas_solver.step(gas, dt, sources=sources)
        stats = self.cloud.stats(cloud)
        diag.update({f"cloud_{k}": v for k, v in stats.items()})
        return SprayFLState(gas=gas_new, cloud=cloud), diag
