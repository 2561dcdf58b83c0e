"""DNN-surrogate combustion model (DF-ODENet in the combustion-model slot).

Role parity: `dfChemistryModel::solve_DNN` dispatch
(/root/reference/src/dfChemistryModel/dfChemistryModel.C:355-384: use the DNN
when torch is on and the flow is warm, else CVODE) — here the hybrid is a
per-cell mask in one jitted computation instead of an MPI choreography.
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp

from .basic import CombustionModel
from ..chemistry.dnn import DFODENet
from ..chemistry.reactor import solve_chemistry, ChemistryResult

__all__ = ["DNNChemistry"]


@dataclasses.dataclass(frozen=True)
class DNNChemistry(CombustionModel):
    """Chemistry source terms from a DF-ODENet surrogate.

    hybrid=True additionally runs the stiff integrator on cells OUTSIDE the
    surrogate's validity window [T_valid_min, T_valid_max] and blends
    (the reference's CVODE-leftover path, pytorchFunctions.H:170-187)."""
    net: DFODENet | None = None
    hybrid: bool = False
    T_valid_min: float = 0.0
    T_valid_max: float = 1e9

    def correct(self, T, p, Y, dt, turb=None, dt_start=None) -> ChemistryResult:
        assert self.net is not None, "DNNChemistry requires a DFODENet"
        rho = self.thermo.rho(p, T, Y)
        RR = self.net.rates(T, p, Y, rho)
        if self.hybrid:
            ode = solve_chemistry(self.thermo, self.kinetics, T, p, Y, dt,
                                  opts=self.ode_opts,
                                  T_threshold=self.T_threshold,
                                  dt_start=dt_start)
            outside = ((T < self.T_valid_min) | (T > self.T_valid_max))[..., None]
            RR = jnp.where(outside, ode.RR, RR)
        Y_new = jnp.clip(Y + RR * dt / rho[..., None], 0.0, 1.0)
        Y_new = Y_new / jnp.sum(Y_new, axis=-1, keepdims=True)
        Qdot = -jnp.einsum("...s,s->...", RR, self.thermo.h_formation)
        dt_next = ode.dt_next if self.hybrid else None
        return ChemistryResult(T=T, Y=Y_new, RR=RR, Qdot=Qdot,
                               dt_next=dt_next)
