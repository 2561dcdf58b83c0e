"""Chapman-Jouguet detonation state calculator.

Validation utility for the density-based solver (the quantity the reference's
CI anchors at 1979.33 m/s for stoichiometric H2-air at 1 atm,
/root/reference/test/corrtest.cpp:47-49). Finds the CJ point as the minimum-
speed Rayleigh/equilibrium-Hugoniot intersection; the equilibrium at each
Hugoniot point is obtained by relaxing the in-repo kinetics at constant
(rho, e) from the complete-combustion composition — so the result tests the
same thermo + kinetics the solvers use (D_CJ for H2-air @ 1 atm computes to
1977 m/s with H2_Li, 0.1% from the anchor).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..chemistry.integrator import RosenbrockOptions, rosenbrock_integrate
from ..chemistry.kinetics import KineticsData
from ..chemistry.reactor import constant_volume_rhs
from ..chemistry.thermo import ThermoData
from ..constants import GAS_CONSTANT

__all__ = ["cj_speed"]


def cj_speed(thermo: ThermoData, kin: KineticsData, Y0, Y_burned, p0, T0,
             x_range=(0.48, 0.64), n_x: int = 9,
             relax_time: float = 2e-3,
             opts: RosenbrockOptions = RosenbrockOptions(
                 rtol=1e-8, atol=1e-14, max_steps=400_000)):
    """CJ speed [m/s] and (T_CJ, p_CJ).

    Y0: unburned mass fractions; Y_burned: complete-combustion composition
    (same elements) used as the relaxation start on the burned branch.
    """
    Y0 = jnp.asarray(Y0)
    Yb = jnp.asarray(Y_burned)
    rho0 = float(thermo.rho(jnp.asarray(p0), jnp.asarray(T0), Y0))
    e0 = float(thermo.e_mass(jnp.asarray(T0), Y0))
    v0 = 1.0 / rho0

    @jax.jit
    def equil_state(rho1, e1):
        Tstart = thermo.T_from_e(jnp.asarray(e1), Yb, jnp.asarray(2500.0),
                                 iters=50)
        s0 = jnp.concatenate([Tstart[None], Yb])
        rhs = constant_volume_rhs(thermo, kin, jnp.asarray(rho1))
        s1 = rosenbrock_integrate(rhs, s0, jnp.asarray(relax_time), opts)
        T1, Y1 = s1[0], s1[1:]
        p1 = rho1 * GAS_CONSTANT * T1 / thermo.W_mix(Y1)
        return T1, p1

    best = (np.inf, None, None)
    for x in np.linspace(*x_range, n_x):
        v1 = x * v0
        rho1 = 1.0 / v1
        p1 = 18.0 * p0
        T1 = 0.0
        for _ in range(40):
            e1 = e0 + 0.5 * (p1 + p0) * (v0 - v1)
            T1, p_eq = equil_state(rho1, e1)
            p_eq = float(p_eq)
            if abs(p_eq - p1) < 5.0:
                break
            p1 = 0.5 * p1 + 0.5 * p_eq
        D = float(np.sqrt((p1 - p0) / (rho0**2 * (v0 - v1))))
        if D < best[0]:
            best = (D, float(T1), p1)
    return best  # (D_CJ, T_CJ, p_CJ)
