"""Liquid fuel properties for spray parcels.

Role parity: /root/reference/src/thermophysicalModels/thermophysicalProperties
(liquidProperties/liquidMixtureProperties) — NSRDS-style temperature
correlations consumed by the evaporation/heat-transfer submodels.

Shipped liquids: n-heptane C7H16 (aachenBomb fuel), n-dodecane-ish diesel
surrogate, water (water-mist detonation cases). Correlation forms are the
standard published ones (Antoine vapor pressure, Watson latent heat, linear
rho/cp fits over the relevant range); coefficients from public property data.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["Liquid", "n_heptane", "n_dodecane", "water"]


@dataclasses.dataclass(frozen=True)
class Liquid:
    name: str
    W: float                 # kg/kmol
    T_crit: float            # K
    T_boil: float            # K at 1 atm
    rho_ref: float           # kg/m^3 at T_ref
    rho_slope: float         # d rho/dT
    T_ref: float
    cp_ref: float            # J/kg/K
    cp_slope: float
    L_ref: float             # latent heat at T_boil [J/kg]
    antoine_A: float         # log10(p_sat[Pa]) = A - B/(T + C)
    antoine_B: float
    antoine_C: float
    sigma: float = 0.02      # surface tension [N/m] (approx const)
    mu_ref: float = 5e-4     # liquid viscosity at T_ref [Pa s]
    mu_B: float = 1000.0     # Andrade exponent: mu = mu_ref exp(B(1/T-1/Tref))

    def rho(self, T):
        return self.rho_ref + self.rho_slope * (T - self.T_ref)

    def mu(self, T):
        """Liquid dynamic viscosity (Andrade/Guzman correlation)."""
        T = jnp.clip(T, 200.0, self.T_crit - 1.0)
        return self.mu_ref * jnp.exp(self.mu_B * (1.0 / T - 1.0 / self.T_ref))

    def cp(self, T):
        return self.cp_ref + self.cp_slope * (T - self.T_ref)

    def p_sat(self, T):
        """Saturation vapor pressure [Pa] (Antoine, clipped at critical)."""
        T = jnp.clip(T, 200.0, self.T_crit - 1.0)
        return 10.0 ** (self.antoine_A - self.antoine_B / (T + self.antoine_C))

    def latent_heat(self, T):
        """Watson correlation scaled from the boiling point."""
        Tr = jnp.clip(T, 200.0, self.T_crit - 1.0) / self.T_crit
        Trb = self.T_boil / self.T_crit
        return self.L_ref * ((1.0 - Tr) / (1.0 - Trb)) ** 0.38


# n-heptane: W=100.2, Tc=540.2, Tb=371.6, rho~680 @300K, cp~2240,
# L=318 kJ/kg @ Tb, Antoine (Pa): A=9.2535, B=1268.6, C=-56.2 (NIST range)
def n_heptane() -> Liquid:
    return Liquid(name="C7H16", W=100.204, T_crit=540.2, T_boil=371.55,
                  rho_ref=679.5, rho_slope=-0.85, T_ref=300.0,
                  cp_ref=2242.0, cp_slope=5.0, L_ref=3.18e5,
                  antoine_A=9.2535, antoine_B=1268.636, antoine_C=-56.199,
                  mu_ref=3.9e-4, mu_B=900.0)


def n_dodecane() -> Liquid:
    return Liquid(name="C12H26", W=170.33, T_crit=658.0, T_boil=489.3,
                  rho_ref=745.0, rho_slope=-0.75, T_ref=300.0,
                  cp_ref=2210.0, cp_slope=4.5, L_ref=2.56e5,
                  antoine_A=9.328, antoine_B=1625.9, antoine_C=-92.8,
                  mu_ref=1.34e-3, mu_B=1500.0)


def water() -> Liquid:
    return Liquid(name="H2O", W=18.015, T_crit=647.1, T_boil=373.15,
                  rho_ref=997.0, rho_slope=-0.35, T_ref=300.0,
                  cp_ref=4184.0, cp_slope=0.5, L_ref=2.257e6,
                  antoine_A=10.196, antoine_B=1730.63, antoine_C=-39.72,
                  sigma=0.072, mu_ref=8.5e-4, mu_B=2100.0)
