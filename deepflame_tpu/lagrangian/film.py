"""Wall liquid-film model (surface film region model parity).

Role parity: /root/reference/src/regionModels/surfaceFilmModels — the
OpenFOAM-7 overlay DeepFlame rebuilds for spray wall interaction
(kinematicSingleLayer/thermoSingleLayer + transferModels). The reference
keeps the film as a separate 2D region mesh coupled to parcels (absorb on
impingement) and to the gas (evaporation mass/energy transfer).

TPU-first design: the film is a fixed-shape 2D structure-of-arrays aligned
with a wall face of the structured mesh — mass per area, tangential momentum
per area, and temperature — living inside the cloud state pytree so the whole
spray+film substep stays one jitted program. Physics kept (the parts the
reference's spray cases exercise):
  - parcel absorption on impingement (kinematicSingleLayer::addSources);
  - film heating by gas-side convection (thermoSingleLayer htcs transfer);
  - film evaporation with a Spalding driving force, boiling-limited
    (thermoSingleLayer + standardPhaseChange), mass/energy returned to the
    wall-adjacent gas cells as Srho/SY/Sh sources;
  - wall friction as tangential momentum relaxation (the
    kinematicSingleLayer wall-shear term in the thin-film limit).
Not modeled (documented): contact-angle/thermocapillary forces, dripping/
curvature separation, in-film lateral transport — none are exercised by the
reference's shipped spray cases (aachenBomb/sydney use escape/rebound walls).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["WallFilmState", "WallFilm"]


class WallFilmState(NamedTuple):
    m: jnp.ndarray      # (n1, n2) film mass per area [kg/m^2]
    mom: jnp.ndarray    # (2, n1, n2) tangential momentum per area [kg/m/s]
    T: jnp.ndarray      # (n1, n2) film temperature [K]
    m_evap: jnp.ndarray # scalar: cumulative evaporated film mass [kg]


@dataclasses.dataclass(frozen=True)
class WallFilm:
    """One wall patch's film. axis/side select the structured-mesh boundary
    face (axis in {0,1,2}, side in {0,1}); the film arrays span the two
    tangential axes of that face."""
    axis: int
    side: int
    tau_wall: float = 1e-3    # wall-friction momentum relaxation time [s]
    Sc_gas: float = 0.7
    Pr_gas: float = 0.7
    W_gas: float = 28.9

    def tangential_axes(self):
        return tuple(a for a in range(3) if a != self.axis)

    def init(self, mesh, dtype) -> WallFilmState:
        t1, t2 = self.tangential_axes()
        shape = (mesh.shape[t1], mesh.shape[t2])
        z = jnp.zeros(shape, dtype)
        return WallFilmState(m=z, mom=jnp.zeros((2,) + shape, dtype),
                             T=z + 300.0, m_evap=jnp.zeros((), dtype))

    def face_area(self, mesh):
        d = (mesh.dx, mesh.dy, mesh.dz)
        t1, t2 = self.tangential_axes()
        return d[t1] * d[t2]

    def absorb(self, f: WallFilmState, idx1, idx2, mass, mom_t,
               T_p) -> WallFilmState:
        """Deposit impinging parcels (scatter-add). mass [kg/m^2], mom_t
        (2,K) [kg/m/s] per face area, T_p [K]; multiplicity-weighted by the
        caller. Film temperature mixes mass-weighted (constant-cp liquid)."""
        m_new = f.m.at[idx1, idx2].add(mass)
        mom_new = f.mom.at[:, idx1, idx2].add(mom_t)
        mT_new = (f.m * f.T).at[idx1, idx2].add(mass * T_p)
        T_new = jnp.where(m_new > 1e-14, mT_new / jnp.maximum(m_new, 1e-14),
                          f.T)
        return WallFilmState(m=m_new, mom=mom_new, T=T_new, m_evap=f.m_evap)

    def evolve(self, f: WallFilmState, gas_wall: dict, liquid, dt,
               face_area=1.0):
        """One film substep against the wall-adjacent gas layer.

        gas_wall: dict of 2D fields sampled at the first interior cell
        (rho, T, mu, p, Yv) plus dn = wall-normal cell size.
        Returns (new_state, per-area gas sources dict {Srho, Sh, SY} in
        [kg/m^2/s] and [W/m^2] to be divided by dn for volumetric rates).
        """
        rho_g = gas_wall["rho"]
        T_g = gas_wall["T"]
        mu_g = gas_wall["mu"]
        p_g = gas_wall["p"]
        Yv_g = gas_wall.get("Yv", jnp.zeros_like(rho_g))
        dn = gas_wall["dn"]

        has_film = f.m > 1e-12
        # gas-side convective transfer across the half-cell (thermoSingleLayer
        # htcs in the laminar thin-layer limit: h = kappa_g / (dn/2))
        cp_g = 1005.0
        kappa_g = mu_g * cp_g / self.Pr_gas
        h_conv = kappa_g / (0.5 * dn)
        cp_l = liquid.cp(f.T)
        # implicit temperature relaxation toward gas T
        tau_T = jnp.maximum(f.m * cp_l / jnp.maximum(h_conv, 1e-20), 1e-9)
        T_new = T_g + (f.T - T_g) * jnp.exp(-dt / tau_T)
        T_new = jnp.where(has_film,
                          jnp.clip(T_new, 250.0, liquid.T_crit - 1.0), f.T)

        # evaporation (standardPhaseChange parity): Spalding mass transfer
        # with the boiling heat-limited cap
        D_v = mu_g / (rho_g * self.Sc_gas)
        h_m = D_v / (0.5 * dn)                    # mass-transfer coefficient
        p_sat = liquid.p_sat(T_new)
        x_s = jnp.clip(p_sat / jnp.maximum(p_g, 1.0), 0.0, 0.999)
        Y_s = x_s * liquid.W / (x_s * liquid.W + (1.0 - x_s) * self.W_gas)
        B_M = jnp.clip((Y_s - Yv_g) / jnp.maximum(1.0 - Y_s, 1e-3), 0.0, 20.0)
        flux = rho_g * h_m * jnp.log1p(B_M)       # kg/m^2/s
        L = liquid.latent_heat(T_new)
        flux_boil = h_conv * jnp.maximum(T_g - T_new, 0.0) / L
        flux = jnp.where(T_new > liquid.T_boil,
                         jnp.maximum(flux, flux_boil), flux)
        dm = jnp.where(has_film, jnp.minimum(flux * dt, f.m), 0.0)
        m_new = f.m - dm

        # wall friction: tangential momentum decay (no-slip wall shear)
        mom_new = f.mom * jnp.exp(-dt / self.tau_wall)
        mom_new = jnp.where(m_new[None] > 1e-14, mom_new,
                            jnp.zeros_like(mom_new))

        # sensible heat the film absorbed while relaxing toward the gas T
        # (the gas side of the convective coupling; reference
        # thermoSingleLayer debits both sides) — per unit area
        q_conv = f.m * cp_l * (T_new - f.T) / dt
        src = {
            "Srho": dm / dt,                                  # kg/m^2/s
            "SY": dm / dt,
            # latent heat drawn from the gas + convective heat into the film
            "Sh": -(dm / dt) * L - q_conv,
        }
        f_new = WallFilmState(m=m_new, mom=mom_new, T=T_new,
                              m_evap=f.m_evap + jnp.sum(dm) * face_area)
        return f_new, src
