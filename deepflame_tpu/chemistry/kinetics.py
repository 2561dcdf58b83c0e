"""Mass-action kinetics as dense batched matmuls (MXU-native).

Role parity: replaces Cantera `Kinetics::getNetProductionRates` used by the
reference's chemistry engine (/root/reference/src/dfChemistryModel/
dfChemistryModel.C:738-780 `solveSingle`, via CVODE RHS callbacks) and the
direct-rate `calculateW()` path of the density-based solver
(/root/reference/applications/solvers/dfHighSpeedFoam/rhoYEqn.H:70-76).

TPU-first design: instead of per-cell, per-reaction scalar loops, stoichiometry
is dense, so for a batch of cells the rate evaluation is
    ln r_fwd = ln kf + ORDER @ ln c        (batch, nr) = (nr, ns) matmul
    wdot     = (r_f - r_r) @ (nu_rev - nu_fwd)
— two large matmuls plus elementwise transcendentals, which XLA tiles onto the
MXU/VPU. gri30 (53 species, 325 reactions) over 10^5 cells is a
(1e5 x 53) @ (53 x 325) GEMM, not 3.25e7 scalar rate calls.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GAS_CONSTANT, P_REF
from .mechanism import Mechanism
from .thermo import ThermoData

__all__ = ["KineticsData", "make_kinetics", "production_rates", "heat_release_rate"]

_LOG10 = 2.302585092994046


class KineticsData(NamedTuple):
    order_fwd_T: jax.Array   # (ns, nr) transposed forward orders
    nu_rev_T: jax.Array      # (ns, nr)
    d_nu: jax.Array          # (nr, ns) nu_rev - nu_fwd
    sum_d_nu: jax.Array      # (nr,)
    ln_A: jax.Array          # (nr,)
    beta: jax.Array
    EaR: jax.Array
    reversible: jax.Array
    is_three_body: jax.Array
    is_falloff: jax.Array
    eff_T: jax.Array         # (ns, nr) third-body efficiencies (transposed)
    ln_low_A: jax.Array
    low_beta: jax.Array
    low_EaR: jax.Array
    has_troe: jax.Array
    troe_A: jax.Array
    troe_T3: jax.Array
    troe_T1: jax.Array
    troe_T2: jax.Array
    troe_has_T2: jax.Array
    inv_W: jax.Array         # (ns,)
    W: jax.Array             # (ns,)


def make_kinetics(mech: Mechanism, dtype=jnp.float64) -> KineticsData:
    f = lambda x: jnp.asarray(np.asarray(x), dtype)
    with np.errstate(divide="ignore"):
        ln_A = np.where(mech.arr_A > 0, np.log(np.maximum(mech.arr_A, 1e-300)), -700.0)
        ln_low_A = np.where(mech.low_A > 0, np.log(np.maximum(mech.low_A, 1e-300)), -700.0)
    return KineticsData(
        order_fwd_T=f(mech.order_fwd.T),
        nu_rev_T=f(mech.nu_rev.T),
        d_nu=f(mech.nu_rev - mech.nu_fwd),
        sum_d_nu=f((mech.nu_rev - mech.nu_fwd).sum(axis=1)),
        ln_A=f(ln_A), beta=f(mech.arr_beta), EaR=f(mech.arr_EaR),
        reversible=f(mech.reversible),
        is_three_body=f(mech.is_three_body), is_falloff=f(mech.is_falloff),
        eff_T=f(mech.efficiencies.T),
        ln_low_A=f(ln_low_A), low_beta=f(mech.low_beta), low_EaR=f(mech.low_EaR),
        has_troe=f(mech.has_troe),
        troe_A=f(mech.troe[:, 0]), troe_T3=f(mech.troe[:, 1]),
        troe_T1=f(mech.troe[:, 2]), troe_T2=f(mech.troe[:, 3]),
        troe_has_T2=f(mech.troe_has_T2),
        inv_W=f(1.0 / mech.molecular_weights),
        W=f(mech.molecular_weights),
    )


def _falloff_factor(kin: KineticsData, T, ln_k_inf, M):
    """Falloff blending factor Pr/(1+Pr) * F(Troe) per reaction (batched)."""
    ln_T = jnp.log(T)[..., None]
    ln_k0 = kin.ln_low_A + kin.low_beta * ln_T - kin.low_EaR / T[..., None]
    # Pr = k0 [M] / kinf, in log space for range safety (floor must be a
    # normal number: TPU flushes denormals)
    floor = jnp.asarray(1e-100 if T.dtype == jnp.float64 else 1e-25, T.dtype)
    ln_Pr = ln_k0 - ln_k_inf + jnp.log(jnp.maximum(M, floor))
    Pr = jnp.exp(ln_Pr)
    # Troe centering factor
    Tb = T[..., None]
    safe = lambda x: jnp.maximum(x, 1e-30)
    Fcent = ((1.0 - kin.troe_A) * jnp.exp(-Tb / safe(kin.troe_T3))
             + kin.troe_A * jnp.exp(-Tb / safe(kin.troe_T1))
             + kin.troe_has_T2 * jnp.exp(-kin.troe_T2 / Tb))
    log_Fc = jnp.log10(jnp.maximum(Fcent, 1e-30))
    log_Pr = ln_Pr / _LOG10
    c = -0.4 - 0.67 * log_Fc
    n = 0.75 - 1.27 * log_Fc
    f1 = (log_Pr + c) / (n - 0.14 * (log_Pr + c))
    log_F_troe = log_Fc / (1.0 + f1 * f1)
    log_F = jnp.where(kin.has_troe > 0, log_F_troe, 0.0)  # Lindemann: F = 1
    F = jnp.exp(_LOG10 * log_F)
    return (Pr / (1.0 + Pr)) * F


def production_rates(kin: KineticsData, thermo: ThermoData,
                     T: jax.Array, rho: jax.Array, Y: jax.Array) -> jax.Array:
    """Net molar production rates wdot [kmol/m^3/s], shape (..., ns).

    T, rho: (...,); Y: (..., ns). Fully batched; no data-dependent control flow.
    """
    dtype = Y.dtype
    # Concentration floor for the log-space rate evaluation. Must be a safely
    # normal number (TPU flushes denormals, log(0) = -inf would poison the
    # order matmul via 0 * inf): 1e-25 kmol/m^3 is ~6e-3 molecules/cm^3 —
    # physically zero, and exp(order * ln(floor)) underflows to an exact 0 rate.
    floor = jnp.asarray(1e-100 if dtype == jnp.float64 else 1e-25, dtype)
    c = rho[..., None] * Y * kin.inv_W                       # (..., ns) kmol/m^3
    c = jnp.maximum(c, 0.0)
    ln_c = jnp.log(jnp.maximum(c, floor))

    ln_T = jnp.log(T)[..., None]
    inv_T = (1.0 / T)[..., None]
    ln_kf = kin.ln_A + kin.beta * ln_T - kin.EaR * inv_T      # (..., nr)

    # third-body concentrations [M] per reaction — a matmul over species
    M = jnp.einsum("...s,sr->...r", c, kin.eff_T)

    fo = _falloff_factor(kin, T, ln_kf, M)
    factor = jnp.where(kin.is_falloff > 0, fo,
                       jnp.where(kin.is_three_body > 0, M, 1.0))

    # equilibrium constants: ln Kc = -d_nu @ g/RT + sum(d_nu) ln(Pref/(R T))
    g = thermo.g_RT(T)                                        # (..., ns)
    ln_Kc = (-jnp.einsum("rs,...s->...r", kin.d_nu, g)
             + kin.sum_d_nu * jnp.log(P_REF / (GAS_CONSTANT * T))[..., None])

    ln_rf = ln_kf + jnp.einsum("...s,sr->...r", ln_c, kin.order_fwd_T)
    ln_rr = ln_kf - ln_Kc + jnp.einsum("...s,sr->...r", ln_c, kin.nu_rev_T)

    r_f = jnp.exp(ln_rf) * factor
    r_r = jnp.exp(ln_rr) * factor * kin.reversible
    q = r_f - r_r                                             # (..., nr)
    return jnp.einsum("...r,rs->...s", q, kin.d_nu)


def mass_production_rates(kin: KineticsData, thermo: ThermoData,
                          T, rho, Y) -> jax.Array:
    """RR [kg/m^3/s] — the reference's `RR(i)` source-term fields
    (/root/reference/src/dfChemistryModel/dfChemistryModel.H:281-307)."""
    return production_rates(kin, thermo, T, rho, Y) * kin.W


def heat_release_rate(kin: KineticsData, thermo: ThermoData,
                      T, rho, Y) -> jax.Array:
    """Qdot [J/m^3/s] = -sum_i h_i(T) * wdot_i (molar basis)."""
    wdot = production_rates(kin, thermo, T, rho, Y)
    h_molar = thermo.h_RT(T) * (GAS_CONSTANT * T[..., None])   # J/kmol
    return -jnp.einsum("...s,...s->...", h_molar, wdot)
