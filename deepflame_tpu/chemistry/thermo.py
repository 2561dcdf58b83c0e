"""Pure-JAX NASA-7 thermodynamics: cp/h/s, mixture properties, Newton T(h).

Role parity: replaces per-cell Cantera `setState_HP` calls in the reference's
`correctThermo()` (/root/reference/src/dfChemistryModel/dfChemistryModel.C:419-735)
and the GPU NASA-polynomial kernels + Newton temperature solve
(/root/reference/src_gpu/dfThermo.H:74-91, atol=rtol=1e-7, <=20 iterations).

All functions are shape-polymorphic: `T` may be scalar or any batch shape
(..., ), `Y` is (..., ns). Everything is elementwise + small matmuls, so a
single `jit` over a whole field vectorizes across cells with no vmap needed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GAS_CONSTANT
from .mechanism import Mechanism

__all__ = ["ThermoData", "make_thermo"]

T_STD = 298.15


class ThermoData(NamedTuple):
    """NASA-7 tables as a pytree (device-resident constants under jit)."""
    W: jax.Array          # (ns,) kg/kmol
    inv_W: jax.Array      # (ns,)
    T_mid: jax.Array      # (ns,)
    coeffs_low: jax.Array   # (ns, 7)
    coeffs_high: jax.Array  # (ns, 7)
    h_formation: jax.Array  # (ns,) J/kg at 298.15 K (mass basis)
    T_min: float
    T_max: float

    # ---- per-species molar (nondimensional) properties ----
    def _select(self, T: jax.Array) -> jax.Array:
        """Piecewise NASA-7 coefficient selection: (..., ns, 7)."""
        Tb = T[..., None, None]
        return jnp.where(Tb < self.T_mid[:, None], self.coeffs_low, self.coeffs_high)

    def cp_R(self, T: jax.Array) -> jax.Array:
        """(..., ns): cp_i / R."""
        a = self._select(T)
        t = T[..., None]
        return a[..., 0] + t * (a[..., 1] + t * (a[..., 2] + t * (a[..., 3] + t * a[..., 4])))

    def h_RT(self, T: jax.Array) -> jax.Array:
        """(..., ns): h_i / (R T) (absolute enthalpy incl. formation)."""
        a = self._select(T)
        t = T[..., None]
        return (a[..., 0] + t * (a[..., 1] / 2 + t * (a[..., 2] / 3 + t * (a[..., 3] / 4 + t * a[..., 4] / 5)))
                + a[..., 5] / t)

    def s_R(self, T: jax.Array) -> jax.Array:
        """(..., ns): s°_i / R."""
        a = self._select(T)
        t = T[..., None]
        return (a[..., 0] * jnp.log(t) + t * (a[..., 1] + t * (a[..., 2] / 2 + t * (a[..., 3] / 3 + t * a[..., 4] / 4)))
                + a[..., 6])

    def g_RT(self, T: jax.Array) -> jax.Array:
        """(..., ns): standard-state Gibbs g_i/(R T) = h/RT - s/R."""
        a = self._select(T)
        t = T[..., None]
        # expanded to share polynomial work
        h = (a[..., 0] + t * (a[..., 1] / 2 + t * (a[..., 2] / 3 + t * (a[..., 3] / 4 + t * a[..., 4] / 5)))
             + a[..., 5] / t)
        s = (a[..., 0] * jnp.log(t) + t * (a[..., 1] + t * (a[..., 2] / 2 + t * (a[..., 3] / 3 + t * a[..., 4] / 4)))
             + a[..., 6])
        return h - s

    # ---- species mass-basis properties [J/kg] ----
    def h_species(self, T: jax.Array) -> jax.Array:
        """(..., ns): absolute enthalpy per species, J/kg."""
        return self.h_RT(T) * (GAS_CONSTANT * T[..., None]) * self.inv_W

    def cp_species(self, T: jax.Array) -> jax.Array:
        return self.cp_R(T) * GAS_CONSTANT * self.inv_W

    # ---- mixture properties ----
    def W_mix(self, Y: jax.Array) -> jax.Array:
        """Mean molecular weight [kg/kmol] from mass fractions."""
        return 1.0 / jnp.einsum("...s,s->...", Y, self.inv_W)

    def mole_fractions(self, Y: jax.Array) -> jax.Array:
        x = Y * self.inv_W
        return x / jnp.sum(x, axis=-1, keepdims=True)

    def cp_mass(self, T: jax.Array, Y: jax.Array) -> jax.Array:
        return jnp.einsum("...s,...s->...", Y, self.cp_species(T))

    def cv_mass(self, T: jax.Array, Y: jax.Array) -> jax.Array:
        return self.cp_mass(T, Y) - GAS_CONSTANT / self.W_mix(Y)

    def h_mass(self, T: jax.Array, Y: jax.Array) -> jax.Array:
        """Absolute (chemical + sensible) enthalpy [J/kg]."""
        return jnp.einsum("...s,...s->...", Y, self.h_species(T))

    def e_mass(self, T: jax.Array, Y: jax.Array) -> jax.Array:
        """Absolute internal energy [J/kg]: e = h - R T / W."""
        return self.h_mass(T, Y) - GAS_CONSTANT * T / self.W_mix(Y)

    def hs_mass(self, T: jax.Array, Y: jax.Array) -> jax.Array:
        """Sensible enthalpy [J/kg]."""
        return self.h_mass(T, Y) - jnp.einsum("...s,s->...", Y, self.h_formation)

    def psi(self, T: jax.Array, Y: jax.Array) -> jax.Array:
        """Compressibility psi = rho/p = W/(R T) [s^2/m^2]."""
        return self.W_mix(Y) / (GAS_CONSTANT * T)

    def rho(self, p: jax.Array, T: jax.Array, Y: jax.Array) -> jax.Array:
        return p * self.psi(T, Y)

    def gamma(self, T: jax.Array, Y: jax.Array) -> jax.Array:
        cp = self.cp_mass(T, Y)
        return cp / (cp - GAS_CONSTANT / self.W_mix(Y))

    def sound_speed(self, T: jax.Array, Y: jax.Array) -> jax.Array:
        return jnp.sqrt(self.gamma(T, Y) / self.psi(T, Y))

    # ---- inverse property solves (Newton, fixed iteration count) ----
    def T_from_h(self, h: jax.Array, Y: jax.Array, T_guess: jax.Array,
                 iters: int = 8) -> jax.Array:
        """Temperature from absolute enthalpy (per-cell Newton; replaces Cantera
        setState_HP / GPU calculateTemperatureGPU). Fixed iteration count keeps
        the computation shape-static for XLA; 8 Newton steps from a previous-step
        T reach float64 roundoff (quadratic convergence, cp>0 everywhere)."""
        def body(_, T):
            f = self.h_mass(T, Y) - h
            T = T - f / self.cp_mass(T, Y)
            return jnp.clip(T, self.T_min, self.T_max)
        return jax.lax.fori_loop(0, iters, body, jnp.clip(T_guess, self.T_min, self.T_max))

    def T_from_e(self, e: jax.Array, Y: jax.Array, T_guess: jax.Array,
                 iters: int = 8) -> jax.Array:
        """Temperature from absolute internal energy (density-based solver)."""
        def body(_, T):
            f = self.e_mass(T, Y) - e
            T = T - f / self.cv_mass(T, Y)
            return jnp.clip(T, self.T_min, self.T_max)
        return jax.lax.fori_loop(0, iters, body, jnp.clip(T_guess, self.T_min, self.T_max))


def make_thermo(mech: Mechanism, dtype=jnp.float64) -> ThermoData:
    W = np.asarray(mech.molecular_weights)
    # formation enthalpy at 298.15 K (mass basis), computed host-side in f64
    a = np.where((T_STD < mech.nasa_T_mid)[:, None], mech.nasa_low, mech.nasa_high)
    t = T_STD
    h_RT = (a[:, 0] + t * (a[:, 1] / 2 + t * (a[:, 2] / 3 + t * (a[:, 3] / 4 + t * a[:, 4] / 5)))
            + a[:, 5] / t)
    h_form = h_RT * GAS_CONSTANT * T_STD / W
    return ThermoData(
        W=jnp.asarray(W, dtype),
        inv_W=jnp.asarray(1.0 / W, dtype),
        T_mid=jnp.asarray(mech.nasa_T_mid, dtype),
        coeffs_low=jnp.asarray(mech.nasa_low, dtype),
        coeffs_high=jnp.asarray(mech.nasa_high, dtype),
        h_formation=jnp.asarray(h_form, dtype),
        T_min=float(max(np.min(mech.nasa_T_low), 100.0)),
        T_max=float(np.max(mech.nasa_T_high)),
    )
