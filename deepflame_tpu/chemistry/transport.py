"""Mixture-averaged transport: kinetic-theory property fits, JAX evaluation.

Role parity: replaces Cantera's `MixTransport`/`UnityLewisTransport` used by
the reference mixture (/root/reference/src/dfCanteraMixture/CanteraMixture.H:71-72
`Mix`/`UnityLewis` transport models) and the GPU polynomial-table transport
(/root/reference/src_gpu/dfThermo.H:29-35: binary-file viscosity/conductivity/
binary-diffusion polynomial tables, Wilke mixture rule).

Approach (same shape as the reference GPU path): per-species property curves are
fit once, host-side in float64, as degree-4 polynomials in ln T of
ln(mu), ln(lambda) and ln(D_jk * p); at runtime JAX evaluates the polynomials
and applies mixture rules (Wilke for viscosity, Mathur-Saxena averaging for
conductivity, mixture-averaged Fickian diffusion) — all elementwise/einsum ops.

Collision integrals use the Neufeld (1972) empirical correlations with
Stockmayer polar corrections; pure-species conductivity uses the
Parker-Brau-Jonkman rotational relaxation formulation (Kee, Coltrin, Glarborg).
Accuracy vs Cantera's tabulated collision integrals is ~1-2% — well inside the
modeling error of mixture-averaged transport.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AVOGADRO, BOLTZMANN, GAS_CONSTANT
from .mechanism import Mechanism

__all__ = ["TransportData", "make_transport"]

_N_FIT = 50
_DEGREE = 4


def _omega22(t_star, delta_star):
    o = (1.16145 * t_star**-0.14874 + 0.52487 * np.exp(-0.7732 * t_star)
         + 2.16178 * np.exp(-2.43787 * t_star))
    return o + 0.2 * delta_star**2 / t_star


def _omega11(t_star, delta_star):
    o = (1.06036 * t_star**-0.15610 + 0.19300 * np.exp(-0.47635 * t_star)
         + 1.03587 * np.exp(-1.52996 * t_star) + 1.76474 * np.exp(-3.89411 * t_star))
    return o + 0.19 * delta_star**2 / t_star


def _cp_R_np(mech: Mechanism, T: np.ndarray) -> np.ndarray:
    """(nT, ns) cp/R from NASA7, numpy."""
    a = np.where((T[:, None] < mech.nasa_T_mid[None, :])[..., None],
                 mech.nasa_low[None], mech.nasa_high[None])
    t = T[:, None]
    return a[..., 0] + t * (a[..., 1] + t * (a[..., 2] + t * (a[..., 3] + t * a[..., 4])))


class TransportData(NamedTuple):
    mu_coeffs: jax.Array    # (ns, deg+1) polyfit of ln(mu) in ln(T)
    lam_coeffs: jax.Array   # (ns, deg+1) polyfit of ln(lambda) in ln(T)
    diff_coeffs: jax.Array  # (ns, ns, deg+1) polyfit of ln(D_jk * p) in ln(T)
    W: jax.Array            # (ns,)
    inv_W: jax.Array

    def mu_species(self, T: jax.Array) -> jax.Array:
        """(..., ns) pure-species viscosity [Pa s]."""
        lnT = jnp.log(T)[..., None]
        return jnp.exp(_polyval(self.mu_coeffs, lnT))

    def lambda_species(self, T: jax.Array) -> jax.Array:
        lnT = jnp.log(T)[..., None]
        return jnp.exp(_polyval(self.lam_coeffs, lnT))

    def binary_diff(self, T: jax.Array, p: jax.Array) -> jax.Array:
        """(..., ns, ns) binary diffusion coefficients [m^2/s]."""
        lnT = jnp.log(T)[..., None, None]
        return jnp.exp(_polyval(self.diff_coeffs, lnT)) / p[..., None, None]

    def mu_mix(self, T: jax.Array, X: jax.Array) -> jax.Array:
        """Wilke mixture viscosity. X: mole fractions (..., ns).

        Separable form (round 5, exact): phi_kj = (1 + u_k v_j)^2 / d_kj
        with u_k = sqrt(mu_k) W_k^{-1/4}, v_j = W_j^{1/4}/sqrt(mu_j),
        d_kj = sqrt(8 (1 + W_k/W_j)), so the Wilke denominator
        sum_j X_j phi_kj expands into THREE (cells, ns) @ (ns, ns)
        matmuls with constant matrices — no (cells, ns, ns) pairwise
        intermediate (287 MB and ~8 ms/step at 96^3 in the naive form)."""
        mu = self.mu_species(T)
        rW4 = self.W ** 0.25                                        # W^(1/4)
        u = jnp.sqrt(mu) / rW4                                      # (..., k)
        v = rW4 / jnp.sqrt(mu)                                      # (..., j)
        inv_d = 1.0 / jnp.sqrt(8.0 * (1.0 + self.W[:, None]
                                      / self.W[None, :]))           # (k, j)
        A = inv_d.T                                                 # (j, k)
        denom = (X @ A + 2.0 * u * ((X * v) @ A)
                 + (u * u) * ((X * v * v) @ A))
        return jnp.sum(X * mu / denom, axis=-1)

    def lambda_mix(self, T: jax.Array, X: jax.Array) -> jax.Array:
        """Mathur-Saxena average: 0.5 (sum x l + 1/sum(x/l))."""
        lam = self.lambda_species(T)
        return 0.5 * (jnp.sum(X * lam, axis=-1)
                      + 1.0 / jnp.sum(X / lam, axis=-1))

    def mix_diff_coeffs(self, T: jax.Array, p: jax.Array, X: jax.Array,
                        Y: jax.Array) -> jax.Array:
        """(..., ns) mixture-averaged D_km (mass-flux form):
        D_km = (1 - Y_k) / sum_{j != k} X_j / D_jk.

        Computed as ONE fused (cells, ns, ns) pass: 1/D_jk = p exp(-poly)
        produced directly inside the masked reduction (the two-stage
        Djk -> 1/Djk form materialized the 287 MB pairwise array twice)."""
        lnT = jnp.log(T)[..., None, None]
        inv_no_p = jnp.exp(-_polyval(self.diff_coeffs, lnT))        # 1/(D p)
        ns = inv_no_p.shape[-1]
        mask = 1.0 - jnp.eye(ns, dtype=X.dtype)
        denom = jnp.einsum("...j,...kj->...k", X, inv_no_p * mask) * p[..., None]
        tiny = jnp.asarray(jnp.finfo(X.dtype).eps, X.dtype)
        # pure-species limit: D_km -> D_kk (self-diffusion dominated);
        # evaluated from the DIAGONAL fits only ((ns,) polynomial)
        diag_c = jnp.diagonal(self.diff_coeffs, axis1=0, axis2=1)   # (deg+1, ns)
        Dkk = jnp.exp(_polyval(jnp.moveaxis(diag_c, 0, -1),
                               jnp.log(T)[..., None])) / p[..., None]
        return jnp.where(denom > tiny, (1.0 - Y) / jnp.maximum(denom, tiny), Dkk)


def _polyval(coeffs: jax.Array, lnT: jax.Array) -> jax.Array:
    """Horner evaluation, highest power first. coeffs (*dims, deg+1); lnT has
    trailing singleton dims so it broadcasts against *dims (e.g. lnT (..., 1)
    against coeffs (ns, deg+1) -> result (..., ns))."""
    out = coeffs[..., 0]
    for k in range(1, coeffs.shape[-1]):
        out = out * lnT + coeffs[..., k]
    return out


def make_transport(mech: Mechanism, dtype=jnp.float64,
                   T_range=(250.0, 3500.0)) -> TransportData:
    ns = mech.n_species
    W = mech.molecular_weights                      # kg/kmol
    m = W / AVOGADRO                                # kg/molecule
    eps = mech.well_depth                           # K (eps/kB)
    sigma = mech.diameter                           # m
    mu_dip = mech.dipole                            # C m
    kB = BOLTZMANN

    # reduced dipole delta* = mu^2 / (2 eps kB sigma^3), dimensionless
    delta = mu_dip**2 / (2.0 * eps * kB * sigma**3 + 1e-300)
    delta = np.where(eps > 0, delta, 0.0)

    Ts = np.exp(np.linspace(np.log(T_range[0]), np.log(T_range[1]), _N_FIT))
    lnTs = np.log(Ts)
    cp_R = _cp_R_np(mech, Ts)                       # (nT, ns)

    # --- pure-species viscosity ---
    t_star = Ts[:, None] / eps[None, :]
    om22 = _omega22(t_star, delta[None, :])
    mu_k = (5.0 / 16.0) * np.sqrt(np.pi * m * kB * Ts[:, None]) / (np.pi * sigma**2 * om22)

    # --- self & binary diffusion (times pressure) ---
    # combining rules
    sig_jk = 0.5 * (sigma[:, None] + sigma[None, :])
    eps_jk = np.sqrt(eps[:, None] * eps[None, :])
    m_jk = m[:, None] * m[None, :] / (m[:, None] + m[None, :])
    # polar/nonpolar xi correction (Stockmayer): only for polar-with-polar pairs
    delta_jk = np.sqrt(delta[:, None] * delta[None, :])
    Dp = np.empty((_N_FIT, ns, ns))
    for it, T in enumerate(Ts):
        ts = T / eps_jk
        om11 = _omega11(ts, delta_jk)
        Dp[it] = (3.0 / 16.0) * np.sqrt(2.0 * np.pi * kB**3 * T**3 / m_jk) / (
            np.pi * sig_jk**2 * om11)               # D * p [m^2/s * Pa]

    # --- pure-species conductivity (Kee et al. formulation) ---
    R = GAS_CONSTANT
    cv_R = cp_R - 1.0                               # Cv/R per species
    geom = mech.geometry
    cv_rot_R = np.where(geom == 0, 0.0, np.where(geom == 1, 1.0, 1.5))[None, :]
    cv_tr_R = 1.5
    cv_vib_R = np.maximum(cv_R - cv_tr_R - cv_rot_R, 0.0)
    # rho * D_kk / mu with rho = p W/(R T): f_vib ("self-diffusion ratio")
    Dkk_p = np.stack([np.diag(Dp[it]) for it in range(_N_FIT)])     # (nT, ns) D_kk * p
    rhoD_over_mu = Dkk_p * (W[None, :] / (R * Ts[:, None])) / mu_k

    def parker(Teps):
        """Parker-Brau-Jonkman F(T) with T/eps argument."""
        x = 1.0 / np.maximum(Teps, 1e-12)
        return (1.0 + 0.5 * np.pi**1.5 * np.sqrt(x) + (0.25 * np.pi**2 + 2.0) * x
                + np.pi**1.5 * x**1.5)

    F298 = parker(298.0 / np.maximum(eps, 1e-12))[None, :]
    FT = parker(Ts[:, None] / np.maximum(eps, 1e-12)[None, :])
    z_rot = np.maximum(mech.rot_relax[None, :], 1.0) * F298 / FT

    A = 2.5 - rhoD_over_mu
    B = z_rot + (2.0 / np.pi) * ((5.0 / 3.0) * cv_rot_R + rhoD_over_mu)
    f_tr = 2.5 * (1.0 - (2.0 / np.pi) * (cv_rot_R / cv_tr_R) * (A / B))
    f_rot = rhoD_over_mu * (1.0 + 2.0 * A / (np.pi * B))
    f_vib = rhoD_over_mu
    lam_k = (mu_k / (W[None, :] / 1.0)) * R * (
        f_tr * cv_tr_R + np.where(geom[None, :] == 0, 0.0, f_rot * cv_rot_R)
        + f_vib * cv_vib_R)

    # --- fits in ln T ---
    mu_fit = np.stack([np.polyfit(lnTs, np.log(mu_k[:, k]), _DEGREE) for k in range(ns)])
    lam_fit = np.stack([np.polyfit(lnTs, np.log(np.maximum(lam_k[:, k], 1e-10)), _DEGREE)
                        for k in range(ns)])
    d_fit = np.empty((ns, ns, _DEGREE + 1))
    for j in range(ns):
        for k in range(ns):
            d_fit[j, k] = np.polyfit(lnTs, np.log(Dp[:, j, k]), _DEGREE)

    f = lambda x: jnp.asarray(x, dtype)
    return TransportData(
        mu_coeffs=f(mu_fit), lam_coeffs=f(lam_fit), diff_coeffs=f(d_fit),
        W=f(W), inv_W=f(1.0 / W),
    )
