"""RAS turbulence: k-epsilon (standard + RNG) and k-omega SST models.

Role parity: the standard OpenFOAM RAS family available through the
reference's rebuilt TurbulenceModels framework (/root/reference/src/
TurbulenceModels, SURVEY.md §2.8 "Standard OpenFOAM RAS (kEpsilon etc.)").

Each model owns two transported fields carried in the solver state's `turb`
slot and advanced with the same implicit FV machinery as the species
equations. kEpsilon: (k, eps), mu_t = rho Cmu k^2/eps. kOmegaSST:
(k, omega), mu_t = rho a1 k / max(a1 omega, S F2) with Menter's F1/F2
wall-distance blending.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..mesh.structured import StructuredMesh, pad_field
from ..ops.fv import fvm_ddt, fvm_div, fvm_laplacian, fvm_source_implicit, \
    grad, interpolate
from ..ops.linsolve import solve_fvmatrix

__all__ = ["KEpsilon", "KOmegaSST", "wall_distance"]


def wall_distance(mesh: StructuredMesh, walls):
    """Distance to the nearest wall plane for box meshes. walls: iterable of
    (axis, side) boundary planes treated as no-slip walls (the structured
    analogue of OpenFOAM's wallDist used by kOmegaSST). No walls -> a large
    distance (the model degenerates to its free-shear branch)."""
    X, Y, Z = mesh.cell_centers()
    C = (X, Y, Z)
    lo = (mesh.x0, mesh.y0, mesh.z0)
    ext = (mesh.nx * mesh.dx, mesh.ny * mesh.dy, mesh.nz * mesh.dz)
    d = jnp.full(mesh.shape, 1e10, X.dtype)
    for (ax, side) in walls:
        plane = lo[ax] if side == 0 else lo[ax] + ext[ax]
        d = jnp.minimum(d, jnp.abs(C[ax] - plane))
    return d


@dataclasses.dataclass(frozen=True)
class KEpsilon:
    """k-epsilon: standard (Launder-Spalding) or RNG variant (Yakhot et al.,
    OpenFOAM RNGkEpsilon constants: Cmu 0.0845, C1 1.42, C2 1.68,
    eta0 4.38, beta 0.012, with the strain-dependent C1* correction)."""
    kind: str = "kEpsilon"
    is_ras: bool = True
    variant: str = "standard"   # standard | RNG
    Cmu: float = 0.09
    C1: float = 1.44
    C2: float = 1.92
    sigma_k: float = 1.0
    sigma_eps: float = 1.3
    eta0: float = 4.38          # RNG
    beta_rng: float = 0.012     # RNG
    Pr_t: float = 0.85
    Sc_t: float = 0.7
    k_min: float = 1e-10
    eps_min: float = 1e-12
    wall_fns: Any = None        # WallFunctions (turbulence/wall_functions.py)

    @staticmethod
    def rng(**kw):
        """RNG k-epsilon with its published constants."""
        return KEpsilon(variant="RNG", Cmu=0.0845, C1=1.42, C2=1.68,
                        sigma_k=0.71942, sigma_eps=0.71942, **kw)

    def mu_t_from(self, rho, k, eps):
        return rho * self.Cmu * k * k / jnp.maximum(eps, self.eps_min)

    def k_eps(self, turb):
        """(k, epsilon) view of the transported pair (for combustion models
        needing eddy timescales)."""
        return turb[0], turb[1]

    def initial_fields(self, shape, dtype, k0: float = 1e-3,
                       eps0: float = 1e-2):
        return (jnp.full(shape, k0, dtype), jnp.full(shape, eps0, dtype))

    def advance(self, k, eps, rho, rho_old, phi, U, mu, bcs_U, bcs_scalar,
                mesh: StructuredMesh, dt, tol: float = 1e-8,
                max_iter: int = 100):
        """One implicit update of (k, eps); returns (k, eps, mu_t)."""
        dtype = k.dtype
        mu_t = self.mu_t_from(rho, k, eps)
        # production P = mu_t * 2 S:S (incompressible-form shear production)
        gU = [grad(U[c], bcs_U[c], mesh) for c in range(3)]
        SS = 0.0
        for i in range(3):
            for j in range(3):
                Sij = 0.5 * (gU[i][j] + gU[j][i])
                SS = SS + Sij * Sij
        P = mu_t * 2.0 * SS
        # realizability production limiter (Menter clip, as in the face-list
        # k-eps): at sharp density fronts unbounded P outruns the lagged
        # dissipation and k diverges within a few steps
        P = jnp.minimum(P, 10.0 * rho * jnp.maximum(eps, self.eps_min))
        wf = self.wall_fns
        if wf is not None:
            # wall-layer production + log-layer eddy viscosity
            # (epsilonWallFunction::calculate + nutkWallFunction). G must
            # use the wall-function nutw, not the transported-k mu_t —
            # see low_mach_fl._keps_advance for the spurious-equilibrium
            # analysis (OpenFOAM uses the nut boundary field here).
            mut_w = rho * wf.nut(rho, k, mu)
            G_w = wf.production(rho, k, mu, mut_w, U, bcs_U, mesh)
            P = wf.apply_mask(G_w, P)
            mu_t = wf.apply_mask(mut_w, mu_t)

        def diff_face(gamma):
            return tuple(interpolate(pad_field(gamma, bcs_scalar, mesh), ax)
                         for ax in range(3))

        # k equation: ddt + div - lap = P - rho eps  (eps sink implicit via
        # Sp(rho eps/k))
        Dk = diff_face(mu + mu_t / self.sigma_k)
        sp_k = rho * eps / jnp.maximum(k, self.k_min)
        eqn_k = (fvm_ddt(rho, k, dt, mesh, bcs_scalar, coeff_old=rho_old)
                 + fvm_div(phi, k, mesh, bcs_scalar, "upwind")
                 + fvm_laplacian(Dk, mesh, bcs_scalar, dtype=dtype, sign=-1.0)
                 + fvm_source_implicit(sp_k, mesh, bcs_scalar, dtype=dtype))
        eqn_k = eqn_k.with_source(P)
        k_new = jnp.maximum(solve_fvmatrix(eqn_k, k, tol=tol,
                                           max_iter=max_iter).x, self.k_min)

        # epsilon equation
        De = diff_face(mu + mu_t / self.sigma_eps)
        inv_tau = eps / jnp.maximum(k_new, self.k_min)
        C1_eff = self.C1
        if self.variant == "RNG":
            # strain-dependent C1* = C1 - eta(1-eta/eta0)/(1+beta eta^3)
            S_mag = jnp.sqrt(2.0 * SS)
            eta = S_mag * k_new / jnp.maximum(eps, self.eps_min)
            C1_eff = self.C1 - eta * (1.0 - eta / self.eta0) \
                / (1.0 + self.beta_rng * eta**3)
        eqn_e = (fvm_ddt(rho, eps, dt, mesh, bcs_scalar, coeff_old=rho_old)
                 + fvm_div(phi, eps, mesh, bcs_scalar, "upwind")
                 + fvm_laplacian(De, mesh, bcs_scalar, dtype=dtype, sign=-1.0)
                 + fvm_source_implicit(self.C2 * rho * inv_tau, mesh,
                                       bcs_scalar, dtype=dtype))
        eqn_e = eqn_e.with_source(C1_eff * P * inv_tau)
        eps_new = jnp.maximum(solve_fvmatrix(eqn_e, eps, tol=tol,
                                             max_iter=max_iter).x,
                              self.eps_min)
        mu_t_new = self.mu_t_from(rho, k_new, eps_new)
        if wf is not None:
            # epsilonWallFunction fixed value + nutk eddy viscosity
            eps_new = wf.apply_mask(wf.epsilon(k_new), eps_new)
            mu_t_new = wf.apply_mask(rho * wf.nut(rho, k_new, mu), mu_t_new)
        return k_new, eps_new, mu_t_new


@dataclasses.dataclass(frozen=True)
class KOmegaSST:
    """Menter k-omega SST (2003 form, OpenFOAM kOmegaSST constants).

    Transported pair (k, omega); mu_t = rho a1 k / max(a1 omega, S F2);
    F1/F2 blend the k-omega near-wall and k-epsilon free-stream branches
    using the wall distance (supply `y` from wall_distance(mesh, walls);
    wall-less domains get the free-shear branch everywhere)."""
    kind: str = "kOmegaSST"
    is_ras: bool = True
    y: jax.Array = None          # wall distance field (mesh.shape)
    alpha_k1: float = 0.85
    alpha_k2: float = 1.0
    alpha_w1: float = 0.5
    alpha_w2: float = 0.856
    beta1: float = 0.075
    beta2: float = 0.0828
    beta_star: float = 0.09
    gamma1: float = 5.0 / 9.0
    gamma2: float = 0.44
    a1: float = 0.31
    Pr_t: float = 0.85
    Sc_t: float = 0.7
    k_min: float = 1e-10
    w_min: float = 1e-6
    wall_fns: Any = None        # WallFunctions (turbulence/wall_functions.py)

    def k_eps(self, turb):
        k, w = turb
        return k, self.beta_star * k * jnp.maximum(w, self.w_min)

    def initial_fields(self, shape, dtype, k0: float = 1e-3,
                       eps0: float = 1e-2):
        # convert the (k0, eps0) convention: omega = eps/(beta* k)
        w0 = eps0 / (self.beta_star * max(k0, 1e-12))
        return (jnp.full(shape, k0, dtype), jnp.full(shape, w0, dtype))

    def mu_t_from(self, rho, k, w, S_mag=None, F2=None):
        w = jnp.maximum(w, self.w_min)
        if S_mag is None or F2 is None:
            return rho * k / w
        return rho * self.a1 * k / jnp.maximum(self.a1 * w, S_mag * F2)

    def _blend(self, c1, c2, F1):
        return F1 * c1 + (1.0 - F1) * c2

    def advance(self, k, w, rho, rho_old, phi, U, mu, bcs_U, bcs_scalar,
                mesh: StructuredMesh, dt, tol: float = 1e-8,
                max_iter: int = 100):
        """One implicit update of (k, omega); returns (k, omega, mu_t)."""
        dtype = k.dtype
        w = jnp.maximum(w, self.w_min)
        nu = mu / rho
        y = self.y if self.y is not None \
            else jnp.full(mesh.shape, 1e10, dtype)
        y2 = jnp.maximum(y, 1e-10) ** 2

        gU = [grad(U[c], bcs_U[c], mesh) for c in range(3)]
        SS = 0.0
        for i in range(3):
            for j in range(3):
                Sij = 0.5 * (gU[i][j] + gU[j][i])
                SS = SS + Sij * Sij
        S_mag = jnp.sqrt(2.0 * SS)

        gk = grad(k, bcs_scalar, mesh)
        gw = grad(w, bcs_scalar, mesh)
        gkgw = sum(gk[a] * gw[a] for a in range(3))
        CDkw = jnp.maximum(2.0 * rho * self.alpha_w2 / w * gkgw, 1e-10)
        arg1 = jnp.minimum(
            jnp.maximum(jnp.sqrt(jnp.maximum(k, self.k_min))
                        / (self.beta_star * w * jnp.sqrt(y2)),
                        500.0 * nu / (jnp.sqrt(y2) ** 2 * w)),
            4.0 * rho * self.alpha_w2 * k / (CDkw * y2))
        F1 = jnp.tanh(jnp.minimum(arg1, 20.0) ** 4)
        arg2 = jnp.maximum(
            2.0 * jnp.sqrt(jnp.maximum(k, self.k_min))
            / (self.beta_star * w * jnp.sqrt(y2)),
            500.0 * nu / (y2 * w))
        F2 = jnp.tanh(jnp.minimum(arg2, 20.0) ** 2)

        mu_t = self.mu_t_from(rho, k, w, S_mag, F2)
        # production, limited to 10 beta* rho k omega (Menter limiter)
        Pk = jnp.minimum(mu_t * 2.0 * SS, 10.0 * self.beta_star * rho * k * w)
        wf = self.wall_fns
        if wf is not None:
            mut_w = rho * wf.nut(rho, k, mu)
            Pk = wf.apply_mask(wf.production(rho, k, mu, mut_w, U, bcs_U,
                                             mesh), Pk)
            mu_t = wf.apply_mask(mut_w, mu_t)

        def diff_face(gamma):
            return tuple(interpolate(pad_field(gamma, bcs_scalar, mesh), ax)
                         for ax in range(3))

        # k equation
        Dk = diff_face(mu + self._blend(self.alpha_k1, self.alpha_k2, F1)
                       * mu_t)
        sp_k = self.beta_star * rho * w
        eqn_k = (fvm_ddt(rho, k, dt, mesh, bcs_scalar, coeff_old=rho_old)
                 + fvm_div(phi, k, mesh, bcs_scalar, "upwind")
                 + fvm_laplacian(Dk, mesh, bcs_scalar, dtype=dtype, sign=-1.0)
                 + fvm_source_implicit(sp_k, mesh, bcs_scalar, dtype=dtype))
        eqn_k = eqn_k.with_source(Pk)
        k_new = jnp.maximum(solve_fvmatrix(eqn_k, k, tol=tol,
                                           max_iter=max_iter).x, self.k_min)

        # omega equation
        gamma = self._blend(self.gamma1, self.gamma2, F1)
        beta = self._blend(self.beta1, self.beta2, F1)
        Dw = diff_face(mu + self._blend(self.alpha_w1, self.alpha_w2, F1)
                       * mu_t)
        # production gamma rho/mu_t Pk ~ gamma rho 2 SS (high-Re form)
        Pw = gamma * rho * jnp.minimum(2.0 * SS,
                                       10.0 * self.beta_star * w * w
                                       / jnp.maximum(self.a1, 1e-3))
        cross = 2.0 * (1.0 - F1) * rho * self.alpha_w2 / w * gkgw
        eqn_w = (fvm_ddt(rho, w, dt, mesh, bcs_scalar, coeff_old=rho_old)
                 + fvm_div(phi, w, mesh, bcs_scalar, "upwind")
                 + fvm_laplacian(Dw, mesh, bcs_scalar, dtype=dtype, sign=-1.0)
                 + fvm_source_implicit(beta * rho * w, mesh, bcs_scalar,
                                       dtype=dtype))
        eqn_w = eqn_w.with_source(Pw + cross)
        w_new = jnp.maximum(solve_fvmatrix(eqn_w, w, tol=tol,
                                           max_iter=max_iter).x, self.w_min)
        if wf is not None:
            # omegaWallFunction blended fixed value
            w_new = wf.apply_mask(wf.omega(rho, k_new, mu, self.beta1),
                                  w_new)
        mu_t_new = self.mu_t_from(rho, k_new, w_new, S_mag, F2)
        if wf is not None:
            mu_t_new = wf.apply_mask(rho * wf.nut(rho, k_new, mu), mu_t_new)
        return k_new, w_new, mu_t_new
