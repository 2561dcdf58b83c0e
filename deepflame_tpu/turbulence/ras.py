"""RAS turbulence: standard k-epsilon model.

Role parity: the standard OpenFOAM RAS family available through the
reference's rebuilt TurbulenceModels framework (/root/reference/src/
TurbulenceModels, SURVEY.md §2.8 "Standard OpenFOAM RAS (kEpsilon etc.)").

The model owns two transported fields (k, epsilon) carried in the solver
state's `turb` slot and advanced with the same implicit FV machinery as the
species equations. mu_t = rho Cmu k^2/eps.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..mesh.structured import StructuredMesh, pad_field
from ..ops.fv import fvm_ddt, fvm_div, fvm_laplacian, fvm_source_implicit, \
    grad, interpolate
from ..ops.linsolve import solve_fvmatrix

__all__ = ["KEpsilon"]


@dataclasses.dataclass(frozen=True)
class KEpsilon:
    """Standard k-epsilon (Launder-Spalding constants)."""
    kind: str = "kEpsilon"
    Cmu: float = 0.09
    C1: float = 1.44
    C2: float = 1.92
    sigma_k: float = 1.0
    sigma_eps: float = 1.3
    Pr_t: float = 0.85
    Sc_t: float = 0.7
    k_min: float = 1e-10
    eps_min: float = 1e-12

    def mu_t_from(self, rho, k, eps):
        return rho * self.Cmu * k * k / jnp.maximum(eps, self.eps_min)

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
        eqn_e = (fvm_ddt(rho, eps, dt, mesh, bcs_scalar, coeff_old=rho_old)
                 + fvm_div(phi, eps, mesh, bcs_scalar, "upwind")
                 + fvm_laplacian(De, mesh, bcs_scalar, dtype=dtype, sign=-1.0)
                 + fvm_source_implicit(self.C2 * rho * inv_tau, mesh,
                                       bcs_scalar, dtype=dtype))
        eqn_e = eqn_e.with_source(self.C1 * P * inv_tau)
        eps_new = jnp.maximum(solve_fvmatrix(eqn_e, eps, tol=tol,
                                             max_iter=max_iter).x,
                              self.eps_min)
        mu_t_new = self.mu_t_from(rho, k_new, eps_new)
        return k_new, eps_new, mu_t_new
