"""LES subgrid-scale turbulence models.

Role parity: /root/reference/src/TurbulenceModels/ — the compressible
turbulence framework with the reference's two added LES models:
`dynamicSmagorinsky` (dynamic Cs via test filter, dynamicSmagorinsky.H:76-90)
and `Sigma` (singular-value eddy viscosity, coeff Csigma=1.5, Sigma.H:28-44,87),
plus the standard OpenFOAM Smagorinsky/WALE family available through the
framework (makeTurbulentFluidThermoModels.C).

All models are local tensor algebra on the velocity gradient — pure VPU work,
fused into the solver step. The solver consumes mu_t via effective transport
coefficients (mu_eff, alpha_eff = alpha + mu_t/Pr_t, rhoD_eff = rhoD +
mu_t/Sc_t), exactly how the reference's solvers consume
turbulence->muEff()/alphaEff().
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..mesh.structured import StructuredMesh, pad_field
from ..ops.fv import grad

__all__ = ["LESModel", "smagorinsky", "wale", "sigma_model",
           "dynamic_smagorinsky"]


@dataclasses.dataclass(frozen=True)
class LESModel:
    """SGS model selector. kind: Smagorinsky | WALE | Sigma |
    dynamicSmagorinsky. delta: filter width (cube-root cell volume)."""
    kind: str = "Smagorinsky"
    Cs: float = 0.167          # Smagorinsky
    Cw: float = 0.325          # WALE
    Csigma: float = 1.5        # Sigma (reference Sigma.H:44 Csg = 1.5)
    Pr_t: float = 0.85
    Sc_t: float = 0.7
    mu_t_max_ratio: float = 1e5

    def sgs_k_epsilon(self, mu_t, rho, mesh: StructuredMesh):
        """SGS kinetic energy and dissipation from equilibrium scaling
        (k = (nu_t/(Ck delta))^2, eps = Ce k^1.5/delta; Ck=0.094, Ce=1.048 —
        the OpenFOAM LES eddyViscosity convention the reference's EDC/PaSR
        consume via turbulence().k()/epsilon())."""
        delta = (mesh.dx * mesh.dy * mesh.dz) ** (1.0 / 3.0)
        Ck, Ce = 0.094, 1.048
        nu_t = mu_t / rho
        k = (nu_t / (Ck * delta)) ** 2
        eps = Ce * k ** 1.5 / delta
        return k, eps

    def mu_t(self, rho, U, bcs_U, mesh: StructuredMesh):
        delta = (mesh.dx * mesh.dy * mesh.dz) ** (1.0 / 3.0)
        g = _grad_U(U, bcs_U, mesh)            # (3, 3, nx, ny, nz): g[i][j] = dU_i/dx_j
        if self.kind == "dynamicSmagorinsky":
            return rho * _dyn_smag_nut(g, U, bcs_U, mesh, delta)
        return rho * self._nut_from_grad(g, delta)

    def _nut_from_grad(self, g, delta):
        """Shape-agnostic SGS viscosity from a velocity gradient (3, 3, ...)
        — shared by the structured and face-list backends."""
        if self.kind == "Smagorinsky":
            return _smag_nut(g, self.Cs, delta)
        if self.kind == "WALE":
            return _wale_nut(g, self.Cw, delta)
        if self.kind == "Sigma":
            return _sigma_nut(g, self.Csigma, delta)
        raise ValueError(self.kind)

    # ------------------------------------------------- face-list backend
    def mu_t_fl(self, rho, U, m_U, volumes):
        """SGS viscosity on a FaceListMesh: g from the Gauss cell gradient
        per component (ops/fv_facelist.grad_fl), delta = V^(1/3) per cell
        (OpenFOAM cubeRootVol LESdelta). dynamicSmagorinsky needs a test
        filter (structured box filter) — not available on general meshes
        (same limitation as the reference: dynamicSmagorinsky.H needs an
        LESfilter; use WALE/Sigma on unstructured cases)."""
        from ..ops.fv_facelist import grad_multi_fl
        if self.kind == "dynamicSmagorinsky":
            raise ValueError("dynamicSmagorinsky needs a structured test "
                             "filter; use Smagorinsky/WALE/Sigma on "
                             "face-list meshes")
        delta = volumes ** (1.0 / 3.0)          # (n,)
        gU = grad_multi_fl(m_U, U)              # (n, 3, 3): [n, i, j]
        g = jnp.moveaxis(gU, 0, -1)             # (3, 3, n): g[i,j]=dU_i/dx_j
        return rho * self._nut_from_grad(g, delta)

    def sgs_k_epsilon_fl(self, mu_t, rho, volumes):
        """Per-cell-delta variant of sgs_k_epsilon for face-list meshes."""
        delta = volumes ** (1.0 / 3.0)
        Ck, Ce = 0.094, 1.048
        nu_t = mu_t / rho
        k = (nu_t / (Ck * delta)) ** 2
        eps = Ce * k ** 1.5 / delta
        return k, eps


def smagorinsky(**kw) -> LESModel:
    return LESModel(kind="Smagorinsky", **kw)


def wale(**kw) -> LESModel:
    return LESModel(kind="WALE", **kw)


def sigma_model(**kw) -> LESModel:
    return LESModel(kind="Sigma", **kw)


def dynamic_smagorinsky(**kw) -> LESModel:
    return LESModel(kind="dynamicSmagorinsky", **kw)


def _grad_U(U, bcs_U, mesh):
    return jnp.stack([grad(U[c], bcs_U[c], mesh) for c in range(3)])


def _strain(g):
    """S_ij = 0.5 (g_ij + g_ji): (3, 3, ...)."""
    return 0.5 * (g + jnp.swapaxes(g, 0, 1))


def _smag_nut(g, Cs, delta):
    S = _strain(g)
    magS = jnp.sqrt(2.0 * jnp.sum(S * S, axis=(0, 1)))
    return (Cs * delta) ** 2 * magS


def _wale_nut(g, Cw, delta):
    S = _strain(g)
    g2 = jnp.einsum("ik...,kj...->ij...", g, g)
    tr = jnp.trace(g2, axis1=0, axis2=1)
    eye = jnp.eye(3).reshape(3, 3, *([1] * (g.ndim - 2)))
    Sd = 0.5 * (g2 + jnp.swapaxes(g2, 0, 1)) - eye * tr / 3.0
    SS = jnp.sum(S * S, axis=(0, 1))
    SdSd = jnp.sum(Sd * Sd, axis=(0, 1))
    eps = 1e-30
    return (Cw * delta) ** 2 * SdSd ** 1.5 / (SS ** 2.5 + SdSd ** 1.25 + eps)


def _sigma_nut(g, Csig, delta):
    """Sigma model (Nicoud et al. 2011): D = sigma3 (sigma1 - sigma2)
    (sigma2 - sigma3) / sigma1^2, sigma_i singular values of grad U."""
    # G = g^T g, symmetric PSD; singular values = sqrt(eigenvalues of G).
    # The 6 unique entries are built with explicit elementwise sums: the
    # einsum form lowers to a batched dot whose producer XLA duplicates
    # into the eigenvalue consumers (two 17 ms fusions at 96^3 on the
    # face-list backend)
    def comp(i, j):
        return g[0, i] * g[0, j] + g[1, i] * g[1, j] + g[2, i] * g[2, j]

    l1, l2, l3 = _eig3_sym_comps(comp(0, 0), comp(1, 1), comp(2, 2),
                                 comp(0, 1), comp(0, 2), comp(1, 2))
    s1 = jnp.sqrt(jnp.maximum(l1, 0.0))
    s2 = jnp.sqrt(jnp.maximum(l2, 0.0))
    s3 = jnp.sqrt(jnp.maximum(l3, 0.0))
    D = s3 * (s1 - s2) * (s2 - s3) / jnp.maximum(s1 * s1, 1e-30)
    return (Csig * delta) ** 2 * jnp.maximum(D, 0.0)


def _eig3_sym(A):
    """Analytic eigenvalues of a symmetric 3x3 field (A: (3,3,...)),
    descending order (trigonometric/Cardano method, vectorized)."""
    return _eig3_sym_comps(A[0, 0], A[1, 1], A[2, 2],
                           A[0, 1], A[0, 2], A[1, 2])


def _eig3_sym_comps(a00, a11, a22, a01, a02, a12):
    """Eigenvalues from the 6 unique symmetric components (elementwise)."""
    q = (a00 + a11 + a22) / 3.0
    p1 = a01**2 + a02**2 + a12**2
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    # floor must be representable in the working dtype: 1e-60 underflows to
    # ZERO in f32 (min normal 1.2e-38) and a uniform-flow region (A = q I,
    # p2 = 0 — any laminar coflow) then divides by p = 0 -> NaN
    floor = jnp.asarray(1e-60 if a00.dtype == jnp.float64 else 1e-30,
                        a00.dtype)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, floor))
    # B = (A - q I)/p
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    return e1, e2, e3


def _box_filter(f, bcs, mesh):
    """Top-hat test filter: 27-point (trapezoidal) local average."""
    P = pad_field(f, bcs, mesh)
    out = 0.0
    w_tot = 0.0
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for dk in (-1, 0, 1):
                w = (0.5 if di else 1.0) * (0.5 if dj else 1.0) * (0.5 if dk else 1.0)
                sl = tuple(slice(1 + d, f.shape[a] + 1 + d)
                           for a, d in enumerate((di, dj, dk)))
                out = out + w * P[sl]
                w_tot += w
    return out / w_tot


def _dyn_smag_nut(g, U, bcs_U, mesh, delta):
    """Dynamic Smagorinsky (Germano/Lilly), local-averaged and clipped
    (the reference's dynamicSmagorinsky model computes a Cs field the same
    way, dynamicSmagorinsky.H:76-90)."""
    S = _strain(g)
    magS = jnp.sqrt(2.0 * jnp.sum(S * S, axis=(0, 1)))
    bcs0 = bcs_U[0]
    filt = lambda f: _box_filter(f, bcs0, mesh)
    U_f = jnp.stack([filt(U[c]) for c in range(3)])
    g_f = _grad_U(U_f, bcs_U, mesh)
    S_f = _strain(g_f)
    magS_f = jnp.sqrt(2.0 * jnp.sum(S_f * S_f, axis=(0, 1)))
    alpha = 2.0   # test-to-grid filter width ratio
    L = jnp.stack([jnp.stack([
        filt(U[i] * U[j]) - U_f[i] * U_f[j] for j in range(3)]) for i in range(3)])
    M = jnp.stack([jnp.stack([
        filt(magS * S[i, j]) - alpha**2 * magS_f * S_f[i, j]
        for j in range(3)]) for i in range(3)])
    M = 2.0 * delta**2 * M
    LM = filt(jnp.sum(L * M, axis=(0, 1)))
    MM = filt(jnp.sum(M * M, axis=(0, 1)))
    Cs2 = jnp.clip(LM / jnp.maximum(MM, 1e-30), 0.0, 0.09)
    return Cs2 * delta**2 * magS
