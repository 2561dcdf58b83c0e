"""Finite-volume operators, matrix-free, on structured blocks.

Role parity: the discrete-operator contract of the reference's GPU FVM library
(/root/reference/src_gpu/dfMatrixOpBase.H:84-343 — fvm_ddt/fvm_div/
fvm_laplacian, fvc_grad/fvc_div/fvc_laplacian/fvc_interpolate/fvc_flux, upwind
and limited face weights, boundary-coefficient handling) and of OpenFOAM's
fvm/fvc used by the CPU solvers.

TPU-first design, three ideas:

1. Stencils are shifts. On a structured block every face value is a slice of a
   ghost-padded array; divergence/laplacian are differences of slices. No LDU
   addressing, no gather/scatter, no CSR assembly (the reference's
   ldu_to_csr + AmgX path, dfMatrixOpBase.H:117-125, disappears).

2. Implicit equations are matrix-free linear operators. An FvMatrix is
   A(x) = sum of stencil terms applied with *homogeneous* ghost padding, and
   b = explicit source minus the terms applied to the *inhomogeneous* ghost
   part. This is the exact analogue of OpenFOAM's internalCoeffs/
   boundaryCoeffs split, but as functions XLA can fuse.

3. Exact diagonals by graph coloring. Jacobi/rAU need diag(A); for 7-point
   stencils cells of the same (i%2, j%2, k%2) color are never neighbors, so 8
   masked matvecs recover the exact diagonal of ANY composed operator —
   including all BC contributions — with no per-scheme bookkeeping.
   (PIMPLE's rAU = 1/A and H(U) come straight from this, cf. dfUEqn.cu:713
   fvMtx_A / fvMtx_H.)

Convection schemes: 'upwind' (implicit), 'linear' (implicit central),
'limitedLinear'/'vanLeer' (implicit upwind + explicit deferred limited
anti-diffusion, the standard TVD linearization).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..mesh.structured import (BC, FieldBCs, StructuredMesh, extend_padded,
                               pad_field)

__all__ = [
    "FvMatrix", "face_pair", "interpolate", "grad", "div_flux", "flux_of",
    "laplacian_explicit", "div_explicit", "fvm_ddt", "fvm_div", "fvm_laplacian",
    "fvm_source_implicit", "limited_face_values", "snGrad_boundary",
]

Axis = int


def _trim(f: jax.Array, axis: Axis) -> jax.Array:
    """Trim ghost layers on the two axes other than `axis`."""
    sl = [slice(1, -1)] * 3
    sl[axis] = slice(None)
    return f[tuple(sl)]


def face_pair(P: jax.Array, axis: Axis) -> tuple[jax.Array, jax.Array]:
    """Owner/neighbour cell values for all faces along `axis`.

    P: padded field (n+2 on every axis). Returns two arrays of shape
    (n_axis + 1) on `axis`, interior extent on the others.
    """
    t = _trim(P, axis)
    n = t.shape[axis]
    own = jax.lax.slice_in_dim(t, 0, n - 1, axis=axis)
    nei = jax.lax.slice_in_dim(t, 1, n, axis=axis)
    return own, nei


def _face_diff(F: jax.Array, axis: Axis) -> jax.Array:
    """(F_hi - F_lo) per cell along axis: input has n+1 faces, output n cells."""
    n = F.shape[axis]
    return (jax.lax.slice_in_dim(F, 1, n, axis=axis)
            - jax.lax.slice_in_dim(F, 0, n - 1, axis=axis))


# ---------------------------------------------------------------- explicit ops

def interpolate(P: jax.Array, axis: Axis) -> jax.Array:
    """Linear face interpolation along axis from a padded field."""
    own, nei = face_pair(P, axis)
    return 0.5 * (own + nei)


def interpolate_cubic(P: jax.Array, axis: Axis, bcs: FieldBCs) -> jax.Array:
    """4-point cubic face interpolation (OpenFOAM `cubic` on a uniform mesh:
    linear + gradient correction == (9(P+N) - (W+E))/16). Used for
    div(hDiffCorrFlux) Gauss cubic in the shipped fvSchemes. Falls back to
    a replicated ghost at physical boundaries (first-order there, as the
    reference's boundary handling effectively is)."""
    own, nei = face_pair(P, axis)
    Pm, Pp = extend_padded(P, axis, bcs)
    t = _trim(Pm, axis)
    nfull = t.shape[axis]
    far_own = jax.lax.slice_in_dim(t, 0, nfull - 2, axis=axis)   # own - 1
    tp = _trim(Pp, axis)
    far_nei = jax.lax.slice_in_dim(tp, 2, nfull, axis=axis)      # nei + 1
    return (9.0 * (own + nei) - (far_own + far_nei)) / 16.0


def grad(f: jax.Array, bcs: FieldBCs, mesh: StructuredMesh) -> jax.Array:
    """Gauss-linear cell gradient: (3, nx, ny, nz)."""
    P = pad_field(f, bcs, mesh)
    comps = []
    for ax, h in enumerate(mesh.spacing):
        fv = interpolate(P, ax)
        comps.append(_face_diff(fv, ax) / h)
    return jnp.stack(comps)


def flux_of(rho_u: Sequence[jax.Array], bcs_u, mesh: StructuredMesh,
            ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Face-normal flux density [field·m/s] per axis from a cell vector field.

    rho_u: (3, nx, ny, nz) (e.g. rho*U). Returns per-axis face arrays
    (nx+1, ny, nz), (nx, ny+1, nz), (nx, ny, nz+1).
    """
    out = []
    for ax in range(3):
        P = pad_field(rho_u[ax], bcs_u[ax], mesh)
        out.append(interpolate(P, ax))
    return tuple(out)


def div_flux(phi: Sequence[jax.Array], mesh: StructuredMesh) -> jax.Array:
    """Cell divergence of face fluxes: sum_ax (phi_hi - phi_lo)/h."""
    out = 0.0
    for ax, h in enumerate(mesh.spacing):
        out = out + _face_diff(phi[ax], ax) / h
    return out


def div_explicit(phi, psi: jax.Array, bcs: FieldBCs, mesh: StructuredMesh,
                 scheme: str = "linear", limiter_k: float = 1.0) -> jax.Array:
    """fvc::div(phi, psi): explicit convection divergence."""
    P = pad_field(psi, bcs, mesh)
    out = 0.0
    for ax, h in enumerate(mesh.spacing):
        fv = limited_face_values(P, phi[ax], ax, scheme, limiter_k, bcs)
        out = out + _face_diff(phi[ax] * fv, ax) / h
    return out


def _gamma_ax(gamma_f, ax: Axis):
    """Per-axis diffusivity: accept a scalar or a per-axis tuple of face arrays."""
    if isinstance(gamma_f, (tuple, list)):
        return gamma_f[ax]
    return gamma_f


def laplacian_explicit(gamma_f, f: jax.Array, bcs: FieldBCs,
                       mesh: StructuredMesh) -> jax.Array:
    """fvc::laplacian(gamma, f). gamma_f: per-axis face arrays (or a scalar)."""
    P = pad_field(f, bcs, mesh)
    out = 0.0
    for ax, h in enumerate(mesh.spacing):
        own, nei = face_pair(P, ax)
        out = out + _face_diff(_gamma_ax(gamma_f, ax) * (nei - own) / h, ax) / h
    return out


def snGrad_boundary(f, bcs, mesh):
    """Surface-normal gradients on the 6 boundary patches (for diagnostics)."""
    P = pad_field(f, bcs, mesh)
    grads = {}
    for ax, h in enumerate(mesh.spacing):
        own, nei = face_pair(P, ax)
        g = (nei - own) / h
        n = g.shape[ax]
        grads[(ax, 0)] = jax.lax.slice_in_dim(g, 0, 1, axis=ax)
        grads[(ax, 1)] = jax.lax.slice_in_dim(g, n - 1, n, axis=ax)
    return grads


# ------------------------------------------------------------ face-value schemes

def limited_face_values(P: jax.Array, phi_ax: jax.Array, axis: Axis,
                        scheme: str, k: float = 1.0,
                        bcs: FieldBCs | None = None) -> jax.Array:
    """Face values of psi for convection along `axis` given face flux sign.

    upwind:        psi_f = upwind cell
    linear:        psi_f = central average
    limitedLinear: upwind + limiter * (central - upwind)   [Sweby-limited]
    vanLeer:       upwind + vanLeer(r) * (central - upwind)
    minmod / MUSCL / superBee / QUICK: classic piecewise TVD limiters
    vanAlbada / OSPRE: smooth rational limiters — the role the reference
      fills with its libROUNDSchemes submodule (smooth high-resolution
      bounded convection selectable from fvSchemes; the submodule itself is
      an empty git pointer in the repo, SURVEY.md §2.5)
    """
    own, nei = face_pair(P, axis)
    up = jnp.where(phi_ax >= 0, own, nei)
    if scheme == "upwind":
        return up
    central = 0.5 * (own + nei)
    if scheme == "linear":
        return central
    lim = nvd_limiter(P, phi_ax, axis, scheme, k, bcs)
    return up + lim * (central - up)


def nvd_limiter(P: jax.Array, phi_ax: jax.Array, axis: Axis, scheme: str,
                k: float = 1.0, bcs: FieldBCs | None = None) -> jax.Array:
    """Per-face TVD limiter lim in psi_f = up + lim*(central - up).

    Exposed separately from limited_face_values so multivariate (grouped)
    convection can take the field-wise min of limiters and apply ONE shared
    weight set to every field in the group — OpenFOAM's
    multivariateScheme/multivariateGaussConvectionScheme, used by the
    reference for div(phi,Yi_h) (dfLowMachFoam YEqn.H:6-15, EEqn.H:15)."""
    own, nei = face_pair(P, axis)
    central = 0.5 * (own + nei)
    up = jnp.where(phi_ax >= 0, own, nei)
    # limiter needs the far-upwind value: extend with a second ghost layer
    # (cyclic-exact when bcs provided — keeps the periodic seam conservative)
    if bcs is not None:
        Pm, Pp = extend_padded(P, axis, bcs)
    else:
        n = P.shape[axis]
        Pm = jnp.concatenate([jax.lax.slice_in_dim(P, 0, 1, axis=axis), P], axis=axis)
        Pp = jnp.concatenate([P, jax.lax.slice_in_dim(P, n - 1, n, axis=axis)], axis=axis)
    t = _trim(Pm, axis)  # indices shifted by +1 relative to P's trim
    nfull = t.shape[axis]
    far_own = jax.lax.slice_in_dim(t, 0, nfull - 2, axis=axis)   # own - 1
    tp = _trim(Pp, axis)
    far_nei = jax.lax.slice_in_dim(tp, 2, nfull, axis=axis)      # nei + 1
    d = nei - own
    eps = jnp.asarray(jnp.finfo(P.dtype).eps, P.dtype)
    safe_d = jnp.where(jnp.abs(d) > eps, d, eps)
    r_pos = (own - far_own) / safe_d          # upwind gradient ratio, flux > 0
    r_neg = (nei - far_nei) / (-safe_d)
    r = jnp.where(phi_ax >= 0, r_pos, r_neg)
    if scheme in ("limitedLinear", "limitedLinear01"):
        # OpenFOAM limitedLinear k: psi = max(min(2r/k, 1), 0) blended to linear
        lim = jnp.clip(2.0 * r / k, 0.0, 1.0)
        if scheme == "limitedLinear01":
            # limited01 wrapper (OpenFOAM Limited01, used for div(phi,Yi) in
            # every shipped low-Mach case): additionally limit the limiter so
            # the face value stays in [0,1] — active only when cell values
            # overshoot the physical bounds
            delta = central - up
            big = jnp.asarray(1e30, P.dtype)
            lim_hi = jnp.where(delta > eps, (1.0 - up) / jnp.maximum(delta, eps),
                               big)
            lim_lo = jnp.where(delta < -eps, up / jnp.maximum(-delta, eps), big)
            lim = jnp.clip(jnp.minimum(lim, jnp.minimum(lim_hi, lim_lo)),
                           0.0, None)
    elif scheme == "vanLeer":
        lim = (r + jnp.abs(r)) / (1.0 + jnp.abs(r))
    elif scheme == "minmod":
        lim = jnp.clip(r, 0.0, 1.0)
    elif scheme == "MUSCL":
        lim = jnp.maximum(0.0, jnp.minimum(jnp.minimum(2.0 * r,
                                                       0.5 * (r + 1.0)), 2.0))
    elif scheme == "superBee":
        lim = jnp.maximum(jnp.maximum(0.0, jnp.minimum(2.0 * r, 1.0)),
                          jnp.minimum(r, 2.0))
    elif scheme == "QUICK":
        # TVD-limited QUICK: psi = max(0, min(2r, (3+r)/4, 2))
        lim = jnp.maximum(0.0, jnp.minimum(jnp.minimum(2.0 * r,
                                                       0.25 * (3.0 + r)),
                                           2.0))
    elif scheme == "vanAlbada":
        lim = jnp.maximum((r * r + r) / (r * r + 1.0), 0.0)
    elif scheme == "OSPRE":
        lim = jnp.maximum(1.5 * (r * r + r) / (r * r + r + 1.0), 0.0)
    else:
        raise ValueError(f"unknown convection scheme {scheme}")
    return lim


# ------------------------------------------------------------------ FvMatrix

@dataclasses.dataclass
class StencilPart:
    """Analytic 7-point coefficients of one fvm term over INTERIOR faces.

    d: diagonal contribution (cell array); lo[ax]/hi[ax]: coefficient of
    x_{i-1}/x_{i+1} along ax (cell arrays; boundary-face entries still hold
    the raw face coefficient — FvMatrix.stencil() folds them into d via the
    BC ghost relation). None entries mean zero.
    """
    d: jax.Array | float = 0.0
    lo: tuple = (0.0, 0.0, 0.0)
    hi: tuple = (0.0, 0.0, 0.0)


@dataclasses.dataclass
class FvMatrix:
    """Matrix-free implicit FV equation  A(x) = b  over one cell field.

    terms: list of L(P_padded)->cell functions (linear in the padded field).
    source: explicit RHS (cell field).
    parts: per-term StencilPart when the term is 7-point-expressible (every
    shipped fvm builder is); None entries disable the fused stencil path.

    The fused stencil path (round 5): A(x) as a padded-closure sum
    materializes ~40 distinct 31 MB intermediates per Krylov iteration at
    96^3x9 species (per-axis face arrays have incompatible shapes, so XLA
    cannot fuse across axes — measured 66 ms/step in the species BiCGStab
    alone). `stencil()` returns (D, lo3, hi3) cell-shaped coefficients with
    boundary ghosts FOLDED into D, so the matvec is ONE fused
    roll-multiply-add expression and diag(A) = D is exact and free (replacing
    the 8-probe coloring per solve).
    """
    mesh: StructuredMesh
    bcs: FieldBCs
    terms: list
    source: jax.Array
    parts: list | None = None

    def __add__(self, other: "FvMatrix") -> "FvMatrix":
        assert self.bcs is other.bcs or self.bcs == other.bcs
        parts = None
        if self.parts is not None and other.parts is not None:
            parts = self.parts + other.parts
        return FvMatrix(self.mesh, self.bcs, self.terms + other.terms,
                        self.source + other.source, parts)

    def __sub__(self, other: "FvMatrix") -> "FvMatrix":
        neg = [(lambda P, L=L: -L(P)) for L in other.terms]
        parts = None
        if self.parts is not None and other.parts is not None:
            parts = self.parts + [
                StencilPart(d=-p.d, lo=tuple(-c for c in p.lo),
                            hi=tuple(-c for c in p.hi))
                for p in other.parts]
        return FvMatrix(self.mesh, self.bcs, self.terms + neg,
                        self.source - other.source, parts)

    def with_source(self, s: jax.Array) -> "FvMatrix":
        return FvMatrix(self.mesh, self.bcs, self.terms, self.source + s,
                        self.parts)

    # ---- fused stencil path
    def stencil(self):
        """(D, lo, hi) cell coefficient arrays with BCs folded into D, or
        None when a term lacks stencil info or a BC kind prevents folding
        (processor halos). Cyclic axes stay in lo/hi — `stencil_apply`'s
        rolls wrap them exactly."""
        if self.parts is None or any(p is None for p in self.parts):
            return None
        for ax in range(3):
            for side in (0, 1):
                if self.bcs[ax][side].kind == "processor":
                    return None
        shape = self.mesh.shape
        dtype = self.source.dtype
        D = jnp.zeros(shape, dtype)
        lo = [jnp.zeros(shape, dtype) for _ in range(3)]
        hi = [jnp.zeros(shape, dtype) for _ in range(3)]
        for p in self.parts:
            D = D + p.d
            for ax in range(3):
                lo[ax] = lo[ax] + p.lo[ax]
                hi[ax] = hi[ax] + p.hi[ax]
        # fold boundary ghosts: homogeneous ghost = a * owner
        for ax in range(3):
            bc_lo, bc_hi = self.bcs[ax]
            if bc_lo.kind == "cyclic":
                continue
            n = shape[ax]
            h = self.mesh.spacing[ax]
            a_lo = bc_lo.coeffs(h, -1)[0]
            a_hi = bc_hi.coeffs(h, +1)[0]
            sl0 = [slice(None)] * 3
            sl0[ax] = slice(0, 1)
            sl0 = tuple(sl0)
            sln = [slice(None)] * 3
            sln[ax] = slice(n - 1, n)
            sln = tuple(sln)
            D = D.at[sl0].add(lo[ax][sl0] * a_lo)
            D = D.at[sln].add(hi[ax][sln] * a_hi)
            lo[ax] = lo[ax].at[sl0].set(0.0)
            hi[ax] = hi[ax].at[sln].set(0.0)
        return D, tuple(lo), tuple(hi)

    @staticmethod
    def stencil_apply(x, D, lo, hi):
        """A(x) for folded stencil coefficients: one fused XLA expression
        (6 rolls + 7 multiplies). Boundary entries of lo/hi are zero, so
        the wrapped reads rolls produce there are masked out; on cyclic
        axes the wrap IS the neighbor."""
        out = D * x
        for ax in range(3):
            out = out + lo[ax] * jnp.roll(x, 1, axis=ax) \
                      + hi[ax] * jnp.roll(x, -1, axis=ax)
        return out

    # A(x)
    def apply(self, x: jax.Array) -> jax.Array:
        P = pad_field(x, self.bcs, self.mesh, homogeneous=True)
        out = 0.0
        for L in self.terms:
            out = out + L(P)
        return out

    # b
    def rhs(self) -> jax.Array:
        Pb = pad_field(jnp.zeros(self.mesh.shape, self.source.dtype), self.bcs,
                       self.mesh, bc_only=True)
        out = self.source
        for L in self.terms:
            out = out - L(Pb)
        return out

    def diag(self) -> jax.Array:
        """Exact diagonal via coloring probes.

        For a 7-point stencil, cells with the same color index along every
        axis are never neighbors, so masked matvecs recover diag(A) exactly.
        Non-cyclic axes need period 2; a cyclic axis wraps, so an odd length
        needs period 3 (or, for lengths not divisible by 2 or 3, one color
        per cell along that axis — rare, tiny axes only)."""
        shape = self.mesh.shape
        periods = []
        for ax in range(3):
            n = shape[ax]
            kind = self.bcs[ax][0].kind
            if kind == "processor":
                # sharded axis: local period-2 coloring is globally
                # consistent iff the local extent is even (then the global
                # cell parity equals the local parity on every shard)
                if n % 2 != 0:
                    raise ValueError(
                        "processor-sharded axis needs an even local extent "
                        f"for diagonal coloring (got {n})")
                periods.append(2)
                continue
            is_cyc = kind == "cyclic"
            if not is_cyc or n % 2 == 0 or n == 1:
                periods.append(2 if n > 1 else 1)
            elif n % 3 == 0:
                periods.append(3)
            else:
                periods.append(n)
        iotas = [jax.lax.broadcasted_iota(jnp.int32, shape, ax) for ax in range(3)]
        d = jnp.zeros(shape, self.source.dtype)
        for ci in range(periods[0]):
            for cj in range(periods[1]):
                for ck in range(periods[2]):
                    mask = ((iotas[0] % periods[0] == ci)
                            & (iotas[1] % periods[1] == cj)
                            & (iotas[2] % periods[2] == ck))
                    chi = mask.astype(self.source.dtype)
                    d = d + self.apply(chi) * chi
        return d

    def H(self, x: jax.Array) -> jax.Array:
        """OpenFOAM H operator: b - (A(x) - diag*x)."""
        return self.rhs() - (self.apply(x) - self.diag() * x)

    def residual(self, x: jax.Array) -> jax.Array:
        return self.rhs() - self.apply(x)


# ----------------------------------------------------------------- fvm builders

def fvm_ddt(coeff, x_old, dt, mesh: StructuredMesh, bcs: FieldBCs,
            coeff_old=None) -> FvMatrix:
    """fvm::ddt(coeff, psi): (coeff psi - coeff_old psi_old)/dt.

    coeff may be a field (e.g. rho) or 1.0. Contributes coeff/dt to the
    diagonal and coeff_old psi_old/dt to the source.
    """
    if coeff_old is None:
        coeff_old = coeff
    c = coeff

    def L(P):
        return c * P[1:-1, 1:-1, 1:-1] / dt

    src = coeff_old * x_old / dt
    part = StencilPart(d=jnp.broadcast_to(jnp.asarray(c / dt), mesh.shape))
    return FvMatrix(mesh, bcs, [L], src, [part])


def multivariate_limiter(fields_padded, phi, mesh: StructuredMesh,
                         bcs_list, scheme: str = "limitedLinear",
                         limiter_k: float = 1.0,
                         bounded01: tuple | None = None):
    """Shared per-face limiter for a GROUP of convected fields: the
    field-wise min of each member's TVD limiter — OpenFOAM's
    multivariateScheme, which the reference uses for div(phi,Yi_h)
    (all species + enthalpy convected with ONE weight set,
    dfLowMachFoam YEqn.H:6-15 / EEqn.H:15). Returns per-axis face arrays.

    bounded01: optional per-field flags; flagged members contribute their
    limitedLinear01 (face value bounded to [0,1]) limiter."""
    out = []
    for ax in range(3):
        lim = None
        for i, P in enumerate(fields_padded):
            sch = scheme
            if bounded01 is not None and bounded01[i]:
                sch = "limitedLinear01" if scheme == "limitedLinear" else sch
            li = nvd_limiter(P, phi[ax], ax, sch, limiter_k, bcs_list[i])
            lim = li if lim is None else jnp.minimum(lim, li)
        out.append(jnp.minimum(lim, 1.0))
    return tuple(out)


def fvm_div(phi, psi_now: jax.Array, mesh: StructuredMesh, bcs: FieldBCs,
            scheme: str = "upwind", limiter_k: float = 1.0,
            limiter_override=None, weight_flux=None) -> FvMatrix:
    """fvm::div(phi, psi). For TVD schemes the limited anti-diffusive part is
    deferred-corrected explicitly using the current iterate psi_now.

    limiter_override: per-axis face limiter arrays (from
    multivariate_limiter) replacing the field's own limiter — grouped
    (multivariate Gauss) convection.

    weight_flux: flux whose SIGN selects upwind/central weights when it
    differs from the convecting flux (OpenFOAM mvConvection->fvmDiv(phiUc,
    Yi): the weight set is built from phi at construction, then applied to
    the correction flux phiUc)."""
    implicit_scheme = "linear" if scheme == "linear" else "upwind"
    wf = phi if weight_flux is None else weight_flux

    def L(P):
        out = 0.0
        for ax, h in enumerate(mesh.spacing):
            fv = limited_face_values(P, wf[ax], ax, implicit_scheme)
            out = out + _face_diff(phi[ax] * fv, ax) / h
        return out

    src = jnp.zeros(mesh.shape, psi_now.dtype)
    if limiter_override is not None:
        Pn = pad_field(psi_now, bcs, mesh)
        corr = 0.0
        for ax, h in enumerate(mesh.spacing):
            own, nei = face_pair(Pn, ax)
            up = jnp.where(wf[ax] >= 0, own, nei)
            central = 0.5 * (own + nei)
            hi = up + limiter_override[ax] * (central - up)
            corr = corr + _face_diff(phi[ax] * (hi - up), ax) / h
        src = src - corr
    elif scheme in ("limitedLinear", "limitedLinear01", "vanLeer", "minmod",
                    "MUSCL", "superBee", "QUICK", "vanAlbada", "OSPRE"):
        Pn = pad_field(psi_now, bcs, mesh)
        corr = 0.0
        for ax, h in enumerate(mesh.spacing):
            hi = limited_face_values(Pn, wf[ax], ax, scheme, limiter_k, bcs)
            lo = limited_face_values(Pn, wf[ax], ax, "upwind")
            corr = corr + _face_diff(phi[ax] * (hi - lo), ax) / h
        src = src - corr
    elif scheme not in ("upwind", "linear"):
        raise ValueError(f"unknown scheme {scheme}")

    # analytic stencil of the implicit part (per axis, face arrays -> cell
    # coefficient arrays; contribution at cell i is
    # (phi_hi fv_hi - phi_lo fv_lo)/h with fv chosen by wf's sign)
    d_s = 0.0
    lo_s, hi_s = [], []
    dtype = psi_now.dtype
    for ax, h in enumerate(mesh.spacing):
        p_f = phi[ax]
        n_f = p_f.shape[ax]
        p_lo = jax.lax.slice_in_dim(p_f, 0, n_f - 1, axis=ax)
        p_hi = jax.lax.slice_in_dim(p_f, 1, n_f, axis=ax)
        if implicit_scheme == "linear":
            d_s = d_s + (p_hi - p_lo) / (2.0 * h)
            hi_s.append(p_hi / (2.0 * h))
            lo_s.append(-p_lo / (2.0 * h))
        else:                                     # upwind
            w_f = wf[ax] if weight_flux is not None else p_f
            w_lo = (jax.lax.slice_in_dim(w_f, 0, n_f - 1, axis=ax)
                    >= 0).astype(dtype)
            w_hi = (jax.lax.slice_in_dim(w_f, 1, n_f, axis=ax)
                    >= 0).astype(dtype)
            d_s = d_s + (p_hi * w_hi - p_lo * (1.0 - w_lo)) / h
            hi_s.append(p_hi * (1.0 - w_hi) / h)
            lo_s.append(-p_lo * w_lo / h)
    part = StencilPart(d=d_s, lo=tuple(lo_s), hi=tuple(hi_s))
    return FvMatrix(mesh, bcs, [L], src, [part])


def fvm_laplacian(gamma_f, mesh: StructuredMesh, bcs: FieldBCs,
                  dtype=jnp.float64, sign: float = 1.0) -> FvMatrix:
    """fvm::laplacian(gamma, psi). gamma_f: per-axis face arrays or scalar.
    Use sign=-1 for '- fvm::laplacian(...)' to keep it implicit."""

    def L(P):
        out = 0.0
        for ax, h in enumerate(mesh.spacing):
            own, nei = face_pair(P, ax)
            out = out + _face_diff(_gamma_ax(gamma_f, ax) * (nei - own) / h, ax) / h
        return sign * out

    part = None
    if isinstance(gamma_f, (tuple, list)):
        d_s = 0.0
        lo_s, hi_s = [], []
        for ax, h in enumerate(mesh.spacing):
            g = gamma_f[ax]
            n_f = g.shape[ax]
            g_lo = jax.lax.slice_in_dim(g, 0, n_f - 1, axis=ax)
            g_hi = jax.lax.slice_in_dim(g, 1, n_f, axis=ax)
            inv_h2 = sign / (h * h)
            d_s = d_s - (g_lo + g_hi) * inv_h2
            lo_s.append(g_lo * inv_h2)
            hi_s.append(g_hi * inv_h2)
        part = StencilPart(d=d_s, lo=tuple(lo_s), hi=tuple(hi_s))
    return FvMatrix(mesh, bcs, [L], jnp.zeros(mesh.shape, dtype),
                    [part] if part is not None else [None])


def fvm_source_implicit(coeff, mesh: StructuredMesh, bcs: FieldBCs,
                        dtype=jnp.float64) -> FvMatrix:
    """fvm::Sp(coeff, psi): implicit source coeff*psi (diagonal only)."""

    def L(P):
        return coeff * P[1:-1, 1:-1, 1:-1]

    part = StencilPart(d=jnp.broadcast_to(jnp.asarray(coeff), mesh.shape))
    return FvMatrix(mesh, bcs, [L], jnp.zeros(mesh.shape, dtype),
                    [part])
