"""Derived-field function objects (Q, vorticity, MachNo, yPlus, ...).

Role parity: /root/reference/src/functionObjects/field — the rebuilt
OpenFOAM runtime-postprocessing set (SURVEY.md §2.8 lists the load-bearing
members: fieldAverage, fieldMinMax, sample/probes, Q, vorticity, MachNo,
yPlus). The storage objects live in function_objects.py; this module holds
the pure-jnp derived-field math, usable inside jit or at write time.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..mesh.structured import StructuredMesh
from ..ops.fv import grad

__all__ = ["vorticity", "q_criterion", "enstrophy", "mach_number",
           "y_plus", "wall_heat_flux", "DerivedFields",
           "courant_no", "peclet_no", "lambda2", "wall_shear_stress",
           "turbulence_intensity", "flow_type", "stream_function_2d",
           "wall_heat_transfer_coeff"]


def _grad_U(U, bcs_U, mesh):
    return [grad(U[c], bcs_U[c], mesh) for c in range(3)]


def vorticity(U, bcs_U, mesh: StructuredMesh):
    """curl(U) (3, ...) — the `vorticity` function object."""
    g = _grad_U(U, bcs_U, mesh)
    return jnp.stack([g[2][1] - g[1][2],
                      g[0][2] - g[2][0],
                      g[1][0] - g[0][1]])


def enstrophy(U, bcs_U, mesh: StructuredMesh):
    w = vorticity(U, bcs_U, mesh)
    return 0.5 * jnp.sum(w * w, axis=0)


def q_criterion(U, bcs_U, mesh: StructuredMesh):
    """Q = 0.5 (|Omega|^2 - |S|^2) — the `Q` function object."""
    g = _grad_U(U, bcs_U, mesh)
    SS = 0.0
    WW = 0.0
    for i in range(3):
        for j in range(3):
            s = 0.5 * (g[i][j] + g[j][i])
            w = 0.5 * (g[i][j] - g[j][i])
            SS = SS + s * s
            WW = WW + w * w
    return 0.5 * (WW - SS)


def mach_number(U, T, Y_t, thermo):
    """|U| / c with c = sqrt(gamma R T / W) — the `MachNo` function object.
    Y_t is species-last layout (..., ns)."""
    cp = thermo.cp_mass(T, Y_t)
    W = thermo.W_mix(Y_t)
    from ..constants import GAS_CONSTANT
    R = GAS_CONSTANT / W
    gamma = cp / (cp - R)
    c = jnp.sqrt(gamma * R * T)
    return jnp.sqrt(jnp.sum(U * U, axis=0)) / c


def y_plus(U, rho, mu, mesh: StructuredMesh, wall):
    """y+ of the wall-adjacent cell layer for the no-slip wall plane
    `wall=(axis, side)` — the `yPlus` function object. Returns the 2D
    wall-layer field. tau_w from the one-sided tangential-velocity gradient
    (U_wall = 0)."""
    ax, side = wall
    h = mesh.spacing[ax]
    n = mesh.shape[ax]
    idx = 0 if side == 0 else n - 1
    sl = [slice(None)] * 3
    sl[ax] = idx
    sl = tuple(sl)
    # tangential speed in the first cell (wall value is 0)
    ut2 = 0.0
    for c in range(3):
        if c == ax:
            continue
        ut2 = ut2 + U[c][sl] ** 2
    ut = jnp.sqrt(ut2)
    mu_w = mu[sl]
    rho_w = rho[sl]
    tau_w = mu_w * ut / (0.5 * h)        # one-sided gradient to the wall
    u_tau = jnp.sqrt(tau_w / rho_w)
    return rho_w * u_tau * (0.5 * h) / mu_w


def wall_heat_flux(T, alpha_rho_cp, mesh: StructuredMesh, wall, T_wall):
    """q_w = kappa dT/dn at the wall plane (wallHeatFlux parity).
    alpha_rho_cp: thermal conductivity kappa [W/m/K] field."""
    ax, side = wall
    h = mesh.spacing[ax]
    n = mesh.shape[ax]
    idx = 0 if side == 0 else n - 1
    sl = [slice(None)] * 3
    sl[ax] = idx
    sl = tuple(sl)
    return alpha_rho_cp[sl] * (T[sl] - T_wall) / (0.5 * h)


def courant_no(U, dt, mesh: StructuredMesh):
    """Per-cell Courant number (CourantNo function object,
    /root/reference/src/functionObjects/field Make list)."""
    co = 0.0
    for ax, h in enumerate(mesh.spacing):
        if mesh.shape[ax] > 1:
            co = co + jnp.abs(U[ax]) / h
    return co * dt


def peclet_no(U, rho, gamma, mesh: StructuredMesh):
    """Per-cell Peclet number |U| h rho / gamma (PecletNo parity; gamma =
    the diffusivity, e.g. mu_eff)."""
    h = min(hh for ax, hh in enumerate(mesh.spacing) if mesh.shape[ax] > 1)
    return (jnp.sqrt(jnp.sum(U * U, axis=0)) * h * rho
            / jnp.maximum(gamma, 1e-300))


def lambda2(U, bcs_U, mesh: StructuredMesh):
    """Lambda2 vortex criterion: the middle eigenvalue of S^2 + Omega^2
    (Lambda2 function object). Eigenvalues by the closed-form trigonometric
    method for symmetric 3x3 — no iterative eigensolver under jit."""
    g = _grad_U(U, bcs_U, mesh)
    # A = S^2 + W^2 (symmetric)
    S = [[0.5 * (g[i][j] + g[j][i]) for j in range(3)] for i in range(3)]
    W = [[0.5 * (g[i][j] - g[j][i]) for j in range(3)] for i in range(3)]
    A = [[sum(S[i][k] * S[k][j] + W[i][k] * W[k][j] for k in range(3))
          for j in range(3)] for i in range(3)]
    q = (A[0][0] + A[1][1] + A[2][2]) / 3.0
    B = [[A[i][j] - (q if i == j else 0.0) for j in range(3)]
         for i in range(3)]
    p2 = sum(B[i][j] ** 2 for i in range(3) for j in range(3)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-300))
    detB = (B[0][0] * (B[1][1] * B[2][2] - B[1][2] * B[2][1])
            - B[0][1] * (B[1][0] * B[2][2] - B[1][2] * B[2][0])
            + B[0][2] * (B[1][0] * B[2][1] - B[1][1] * B[2][0]))
    r = jnp.clip(detB / (2.0 * p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # branches: cos(phi) >= cos(phi + 4pi/3) >= cos(phi + 2pi/3) on [0, pi/3]
    # -> the MIDDLE eigenvalue is the phi + 4pi/3 branch
    return q + 2.0 * p * jnp.cos(phi + 4.0 * jnp.pi / 3.0)


def wall_shear_stress(U, rho, mu, mesh: StructuredMesh, wall):
    """tau_w vector (2 tangential comps) on the wall plane `(axis, side)`
    (wallShearStress parity) from the one-sided gradient, no-slip wall."""
    ax, side = wall
    h = mesh.spacing[ax]
    idx = 0 if side == 0 else mesh.shape[ax] - 1
    sl = [slice(None)] * 3
    sl[ax] = idx
    sl = tuple(sl)
    taus = []
    for c in range(3):
        if c == ax:
            continue
        taus.append(mu[sl] * U[c][sl] / (0.5 * h))
    return jnp.stack(taus)


def wall_heat_transfer_coeff(T, kappa, mesh: StructuredMesh, wall, T_wall,
                             T_ref):
    """h = q_w / (T_wall - T_ref) (wallHeatTransferCoeff parity)."""
    q_w = wall_heat_flux(T, kappa, mesh, wall, T_wall)
    return q_w / jnp.where(jnp.abs(T_wall - T_ref) > 1e-12,
                           T_wall - T_ref, 1e-12)


def turbulence_intensity(U, k):
    """I = sqrt(2k/3) / |U| (turbulenceIntensity parity)."""
    umag = jnp.sqrt(jnp.sum(U * U, axis=0))
    return jnp.sqrt(jnp.maximum(2.0 * k / 3.0, 0.0)) \
        / jnp.maximum(umag, 1e-300)


def flow_type(U, bcs_U, mesh: StructuredMesh):
    """flowType parity: lambda = (|D|-|Omega|)/(|D|+|Omega|) mapped to
    [0,2] — 0 rotational, 1 simple shear, 2 planar extensional."""
    g = _grad_U(U, bcs_U, mesh)
    DD = 0.0
    WW = 0.0
    for i in range(3):
        for j in range(3):
            s = 0.5 * (g[i][j] + g[j][i])
            w = 0.5 * (g[i][j] - g[j][i])
            DD = DD + s * s
            WW = WW + w * w
    magD = jnp.sqrt(DD)
    magW = jnp.sqrt(WW)
    return (magD - magW) / jnp.maximum(magD + magW, 1e-300) + 1.0


def stream_function_2d(phi_x, phi_y, mesh: StructuredMesh):
    """2D stream function psi on cell corners from face mass/volume fluxes
    (streamFunction parity, restricted to single-layer z meshes): psi
    integrated along x=0 then across, d(psi)/dy = phi_x, d(psi)/dx = -phi_y.
    phi_x, phi_y: per-axis face-normal flux arrays (nx+1,ny,1)/(nx,ny+1,1)."""
    fx = phi_x[..., 0]          # (nx+1, ny)
    fy = phi_y[..., 0]          # (nx, ny+1)
    # psi on the corner grid (nx+1, ny+1): start at 0, go up the left edge
    # with the x-flux of column 0, then integrate along +x with -y-flux
    left = jnp.concatenate([jnp.zeros((1,), fx.dtype),
                            jnp.cumsum(fx[0, :])])          # (ny+1,)
    rows = jnp.concatenate([jnp.zeros((1, fy.shape[1]), fy.dtype),
                            jnp.cumsum(-fy, axis=0)], axis=0)  # (nx+1, ny+1)
    return left[None, :] + rows


class DerivedFields:
    """Function-object adapter: computes named derived fields from the
    solver state dict and merges them, so storage objects (Probes,
    FieldMinMax, ...) can reference "Q", "vorticity_z", "Ma", ... like any
    primitive field. specs: dict name -> callable(fields_dict) -> array."""

    def __init__(self, specs: dict, inner):
        self.specs = dict(specs)
        self.inner = inner

    def __call__(self, time: float, fields: dict):
        ext = dict(fields)
        for name, fn in self.specs.items():
            ext[name] = fn(ext)
        self.inner(time, ext)

    def write(self):
        if hasattr(self.inner, "write"):
            return self.inner.write()
