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
           "y_plus", "wall_heat_flux", "DerivedFields"]


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
