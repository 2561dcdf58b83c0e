"""Local time stepping (LTS): per-cell pseudo-time-step field.

Role parity: /root/reference/applications/solvers/dfLowMachFoam/setRDeltaT.H
and dfHighSpeedFoam/setRDeltaT.H — per-cell rDeltaT from the local Courant
number, spatially smoothed (fvcSmooth) and rate-damped against the previous
value, used with localEulerDdtScheme (dfLowMachFoam.C:255-258). The fvm_ddt
operators accept a per-cell dt field, so LTS is: dt_field = 1/rDeltaT.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mesh.structured import StructuredMesh, pad_field

__all__ = ["smooth_field", "set_r_delta_t"]


def smooth_field(f: jax.Array, bcs, mesh: StructuredMesh,
                 n_sweeps: int = 3) -> jax.Array:
    """fvcSmooth parity: diffusive neighbor-averaging sweeps (keeps max)."""
    for _ in range(n_sweeps):
        P = pad_field(f, bcs, mesh)
        acc = f
        cnt = 1.0
        for ax in range(3):
            if mesh.shape[ax] == 1:
                continue
            sl_lo = [slice(1, -1)] * 3
            sl_hi = [slice(1, -1)] * 3
            sl_lo[ax] = slice(0, -2)
            sl_hi[ax] = slice(2, None)
            acc = acc + P[tuple(sl_lo)] + P[tuple(sl_hi)]
            cnt += 2.0
        f = jnp.maximum(f, acc / cnt)
    return f


def set_r_delta_t(phi, rho, bcs_p, mesh: StructuredMesh,
                  max_co: float = 0.5, max_dt: float = 1.0,
                  r_delta_t_old=None, damping: float = 0.2,
                  n_smooth: int = 3) -> jax.Array:
    """rDeltaT [1/s] from the local convective Courant number.

    phi: per-axis face mass-flux densities [kg/m^2/s]; rho cell density.
    Smoothing spreads small time steps into neighbors (stability); damping
    limits the rate of increase vs the previous field (setRDeltaT.H
    rDeltaTDampingCoeff)."""
    co_sum = 0.0
    for ax, h in enumerate(mesh.spacing):
        if mesh.shape[ax] == 1:
            continue
        n = phi[ax].shape[ax]
        lo = jax.lax.slice_in_dim(phi[ax], 0, n - 1, axis=ax)
        hi = jax.lax.slice_in_dim(phi[ax], 1, n, axis=ax)
        u_face = 0.5 * (jnp.abs(lo) + jnp.abs(hi)) / rho
        co_sum = co_sum + u_face / h
    r_dt = jnp.maximum(co_sum / max_co, 1.0 / max_dt)
    r_dt = smooth_field(r_dt, bcs_p, mesh, n_smooth)
    if r_delta_t_old is not None:
        # limit rate of increase: rDeltaT <= old * (1 + damping)
        r_dt = jnp.minimum(r_dt, r_delta_t_old * (1.0 + damping))
    return r_dt


def set_r_delta_t_acoustic(U, c, bcs_p, mesh: StructuredMesh,
                           max_co: float = 0.5, max_dt: float = 1.0,
                           n_smooth: int = 3) -> jax.Array:
    """rDeltaT [1/s] from the local ACOUSTIC Courant number — the
    dfHighSpeedFoam LTS mode (setRDeltaT.H: rDeltaT = max(1/maxDeltaT,
    surfaceSum(amaxSf)/(2 maxCo V)) with amaxSf = |phi_f| + c_f |Sf|,
    rhoCentralFoam heritage; dfHighSpeedFoam.C:182-186).

    U: (3, ...) velocity; c: sound speed cell field. Per-axis face wave
    speed approximated cellwise (uniform grid): sum_ax (|u_ax| + c)/h_ax.
    """
    r_dt = 0.0
    for ax, h in enumerate(mesh.spacing):
        if mesh.shape[ax] == 1:
            continue
        r_dt = r_dt + (jnp.abs(U[ax]) + c) / h
    r_dt = jnp.maximum(r_dt / (2.0 * max_co), 1.0 / max_dt)
    return smooth_field(r_dt, bcs_p, mesh, n_smooth)
