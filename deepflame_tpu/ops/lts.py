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

__all__ = ["smooth_field", "set_r_delta_t",
           "smooth_field_fl", "set_r_delta_t_fl",
           "set_r_delta_t_acoustic_fl"]


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


# ---------------------------------------------------------------------------
# Face-list backend (setRDeltaT.H on arbitrary fvMesh connectivity — the
# reference's localEuler LTS runs on any mesh, dfLowMachFoam.C:255-258 /
# dfHighSpeedFoam.C:182-186; this closes the structured-only gap).
# ---------------------------------------------------------------------------

def _surface_sum_fl(m, face_vals: jax.Array,
                    patch_vals=None) -> jax.Array:
    """sum over each cell's faces of a per-face scalar (fvc::surfaceSum).
    Scatter-add over owner+neighbour; LTS runs once per step (outside the
    Krylov hot loops) so the serialized TPU scatter is immaterial."""
    acc = jnp.zeros((m.n_cells,), face_vals.dtype)
    acc = acc.at[m.owner].add(face_vals)
    acc = acc.at[m.neighbour].add(face_vals)
    if patch_vals is not None:
        for p, v in zip(m.patches, patch_vals):
            acc = acc.at[p.owner].add(v)
    return acc


def smooth_field_fl(f: jax.Array, m, n_sweeps: int = 3) -> jax.Array:
    """fvcSmooth parity on face-list connectivity: neighbor-averaging
    sweeps keeping the cell max (spreads small time steps outward)."""
    ones = jnp.ones_like(m.mag_sf)
    deg = _surface_sum_fl(m, ones)
    for _ in range(n_sweeps):
        nb = jnp.zeros_like(f)
        nb = nb.at[m.owner].add(f[m.neighbour])
        nb = nb.at[m.neighbour].add(f[m.owner])
        f = jnp.maximum(f, (f + nb) / (1.0 + deg))
    return f


def set_r_delta_t_fl(m, phi: jax.Array, rho: jax.Array,
                     phi_b=None,
                     max_co: float = 0.5, max_dt: float = 1.0,
                     r_delta_t_old=None, damping: float = 0.2,
                     n_smooth: int = 3) -> jax.Array:
    """rDeltaT [1/s] on a FaceListMesh from the convective Courant number:
    max(1/maxDeltaT, surfaceSum(|phi| magSf)/(2 maxCo V rho)) — setRDeltaT.H
    with phi the interior face-normal mass-flux DENSITY [kg/m^2/s] (the
    form flux_of_fl produces times rho_f), phi_b the optional per-patch
    boundary flux densities."""
    face_vals = jnp.abs(phi) * m.mag_sf
    patch_vals = None
    if phi_b is not None:
        patch_vals = [jnp.abs(v) * p.mag_sf
                      for p, v in zip(m.patches, phi_b)]
    ssum = _surface_sum_fl(m, face_vals, patch_vals)
    r_dt = jnp.maximum(ssum / (2.0 * max_co * m.volumes * rho),
                       1.0 / max_dt)
    r_dt = smooth_field_fl(r_dt, m, n_smooth)
    if r_delta_t_old is not None:
        r_dt = jnp.minimum(r_dt, r_delta_t_old * (1.0 + damping))
    return r_dt


def set_r_delta_t_acoustic_fl(m, un: jax.Array, c: jax.Array,
                              max_co: float = 0.5, max_dt: float = 1.0,
                              n_smooth: int = 3) -> jax.Array:
    """Acoustic-Courant rDeltaT on a FaceListMesh (dfHighSpeedFoam LTS
    mode): amaxSf = (|un_f| + c_f) magSf with un the interior face-normal
    velocity [m/s] and c the cell sound speed interpolated to faces;
    rDeltaT = max(1/maxDeltaT, surfaceSum(amaxSf)/(2 maxCo V))."""
    c_f = 0.5 * (c[m.owner] + c[m.neighbour])
    amax = (jnp.abs(un) + c_f) * m.mag_sf
    # boundary faces: owner-cell wave speed (zero-gradient extrapolation)
    patch_vals = [(c[p.owner]) * p.mag_sf for p in m.patches]
    ssum = _surface_sum_fl(m, amax, patch_vals)
    r_dt = jnp.maximum(ssum / (2.0 * max_co * m.volumes), 1.0 / max_dt)
    return smooth_field_fl(r_dt, m, n_smooth)
