"""Energy boundary conditions: T-space BCs resolved onto the enthalpy field.

Role parity: the reference's energy BC kinds (SURVEY.md §2 row "Energy BCs";
OpenFOAM-7 fixedEnergyFvPatchScalarField / gradientEnergyFvPatchScalarField /
mixedEnergyFvPatchScalarField, re-exported by the reference's dfThermo layer):
the user states the boundary condition on TEMPERATURE, and the energy
equation's he/ha field receives the thermodynamically consistent BC

    fixedEnergy:    ha|b      = h(T_b, Y_b)
    gradientEnergy: dha/dn|b  = cp(T_own, Y_own) dT/dn|b
    mixedEnergy:    f * fixed + (1 - f) * gradient  (OpenFOAM mixed)

OpenFOAM re-evaluates these per iteration through virtual patch updates;
here `resolve_energy_bcs` is a pure function called once per step that maps
any energy-kind BCs in bcs_h to concrete affine ghost BCs (array-valued
(a, b) via the generic "affine" BC kind), computed from the current
owner-cell composition — branch-free under jit, since BC kinds are static.
Composition at the boundary: fixedValue Y BCs are honored; otherwise the
owner-cell (zero-gradient) composition is used.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .structured import BC, StructuredMesh

__all__ = ["fixed_energy", "gradient_energy", "mixed_energy",
           "resolve_energy_bcs", "has_energy_bcs"]


def fixed_energy(T_b) -> BC:
    """Boundary enthalpy from a fixed boundary temperature (fixedEnergy)."""
    return BC("fixedEnergy", T_b)


def gradient_energy(dTdn) -> BC:
    """Boundary enthalpy gradient from a fixed temperature gradient
    (gradientEnergy): dha/dn = cp dT/dn. Sign convention follows
    fixed_gradient: the value is the +axis directional derivative dT/dx."""
    return BC("gradientEnergy", dTdn)


def mixed_energy(T_b, dTdn, fraction) -> BC:
    """OpenFOAM mixedEnergy: value-fraction blend of the two above."""
    return BC("mixedEnergy", (T_b, dTdn, fraction))


_ENERGY_KINDS = ("fixedEnergy", "gradientEnergy", "mixedEnergy")


def has_energy_bcs(bcs_h) -> bool:
    return any(bc.kind in _ENERGY_KINDS for ax in bcs_h for bc in ax)


def _owner_slice(F, axis, side):
    n = F.shape[axis]
    i = 0 if side == 0 else n - 1
    return jax.lax.slice_in_dim(F, i, i + 1, axis=axis)


def _pad_prior_axes(arr, axis):
    """pad_field pads axes in order 0..2, so an array-valued BC on `axis`
    meets owner slices whose EARLIER axes already carry one ghost layer each
    side. Edge-replicate those axes so the affine (a, b) broadcasts (ghost
    corners get the adjacent boundary value, the standard corner closure)."""
    pads = [(1, 1) if ax < axis else (0, 0) for ax in range(arr.ndim)]
    if not any(p != (0, 0) for p in pads):
        return arr
    return jnp.pad(arr, pads, mode="edge")


def _boundary_Y(Y, bcs_Y, axis, side):
    """(ns, 1-slice) boundary composition: fixedValue Y BCs honored,
    anything else -> owner-cell composition. bcs_Y may be one FieldBCs
    shared by all species or a per-species sequence (the two layouts
    LowMachSolver.bcs_Y accepts)."""
    ns = Y.shape[0]
    own = _owner_slice(Y, axis + 1, side)        # Y is (ns, nx, ny, nz)
    if bcs_Y is None:
        return own
    shared = isinstance(bcs_Y[0][0], BC)         # single FieldBCs layout
    vals = []
    for k in range(ns):
        bc = (bcs_Y if shared else bcs_Y[k])[axis][side]
        if bc.kind in ("fixedValue", "inletOutlet"):
            vals.append(jnp.full_like(own[k], bc.value))
        else:
            vals.append(own[k])
    return jnp.stack(vals)


def resolve_energy_bcs(bcs_h, T, Y, thermo, mesh: StructuredMesh,
                       bcs_Y=None):
    """Map energy-kind BCs in bcs_h to concrete affine ghost BCs using the
    current fields. Returns bcs_h unchanged (same object) when it contains
    no energy kinds."""
    if not has_energy_bcs(bcs_h):
        return bcs_h
    spacing = mesh.spacing
    out = []
    for axis in range(3):
        pair = []
        for side in (0, 1):
            bc = bcs_h[axis][side]
            if bc.kind not in _ENERGY_KINDS:
                pair.append(bc)
                continue
            h = spacing[axis]
            sgn = -1.0 if side == 0 else 1.0
            Yb = jnp.moveaxis(_boundary_Y(Y, bcs_Y, axis, side), 0, -1)
            T_own = _owner_slice(T, axis, side)
            if bc.kind == "fixedEnergy":
                T_b = jnp.asarray(bc.value, T.dtype)
                h_b = thermo.h_mass(jnp.broadcast_to(T_b, T_own.shape), Yb)
                pair.append(BC("affine",
                               (-1.0, _pad_prior_axes(2.0 * h_b, axis))))
            elif bc.kind == "gradientEnergy":
                cp = thermo.cp_mass(T_own, Yb)
                g = cp * jnp.asarray(bc.value, T.dtype)
                pair.append(BC("affine",
                               (1.0, _pad_prior_axes(sgn * g * h, axis))))
            else:                                  # mixedEnergy
                T_b, dTdn, f = bc.value
                T_b = jnp.asarray(T_b, T.dtype)
                h_b = thermo.h_mass(jnp.broadcast_to(T_b, T_own.shape), Yb)
                cp = thermo.cp_mass(T_own, Yb)
                g = cp * jnp.asarray(dTdn, T.dtype)
                a = 1.0 - 2.0 * f
                b = 2.0 * f * h_b + (1.0 - f) * sgn * g * h
                pair.append(BC("affine", (a, _pad_prior_axes(b, axis))))
        out.append(tuple(pair))
    return tuple(out)
