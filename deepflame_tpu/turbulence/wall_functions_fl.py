"""High-Re wall functions on the face-list (unstructured) backend.

Role parity: nutkWallFunction / epsilonWallFunction / kqRWallFunction
(OpenFOAM-7 wallFunctions, used by every reference RAS case on its wall
patches — e.g. Sandia D's wallTube/wallOutside, 0/k and 0/epsilon). Same
masked-correction formulation as the structured
turbulence/wall_functions.py, built from a GeneralMesh's named wall
patches: per wall-adjacent cell, the wall distance y = n.(Cf - Co) and the
wall unit normal of its nearest wall face.

Without these, raw k-epsilon production in the first cell off a wall
(0.125 mm at the Sandia D nozzle lip) has no log-layer dissipation answer:
eps stays low, P = mu_t |S|^2 explodes, and k equilibrates 100x high —
observed as nu_t ~ 1 m^2/s homogenizing the whole jet.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WallFunctionsFL", "make_wall_functions_fl"]


@dataclasses.dataclass(frozen=True)
class WallFunctionsFL:
    mask: jax.Array      # (n,) 1.0 on wall-adjacent cells
    y: jax.Array         # (n,) wall distance (big off-mask)
    n_wall: jax.Array    # (n, 3) unit normal of the nearest wall face
    kappa: float = 0.41
    E: float = 9.8
    Cmu: float = 0.09

    @property
    def yplus_lam(self) -> float:
        yl = 11.0
        for _ in range(10):
            yl = math.log(max(self.E * yl, 1.0)) / self.kappa
        return yl

    def nut(self, rho, k, mu):
        """nutkWallFunction kinematic eddy viscosity in wall cells."""
        ys = (self.Cmu ** 0.25 * jnp.sqrt(jnp.maximum(k, 1e-12))
              * self.y * rho / mu)
        nut_log = mu / rho * (ys * self.kappa
                              / jnp.log(jnp.maximum(self.E * ys, 1.0 + 1e-6))
                              - 1.0)
        on = self.mask * (ys > self.yplus_lam)
        return jnp.where(on > 0, jnp.maximum(nut_log, 0.0), 0.0)

    def epsilon(self, k):
        """epsilonWallFunction fixed value in wall cells."""
        return (self.Cmu ** 0.75 * jnp.maximum(k, 1e-12) ** 1.5
                / (self.kappa * self.y))

    def production(self, rho, k, mu, mu_t, U):
        """Wall-cell production G: (nut+nu) (|U_t|/y) Cmu^0.25 sqrt(k) /
        (kappa y) — U (n, 3) cell velocities."""
        Un = jnp.sum(U * self.n_wall, axis=1)
        Ut = jnp.sqrt(jnp.maximum(jnp.sum(U * U, axis=1) - Un ** 2, 0.0))
        return ((mu_t + mu) / rho * (Ut / self.y)
                * self.Cmu ** 0.25 * jnp.sqrt(jnp.maximum(k, 1e-12))
                / (self.kappa * self.y) * rho)

    def apply(self, wall_value, field):
        return jnp.where(self.mask > 0, wall_value, field)


# Pytree registration: shard-local wall masks travel through shard_map as
# sharded inputs (parallel/distributed_fl.py localizes mask/y/n_wall).
jax.tree_util.register_dataclass(
    WallFunctionsFL,
    data_fields=["mask", "y", "n_wall"],
    meta_fields=["kappa", "E", "Cmu"])


def make_wall_functions_fl(gm, wall_patch_names,
                           dtype=jnp.float64) -> WallFunctionsFL:
    """Build wall masks from a GeneralMesh's named wall patches."""
    n = gm.n_cells
    mask = np.zeros(n)
    y = np.full(n, 1e10)
    n_wall = np.zeros((n, 3))
    for p in gm.patches:
        if p.name not in wall_patch_names:
            continue
        own = np.asarray(p.owner)
        # wall distance: owner centre to face = delta/2 (delta is the ghost
        # spacing 2 n.(Cf - Co))
        d = 0.5 * np.asarray(p.delta)
        for i, c in enumerate(own):
            if d[i] < y[c]:
                y[c] = d[i]
                n_wall[c] = np.asarray(p.normal)[i]
            mask[c] = 1.0
    return WallFunctionsFL(mask=jnp.asarray(mask, dtype),
                           y=jnp.asarray(y, dtype),
                           n_wall=jnp.asarray(n_wall, dtype))
