"""High-Re wall functions for the RAS models (structured-mesh walls).

Role parity: the standard OpenFOAM wall-function BCs the reference's RAS
cases use (nutkWallFunction, kqRWallFunction, epsilonWallFunction,
omegaWallFunction — OpenFOAM-7 src/TurbulenceModels/turbulenceModels/
derivedFvPatchFields/wallFunctions/*, consumed unmodified by the reference's
rebuilt TurbulenceModels; SURVEY.md §2.8). The reference applies them as
fvPatchField types on wall patches; here walls are whole boundary planes of
the structured box, so the same physics is a set of masked field corrections
on the wall-adjacent cell layer — branch-free and jit-compatible:

  - nutk:     nu_t|w = nu (y* kappa / ln(E y*) - 1)   for y* > y*_lam
  - epsilon:  eps|w = Cmu^(3/4) k^(3/2) / (kappa y)
              G|w   = (nu_t+nu) |U_t|/y * Cmu^(1/4) sqrt(k) / (kappa y)
  - omega:    omega|w = sqrt(omega_vis^2 + omega_log^2)  (Menter blending)
  - kqR:      zero-gradient k at the wall (the default scalar wall BC).

Walls are declared as (axis, side) pairs like turbulence.ras.wall_distance.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..mesh.structured import StructuredMesh

__all__ = ["WallFunctions"]


@dataclasses.dataclass(frozen=True)
class WallFunctions:
    """Masked wall-layer corrections for (axis, side) wall planes."""
    walls: tuple                 # ((axis, side), ...)
    mask: jax.Array              # 1.0 on wall-adjacent cells
    y: jax.Array                 # distance to the owning wall (big elsewhere)
    axis_field: jax.Array        # wall-normal axis index per cell (int32)
    kappa: float = 0.41
    E: float = 9.8
    Cmu: float = 0.09

    @staticmethod
    def for_walls(mesh: StructuredMesh, walls, dtype=jnp.float32):
        """Build masks for wall-adjacent cell layers of the given planes."""
        import numpy as np
        shape = mesh.shape
        mask = np.zeros(shape, bool)
        y = np.full(shape, 1e10)
        ax_f = np.zeros(shape, np.int32)
        spacing = mesh.spacing
        for (ax, side) in walls:
            sl = [slice(None)] * 3
            sl[ax] = 0 if side == 0 else shape[ax] - 1
            half = 0.5 * spacing[ax]
            region = tuple(sl)
            closer = y[region] > half
            mask[region] = True
            y[region] = np.where(closer, half, y[region])
            ax_f[region] = np.where(closer, ax, ax_f[region])
        return WallFunctions(walls=tuple(walls),
                             mask=jnp.asarray(mask.astype(float), dtype),
                             y=jnp.asarray(y, dtype),
                             axis_field=jnp.asarray(ax_f))

    @property
    def yplus_lam(self) -> float:
        """Intersection of the linear and log laws (OpenFOAM yPlusLam)."""
        yl = 11.0
        for _ in range(10):
            yl = math.log(max(self.E * yl, 1.0)) / self.kappa
        return yl

    def ystar(self, rho, k, mu):
        """y* = Cmu^(1/4) sqrt(k) y rho / mu (k-based wall unit)."""
        return (self.Cmu ** 0.25 * jnp.sqrt(jnp.maximum(k, 1e-12))
                * self.y * rho / mu)

    def nut(self, rho, k, mu):
        """nutkWallFunction value on wall cells (0 off-mask / sublayer)."""
        ys = self.ystar(rho, k, mu)
        nut_log = mu / rho * (ys * self.kappa
                              / jnp.log(jnp.maximum(self.E * ys, 1.0 + 1e-6))
                              - 1.0)
        on = self.mask * (ys > self.yplus_lam)
        return jnp.where(on > 0, jnp.maximum(nut_log, 0.0), 0.0)

    def epsilon(self, k):
        """epsilonWallFunction fixed value in wall cells."""
        return (self.Cmu ** 0.75 * jnp.maximum(k, 1e-12) ** 1.5
                / (self.kappa * self.y))

    def omega(self, rho, k, mu, beta1=0.075):
        """omegaWallFunction blended value in wall cells."""
        nu = mu / rho
        w_vis = 6.0 * nu / (beta1 * self.y ** 2)
        w_log = jnp.sqrt(jnp.maximum(k, 1e-12)) \
            / (self.Cmu ** 0.25 * self.kappa * self.y)
        return jnp.sqrt(w_vis ** 2 + w_log ** 2)

    def production(self, rho, k, mu, mu_t, U, bcs_U, mesh: StructuredMesh):
        """Wall-cell turbulence production G (epsilonWallFunction::calculate,
        omegaWallFunction::calculate): (nut+nu) snGrad(|U_t|) * the log-layer
        velocity-gradient scale Cmu^(1/4) sqrt(k)/(kappa y)."""
        # |U_t|: tangential speed = |U| with the wall-normal component
        # removed per-cell (axis_field chooses the normal direction)
        Un2 = 0.0
        for ax in range(3):
            Un2 = Un2 + jnp.where(self.axis_field == ax, U[ax] ** 2, 0.0)
        Ut = jnp.sqrt(jnp.maximum(sum(U[a] ** 2 for a in range(3)) - Un2,
                                  0.0))
        snGradU = Ut / self.y
        return ((mu_t + mu) / rho * snGradU
                * self.Cmu ** 0.25 * jnp.sqrt(jnp.maximum(k, 1e-12))
                / (self.kappa * self.y) * rho)

    def apply_mask(self, wall_value, field):
        """field with wall cells replaced by wall_value."""
        return jnp.where(self.mask > 0, wall_value, field)
