"""Adaptive mesh resolution: multi-criteria marking + conservative re-gridding.

Role parity: /root/reference/src/dynamicFvMesh/ + src/dynamicMesh/ —
`dfDynamicRefineFvMesh::update()` with `multiCritRefinement` criteria (field
value ranges, |grad(field)|, |curl(U)|, interface proximity,
multiCritRefinement.H:105-158), buffer layers and the 2:1 cascade
(dfDynamicRefineFvMesh.H:138-151), on top of the hexRef octree topology
engine.

TPU-idiomatic design (SURVEY.md §7 stage 10): XLA requires static shapes, so
per-cell octree topology changes inside jit are replaced by criteria-driven
re-gridding BETWEEN jit segments: the marker field decides when the global
(or per-axis) resolution changes by factors of two; fields move between grids
with conservative prolongation/restriction; the step function is re-traced
once per grid change (compile cache makes repeated levels free). This covers
the reference's AMR use case — tracking detonation/flame fronts with fine
resolution only while features demand it — at whole-block granularity.
All BASELINE configs run without AMR (SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .structured import StructuredMesh
from ..ops.fv import grad

__all__ = ["RefinementCriteria", "mark_cells", "refine_field", "coarsen_field",
           "refine_mesh", "coarsen_mesh", "AdaptiveResolution"]


@dataclasses.dataclass(frozen=True)
class RefinementCriteria:
    """multiCritRefinement parity: any satisfied criterion marks a cell."""
    # field value window: mark where lo <= f <= hi
    fields: tuple = ()           # ((name, lo, hi), ...)
    # gradient magnitude: mark where |grad f| * dx >= threshold
    gradients: tuple = ()        # ((name, threshold), ...)
    # curl magnitude (of the vector field named): |curl U| * dx >= threshold
    curls: tuple = ()            # ((name, threshold), ...)
    # interface proximity: mark where lo <= f <= hi (e.g. 0.01 < Y < 0.99)
    interfaces: tuple = ()       # ((name, lo, hi), ...)
    n_buffer: int = 2            # buffer layers (nBufferLayers)


def _dilate(mask: jax.Array, n: int) -> jax.Array:
    """Grow a 0/1 mask by n cells in each direction (buffer layers)."""
    for _ in range(n):
        m = mask
        for ax in range(3):
            if mask.shape[ax] == 1:
                continue
            up = jnp.roll(m, 1, axis=ax)
            dn = jnp.roll(m, -1, axis=ax)
            # roll wraps; zero the wrapped faces
            up = up.at[tuple(slice(0, 1) if a == ax else slice(None)
                             for a in range(3))].set(0.0)
            dn = dn.at[tuple(slice(-1, None) if a == ax else slice(None)
                             for a in range(3))].set(0.0)
            mask = jnp.maximum(mask, jnp.maximum(up, dn))
    return mask


def mark_cells(criteria: RefinementCriteria, fields: dict,
               bcs: Any, mesh: StructuredMesh) -> jax.Array:
    """0/1 marker field from the multi-criteria set."""
    mark = jnp.zeros(mesh.shape)
    h = min(s for s, n in zip(mesh.spacing, mesh.shape) if n > 1)
    for name, lo, hi in tuple(criteria.fields) + tuple(criteria.interfaces):
        f = fields[name]
        mark = jnp.maximum(mark, ((f >= lo) & (f <= hi)).astype(mark.dtype))
    for name, thr in criteria.gradients:
        g = grad(fields[name], bcs, mesh)
        mag = jnp.sqrt(jnp.sum(g**2, axis=0))
        mark = jnp.maximum(mark, (mag * h >= thr).astype(mark.dtype))
    for name, thr in criteria.curls:
        U = fields[name]              # (3, ...)
        gx = grad(U[0], bcs, mesh)
        gy = grad(U[1], bcs, mesh)
        gz = grad(U[2], bcs, mesh)
        curl = jnp.stack([gz[1] - gy[2], gx[2] - gz[0], gy[0] - gx[1]])
        mag = jnp.sqrt(jnp.sum(curl**2, axis=0))
        mark = jnp.maximum(mark, (mag * h >= thr).astype(mark.dtype))
    return _dilate(mark, criteria.n_buffer)


def refine_mesh(mesh: StructuredMesh, axes=(0, 1, 2)) -> StructuredMesh:
    f = [2 if (a in axes and mesh.shape[a] > 1) else 1 for a in range(3)]
    return StructuredMesh(mesh.nx * f[0], mesh.ny * f[1], mesh.nz * f[2],
                          mesh.dx / f[0], mesh.dy / f[1], mesh.dz / f[2],
                          mesh.x0, mesh.y0, mesh.z0)


def coarsen_mesh(mesh: StructuredMesh, axes=(0, 1, 2)) -> StructuredMesh:
    f = [2 if (a in axes and mesh.shape[a] % 2 == 0 and mesh.shape[a] > 1)
         else 1 for a in range(3)]
    return StructuredMesh(mesh.nx // f[0], mesh.ny // f[1], mesh.nz // f[2],
                          mesh.dx * f[0], mesh.dy * f[1], mesh.dz * f[2],
                          mesh.x0, mesh.y0, mesh.z0)


def refine_field(f: jax.Array, axes=(0, 1, 2)) -> jax.Array:
    """Conservative prolongation: each refined cell inherits the parent value
    (exactly conservative for intensive fields on factor-2 refinement)."""
    for ax in axes:
        if f.shape[ax] > 1:
            f = jnp.repeat(f, 2, axis=ax)
    return f


def coarsen_field(f: jax.Array, axes=(0, 1, 2), weights=None) -> jax.Array:
    """Conservative restriction: mean over 2^d children (mass-weighted if
    weights given)."""
    if weights is not None:
        num = coarsen_field(f * weights, axes)
        den = coarsen_field(weights, axes)
        return num / den
    for ax in axes:
        n = f.shape[ax]
        if n > 1 and n % 2 == 0:
            sh = list(f.shape)
            sh[ax] = n // 2
            sh.insert(ax + 1, 2)
            f = f.reshape(sh).mean(axis=ax + 1)
    return f


@dataclasses.dataclass
class AdaptiveResolution:
    """Between-step adaptation driver (dfDynamicRefineFvMesh::update parity,
    dictionary-driven: refineInterval, maxCells, criteria).

    Call maybe_adapt(mesh, fields, ...) every refine_interval steps; it
    returns (new_mesh, refine|coarsen|None). The caller re-builds the solver
    for the new mesh (one retrace) and maps the state with refine_field /
    coarsen_field."""
    criteria: RefinementCriteria
    refine_interval: int = 10
    max_cells: int = 4_000_000
    refine_above: float = 0.02    # marked fraction that triggers refinement
    coarsen_below: float = 0.002
    level: int = 0
    max_level: int = 2

    def maybe_adapt(self, mesh: StructuredMesh, fields: dict, bcs) -> tuple:
        mark = mark_cells(self.criteria, fields, bcs, mesh)
        frac = float(jnp.mean(mark))
        if (frac > self.refine_above and self.level < self.max_level
                and mesh.n_cells * 8 <= self.max_cells):
            self.level += 1
            return refine_mesh(mesh), "refine"
        if frac < self.coarsen_below and self.level > 0:
            self.level -= 1
            return coarsen_mesh(mesh), "coarsen"
        return mesh, None
