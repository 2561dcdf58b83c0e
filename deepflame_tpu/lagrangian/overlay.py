"""Lagrangian spray on general (face-list/unstructured) meshes via a
background overlay grid.

Role parity: the reference's Lagrangian stack tracks parcels through
arbitrary polyhedral meshes with face-walking cell location
(/root/reference/src/lagrangian/intermediate, particle::trackToFace) — a
pointer-chasing algorithm that is hostile to SPMD hardware. The TPU-first
equivalent used here: an O(1), fully-jittable locate through a uniform
BACKGROUND GRID overlaying the general mesh's bounding box. Each overlay
cell is precomputed (host-side, once) to map to the nearest general-mesh
cell; parcels are located by a floor-divide into the overlay, and every
gather/scatter between parcels and gas happens on the overlay grid,
reduced exactly back to general-mesh cells by segment-sum.

The approximation is the locate granularity only: a parcel within one
overlay spacing of a cell boundary may exchange with the neighbouring
cell. Mass/momentum/energy exchange stays exactly conservative — the
overlay->mesh reduction preserves integrals by construction (each overlay
cell maps to exactly one mesh cell; sources are accumulated per overlay
cell in per-volume units, converted through the overlay volume, summed per
mesh cell, and divided by the true cell volume).

This wraps the UNCHANGED SprayCloud physics (drag, evaporation, breakup,
collision, heat transfer — lagrangian/cloud.py): the cloud sees a
structured mesh (the overlay) and structured gas fields gathered from the
general mesh.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .cloud import CloudSources, SprayCloud
from ..mesh.structured import StructuredMesh

__all__ = ["OverlaySprayCloud", "make_overlay"]


def make_overlay(centers, volumes, resolution=(128, 1, 256),
                 bounds=None):
    """Build (overlay_mesh, cell_map): a uniform StructuredMesh covering
    the general mesh's bounding box and the overlay->mesh-cell nearest-
    centre map (int32, overlay.shape).

    centers: (n, 3) general-mesh cell centres; volumes: (n,).
    Host-side, numpy, runs once at setup (scipy cKDTree nearest lookup).
    """
    from scipy.spatial import cKDTree
    ctr = np.asarray(centers, np.float64)
    if bounds is None:
        lo = ctr.min(axis=0)
        hi = ctr.max(axis=0)
        pad = 0.02 * (hi - lo + 1e-300)
        lo, hi = lo - pad, hi + pad
    else:
        lo, hi = (np.asarray(b, np.float64) for b in bounds)
    res = tuple(int(r) for r in resolution)
    ext = np.maximum(hi - lo, 1e-12)
    # degenerate axes (2D/wedge meshes: all centers on one plane): give the
    # overlay a finite thickness there, or parcels leave the box on their
    # first out-of-plane drift (dispersion/gravity) and are deactivated;
    # out-of-plane position is immaterial to the cell map (resolution 1)
    floor = 0.2 * ext.max()
    for a in range(3):
        if ext[a] < floor and res[a] == 1:
            mid = 0.5 * (lo[a] + hi[a])
            lo[a], hi[a] = mid - 0.5 * floor, mid + 0.5 * floor
            ext[a] = floor
    overlay = StructuredMesh.box(ext.tolist(), list(res), origin=lo.tolist())
    # overlay cell centres
    axes = [lo[a] + (np.arange(res[a]) + 0.5) * ext[a] / res[a]
            for a in range(3)]
    OX, OY, OZ = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([OX.ravel(), OY.ravel(), OZ.ravel()], axis=1)
    _, idx = cKDTree(ctr).query(pts)
    cell_map = idx.reshape(res).astype(np.int32)
    return overlay, cell_map


@dataclasses.dataclass(frozen=True)
class OverlaySprayCloud:
    """SprayCloud adapter for general meshes.

    cloud: a SprayCloud whose mesh IS the overlay grid.
    cell_map: (overlay.shape) int32 overlay-cell -> general-cell index.
    volumes: (n,) general-mesh cell volumes.
    """
    cloud: SprayCloud
    cell_map: Any             # int32 (overlay.shape)
    volumes: Any              # (n,) general-mesh cell volumes
    n_cells: int

    @classmethod
    def build(cls, centers, volumes, spray_kwargs: dict,
              resolution=(128, 1, 256), bounds=None):
        overlay, cell_map = make_overlay(centers, volumes, resolution,
                                         bounds)
        cloud = SprayCloud(mesh=overlay, **spray_kwargs)
        return cls(cloud=cloud, cell_map=jnp.asarray(cell_map),
                   volumes=jnp.asarray(np.asarray(volumes)),
                   n_cells=int(np.asarray(volumes).shape[0]))

    def init(self, key, dtype=jnp.float64):
        return self.cloud.init(key, dtype)

    def evolve(self, c, gas_fl: dict, dt, time):
        """gas_fl: dict of FLAT general-mesh fields (n,) / U (n, 3) or
        (3, n). Returns (new cloud state, CloudSources with FLAT (n,)
        per-volume fields)."""
        cm = self.cell_map
        dtype = c.d.dtype

        def to_overlay(f):
            return jnp.asarray(f, dtype)[cm]

        U = gas_fl["U"]
        U = U.T if U.shape[-1] == 3 and U.ndim == 2 else U   # -> (3, n)
        gas_over = {
            "rho": to_overlay(gas_fl["rho"]),
            "T": to_overlay(gas_fl["T"]),
            "p": to_overlay(gas_fl["p"]),
            "mu": to_overlay(gas_fl["mu"]),
            "U": jnp.stack([to_overlay(U[a]) for a in range(3)]),
        }
        for opt in ("Yv", "k_turb", "cp", "kappa"):
            if opt in gas_fl:
                gas_over[opt] = to_overlay(gas_fl[opt])

        c_new, src_over = self.cloud.evolve(c, gas_over, dt, time)

        # exact reduction: per-volume overlay sources -> per-volume mesh
        # sources through the overlay volume (integral-preserving)
        V_over = self.cloud.mesh.volume
        flat_map = cm.ravel()

        def reduce_(f_over):
            tot = jax.ops.segment_sum(f_over.ravel() * V_over, flat_map,
                                      num_segments=self.n_cells)
            return tot / self.volumes.astype(f_over.dtype)

        Srho = reduce_(src_over.Srho)
        SY = reduce_(src_over.SY)
        Sh = reduce_(src_over.Sh)
        SU = jnp.stack([reduce_(src_over.SU[a]) for a in range(3)])
        return c_new, CloudSources(Srho=Srho, SU=SU, Sh=Sh, SY=SY)

    def stats(self, c):
        return self.cloud.stats(c)
