"""Explicit SPMD domain decomposition for the low-Mach solver.

Role parity: the reference's whole multi-process stack — `decomposePar` mesh
partitioning + MPI processor patches (Pstream), the GPU port's NCCL halo
exchange (/root/reference/src_gpu/dfMatrixOpBase.H:139-155 —
`correct_boundary_conditions_processor_scalar`), its rank→device binding
(dfNcclBase.cu:23-60), and AmgX multi-rank consolidation.

TPU-first: ONE program. The solver step runs inside `jax.shard_map` over a
1-D device mesh; the spatial x-axis is block-partitioned across shards.
Stencil ghost layers arrive by `lax.ppermute` ring exchange over ICI
(mesh/structured.py `processor` BCs), Krylov dot products and diagnostics are
`psum`/`pmax` (parallel/context.py), and chemistry load-binning is per-shard
by construction (each shard sorts only its own cells — the per-rank DLB the
reference gets from MPI migration, with zero migration).

Face-array ownership (the scalable layout GSPMD cannot express for odd
nx+1-sized arrays): each shard owns the LOW x-face of each of its cells;
the single domain-top plane is carried replicated. y/z face arrays have an
even x extent and shard directly.

Usage:
    dist = DistributedLowMach(solver, n_shards=8)
    ds = dist.shard_state(solver.initial_state(p, T, Y))
    ds, diag = dist.step(ds, dt)
    s = dist.gather_state(ds)      # back to a global LowMachState
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh.structured import StructuredMesh, processor
from ..solvers.low_mach import LowMachState
from .context import shard_axis

__all__ = ["DistributedLowMach", "DistLowMachState", "localize_bcs",
           "localize_solver"]


class DistLowMachState(NamedTuple):
    """LowMachState with the x-face flux array split into a shardable
    per-cell low-face array + one replicated domain-top plane."""
    rho: jax.Array
    U: jax.Array
    p: jax.Array
    ha: jax.Array
    Y: jax.Array
    T: jax.Array
    phi_x: jax.Array        # (nx, ny, nz): flux on the LOW x-face of cell i
    phi_x_top: jax.Array    # (1, ny, nz): domain top face (replicated)
    phi_y: jax.Array        # (nx, ny+1, nz)
    phi_z: jax.Array        # (nx, ny, nz+1)
    dpdt: jax.Array
    time: jax.Array
    turb: tuple = ()
    cscalars: tuple = ()
    chem_dt: Any = ()


def localize_bcs(bcs, axis_name: str, mesh_axis: int = 0):
    """Replace the partitioned mesh axis' BC pair with processor BCs that
    carry the original (domain-edge) BCs."""
    out = []
    for ax in range(3):
        if ax == mesh_axis:
            lo, hi = bcs[ax]
            out.append((processor(axis_name, lo), processor(axis_name, hi)))
        else:
            out.append(tuple(bcs[ax]))
    return tuple(out)


def localize_solver(solver, n_shards: int, axis_name: str = "x",
                    mesh_axis: int = 0):
    """Per-shard replica of a LowMachSolver: local mesh block + processor BCs
    on the partitioned axis (the analogue of decomposePar + processor
    patches)."""
    m = solver.mesh
    n_glob = m.shape[mesh_axis]
    if n_glob % n_shards != 0:
        raise ValueError(f"mesh axis {mesh_axis} extent {n_glob} not "
                         f"divisible by {n_shards} shards")
    n_loc = n_glob // n_shards
    if n_loc % 2 != 0:
        raise ValueError(f"local extent {n_loc} must be even (diagonal "
                         "coloring consistency across shard boundaries)")
    sizes = [m.nx, m.ny, m.nz]
    sizes[mesh_axis] = n_loc
    local_mesh = StructuredMesh(sizes[0], sizes[1], sizes[2],
                                m.dx, m.dy, m.dz, m.x0, m.y0, m.z0)
    loc = lambda b: localize_bcs(b, axis_name, mesh_axis)
    bcs_Y = solver.bcs_Y
    bcs_Y = ([loc(b) for b in bcs_Y] if isinstance(bcs_Y, list)
             else loc(bcs_Y))
    return dataclasses.replace(
        solver,
        mesh=local_mesh,
        bcs_U=tuple(loc(b) for b in solver.bcs_U),
        bcs_p=loc(solver.bcs_p),
        bcs_h=loc(solver.bcs_h),
        bcs_Y=bcs_Y,
        bcs_rho=loc(solver.bcs_rho),
        bcs_Z=loc(solver.bcs_Z) if solver.bcs_Z is not None else None,
    )


class DistributedLowMach:
    """shard_map-distributed LowMachSolver over a 1-D device mesh.

    The x mesh axis is block-partitioned; each device advances its block,
    exchanging one-plane halos by ppermute (ICI neighbours) exactly where the
    reference exchanges NCCL processor-patch buffers.
    """

    def __init__(self, solver, n_shards: int | None = None, devices=None,
                 axis_name: str = "x"):
        if devices is None:
            devices = jax.devices()
        if n_shards is None:
            n_shards = len(devices)
        devices = np.array(devices[:n_shards])
        self.axis_name = axis_name
        self.n_shards = n_shards
        self.solver = solver
        self.jmesh = Mesh(devices, (axis_name,))
        self.local_solver = localize_solver(solver, n_shards, axis_name)
        self._x_cyclic = solver.bcs_p[0][0].kind == "cyclic"
        self._step_cache: dict = {}

    # ------------------------------------------------------------- layout
    def _specs(self, ds: DistLowMachState) -> DistLowMachState:
        ax = self.axis_name
        cell = P(ax)
        vec = P(None, ax)
        rep = P()
        return DistLowMachState(
            rho=cell, U=vec, p=cell, ha=cell, Y=vec, T=cell,
            phi_x=cell, phi_x_top=rep, phi_y=cell, phi_z=cell,
            dpdt=cell, time=rep,
            turb=tuple(cell for _ in ds.turb),
            cscalars=tuple(cell for _ in ds.cscalars),
            chem_dt=cell if hasattr(ds.chem_dt, "shape") else (),
        )

    def shard_state(self, s: LowMachState) -> DistLowMachState:
        """Split the x-face array and place every leaf on the device mesh."""
        phi_x_full = s.phi[0]
        ds = DistLowMachState(
            rho=s.rho, U=s.U, p=s.p, ha=s.ha, Y=s.Y, T=s.T,
            phi_x=phi_x_full[:-1], phi_x_top=phi_x_full[-1:],
            phi_y=s.phi[1], phi_z=s.phi[2],
            dpdt=s.dpdt, time=s.time, turb=s.turb, cscalars=s.cscalars,
            chem_dt=s.chem_dt)
        specs = self._specs(ds)
        return jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(self.jmesh, sp)),
            ds, specs)

    def gather_state(self, ds: DistLowMachState) -> LowMachState:
        """Back to the canonical global state (replicates the face split)."""
        phi_x = jnp.concatenate([ds.phi_x, ds.phi_x_top], axis=0)
        return LowMachState(
            rho=ds.rho, U=ds.U, p=ds.p, ha=ds.ha, Y=ds.Y, T=ds.T,
            phi=(phi_x, ds.phi_y, ds.phi_z), dpdt=ds.dpdt, time=ds.time,
            turb=ds.turb, cscalars=ds.cscalars, chem_dt=ds.chem_dt)

    # --------------------------------------------------------------- step
    def _make_body(self, dt_is_array: bool, sources=None):
        axis = self.axis_name
        n = self.n_shards
        solver = self.local_solver
        x_cyclic = self._x_cyclic

        def body(ds: DistLowMachState, dt):
            with shard_axis(axis if n > 1 else None):
                # reconstruct local x-faces 0..nxl: the local top face is the
                # RIGHT neighbour's low face (ring), or the domain top plane
                # on the last shard for non-cyclic domains
                low0 = ds.phi_x[:1]
                if n > 1:
                    bwd = [(i, (i - 1) % n) for i in range(n)]
                    nxt = jax.lax.ppermute(low0, axis, bwd)
                else:
                    nxt = low0
                if x_cyclic:
                    top = nxt
                else:
                    if n > 1:
                        is_last = jax.lax.axis_index(axis) == n - 1
                        top = jnp.where(is_last, ds.phi_x_top, nxt)
                    else:
                        top = ds.phi_x_top
                phi = (jnp.concatenate([ds.phi_x, top], axis=0),
                       ds.phi_y, ds.phi_z)
                s = LowMachState(
                    rho=ds.rho, U=ds.U, p=ds.p, ha=ds.ha, Y=ds.Y, T=ds.T,
                    phi=phi, dpdt=ds.dpdt, time=ds.time, turb=ds.turb,
                    cscalars=ds.cscalars, chem_dt=ds.chem_dt)
                s2, diag = solver.step(s, dt, sources=sources)
                phi_x_new = s2.phi[0]
                top_loc = phi_x_new[-1:]
                if n > 1:
                    # make the carried top plane replicated: only the last
                    # shard holds the true domain-top value
                    is_last = jax.lax.axis_index(axis) == n - 1
                    top_rep = jax.lax.psum(
                        jnp.where(is_last, top_loc, jnp.zeros_like(top_loc)),
                        axis)
                else:
                    top_rep = top_loc
                ds2 = DistLowMachState(
                    rho=s2.rho, U=s2.U, p=s2.p, ha=s2.ha, Y=s2.Y, T=s2.T,
                    phi_x=phi_x_new[:-1], phi_x_top=top_rep,
                    phi_y=s2.phi[1], phi_z=s2.phi[2],
                    dpdt=s2.dpdt, time=s2.time, turb=s2.turb,
                    cscalars=s2.cscalars, chem_dt=s2.chem_dt)
                if n > 1:
                    # diagnostics: force device-invariance (most already are
                    # via the context-global reductions; pmax is idempotent)
                    diag = {k: jax.lax.pmax(v, axis)
                            for k, v in diag.items()}
                return ds2, diag

        return body

    def step(self, ds: DistLowMachState, dt):
        """One distributed PIMPLE step. Returns (new_state, diag)."""
        key = jax.tree.structure(ds)
        fn = self._step_cache.get(key)
        if fn is None:
            specs = self._specs(ds)
            body = self._make_body(dt_is_array=True)
            # check_vma=False: the body mixes mesh-varying fields with
            # replicated constants (identity Jacobian bases, BC values)
            # inside jax.linearize — the static varying-axis typing rejects
            # that; replication of P() outputs is guaranteed by psum/pmax
            fn = jax.jit(jax.shard_map(
                body, mesh=self.jmesh,
                in_specs=(specs, P()), out_specs=(specs, P()),
                check_vma=False))
            self._step_cache[key] = fn
        return fn(ds, jnp.asarray(dt, ds.T.dtype))
