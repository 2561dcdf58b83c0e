"""SPMD domain decomposition for the face-list (CSR/unstructured) backend.

Role parity: the reference's general-mesh multi-process stack — decomposePar
partitioning of arbitrary polyMeshes + MPI processor patches, and the GPU
port's first-class processor halos over the CSR path
(/root/reference/src_gpu/dfMatrixOpBase.H:139-155
`correct_boundary_conditions_processor_scalar`,
dfRefinementHistoryConstraint.C). The structured layer
(parallel/distributed.py) covers box meshes by axis slicing; THIS layer
decomposes any owner/neighbour face list, so blockMesh wedges, polyMesh
imports, and graded boxes run multi-chip.

TPU-first design:
- Cells are partitioned into P contiguous slabs of a bandwidth-friendly
  ordering (default: sort by x cell-centre; the native partitioner
  csrc/partition.cpp supplies the balanced split points). Each shard's
  local cell array is [owned | halo]: halo slots are device-resident copies
  of remote cells one face away.
- Faces incident to an owned cell are replicated per shard; a crossing face
  exists on BOTH sides and each side scatters only into its owned rows
  (mesh.restrict discards halo-row partial sums). This is redundant compute
  on a surface-sized set in exchange for zero-communication operator
  application — the halo exchange (`mesh.exchange`: one lax.ppermute per
  ring offset over ICI) is the ONLY communication besides psum reductions.
- Everything runs in ONE jax.shard_map; shard-local connectivity travels as
  sharded pytree inputs (FaceListMesh is a registered pytree), because a
  closure would be replicated.

Correctness contract (tests/test_distributed_fl.py): chemistry-ON steps on
8 virtual devices match the single-device face-list solver to <=1e-9 on a
box mesh and on the Sandia D blockMesh wedge.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh.facelist import BoundaryPatch, FaceListMesh
from ..native import partition_slabs
from ..solvers.low_mach_fl import LowMachFLState, LowMachSolverFL
from .context import cell_weight, shard_axis

__all__ = ["FLDecomp", "DistributedLowMachFL", "block_order"]


def block_order(centers, grid) -> np.ndarray:
    """Recursive-coordinate-bisection cell ordering for a MULTI-AXIS
    face-list decomposition (the hierarchical decomposePar role; VERDICT
    r3 item 7): sort by x, split into grid[0] groups, sort each by y,
    split into grid[1], then z — so FLDecomp's contiguous slabs of this
    order ARE the (gx, gy, gz) spatial blocks, and every downstream
    structure (halo sets, multi-offset ppermute rings) follows from the
    assignment unchanged.

    n need NOT divide prod(grid) (real meshes rarely do — the Sandia
    wedge is 5,170 cells): the nested splits are sized so their leaf
    groups coincide EXACTLY with FLDecomp's flat `partition_slabs(n, P)`
    boundaries — group (i0, i1, i2) gets the cell count of flat slab
    i0*g1*g2 + i1*g2 + i2, every slab balanced to within one cell."""
    from ..native import partition_slabs as _slabs
    centers = np.asarray(centers)
    n = centers.shape[0]
    Pn = int(np.prod(grid))
    sizes = np.diff(_slabs(n, Pn))            # leaf cell counts, max-min <= 1
    # each group tracks the half-open [lo, hi) range of LEAF slabs it covers
    groups = [(np.arange(n), 0, Pn)]
    stride = Pn
    for ax, g in enumerate(grid):
        g = int(g)
        stride //= g
        if g == 1:
            continue
        nxt = []
        for ids, lo, hi in groups:
            o = ids[np.argsort(centers[ids, ax], kind="stable")]
            off = 0
            for j in range(g):
                a, b = lo + j * stride, lo + (j + 1) * stride
                cnt = int(sizes[a:b].sum())
                nxt.append((o[off:off + cnt], a, b))
                off += cnt
            assert off == len(o), (off, len(o))
        groups = nxt
    assert all(len(ids) == sizes[lo] for ids, lo, hi in groups
               if hi - lo == 1)
    return np.concatenate([g[0] for g in groups])


def _patch_axis(normal: np.ndarray) -> int | None:
    """Static dominant normal axis of a patch, from its CONCRETE global
    normals (argmax over the first face — the same heuristic
    LowMachSolverFL._fix_boundary_fluxes applies at trace time on a
    single-device mesh, where normals are concrete). Shard-local patch
    blocks carry traced normals, so this must be recorded before
    localization. None only for globally-empty patches."""
    if normal.shape[0] == 0:
        return None
    return int(np.argmax(np.abs(normal[0])))


class FLDecomp:
    """Host-side decomposition of one FaceListMesh connectivity.

    All field meshes of a solver share connectivity (same owner/neighbour/
    patch face sets, different ghost coefficients), so ONE decomposition
    localizes them all. Produces stacked (P, ...) arrays ready to enter
    shard_map with spec P(axis).
    """

    def __init__(self, mesh: FaceListMesh, n_shards: int,
                 order: np.ndarray | None = None):
        self.n_shards = int(n_shards)
        Pn = self.n_shards
        own = np.asarray(mesh.owner).astype(np.int64)
        nei = np.asarray(mesh.neighbour).astype(np.int64)
        n = mesh.n_cells
        centers = np.asarray(mesh.centers)
        if order is None:
            # bandwidth-friendly slab ordering along the longest mesh extent
            ext = centers.max(axis=0) - centers.min(axis=0)
            order = np.argsort(centers[:, int(np.argmax(ext))], kind="stable")
        order = np.asarray(order, np.int64)
        starts = partition_slabs(n, Pn)
        shard_of = np.empty(n, np.int32)
        pos_in = np.empty(n, np.int64)
        owned = []
        for r in range(Pn):
            ids = order[starts[r]:starts[r + 1]]
            owned.append(ids)
            shard_of[ids] = r
            pos_in[ids] = np.arange(ids.shape[0])
        self._owned = owned
        self._shard_of = shard_of
        n_own_max = max(len(o) for o in owned)

        # halo sets + local face lists per shard
        halos, loc_faces = [], []
        for r in range(Pn):
            fsel = np.where((shard_of[own] == r) | (shard_of[nei] == r))[0]
            loc_faces.append(fsel)
            cells = np.concatenate([own[fsel], nei[fsel]])
            halos.append(np.unique(cells[shard_of[cells] != r]))
        n_halo_max = max((len(h) for h in halos), default=0)
        self.n_own_max = n_own_max
        self.n_loc = n_own_max + n_halo_max
        self.nf_loc = max((len(f) for f in loc_faces), default=1)
        self._halos = halos

        # local index of a global cell per shard (-1 = absent)
        lidx = -np.ones((Pn, n), np.int64)
        for r in range(Pn):
            lidx[r, owned[r]] = pos_in[owned[r]]
            lidx[r, halos[r]] = n_own_max + np.arange(len(halos[r]))
        self._lidx = lidx

        # cell slot -> global id (pads repeat the shard's first owned cell:
        # benign physical values for the redundant pointwise work)
        cell_gid = np.empty((Pn, self.n_loc), np.int64)
        w_own = np.zeros((Pn, self.n_loc))
        for r in range(Pn):
            cell_gid[r, :] = owned[r][0]
            cell_gid[r, :len(owned[r])] = owned[r]
            cell_gid[r, n_own_max:n_own_max + len(halos[r])] = halos[r]
            w_own[r, :len(owned[r])] = 1.0
        self.cell_gid = cell_gid
        self._w_own = w_own

        # local faces, sorted by local owner; pads target the last local
        # slot with zero area (contribute nothing anywhere)
        self.face_gid = -np.ones((Pn, self.nf_loc), np.int64)
        self._f_own = np.full((Pn, self.nf_loc), self.n_loc - 1, np.int64)
        self._f_nei = np.full((Pn, self.nf_loc), self.n_loc - 1, np.int64)
        self._f_perm = []
        for r in range(Pn):
            f = loc_faces[r]
            lo = lidx[r, own[f]]
            ln = lidx[r, nei[f]]
            srt = np.argsort(lo, kind="stable")
            self._f_perm.append(srt)
            k = len(f)
            self.face_gid[r, :k] = f[srt]
            self._f_own[r, :k] = lo[srt]
            self._f_nei[r, :k] = ln[srt]

        # which shard gathers each global face back (the owner-cell side)
        self._face_src = np.empty((n_faces := own.shape[0], 2), np.int64)
        for r in range(Pn):
            valid = self.face_gid[r] >= 0
            self._face_src[self.face_gid[r, valid], 0] = r
            self._face_src[self.face_gid[r, valid], 1] = \
                np.where(valid)[0]
        # (crossing faces are written twice; either copy is identical —
        # the LAST writer wins deterministically)

        # halo-exchange ring maps grouped by shard offset d:
        # shard t receives its offset-d halos from shard (t+d)%P
        offsets = sorted({int((shard_of[g] - r) % Pn)
                          for r in range(Pn) for g in halos[r]})
        self.halo_offsets = offsets
        self._halo_maps = {}
        for d in offsets:
            per_t = []
            for t in range(Pn):
                s = (t + d) % Pn
                cells = [g for g in halos[t] if shard_of[g] == s]
                per_t.append(np.asarray(cells, np.int64))
            B = max((len(c) for c in per_t), default=0)
            send = np.zeros((Pn, max(B, 1)), np.int64)
            recv = np.full((Pn, max(B, 1)), self.n_loc, np.int64)  # drop pad
            for t in range(Pn):
                s = (t + d) % Pn
                cells = per_t[t]
                if len(cells):
                    # shard s sends: local owned slots of cells (on s)
                    send[s, :len(cells)] = pos_in[cells]
                    # shard t receives into its halo slots
                    recv[t, :len(cells)] = lidx[t, cells]
            self._halo_maps[d] = (send, recv)

        # per-patch local face selections (owner-owned side only)
        self._patch_sel = []       # list over patches: (sel (P, nb_loc),
        self._patch_n = []         #                     valid counts)
        for p in mesh.patches:
            pown = np.asarray(p.owner).astype(np.int64)
            sels, counts = [], []
            for r in range(Pn):
                ids = np.where(shard_of[pown] == r)[0]
                sels.append(ids)
                counts.append(len(ids))
            nb_loc = max(counts) if counts else 0
            sel = np.zeros((Pn, max(nb_loc, 0)), np.int64)
            for r in range(Pn):
                sel[r, :counts[r]] = sels[r]
            self._patch_sel.append((sel, np.asarray(counts), nb_loc))

        self._mesh0 = mesh

    # ------------------------------------------------------------ localize
    def _stack_cells(self, x: np.ndarray) -> np.ndarray:
        return x[self.cell_gid]

    def localize_mesh(self, mesh: FaceListMesh, dtype=None) -> FaceListMesh:
        """Stacked (P, ...) shard-local FaceListMesh sharing this
        decomposition's connectivity. Works for any field mesh built over
        the same geometry (asserted)."""
        assert mesh.n_cells == self._mesh0.n_cells
        assert np.array_equal(np.asarray(mesh.owner),
                              np.asarray(self._mesh0.owner))
        Pn = self.n_shards
        dt = dtype or np.asarray(mesh.mag_sf).dtype

        def faces(x, pad=0.0):
            x = np.asarray(x)
            out = np.full((Pn, self.nf_loc) + x.shape[1:], pad, x.dtype)
            for r in range(Pn):
                valid = self.face_gid[r] >= 0
                out[r, valid] = x[self.face_gid[r, valid]]
            return out

        vols = np.asarray(mesh.volumes)
        # pads repeat a real cell's volume — safe nonzero divisor
        vol_loc = vols[self.cell_gid]

        patches = []
        for ip, p in enumerate(mesh.patches):
            sel, counts, nb_loc = self._patch_sel[ip]
            if nb_loc == 0:
                # globally present but empty on every shard: keep the empty
                # block so patch indices line up across backends
                patches.append(dataclasses.replace(
                    p, owner=jnp.zeros((Pn, 0), jnp.int32),
                    mag_sf=jnp.zeros((Pn, 0), dt),
                    delta=jnp.ones((Pn, 0), dt),
                    a=jnp.ones((Pn, 0), dt), b=jnp.zeros((Pn, 0), dt),
                    normal=jnp.zeros((Pn, 0, 3), dt),
                    n_axis=p.n_axis if p.n_axis is not None
                    else _patch_axis(np.asarray(p.normal))))
                continue
            pown = np.asarray(p.owner).astype(np.int64)

            def pf(x, pad):
                x = np.asarray(x)
                out = np.full((Pn, nb_loc) + x.shape[1:], pad, x.dtype)
                for r in range(Pn):
                    k = counts[r]
                    out[r, :k] = x[sel[r, :k]]
                return out

            owner_loc = np.zeros((Pn, nb_loc), np.int64)
            nrm = pf(np.asarray(p.normal), 0.0)
            for r in range(Pn):
                k = counts[r]
                owner_loc[r, :k] = self._lidx[r, pown[sel[r, :k]]]
                owner_loc[r, k:] = self.n_loc - 1   # pad: zero-area face
                nrm[r, k:, 0] = 1.0                  # pad normal = e_x
            patches.append(dataclasses.replace(
                p,
                owner=jnp.asarray(owner_loc, jnp.int32),
                mag_sf=jnp.asarray(pf(p.mag_sf, 0.0), dt),
                delta=jnp.asarray(pf(p.delta, 1.0), dt),
                a=jnp.asarray(pf(p.a, 1.0), dt),
                b=jnp.asarray(pf(p.b, 0.0), dt),
                normal=jnp.asarray(nrm, dt),
                n_axis=p.n_axis if p.n_axis is not None
                else _patch_axis(np.asarray(p.normal))))

        halo = {d: (jnp.asarray(send, jnp.int32),
                    jnp.asarray(recv, jnp.int32))
                for d, (send, recv) in self._halo_maps.items()}
        # stacked per-shard ELL incidence (one width across shards so the
        # leading axis maps under shard_map)
        from ..mesh.facelist import ell_arrays
        Pn = self._f_own.shape[0]

        def _pad_faces(r):
            # pads are EXACTLY the faces with face_gid == -1 (set where the
            # global face list was padded up to the per-shard max) — the
            # own==nei==n_loc-1 heuristic would wrongly exclude a real
            # self-face (1-cell cyclic axis) landing on slot n_loc-1 when
            # n_halo_max == 0 (advisor r3)
            return np.asarray(self.face_gid[r]) < 0

        def _deg(r):
            keep = ~_pad_faces(r)
            return int(np.bincount(
                np.concatenate([self._f_own[r][keep],
                                self._f_nei[r][keep]]),
                minlength=self.n_loc).max())

        w_ell = max(_deg(r) for r in range(Pn))
        ell_f = np.empty((Pn, self.n_loc, w_ell), np.int32)
        ell_s = np.empty((Pn, self.n_loc, w_ell), np.float32)
        for r in range(Pn):
            ell_f[r], ell_s[r] = ell_arrays(
                self._f_own[r], self._f_nei[r], self.n_loc, w_ell,
                exclude=_pad_faces(r))
        return FaceListMesh(
            n_cells=self.n_loc,
            owner=jnp.asarray(self._f_own, jnp.int32),
            neighbour=jnp.asarray(self._f_nei, jnp.int32),
            mag_sf=jnp.asarray(faces(mesh.mag_sf), dt),
            delta=jnp.asarray(faces(mesh.delta) + (self.face_gid < 0), dt),
            weights=jnp.asarray(faces(mesh.weights), dt),
            normal=jnp.asarray(faces(mesh.normal), dt),
            volumes=jnp.asarray(vol_loc, dt),
            centers=jnp.asarray(np.asarray(mesh.centers)[self.cell_gid], dt),
            patches=tuple(patches),
            w_own=jnp.asarray(self._w_own, dt),
            halo=halo,
            ell_face=jnp.asarray(ell_f), ell_sign=jnp.asarray(ell_s))

    def localize_cell(self, x) -> jax.Array:
        """Global cell field (n, ...) -> stacked local (P, n_loc, ...)."""
        return jnp.asarray(np.asarray(x)[self.cell_gid])

    def gather_cell(self, x_st) -> jax.Array:
        """Stacked local (P, n_loc, ...) -> global (n, ...)."""
        x_st = np.asarray(x_st)
        n = self._mesh0.n_cells
        out = np.empty((n,) + x_st.shape[2:], x_st.dtype)
        for r in range(self.n_shards):
            out[self._owned[r]] = x_st[r, :len(self._owned[r])]
        return jnp.asarray(out)

    def localize_face(self, phi) -> jax.Array:
        phi = np.asarray(phi)
        out = np.zeros((self.n_shards, self.nf_loc) + phi.shape[1:],
                       phi.dtype)
        for r in range(self.n_shards):
            valid = self.face_gid[r] >= 0
            out[r, valid] = phi[self.face_gid[r, valid]]
        return jnp.asarray(out)

    def gather_face(self, phi_st) -> jax.Array:
        phi_st = np.asarray(phi_st)
        src = self._face_src
        return jnp.asarray(phi_st[src[:, 0], src[:, 1]])

    def localize_patchfield(self, ip: int, xb) -> jax.Array:
        """Global per-patch face field (nb, ...) -> stacked (P, nb_loc, ...)."""
        sel, counts, nb_loc = self._patch_sel[ip]
        xb = np.asarray(xb)
        out = np.zeros((self.n_shards, nb_loc) + xb.shape[1:], xb.dtype)
        for r in range(self.n_shards):
            k = counts[r]
            out[r, :k] = xb[sel[r, :k]]
        return jnp.asarray(out)

    def gather_patchfield(self, ip: int, xb_st) -> jax.Array:
        sel, counts, nb_loc = self._patch_sel[ip]
        xb_st = np.asarray(xb_st)
        nb = sum(counts)
        out = np.zeros((nb,) + xb_st.shape[2:], xb_st.dtype)
        for r in range(self.n_shards):
            k = counts[r]
            out[sel[r, :k]] = xb_st[r, :k]
        return jnp.asarray(out)


def _take0(tree):
    return jax.tree.map(lambda a: a[0], tree)


def _stack1(tree):
    return jax.tree.map(lambda a: a[None], tree)


class DistributedLowMachFL:
    """shard_map-distributed LowMachSolverFL over a 1-D device mesh.

    Usage:
        dist = DistributedLowMachFL(solver, n_shards=8)
        ds = dist.shard_state(solver.initial_state(p, T, Y, U))
        ds, diag = dist.step(ds, dt)
        s = dist.gather_state(ds)
    """

    def __init__(self, solver: LowMachSolverFL, n_shards: int | None = None,
                 devices=None, axis_name: str = "cells",
                 order: np.ndarray | None = None):
        if devices is None:
            devices = jax.devices()
        if n_shards is None:
            n_shards = len(devices)
        self.devices = np.array(devices[:n_shards])
        self.axis_name = axis_name
        self.n_shards = n_shards
        self.solver = solver
        self.jmesh = Mesh(self.devices, (axis_name,))
        self.decomp = FLDecomp(solver.m_p, n_shards, order)
        d = self.decomp
        lm = dict(
            m_p=d.localize_mesh(solver.m_p),
            m_h=d.localize_mesh(solver.m_h),
            m_Y=d.localize_mesh(solver.m_Y),
            m_rho=d.localize_mesh(solver.m_rho),
            m_U=tuple(d.localize_mesh(m) for m in solver.m_U),
        )
        if solver.m_k is not None:
            lm["m_k"] = d.localize_mesh(solver.m_k)
            lm["m_eps"] = d.localize_mesh(solver.m_eps)
        # m_Y_groups: species-index tuples are STATIC (they select vmapped
        # solves at trace time) — only the BC meshes travel as sharded
        # leaves; the body re-zips them with the static indices.
        self._yg_idx = None
        if solver.m_Y_groups is not None:
            self._yg_idx = tuple(idx for _, idx in solver.m_Y_groups)
            lm["yg_meshes"] = tuple(
                d.localize_mesh(m) for m, _ in solver.m_Y_groups)
        if solver.wall_fns is not None:
            wf = solver.wall_fns
            lm["wall_fns"] = dataclasses.replace(
                wf, mask=d.localize_cell(wf.mask), y=d.localize_cell(wf.y),
                n_wall=d.localize_cell(wf.n_wall))
        self._lm = jax.device_put(
            lm, NamedSharding(self.jmesh, P(axis_name)))
        self._step_cache: dict = {}

    # ------------------------------------------------------------- layout
    def shard_state(self, s: LowMachFLState):
        d = self.decomp
        # chem_dt structure must be step-invariant under shard_map (the
        # jitted body's output pytree is fixed), so materialize the chemistry
        # warm-start array up front. full(dt_init) reproduces the integrator
        # cold start exactly (reactor.solve_chemistry dt0_f), so the first
        # step is bit-identical to an uninitialized single-device step.
        if (not hasattr(s.chem_dt, "shape") and self.solver.config.chemistry
                and getattr(self.solver.combustion, "ode_opts", None)
                is not None):
            s = s._replace(chem_dt=jnp.full(
                s.T.shape, self.solver.combustion.ode_opts.dt_init,
                s.T.dtype))
        ds = LowMachFLState(
            rho=d.localize_cell(s.rho), U=d.localize_cell(s.U),
            p=d.localize_cell(s.p), ha=d.localize_cell(s.ha),
            Y=d.localize_cell(s.Y), T=d.localize_cell(s.T),
            phi=d.localize_face(s.phi),
            phi_b=tuple(d.localize_patchfield(ip, pb)
                        for ip, pb in enumerate(s.phi_b)),
            dpdt=d.localize_cell(s.dpdt),
            time=s.time,
            chem_dt=(d.localize_cell(s.chem_dt)
                     if hasattr(s.chem_dt, "shape") else s.chem_dt),
            turb=tuple(d.localize_cell(t) for t in s.turb))
        specs = self._state_specs(ds)
        return jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(self.jmesh, sp)),
            ds, specs)

    def gather_state(self, ds) -> LowMachFLState:
        d = self.decomp
        return LowMachFLState(
            rho=d.gather_cell(ds.rho), U=d.gather_cell(ds.U),
            p=d.gather_cell(ds.p), ha=d.gather_cell(ds.ha),
            Y=d.gather_cell(ds.Y), T=d.gather_cell(ds.T),
            phi=d.gather_face(ds.phi),
            phi_b=tuple(d.gather_patchfield(ip, pb)
                        for ip, pb in enumerate(ds.phi_b)),
            dpdt=d.gather_cell(ds.dpdt),
            time=ds.time,
            chem_dt=(d.gather_cell(ds.chem_dt)
                     if hasattr(ds.chem_dt, "shape") else ds.chem_dt),
            turb=tuple(d.gather_cell(t) for t in ds.turb))

    def _state_specs(self, ds) -> LowMachFLState:
        ax = self.axis_name
        c = P(ax)
        return LowMachFLState(
            rho=c, U=c, p=c, ha=c, Y=c, T=c, phi=c,
            phi_b=tuple(c for _ in ds.phi_b), dpdt=c, time=P(),
            chem_dt=c if hasattr(ds.chem_dt, "shape") else (),
            turb=tuple(c for _ in ds.turb))

    # --------------------------------------------------------------- step
    def _make_body(self):
        ax = self.axis_name
        n = self.n_shards
        solver = self.solver

        yg_idx = self._yg_idx

        def body(ds, lm, dt):
            meshes = _take0(lm)
            w_own = meshes["m_p"].w_own
            if yg_idx is not None:
                meshes["m_Y_groups"] = tuple(
                    zip(meshes.pop("yg_meshes"), yg_idx))
            lsolver = dataclasses.replace(solver, **meshes)
            has_chem_dt = hasattr(ds.chem_dt, "ndim")
            s = LowMachFLState(
                rho=ds.rho[0], U=ds.U[0], p=ds.p[0], ha=ds.ha[0],
                Y=ds.Y[0], T=ds.T[0], phi=ds.phi[0],
                phi_b=tuple(pb[0] for pb in ds.phi_b), dpdt=ds.dpdt[0],
                time=ds.time,
                chem_dt=ds.chem_dt[0] if has_chem_dt else ds.chem_dt,
                turb=tuple(t[0] for t in ds.turb))
            with shard_axis(ax if n > 1 else None), cell_weight(w_own):
                s2, diag = lsolver.step(s, dt)
            if n > 1:
                diag = {k: jax.lax.pmax(v, ax) for k, v in diag.items()}
            ds2 = LowMachFLState(
                rho=s2.rho[None], U=s2.U[None], p=s2.p[None],
                ha=s2.ha[None], Y=s2.Y[None], T=s2.T[None],
                phi=s2.phi[None],
                phi_b=tuple(pb[None] for pb in s2.phi_b),
                dpdt=s2.dpdt[None], time=s2.time,
                chem_dt=(s2.chem_dt[None]
                         if hasattr(s2.chem_dt, "ndim") else s2.chem_dt),
                turb=tuple(t[None] for t in s2.turb))
            return ds2, diag

        return body

    def step(self, ds, dt):
        key = jax.tree.structure(ds)
        fn = self._step_cache.get(key)
        if fn is None:
            ax = self.axis_name
            specs = self._state_specs(ds)
            mesh_specs = jax.tree.map(lambda _: P(ax), self._lm)
            body = self._make_body()
            fn = jax.jit(jax.shard_map(
                body, mesh=self.jmesh,
                in_specs=(specs, mesh_specs, P()),
                out_specs=(specs, P()),
                check_vma=False))
            self._step_cache[key] = fn
        return fn(ds, self._lm, jnp.asarray(dt, ds.T.dtype))
