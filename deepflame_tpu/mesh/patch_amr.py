"""Moving-patch local refinement for the density-based solver.

Role parity: the reference's AMR stack — dfDynamicRefineFvMesh multi-criteria
refine/unrefine around the detonation front
(/root/reference/src/dynamicFvMesh/dfDynamicRefineFvMesh.H:116-160,
multiCritRefinement.H:105-158, driven from dfHighSpeedFoam.C:113-138 with
refCri = max|grad rho|). The reference rebuilds unstructured topology every
refineInterval; on TPU topology changes mean retraces, so this module uses
the XLA-native equivalent: a FIXED-SIZE fine patch (static shapes, one
compiled step) whose integer offset tracks the front via `dynamic_slice` —
refine/unrefine becomes data movement, not topology.

Structure (1-level Berger-Collela-style nesting, overwrite coupling):
  - the COARSE solver advances the whole domain every step;
  - the FINE patch (refinement ratio r along x, full extent in y/z) advances
    r substeps at dt/r; its outer `buffer` cells are re-seeded from the
    coarse solution each coarse step, so boundary contamination never
    reaches the interior (buffer >= r * stencil width);
  - coarse cells fully covered by the fine interior are overwritten by the
    conservative restriction (mean) — the fine solution is authoritative;
  - every step the patch recenters on max|grad rho| (the reference's
    refCri), shifting by whole coarse cells inside jit.

Conservation note: the overwrite coupling is not flux-telescoping at the
patch edges; the edges sit in smooth flow (buffer + recentring keep the
front in the interior), which holds the error below the anchor tolerance —
the honest trade for a retrace-free static-shape design.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..solvers.high_speed import HighSpeedSolver, HighSpeedState
from .structured import StructuredMesh

__all__ = ["MovingPatchAMR", "FrontPatchAMR2D", "NestedPatchAMR", "PatchState"]


class PatchState(NamedTuple):
    coarse: HighSpeedState
    fine: HighSpeedState
    offset: jax.Array       # int32: coarse-cell index of the patch left edge


def _repeat_x(q, r):
    """Piecewise-constant prolongation along axis -3 (x)."""
    return jnp.repeat(q, r, axis=-3)


def _mean_x(q, r):
    """Conservative restriction along axis -3."""
    sh = q.shape
    nx = sh[-3]
    q4 = q.reshape(sh[:-3] + (nx // r, r) + sh[-2:])
    return jnp.mean(q4, axis=-3)


@dataclasses.dataclass(frozen=True)
class MovingPatchAMR:
    """One fine moving patch over a coarse HighSpeedSolver domain."""
    coarse: HighSpeedSolver
    fine: HighSpeedSolver            # mesh: (pc * r, ny, nz), dx/r spacing
    ratio: int
    pc: int                          # patch extent in coarse cells
    buffer_c: int = 4                # buffer width in coarse cells (per side)
    # Berger-Colella refluxing: replace the coarse flux at the two
    # coarse-fine interface planes by the substep-averaged fine flux in
    # the update of the adjacent OUTSIDE coarse cells, making the
    # restriction coupling flux-telescoping (the conservative refinement
    # role of dfDynamicRefineFvMesh's mapped fluxes, H:85-90). Costs one
    # extra flux evaluation per RK stage (step_with_flux_x).
    reflux: bool = False

    @staticmethod
    def build(coarse: HighSpeedSolver, pc: int, ratio: int = 4,
              buffer_c: int = 4, reflux: bool = False) -> "MovingPatchAMR":
        m = coarse.mesh
        fine_mesh = StructuredMesh(pc * ratio, m.ny, m.nz,
                                   m.dx / ratio, m.dy, m.dz,
                                   m.x0, m.y0, m.z0)
        fine = dataclasses.replace(coarse, mesh=fine_mesh)
        return MovingPatchAMR(coarse=coarse, fine=fine, ratio=ratio, pc=pc,
                              buffer_c=buffer_c, reflux=reflux)

    # ------------------------------------------------------------ plumbing
    def _cons(self, s: HighSpeedState):
        return (s.rho, s.rhoU, s.rhoE, s.rhoY, s.T)

    def _with(self, s: HighSpeedState, vals) -> HighSpeedState:
        rho, rhoU, rhoE, rhoY, T = vals
        return s._replace(rho=rho, rhoU=rhoU, rhoE=rhoE, rhoY=rhoY, T=T)

    def _slice_c(self, q, off, n):
        """x-window [off, off+n) of a coarse field (any leading dims)."""
        z = jnp.zeros((), jnp.int32)
        starts = (z,) * (q.ndim - 3) + (jnp.asarray(off, jnp.int32), z, z)
        sizes = q.shape[:-3] + (n,) + q.shape[-2:]
        return jax.lax.dynamic_slice(q, starts, sizes)

    def _insert_c(self, q, patch, off):
        z = jnp.zeros((), jnp.int32)
        starts = (z,) * (q.ndim - 3) + (jnp.asarray(off, jnp.int32), z, z)
        return jax.lax.dynamic_update_slice(q, patch, starts)

    def prolong(self, sc: HighSpeedState, off) -> HighSpeedState:
        """Fine-patch state from the coarse window (p.w. constant)."""
        vals = tuple(_repeat_x(self._slice_c(q, off, self.pc), self.ratio)
                     for q in self._cons(sc))
        return HighSpeedState(rho=vals[0], rhoU=vals[1], rhoE=vals[2],
                              rhoY=vals[3], T=vals[4], time=sc.time)

    # ---------------------------------------------------------------- init
    def initial_state(self, p, T, Y, U=None, time=0.0,
                      offset: int = 0) -> PatchState:
        sc = self.coarse.initial_state(p, T, Y, U, time)
        off = jnp.asarray(offset, jnp.int32)
        sf = self.prolong(sc, off)
        return PatchState(coarse=sc, fine=sf, offset=off)

    # ---------------------------------------------------------------- step
    def step(self, ps: PatchState, dt) -> tuple[PatchState, dict]:
        r = self.ratio
        b = self.buffer_c
        pc = self.pc
        sc, sf, off = ps

        # 1. coarse step over the whole domain
        if self.reflux:
            sc2, diag_c, fx_c = self.coarse.step_with_flux_x(sc, dt)
        else:
            sc2, diag_c = self.coarse.step(sc, dt)

        # 2. re-seed the fine buffer zones from the coarse state (start-of-
        #    step values; the buffer absorbs the time-lag error)
        seeded = []
        for qf, qc in zip(self._cons(sf), self._cons(sc)):
            proj = _repeat_x(self._slice_c(qc, off, pc), r)
            nxf = qf.shape[-3]
            ix = jnp.arange(nxf)
            in_buf = (ix < b * r) | (ix >= nxf - b * r)
            shape = [1] * qf.ndim
            shape[-3] = nxf
            mask = in_buf.reshape(shape)
            seeded.append(jnp.where(mask, proj, qf))
        sf = self._with(sf, seeded)

        # 3. fine substeps (CFL-matched: dx/r at dt/r)
        keys = ("rho", "rhoU", "rhoE", "rhoY")
        if self.reflux:
            # accumulate the fine interface-plane fluxes (x-faces b*r and
            # (pc-b)*r — STATIC indices) across the r substeps
            iL, iR = b * r, (pc - b) * r

            def plane_f(F, i):
                return jax.lax.index_in_dim(F, i, axis=F.ndim - 3,
                                            keepdims=True)

            def sub(carry, _):
                s, acc = carry
                s2, _, fx = self.fine.step_with_flux_x(s, dt / r)
                acc2 = {k: (acc[k][0] + plane_f(fx[k], iL),
                            acc[k][1] + plane_f(fx[k], iR)) for k in keys}
                return (s2, acc2), None

            ny, nz = self.fine.mesh.ny, self.fine.mesh.nz
            ns = sf.rhoY.shape[0]
            dt_ = sf.rho.dtype
            zplane = {"rho": jnp.zeros((1, ny, nz), dt_),
                      "rhoU": jnp.zeros((3, 1, ny, nz), dt_),
                      "rhoE": jnp.zeros((1, ny, nz), dt_),
                      "rhoY": jnp.zeros((ns, 1, ny, nz), dt_)}
            zero_acc = {k: (zplane[k], zplane[k]) for k in keys}
            (sf2, acc), _ = jax.lax.scan(sub, (sf, zero_acc), None, length=r)
            ff = {k: (acc[k][0] / r, acc[k][1] / r) for k in keys}
        else:
            def sub(s, _):
                s2, _ = self.fine.step(s, dt / r)
                return s2, None
            sf2, _ = jax.lax.scan(sub, sf, None, length=r)

        # 4. conservative restriction of the fine INTERIOR onto the coarse
        restricted = []
        for qf, qc in zip(self._cons(sf2), self._cons(sc2)):
            qr = _mean_x(qf, r)                       # (pc, ny, nz) window
            inner = self._slice_c(qr, b, pc - 2 * b) if b > 0 else qr
            restricted.append(self._insert_c(qc, inner, off + b))
        sc2 = self._with(sc2, restricted)

        # 4b. refluxing: the outside cells adjacent to the interfaces were
        # updated with the COARSE flux at those planes; replace it by the
        # substep-averaged FINE flux so the coupling telescopes (total of
        # each conserved variable changes only through domain boundaries)
        if self.reflux:
            hx = self.coarse.mesh.dx
            fixed = []
            for k, qc in zip(keys, self._cons(sc2)[:4]):
                fcL = self._slice_c(fx_c[k], off + b, 1)
                fcR = self._slice_c(fx_c[k], off + pc - b, 1)
                cL = self._slice_c(qc, off + b - 1, 1)
                cR = self._slice_c(qc, off + pc - b, 1)
                cL = cL - (dt / hx) * (ff[k][0] - fcL)
                cR = cR + (dt / hx) * (ff[k][1] - fcR)
                qc = self._insert_c(qc, cL, off + b - 1)
                qc = self._insert_c(qc, cR, off + pc - b)
                fixed.append(qc)
            sc2 = self._with(sc2, tuple(fixed) + (self._cons(sc2)[4],))
        # re-derive coarse T under the patch from the conserved variables
        _, _, _, T_new, _ = self.coarse.primitives(sc2)
        sc2 = sc2._replace(T=T_new)

        # 5. recenter on the front: refCri = max|grad rho| on the coarse
        #    grid (dfHighSpeedFoam.C:113-121)
        g = jnp.abs(jnp.diff(sc2.rho, axis=0)).max(axis=(1, 2))   # (nxc-1,)
        i_front = jnp.argmax(g).astype(jnp.int32)
        nxc = self.coarse.mesh.nx
        off_new = jnp.clip(i_front - pc // 2, 0, nxc - pc).astype(jnp.int32)
        # shift fine data; newly exposed cells take the coarse prolongation.
        # Cells whose roll-SOURCE lies in the old buffer zones also take
        # the prolongation: buffer data was seeded+advanced but never
        # restricted, so its block means do not match the coarse — rolling
        # it into the interior is a one-time conservation leak (caught by
        # test_reflux_conserves_mass_energy with a moving window).
        shift_f = (off_new - off) * r
        fresh = self.prolong(sc2, off_new)
        shifted = []
        nxf = pc * r
        ix = jnp.arange(nxf)
        src = ix + shift_f
        valid = (src >= b * r) & (src < nxf - b * r)
        for qf, qp in zip(self._cons(sf2), self._cons(fresh)):
            rolled = jnp.roll(qf, -shift_f, axis=-3)
            shape = [1] * qf.ndim
            shape[-3] = nxf
            m = valid.reshape(shape)
            shifted.append(jnp.where(m, rolled, qp))
        sf2 = self._with(fresh, shifted)
        sf2 = sf2._replace(time=sc2.time)

        diag = dict(diag_c)
        diag["patch_offset"] = off_new
        diag["T_max"] = jnp.maximum(diag_c["T_max"], jnp.max(sf2.T))
        diag["p_max"] = diag_c["p_max"]
        return PatchState(coarse=sc2, fine=sf2, offset=off_new), diag


class RowPatchState(NamedTuple):
    coarse: HighSpeedState
    fine: HighSpeedState     # leading row axis: each leaf (n_rows, ...)
    offsets: jax.Array       # (n_rows,) int32 per-row patch x-offsets


def _zg_bcs_y(bcs):
    """Replace the y-axis BC pair with zeroGradient (patch-interior edges
    are buffer-seeded from the coarse state, never real boundaries)."""
    from .structured import zero_gradient
    zg = zero_gradient()
    return (bcs[0], (zg, zg), bcs[2])


@dataclasses.dataclass(frozen=True)
class FrontPatchAMR2D:
    """Front-SHAPED moving refinement: one fine x-patch PER y-ROW, each with
    its own x-offset tracking the local front position — the tile-row
    granularity analogue of dfDynamicRefineFvMesh's per-cell refinement
    (multiCritRefinement.H:105-158) for curved/cellular 2D fronts, with
    static shapes (vmapped over rows; offsets move by dynamic_slice, no
    retraces).

    Each row patch covers (pc coarse cells in x) x (nyb + 2*buffer_y in y),
    refined `ratio`x along x (front-normal). Row patches overlap their
    neighbours by buffer_y rows; buffers (x and y) are re-seeded from the
    coarse solution every coarse step and excluded from the restriction, so
    row-seam and patch-edge contamination is discarded each step. The y
    BCs of the patch solver are zeroGradient placeholders under the seeded
    buffers. Same conservation trade as MovingPatchAMR (overwrite coupling).
    """
    coarse: HighSpeedSolver
    fine: HighSpeedSolver            # mesh: (pc*r, nyb + 2*by, nz)
    ratio: int
    pc: int
    n_rows: int
    buffer_c: int = 4                # x-buffer width [coarse cells, per side]
    buffer_y: int = 4                # y-buffer width [cells, per side]

    @staticmethod
    def build(coarse: HighSpeedSolver, pc: int, n_rows: int, ratio: int = 4,
              buffer_c: int = 4, buffer_y: int = 4) -> "FrontPatchAMR2D":
        m = coarse.mesh
        assert m.ny % n_rows == 0, (m.ny, n_rows)
        nyb = m.ny // n_rows
        fine_mesh = StructuredMesh(pc * ratio, nyb + 2 * buffer_y, m.nz,
                                   m.dx / ratio, m.dy, m.dz,
                                   m.x0, m.y0, m.z0)
        fine = dataclasses.replace(
            coarse, mesh=fine_mesh,
            bcs_rho=_zg_bcs_y(coarse.bcs_rho),
            bcs_U=tuple(_zg_bcs_y(b) for b in coarse.bcs_U),
            bcs_p=_zg_bcs_y(coarse.bcs_p),
            bcs_Y=_zg_bcs_y(coarse.bcs_Y))
        return FrontPatchAMR2D(coarse=coarse, fine=fine, ratio=ratio, pc=pc,
                               n_rows=n_rows, buffer_c=buffer_c,
                               buffer_y=buffer_y)

    # ------------------------------------------------------------ plumbing
    @property
    def nyb(self):
        return self.coarse.mesh.ny // self.n_rows

    def _cons(self, s: HighSpeedState):
        return (s.rho, s.rhoU, s.rhoE, s.rhoY, s.T)

    def _with(self, s: HighSpeedState, vals) -> HighSpeedState:
        rho, rhoU, rhoE, rhoY, T = vals
        return s._replace(rho=rho, rhoU=rhoU, rhoE=rhoE, rhoY=rhoY, T=T)

    def _pad_y(self, q):
        """Edge-replicate pad by buffer_y along y so every row window
        (pc, nyb + 2 by) gathers without clamping."""
        by = self.buffer_y
        pw = [(0, 0)] * q.ndim
        pw[-2] = (by, by)
        return jnp.pad(q, pw, mode="edge")

    def _window(self, q_pady, offx, j):
        """Row-j window (pc, nyb + 2 by[, nz]) of a y-padded coarse field."""
        z = jnp.zeros((), jnp.int32)
        ys = jnp.asarray(j * self.nyb, jnp.int32)
        starts = (z,) * (q_pady.ndim - 3) + (jnp.asarray(offx, jnp.int32),
                                             ys, z)
        sizes = q_pady.shape[:-3] + (self.pc, self.nyb + 2 * self.buffer_y,
                                     q_pady.shape[-1])
        return jax.lax.dynamic_slice(q_pady, starts, sizes)

    def prolong_rows(self, sc: HighSpeedState, offs) -> HighSpeedState:
        """Per-row fine states from coarse windows (p.w. constant in x)."""
        rows = jnp.arange(self.n_rows, dtype=jnp.int32)

        def one(q):
            qp = self._pad_y(q)
            return jax.vmap(lambda o, j: _repeat_x(self._window(qp, o, j),
                                                   self.ratio))(offs, rows)

        vals = tuple(one(q) for q in self._cons(sc))
        t = jnp.broadcast_to(sc.time, (self.n_rows,))
        return HighSpeedState(rho=vals[0], rhoU=vals[1], rhoE=vals[2],
                              rhoY=vals[3], T=vals[4], time=t)

    def _fronts(self, rho):
        """Per-row front x-index from max |d rho/dx| within the row."""
        g = jnp.abs(jnp.diff(rho, axis=0)).max(axis=2)     # (nx-1, ny)
        gr = g.reshape(g.shape[0], self.n_rows, self.nyb).max(axis=2)
        return jnp.argmax(gr, axis=0).astype(jnp.int32)    # (n_rows,)

    # ---------------------------------------------------------------- init
    def initial_state(self, p, T, Y, U=None, time=0.0) -> RowPatchState:
        sc = self.coarse.initial_state(p, T, Y, U, time)
        nxc = self.coarse.mesh.nx
        offs = jnp.clip(self._fronts(sc.rho) - self.pc // 2, 0,
                        nxc - self.pc)
        return RowPatchState(coarse=sc, fine=self.prolong_rows(sc, offs),
                             offsets=offs)

    # ---------------------------------------------------------------- step
    def step(self, ps: RowPatchState, dt) -> tuple[RowPatchState, dict]:
        r = self.ratio
        b = self.buffer_c
        by = self.buffer_y
        pc, nyb = self.pc, self.nyb
        sc, sf, offs = ps
        rows = jnp.arange(self.n_rows, dtype=jnp.int32)

        # 1. coarse step over the whole domain
        sc2, diag_c = self.coarse.step(sc, dt)

        # 2. re-seed x- and y-buffers of every row patch from the coarse
        #    start-of-step state
        nxf = pc * r
        nyf = nyb + 2 * by
        ix = jnp.arange(nxf)
        iy = jnp.arange(nyf)
        in_buf = ((ix[:, None] < b * r) | (ix[:, None] >= nxf - b * r)
                  | (iy[None, :] < by) | (iy[None, :] >= nyf - by))
        seeded = []
        for qf, qc in zip(self._cons(sf), self._cons(sc)):
            qp = self._pad_y(qc)
            proj = jax.vmap(lambda o, j: _repeat_x(self._window(qp, o, j),
                                                   r))(offs, rows)
            shape = [1] * qf.ndim
            shape[-3], shape[-2] = nxf, nyf
            mask = in_buf.reshape(shape)
            seeded.append(jnp.where(mask, proj, qf))
        sf = self._with(sf, seeded)

        # 3. fine substeps, vmapped over rows
        def advance(s):
            def sub(st, _):
                st2, _ = self.fine.step(st, dt / r)
                return st2, None
            s2, _ = jax.lax.scan(sub, s, None, length=r)
            return s2

        sf2 = jax.vmap(advance)(sf)

        # 4. conservative restriction of each row interior onto the coarse
        restricted = []
        for qf, qc in zip(self._cons(sf2), self._cons(sc2)):
            qr = jax.vmap(lambda q: _mean_x(q, r))(qf)   # (R, ..., pc, nyf, nz)
            inner = qr[..., b:pc - b, by:by + nyb, :]
            z = jnp.zeros((), jnp.int32)

            def ins(acc, j):
                starts = (z,) * (qc.ndim - 3) + (offs[j] + b, j * nyb, z)
                return jax.lax.dynamic_update_slice(acc, inner[j], starts), None

            out, _ = jax.lax.scan(ins, qc, rows)
            restricted.append(out)
        sc2 = self._with(sc2, restricted)
        _, _, _, T_new, _ = self.coarse.primitives(sc2)
        sc2 = sc2._replace(T=T_new)

        # 5. recenter each row on its local front
        nxc = self.coarse.mesh.nx
        offs_new = jnp.clip(self._fronts(sc2.rho) - pc // 2, 0, nxc - pc)

        # 6. shift fine data per row; newly exposed cells take the coarse
        #    prolongation
        fresh = self.prolong_rows(sc2, offs_new)
        shift_f = (offs_new - offs) * r                   # (n_rows,)
        valid = ((ix[None, :] + shift_f[:, None] >= 0)
                 & (ix[None, :] + shift_f[:, None] < nxf))  # (R, nxf)
        shifted = []
        for qf, qp in zip(self._cons(sf2), self._cons(fresh)):
            rolled = jax.vmap(lambda q, s: jnp.roll(q, -s, axis=-3))(qf,
                                                                     shift_f)
            m = valid.reshape((self.n_rows,) + (1,) * (qf.ndim - 4)
                              + (nxf, 1, 1))
            shifted.append(jnp.where(m, rolled, qp))
        sf2 = self._with(fresh, shifted)
        sf2 = sf2._replace(time=jnp.broadcast_to(sc2.time, (self.n_rows,)))

        diag = dict(diag_c)
        diag["patch_offsets"] = offs_new
        diag["T_max"] = jnp.maximum(diag_c["T_max"], jnp.max(sf2.T))
        return RowPatchState(coarse=sc2, fine=sf2, offsets=offs_new), diag


# ===================================================================== nested

def _repeat_axes(q, r, axes):
    """Piecewise-constant prolongation along the given SPATIAL axes
    (0=x, 1=y, 2=z; field spatial dims are the trailing three)."""
    for ax in axes:
        q = jnp.repeat(q, r, axis=ax - 3)
    return q


def _mean_axes(q, r, axes):
    """Conservative restriction (block mean) along the given spatial axes."""
    for ax in axes:
        d = ax - 3 if ax - 3 >= 0 else q.ndim + ax - 3
        n = q.shape[d]
        sh = q.shape[:d] + (n // r, r) + q.shape[d + 1:]
        q = jnp.mean(q.reshape(sh), axis=d + 1)
    return q


@dataclasses.dataclass(frozen=True)
class NestedPatchAMR:
    """Multi-level 2:1 moving-patch refinement (hexRef-parity direction).

    Role parity: dfDynamicRefineFvMesh's maxRefinement-level cascade with
    2:1 interfaces and unrefinement history
    (/root/reference/src/dynamicFvMesh/dfDynamicRefineFvMesh.H:116-160;
    hexRef topology engine, /root/reference/src/dynamicMesh/polyTopoChange/
    polyTopoChange/hexRef/hexRef.C). Each level is a fixed-shape fine patch
    (static shapes — no retraces) refined `ratio`x along the tracked x
    direction AND (isotropic mode) along every non-degenerate transverse
    axis — the hexRef8-style cube split. Levels nest recursively: level
    l+1's patch lives inside level l's fine array with its own x-offset,
    each level substepping `ratio`x in time (Berger-Collela cascade).
    Unrefinement is the moving window itself: cells the front leaves revert
    to the coarser level holding the conservative restriction — the
    data-parallel equivalent of dfRefinementHistory unrefine.

    State is the recursive PatchState (fine = PatchState of the next
    level). On a window shift the child's offset is re-anchored
    (offset - shift) so deeper data stays fixed in physical space.
    """
    coarse: HighSpeedSolver
    fine: HighSpeedSolver
    child: "NestedPatchAMR | None"
    ratio: int
    pc: int
    buffer_c: int = 2
    axes: tuple = (0,)
    criteria: "object | None" = None   # RefinementCriteria (mesh/amr.py):
    # multi-criteria window targeting (the multiCritRefinement role,
    # dfDynamicRefineFvMesh.H:116-160) — the window recenters on the
    # CENTROID of the marked-cell field instead of max|grad rho|
    # Berger-Colella refluxing at every level's x-interfaces (see
    # MovingPatchAMR.reflux); transverse axes refine full-extent so x is
    # the only coarse-fine interface direction in this design.
    reflux: bool = False
    # window clamp (in THIS level's coarse x-cells): a child window must
    # stay out of its parent's seeded buffer zone — child data there is
    # overwritten every parent step, and a child restriction straddling
    # the parent's interface plane silently moves mass across it (breaks
    # the reflux telescoping). Set by the parent at build time.
    x_margin: int = 0

    @staticmethod
    def build(coarse: HighSpeedSolver, pcs, ratio: int = 2,
              buffer_c: int = 2, isotropic: bool = True,
              criteria=None, reflux: bool = False) -> "NestedPatchAMR":
        """pcs: per-level patch extents, each in the PARENT level's x-cells
        (e.g. (16, 8) = two levels). isotropic refines every non-degenerate
        axis (hexRef8 role); False refines x only (hexRef2 role).
        criteria: optional RefinementCriteria driving the window target
        (field windows / gradient / curl / interface marks, buffered)."""
        m = coarse.mesh
        axes = tuple(ax for ax in range(3)
                     if ax == 0 or (isotropic and m.shape[ax] > 1))
        pc = pcs[0]
        dims = [pc * ratio if 0 in axes else pc,
                m.ny * ratio if 1 in axes else m.ny,
                m.nz * ratio if 2 in axes else m.nz]
        sp = [m.dx / ratio if 0 in axes else m.dx,
              m.dy / ratio if 1 in axes else m.dy,
              m.dz / ratio if 2 in axes else m.dz]
        fine_mesh = StructuredMesh(dims[0], dims[1], dims[2],
                                   sp[0], sp[1], sp[2], m.x0, m.y0, m.z0)
        fine = dataclasses.replace(coarse, mesh=fine_mesh)
        child = (NestedPatchAMR.build(fine, pcs[1:], ratio, buffer_c,
                                      isotropic, criteria, reflux)
                 if len(pcs) > 1 else None)
        if child is not None:
            rx = ratio if 0 in axes else 1
            child = dataclasses.replace(child, x_margin=buffer_c * rx)
        return NestedPatchAMR(coarse=coarse, fine=fine, child=child,
                              ratio=ratio, pc=pc, buffer_c=buffer_c,
                              axes=axes, criteria=criteria, reflux=reflux)

    # ------------------------------------------------------------ plumbing
    def _cons(self, s):
        return (s.rho, s.rhoU, s.rhoE, s.rhoY, s.T)

    def _with(self, s, vals):
        rho, rhoU, rhoE, rhoY, T = vals
        return s._replace(rho=rho, rhoU=rhoU, rhoE=rhoE, rhoY=rhoY, T=T)

    def _slice_c(self, q, off, n):
        z = jnp.zeros((), jnp.int32)
        starts = (z,) * (q.ndim - 3) + (jnp.asarray(off, jnp.int32), z, z)
        sizes = q.shape[:-3] + (n,) + q.shape[-2:]
        return jax.lax.dynamic_slice(q, starts, sizes)

    def _insert_c(self, q, patch, off):
        z = jnp.zeros((), jnp.int32)
        starts = (z,) * (q.ndim - 3) + (jnp.asarray(off, jnp.int32), z, z)
        return jax.lax.dynamic_update_slice(q, patch, starts)

    def prolong(self, sc, off):
        vals = tuple(
            _repeat_axes(self._slice_c(q, off, self.pc), self.ratio,
                         self.axes)
            for q in self._cons(sc))
        return HighSpeedState(rho=vals[0], rhoU=vals[1], rhoE=vals[2],
                              rhoY=vals[3], T=vals[4], time=sc.time)

    def initial_fine(self, sc, offset: int = 0) -> PatchState:
        off = jnp.asarray(offset, jnp.int32)
        sf = self.prolong(sc, off)
        fine = (self.child.initial_fine(
            sf, (self.fine.mesh.nx - self.child.pc) // 2)
            if self.child is not None else sf)
        return PatchState(coarse=sc, fine=fine, offset=off)

    def initial_state(self, p, T, Y, U=None, time=0.0,
                      offset: int = 0) -> PatchState:
        sc = self.coarse.initial_state(p, T, Y, U, time)
        return self.initial_fine(sc, offset)

    def _base(self, fine):
        """The fine-solver HighSpeedState inside a (possibly nested) fine."""
        return fine.coarse if isinstance(fine, PatchState) else fine

    def _set_base(self, fine, base):
        return (fine._replace(coarse=base) if isinstance(fine, PatchState)
                else base)

    # ---------------------------------------------------------------- step
    def step(self, ps: PatchState, dt, want_flux_x: bool = False):
        r = self.ratio
        b = self.buffer_c
        pc = self.pc
        sc, fine, off = ps
        sf = self._base(fine)

        # 1. this level's (coarse) step over its whole extent
        fx_c = None
        if self.reflux or want_flux_x:
            sc2, diag_c, fx_c = self.coarse.step_with_flux_x(sc, dt)
        else:
            sc2, diag_c = self.coarse.step(sc, dt)

        # 2. seed fine x-buffer zones from the start-of-step coarse state
        seeded = []
        rx = r if 0 in self.axes else 1
        for qf, qc in zip(self._cons(sf), self._cons(sc)):
            proj = _repeat_axes(self._slice_c(qc, off, pc), r, self.axes)
            nxf = qf.shape[-3]
            ix = jnp.arange(nxf)
            in_buf = (ix < b * rx) | (ix >= nxf - b * rx)
            shape = [1] * qf.ndim
            shape[-3] = nxf
            seeded.append(jnp.where(in_buf.reshape(shape), proj, qf))
        fine = self._set_base(fine, self._with(sf, seeded))

        # 3. fine substeps (recursive through deeper levels)
        keys = ("rho", "rhoU", "rhoE", "rhoY")
        rx_ = r if 0 in self.axes else 1
        if self.reflux:
            # accumulate this level's fine fluxes at its two x-interface
            # planes (static fine-face indices); deeper levels reflux
            # themselves inside child.step
            iL, iR = b * rx_, (pc - b) * rx_

            def plane_f(F, i):
                return jax.lax.index_in_dim(F, i, axis=F.ndim - 3,
                                            keepdims=True)

            def fine_step_fx(s, dt_f):
                if self.child is None:
                    return self.fine.step_with_flux_x(s, dt_f)
                s2, dg, fx = self.child.step(s, dt_f, want_flux_x=True)
                return s2, dg, fx

            fm = self.fine.mesh
            ns = sf.rhoY.shape[0]
            dt_y = sf.rho.dtype
            zp = {"rho": jnp.zeros((1, fm.ny, fm.nz), dt_y),
                  "rhoU": jnp.zeros((3, 1, fm.ny, fm.nz), dt_y),
                  "rhoE": jnp.zeros((1, fm.ny, fm.nz), dt_y),
                  "rhoY": jnp.zeros((ns, 1, fm.ny, fm.nz), dt_y)}
            zero_acc = {k: (zp[k], zp[k]) for k in keys}

            def sub(carry, _):
                s, acc = carry
                s2, _, fx = fine_step_fx(s, dt / r)
                acc2 = {k: (acc[k][0] + plane_f(fx[k], iL),
                            acc[k][1] + plane_f(fx[k], iR)) for k in keys}
                return (s2, acc2), None

            (fine2, acc), _ = jax.lax.scan(sub, (fine, zero_acc), None,
                                           length=r)
            t_ax = [a for a in self.axes if a != 0]
            ff = {k: (_mean_axes(acc[k][0] / r, r, t_ax),
                      _mean_axes(acc[k][1] / r, r, t_ax)) for k in keys}
        else:
            if self.child is None:
                def sub(s, _):
                    s2, _ = self.fine.step(s, dt / r)
                    return s2, None
            else:
                def sub(cs, _):
                    cs2, _ = self.child.step(cs, dt / r)
                    return cs2, None
            fine2, _ = jax.lax.scan(sub, fine, None, length=r)
        sf2 = self._base(fine2)

        # 4. conservative restriction of the fine INTERIOR onto the coarse
        restricted = []
        for qf, qc in zip(self._cons(sf2), self._cons(sc2)):
            qr = _mean_axes(qf, r, self.axes)            # (pc, nyc, nzc)
            inner = self._slice_c(qr, b, pc - 2 * b) if b > 0 else qr
            restricted.append(self._insert_c(qc, inner, off + b))
        sc2 = self._with(sc2, restricted)

        # 4b. refluxing (see MovingPatchAMR.step 4b): substep-averaged,
        # transverse-restricted fine fluxes replace the coarse flux in the
        # outside cells adjacent to the interfaces
        if self.reflux:
            hx = self.coarse.mesh.dx
            fixed = []
            for k, qc in zip(keys, self._cons(sc2)[:4]):
                fcL = self._slice_c(fx_c[k], off + b, 1)
                fcR = self._slice_c(fx_c[k], off + pc - b, 1)
                cL = self._slice_c(qc, off + b - 1, 1)
                cR = self._slice_c(qc, off + pc - b, 1)
                cL = cL - (dt / hx) * (ff[k][0] - fcL)
                cR = cR + (dt / hx) * (ff[k][1] - fcR)
                qc = self._insert_c(qc, cL, off + b - 1)
                qc = self._insert_c(qc, cR, off + pc - b)
                fixed.append(qc)
            sc2 = self._with(sc2, tuple(fixed) + (self._cons(sc2)[4],))
        _, _, _, T_new, _ = self.coarse.primitives(sc2)
        sc2 = sc2._replace(T=T_new)

        # 5. recenter: criteria-driven (multiCritRefinement role) when a
        # RefinementCriteria is set — window centers on the centroid of the
        # marked-cell field; else the default refCri = max|grad rho|
        nxc = self.coarse.mesh.nx
        if self.criteria is not None:
            from .amr import mark_cells
            rhoI, U, p_f, T_f, Y_f = self.coarse.primitives(sc2)
            fields = {"rho": sc2.rho, "T": T_f, "p": p_f, "U": U}
            for k, i_sp in getattr(self.criteria, "species", ()):  # optional
                fields[k] = Y_f[i_sp]
            mark = mark_cells(self.criteria, fields, self.coarse.bcs_rho,
                              self.coarse.mesh)
            m_x = jnp.sum(mark, axis=(1, 2)) > 0
            tot = jnp.sum(m_x)
            ix = jnp.arange(nxc)
            # LEAD edge of the marked set (largest marked x-index): a
            # front's wake (burned column, shocked region) can mark a span
            # far longer than the window, and a centroid target then lags
            # until the front escapes the fine region. Anchor the window
            # with the lead edge at its 3/4 point (wake fills the rest).
            i_lead = jnp.max(jnp.where(m_x, ix, -1))
            tgt = i_lead - (3 * pc) // 4 + pc // 2       # -> off uses -pc//2
            i_front = jnp.where(tot > 0, tgt, off + pc // 2)
            i_front = i_front.astype(jnp.int32)
        else:
            g = jnp.abs(jnp.diff(sc2.rho, axis=0)).max(
                axis=tuple(range(1, sc2.rho.ndim)))
            i_front = jnp.argmax(g).astype(jnp.int32)
        off_new = jnp.clip(i_front - pc // 2, self.x_margin,
                           nxc - pc - self.x_margin).astype(jnp.int32)
        fine2 = self._reframe(fine2, sc2, off, off_new)

        diag = dict(diag_c)
        diag["patch_offset"] = off_new
        diag["T_max"] = jnp.maximum(diag_c["T_max"], jnp.max(sf2.T))
        ps2 = PatchState(coarse=sc2, fine=fine2, offset=off_new)
        if want_flux_x:
            return ps2, diag, fx_c
        return ps2, diag

    def _reframe(self, fine, base_new, off_data, off_new):
        """Re-anchor this level's fine structure from window position
        off_data to off_new over the (already-updated) parent state
        base_new: roll retained data, fill newly exposed cells by
        prolongation, and RECURSIVELY re-anchor deeper windows so their
        data stays fixed in physical space (a clipped child re-anchor
        without the matching data roll mis-aligns the child interior —
        the corruption mode this fixes)."""
        rx = self.ratio if 0 in self.axes else 1
        sf = self._base(fine)
        shift_f = (jnp.asarray(off_new, jnp.int32)
                   - jnp.asarray(off_data, jnp.int32)) * rx
        fresh = self.prolong(base_new, off_new)
        nxf = self.pc * rx
        ix = jnp.arange(nxf)
        # exclude roll-sources in the old buffer zones (never restricted:
        # their block means do not match the coarse — see MovingPatchAMR
        # step 5's conservation note)
        src = ix + shift_f
        valid = (src >= self.buffer_c * rx) & (src < nxf
                                               - self.buffer_c * rx)
        shifted = []
        for qf, qp in zip(self._cons(sf), self._cons(fresh)):
            rolled = jnp.roll(qf, -shift_f, axis=-3)
            shape = [1] * qf.ndim
            shape[-3] = nxf
            shifted.append(jnp.where(valid.reshape(shape), rolled, qp))
        sf_new = self._with(fresh, shifted)._replace(time=base_new.time)
        if self.child is None:
            return sf_new
        # child data anchor expressed in THIS level's new frame
        a_child = fine.offset - shift_f
        c_new = jnp.clip(a_child, self.child.x_margin,
                         nxf - self.child.pc
                         - self.child.x_margin).astype(jnp.int32)
        child_fine = self.child._reframe(fine.fine, sf_new, a_child, c_new)
        return PatchState(coarse=sf_new, fine=child_fine, offset=c_new)
