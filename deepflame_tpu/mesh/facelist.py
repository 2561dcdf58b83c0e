"""Face-list (unstructured-ready) mesh backend.

Role parity: the reference's device mesh database
(/root/reference/src_gpu/dfMatrixDataBase.H:97-324 — owner/neighbour LDU
indices, LDU->CSR permutation, face weights, Sf/magSf, deltaCoeffs, volumes,
per-patch boundary metadata) and OpenFOAM's fvMesh addressing. This is the
"gather/scatter over CSR face-cell connectivity" backend named by the
BASELINE north star: the structured-block backend covers box cases with
shifts; THIS backend carries general connectivity so arbitrary (unstructured)
meshes plug into the same FvMatrix contract.

TPU-first: all connectivity is static int32 device arrays; faces are sorted
by owner (CSR row order) so `jax.ops.segment_sum(..., indices_are_sorted=
True)` scatters face->cell contributions in one pass; boundary faces live in
per-patch contiguous blocks with affine ghost coefficients precomputed as
arrays (no per-face branching under jit).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .structured import BC, FieldBCs, StructuredMesh

__all__ = ["FaceListMesh", "BoundaryPatch", "ShiftPlan", "from_structured",
           "graded_box", "structured_face_maps"]


@dataclasses.dataclass(frozen=True, eq=True)
class ShiftPlan:
    """Static shift-execution plan for tensor-product (blockMesh-style)
    connectivity: when the interior faces are the axis families of an
    (nx, ny, nz) cell lattice, every face gather/scatter is a reshape +
    static slice — the layout XLA fuses into shift stencils — instead of a
    per-index gather, which on TPU costs ~10 ns PER FACE regardless of row
    width (measured: a single (nf,) gather at 32^3 = 1.4 ms, 1000x off
    HBM speed-of-light; the whole structured step is 10 ms).

    Faces must be stored family-major in construction order: for each
    active axis, the (n_ax-1) interior slabs in C order, then (cyclic axes)
    the wrap slab. All fields are hashable statics — the plan is pytree
    metadata, so jit specializes on it exactly like on shapes.

    The general owner/neighbour arrays remain alongside (the CSR contract);
    any mesh without a plan — shard-local FLDecomp meshes, true
    unstructured imports — takes the ELL/segment-sum path unchanged.
    """
    shape: tuple              # (nx, ny, nz)
    # per active family: (axis, wrap, n_main, n_wrap) — faces laid out
    # [main slabs..., wrap slab] consecutively per family
    families: tuple


def _plan_segments(plan: ShiftPlan):
    """[(axis, is_wrap, start, count)] face segments in storage order."""
    segs = []
    off = 0
    for ax, wrap, n_main, n_wrap in plan.families:
        segs.append((ax, False, off, n_main))
        off += n_main
        if wrap:
            segs.append((ax, True, off, n_wrap))
            off += n_wrap
    return segs


def _lattice_shape(shape, ax, is_wrap):
    s = list(shape)
    s[ax] = 1 if is_wrap else shape[ax] - 1
    return tuple(s)


def ell_arrays(own: np.ndarray, nei: np.ndarray, n_cells: int,
               width: int | None = None, exclude: np.ndarray | None = None):
    """Host-side ELLPACK cell->face incidence: (face_idx (n,w) int32 padded
    with nf, sign (n,w) f32 {+1 owner, -1 neighbour, 0 pad}).

    A face appears twice (owner side +1, neighbour side -1) — INCLUDING
    self-faces (own == nei, e.g. a 1-cell cyclic axis), which matter for
    scatter_both. `exclude` masks faces to drop entirely (the distributed
    backend's zero-area pad faces, which would otherwise pile width onto
    one cell)."""
    own = np.asarray(own).astype(np.int64)
    nei = np.asarray(nei).astype(np.int64)
    nf = own.shape[0]
    n = n_cells
    keep = (np.nonzero(~np.asarray(exclude))[0] if exclude is not None
            else np.arange(nf))
    ids = np.concatenate([own[keep], nei[keep]])
    faces = np.concatenate([keep, keep])
    side = np.concatenate([np.ones(keep.shape[0], np.float32),
                           -np.ones(keep.shape[0], np.float32)])
    order = np.argsort(ids, kind="stable")
    ids_s, faces_s, side_s = ids[order], faces[order], side[order]
    counts = np.bincount(ids, minlength=n)
    w = int(counts.max()) if width is None else int(width)
    assert counts.max() <= w, f"cell with {counts.max()} faces > {w}"
    starts = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(ids.shape[0]) - starts[ids_s]
    face_idx = np.full((n, w), nf, np.int32)
    sgn = np.zeros((n, w), np.float32)
    face_idx[ids_s, pos] = faces_s
    sgn[ids_s, pos] = side_s
    return face_idx, sgn


@dataclasses.dataclass(frozen=True)
class BoundaryPatch:
    """One boundary patch: nb faces all owned by interior cells.

    ghost = a * x_owner + b defines the face-adjacent ghost value exactly as
    the structured backend's `BC.coeffs` (mesh/structured.py) — the two
    backends share BC semantics by construction.
    """
    name: str
    owner: jax.Array        # (nb,) int32 cell index
    mag_sf: jax.Array       # (nb,) face area
    delta: jax.Array        # (nb,) owner-center to ghost-center distance
    a: jax.Array            # (nb,) ghost = a*x_own + b
    b: jax.Array            # (nb,)
    normal: jax.Array       # (nb, 3) outward unit normal
    kind: str = "generic"   # original BC kind (upwind/inletOutlet need it)
    # dominant normal axis, recorded STATICALLY where the constructor knows
    # it (axis-aligned box patches). Shard-local patches carry traced normal
    # arrays, so code that needs the axis at trace time (the mixed-BC
    # shortcut in LowMachSolverFL._fix_boundary_fluxes) reads this instead
    # of np.argmax over a tracer. None = infer from concrete normals.
    n_axis: int | None = None
    # boundary non-orthogonal correction vector (nb, 3): Sf split against
    # df = f_ctr - C_own as Sf = (magSf/(n.df)) df + k_no, so the boundary
    # flux gains a deferred k_no . grad(x)_own term on meshes whose walls
    # are not normal to the owner-center-to-face line (see FaceListMesh.k_no)
    k_no: jax.Array | None = None


@dataclasses.dataclass(frozen=True)
class FaceListMesh:
    """Interior-face connectivity + boundary patches + cell geometry."""
    n_cells: int
    owner: jax.Array        # (nf,) int32, sorted ascending (CSR row order)
    neighbour: jax.Array    # (nf,) int32
    mag_sf: jax.Array       # (nf,) face area magnitude
    delta: jax.Array        # (nf,) owner-to-neighbour center distance
    weights: jax.Array      # (nf,) owner interpolation weight
    normal: jax.Array       # (nf, 3) unit normal owner->neighbour
    volumes: jax.Array      # (n_cells,)
    centers: jax.Array      # (n_cells, 3)
    patches: tuple          # tuple[BoundaryPatch, ...]
    # --- SPMD domain-decomposition extension (parallel/distributed_fl.py).
    # On a shard-local mesh, cells [0, n_own_max) are owned (+pad) and the
    # rest are HALO copies of remote cells (the reference's processor-patch
    # ghost layer, src_gpu/dfMatrixOpBase.H:139-155). Crossing faces are
    # replicated on both shards; scatter contributions landing in halo rows
    # are discarded by restrict(). Single-device meshes leave these None and
    # every hook degrades to the identity.
    w_own: jax.Array | None = None   # (n_cells,) 1.0 real owned cell, else 0
    # static dict {ring offset d: (send_idx (B_d,), recv_slot (B_d,))}:
    # shard r receives from shard (r+d)%P; send_idx gathers MY owned slots
    # destined for shard (r-d)%P; recv_slot scatters the arriving buffer
    # into MY halo slots (padding = n_cells -> dropped).
    halo: Any = None
    # --- Non-orthogonal / skew mesh corrections (OpenFOAM's `corrected`
    # snGrad + skewCorrected interpolation; reference pEqn nonOrthogonal
    # corrector loop, SURVEY §3.1). Over-relaxed decomposition of the face
    # area vector Sf = magSf*normal into an implicit orthogonal part along
    # d = C_nei - C_own (already encoded in `delta`, geometry.py) plus the
    # explicit k_no = Sf - (magSf/delta) d, applied as a deferred gradient
    # correction. None (orthogonal meshes: boxes, from_structured) = both
    # corrections vanish identically and the ops skip the work.
    k_no: jax.Array | None = None   # (nf, 3)
    # skew vector: face centroid minus the own->nei line's intersection
    # with the face plane — skewCorrected face interpolation adds
    # skew . grad_f(x).
    skew: jax.Array | None = None   # (nf, 3)
    # --- ELLPACK cell->face incidence (TPU fast path). segment_sum lowers
    # to scatter-add, which serializes on TPU (measured 31x slower than the
    # structured backend at 32^3); the ELL form turns every face->cell
    # reduction into a dense (n_cells, width) gather + row sum — the layout
    # the VPU pipelines. Built host-side by with_ell() (constructors call
    # it); None falls back to segment_sum (e.g. tracer-built meshes).
    ell_face: jax.Array | None = None   # (n_cells, w) int32, pad = nf
    ell_sign: jax.Array | None = None   # (n_cells, w) f32 {+1 own,-1 nei,0}
    # --- static shift-execution plan (see ShiftPlan): tensor-product
    # connectivity runs face gathers/scatters as reshape+slice shifts.
    plan: ShiftPlan | None = None

    def with_ell(self, width: int | None = None) -> "FaceListMesh":
        """Return a copy carrying the ELL incidence arrays (no-op if the
        mesh has no interior faces). Requires concrete (host) owner /
        neighbour arrays — call from constructors, not under trace."""
        own = np.asarray(self.owner)
        nei = np.asarray(self.neighbour)
        nf = own.shape[0]
        if nf == 0:
            return self
        face_idx, sgn = ell_arrays(own, nei, self.n_cells, width)
        return dataclasses.replace(self, ell_face=jnp.asarray(face_idx),
                                   ell_sign=jnp.asarray(sgn))

    @property
    def n_faces(self) -> int:
        return int(self.owner.shape[0])

    @property
    def vol_local(self) -> jax.Array:
        """Cell volumes for row scaling; halo/pad slots hold safe values."""
        return self.volumes

    def restrict(self, x: jax.Array) -> jax.Array:
        """Zero non-owned (halo/pad) rows — scatter results on those rows
        are partial sums the owning shard computes exactly itself. Uses
        where (not multiply) so a NaN in a discarded row cannot leak
        through 0*NaN."""
        if self.w_own is None:
            return x
        w = self.w_own.reshape(self.w_own.shape + (1,) * (x.ndim - 1))
        return jnp.where(w > 0, x, jnp.zeros_like(x))

    def exchange(self, x: jax.Array) -> jax.Array:
        """Refresh halo rows from their owning shards (ppermute over the
        active shard axis) — the NCCL processor-patch exchange of the
        reference (correct_boundary_conditions_processor_scalar). Identity
        on single-device meshes. Works for (n,) and (n, k) arrays."""
        if self.halo is None:
            return x
        from ..parallel.context import current_axis
        ax = current_axis()
        if ax is None:
            return x
        P = jax.lax.axis_size(ax)
        for d, (send_idx, recv_slot) in self.halo.items():
            buf = x[send_idx]
            perm = [(i, (i - d) % P) for i in range(P)]
            buf = jax.lax.ppermute(buf, ax, perm)
            x = x.at[recv_slot].set(buf, mode="drop")
        return x

    def ell_connectivity(self, width: int = 6):
        """ELLPACK cell->face adjacency: for each cell, up to `width`
        incident interior faces as (face_id, is_owner_side) with -1 padding.

        The TPU-idiomatic SpMV layout: a hex cell has at most 6 faces, so a
        dense (n_cells, 6) gather + masked sum replaces CSR row loops —
        regular shapes the MXU/VPU pipeline likes (the reference's CSR SpMV
        is a CUDA scalar loop, dfMatrixOpBase.H:117-125). Returns
        (face_ids (n,w) int32, side (n,w) float {+1 owner,-1 neighbour,0 pad},
        nbr_ids (n,w) int32 — the cell across each face, self-index padding).
        """
        own = np.asarray(self.owner).astype(np.int64)
        nei = np.asarray(self.neighbour).astype(np.int64)
        n = self.n_cells
        nf = own.shape[0]
        fidx, sgn = ell_arrays(own, nei, n, width)   # vectorized host build
        f_safe = np.minimum(fidx, max(nf - 1, 0))
        self_col = np.broadcast_to(np.arange(n, dtype=np.int64)[:, None],
                                   fidx.shape)
        nbr = np.where(sgn > 0, nei[f_safe],
                       np.where(sgn < 0, own[f_safe], self_col))
        face_ids = np.where(sgn != 0, fidx, -1).astype(np.int32)
        return (jnp.asarray(face_ids), jnp.asarray(sgn.astype(np.float64)),
                jnp.asarray(nbr.astype(np.int32)))

    # ------------------------------------------------- plan (shift) path
    #
    # Batched arrays are processed BATCH-LEADING internally ((k, nx, ny,
    # nz) lattices): TPU tiles the two minor dims to (8, 128), so a
    # trailing batch of 3-10 pads the lane dimension 13-42x — measured 10x
    # slower than batch-leading at 48^3. Transposes at the op boundary are
    # cheap relative to that.

    def _gather_plan(self, x: jax.Array, own_side: bool) -> jax.Array:
        pl = self.plan
        rest = x.shape[1:]
        if rest:
            K = 1
            for r in rest:
                K *= r
            Xl = x.reshape((self.n_cells, K)).T.reshape((K,) + pl.shape)
            lead = (slice(None),)
        else:
            Xl = x.reshape(pl.shape)
            lead = ()
        outs = []
        for ax, is_wrap, _, _ in _plan_segments(pl):
            sl = [slice(None)] * 3
            n_ax = pl.shape[ax]
            if own_side:
                sl[ax] = (slice(n_ax - 1, n_ax) if is_wrap
                          else slice(0, n_ax - 1))
            else:
                sl[ax] = slice(0, 1) if is_wrap else slice(1, n_ax)
            seg = Xl[lead + tuple(sl)]
            outs.append(seg.reshape((K, -1) if rest else (-1,)))
        cat = jnp.concatenate(outs, axis=-1)
        if rest:
            return cat.T.reshape((-1,) + rest)
        return cat

    def _fam_slices(self, ax: int, is_wrap: bool):
        """(owner slice, neighbour slice) on the cell lattice."""
        n_ax = self.plan.shape[ax]
        sl_o = [slice(None)] * 3
        sl_n = [slice(None)] * 3
        if is_wrap:
            sl_o[ax] = slice(n_ax - 1, n_ax)
            sl_n[ax] = slice(0, 1)
        else:
            sl_o[ax] = slice(0, n_ax - 1)
            sl_n[ax] = slice(1, n_ax)
        return tuple(sl_o), tuple(sl_n)

    def plan_interp(self, x: jax.Array) -> jax.Array:
        """Scalar linear face interpolation on the shift plan: one concat,
        per-family slab arithmetic (no (nf,) gather temporaries)."""
        pl = self.plan
        X = x.reshape(pl.shape)
        outs = []
        for ax, is_wrap, start, count in _plan_segments(pl):
            lat = _lattice_shape(pl.shape, ax, is_wrap)
            w = self.weights[start:start + count].reshape(lat)
            sl_o, sl_n = self._fam_slices(ax, is_wrap)
            outs.append((w * X[sl_o] + (1.0 - w) * X[sl_n]).reshape(-1))
        return jnp.concatenate(outs)

    def plan_grad_interior(self, x: jax.Array) -> jax.Array:
        """Interior part of the Gauss gradient on the shift plan, (n, 3).
        Axis-family normals are exactly +e_ax, so each family writes ONE
        gradient component — three (n,) accumulators, no (nf, 3) face
        vectors (the generic path's per-face normal products are 3x wasted
        work and pad the 3-lane minor dim on TPU)."""
        pl = self.plan
        X = x.reshape(pl.shape)
        comps = {}
        for ax, is_wrap, start, count in _plan_segments(pl):
            lat = _lattice_shape(pl.shape, ax, is_wrap)
            w = self.weights[start:start + count].reshape(lat)
            ms = self.mag_sf[start:start + count].reshape(lat)
            sl_o, sl_n = self._fam_slices(ax, is_wrap)
            fv = (w * X[sl_o] + (1.0 - w) * X[sl_n]) * ms
            acc = comps.get(ax)
            if acc is None:
                acc = jnp.zeros(pl.shape, x.dtype)
            acc = acc.at[sl_o].add(fv)
            acc = acc.at[sl_n].add(-fv)
            comps[ax] = acc
        z = jnp.zeros(pl.shape, x.dtype)
        return jnp.stack([comps.get(ax, z).reshape(-1) for ax in range(3)],
                         axis=1)

    def plan_flux_normal(self, q: jax.Array) -> jax.Array:
        """(u . n)_f from a cell vector field q (n, 3) on the shift plan:
        per family only the axis component survives (n = +e_ax), so this
        is three scalar interpolations — no (nf, 3) face vectors."""
        pl = self.plan
        outs = []
        for ax, is_wrap, start, count in _plan_segments(pl):
            lat = _lattice_shape(pl.shape, ax, is_wrap)
            X = q[:, ax].reshape(pl.shape)
            w = self.weights[start:start + count].reshape(lat)
            sl_o, sl_n = self._fam_slices(ax, is_wrap)
            outs.append((w * X[sl_o] + (1.0 - w) * X[sl_n]).reshape(-1))
        return jnp.concatenate(outs)

    def gather_own(self, x: jax.Array) -> jax.Array:
        """x (n_cells, ...) -> per-face owner values (nf, ...). Shift plan:
        reshape + static slices; fallback: one row gather."""
        if self.plan is None:
            return x[self.owner]
        return self._gather_plan(x, True)

    def gather_nei(self, x: jax.Array) -> jax.Array:
        if self.plan is None:
            return x[self.neighbour]
        return self._gather_plan(x, False)

    def _plan_scatter(self, to_owner, to_neighbour) -> jax.Array:
        """sum of per-face contributions into owner cells (to_owner) and
        neighbour cells (to_neighbour) via static slice adds."""
        pl = self.plan
        rest = to_owner.shape[1:]
        if rest:
            K = 1
            for r in rest:
                K *= r
            to_o = to_owner.reshape((-1, K)).T       # (K, nf)
            to_n = to_neighbour.reshape((-1, K)).T
            lead = (K,)
        else:
            to_o, to_n = to_owner, to_neighbour
            lead = ()
        out = jnp.zeros(lead + pl.shape, to_owner.dtype)
        for ax, is_wrap, start, count in _plan_segments(pl):
            n_ax = pl.shape[ax]
            lat = _lattice_shape(pl.shape, ax, is_wrap)
            so = to_o[..., start:start + count].reshape(lead + lat)
            sn = to_n[..., start:start + count].reshape(lead + lat)
            sl_o = [slice(None)] * len(lead) + [slice(None)] * 3
            sl_n = list(sl_o)
            off = len(lead)
            if is_wrap:
                sl_o[off + ax] = slice(n_ax - 1, n_ax)
                sl_n[off + ax] = slice(0, 1)
            else:
                sl_o[off + ax] = slice(0, n_ax - 1)
                sl_n[off + ax] = slice(1, n_ax)
            out = out.at[tuple(sl_o)].add(so)
            out = out.at[tuple(sl_n)].add(sn)
        if rest:
            return out.reshape((K, self.n_cells)).T.reshape(
                (self.n_cells,) + rest)
        return out.reshape((self.n_cells,))

    def scatter_faces(self, face_vals: jax.Array) -> jax.Array:
        """sum_f s_f for each cell with owner +, neighbour - orientation:
        the divergence accumulation (sum of outward fluxes). Accepts
        batched face arrays (nf, ...) -> (n_cells, ...): ONE wide row
        gather instead of k scalar gathers (the TPU-friendly layout)."""
        if self.plan is not None:
            return self._plan_scatter(face_vals, -face_vals)
        if self.ell_face is not None:
            fv = face_vals[jnp.minimum(self.ell_face, self.n_faces - 1)]
            ext = (Ellipsis,) + (None,) * (face_vals.ndim - 1)
            sgn = self.ell_sign.astype(face_vals.dtype)[ext]
            # where (not multiply) so a non-finite value in a clamp-gathered
            # pad slot cannot propagate through 0*NaN (advisor r3)
            return jnp.where(sgn != 0, fv * sgn, 0.0).sum(axis=1)
        out = jax.ops.segment_sum(face_vals, self.owner,
                                  num_segments=self.n_cells)
        out = out - jax.ops.segment_sum(face_vals, self.neighbour,
                                        num_segments=self.n_cells)
        return out

    def scatter_both(self, to_owner: jax.Array,
                     to_neighbour: jax.Array) -> jax.Array:
        """Separate owner/neighbour accumulations (matrix assembly).
        Accepts batched (nf, ...) inputs like scatter_faces."""
        if self.plan is not None:
            return self._plan_scatter(to_owner, to_neighbour)
        if self.ell_face is not None:
            idx = jnp.minimum(self.ell_face, self.n_faces - 1)
            ext = (Ellipsis,) + (None,) * (to_owner.ndim - 1)
            own_m = (self.ell_sign > 0)[ext]
            nei_m = (self.ell_sign < 0)[ext]
            zero = jnp.zeros((), to_owner.dtype)
            out = (jnp.where(own_m, to_owner[idx], zero)
                   + jnp.where(nei_m, to_neighbour[idx], zero))
            return out.sum(axis=1)
        out = jax.ops.segment_sum(to_owner, self.owner,
                                  num_segments=self.n_cells)
        out = out + jax.ops.segment_sum(to_neighbour, self.neighbour,
                                        num_segments=self.n_cells)
        return out


# Pytree registration: shard-local meshes travel THROUGH shard_map as
# inputs (their connectivity differs per shard, so they cannot be closed
# over — a closure is replicated). name/kind/n_axis/n_cells are static
# metadata; everything else is leaves.
jax.tree_util.register_dataclass(
    BoundaryPatch,
    data_fields=["owner", "mag_sf", "delta", "a", "b", "normal", "k_no"],
    meta_fields=["name", "kind", "n_axis"])
jax.tree_util.register_dataclass(
    FaceListMesh,
    data_fields=["owner", "neighbour", "mag_sf", "delta", "weights",
                 "normal", "volumes", "centers", "patches", "w_own", "halo",
                 "k_no", "skew", "ell_face", "ell_sign"],
    meta_fields=["n_cells", "plan"])


def _cell_id(i, j, k, ny, nz):
    return (i * ny + j) * nz + k


def _box_plan(shape, bcs) -> ShiftPlan | None:
    """ShiftPlan for a tensor-product box with the given per-axis BCs.
    Degenerate axes work: n_ax == 1 cyclic wraps become self-faces, whose
    owner and neighbour slices coincide (both contributions land on the
    same cell — exactly the self-face semantics)."""
    n_all = int(np.prod(shape))
    fams = []
    for ax in range(3):
        lo_bc, _ = bcs[ax]
        if lo_bc.kind == "empty":
            continue
        n_ax = shape[ax]
        per_slab = n_all // n_ax
        fams.append((ax, lo_bc.kind == "cyclic",
                     per_slab * (n_ax - 1),
                     per_slab if lo_bc.kind == "cyclic" else 0))
    return ShiftPlan(shape=tuple(int(s) for s in shape),
                     families=tuple(fams))


def structured_face_maps(mesh: StructuredMesh, bcs: FieldBCs):
    """(axis_ids, flat_ids) mapping each facelist INTERIOR face (in the
    from_structured ordering) to its slot in the structured per-axis face
    arrays ((nx+1,ny,nz), (nx,ny+1,nz), (nx,ny,nz+1)) — so structured face
    fluxes can be gathered into facelist order:
        phi_fl = concat_per_axis(phi[ax].ravel()[flat_ids[ax]])
    Boundary patch faces map by construction (patch order == from_structured
    patch order, faces in C order over the patch slab)."""
    nx, ny, nz = mesh.shape
    shapes = [(nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1)]
    per_axis = []
    for ax in range(3):
        lo_bc, _ = bcs[ax]
        if lo_bc.kind == "empty":
            per_axis.append(None)
            continue
        fsh = shapes[ax]
        fidx = np.arange(int(np.prod(fsh))).reshape(fsh)
        n_ax = mesh.shape[ax]
        sl = [slice(None)] * 3
        sl[ax] = slice(1, n_ax)            # interior faces = 1..n_ax-1
        ids = fidx[tuple(sl)].ravel()
        if lo_bc.kind == "cyclic":
            sl_w = [slice(None)] * 3
            sl_w[ax] = slice(n_ax, n_ax + 1)   # wrap face stored at the top
            ids = np.concatenate([ids, fidx[tuple(sl_w)].ravel()])
        per_axis.append(ids)
    # faces are stored family-major in construction order (ShiftPlan
    # layout) — the global map is the identity permutation
    n_total = sum(ids.shape[0] for ids in per_axis if ids is not None)
    return per_axis, np.arange(n_total)


def from_structured(mesh: StructuredMesh, bcs: FieldBCs,
                    dtype=jnp.float64) -> FaceListMesh:
    """Build the face-list form of a uniform structured block + its BCs.

    Validation bridge: every structured case must produce identical FV
    operators through both backends (tests/test_facelist.py). Cyclic axes
    become wrap interior faces; 'empty' axes contribute no faces; physical
    BCs become BoundaryPatch blocks with the same affine ghost coefficients
    the padder uses.
    """
    nx, ny, nz = mesh.shape
    hs = mesh.spacing
    areas = (mesh.dy * mesh.dz, mesh.dx * mesh.dz, mesh.dx * mesh.dy)
    own, nei, msf, dlt, nrm = [], [], [], [], []
    patches = []
    eye = np.eye(3)

    for ax, (n_ax, h, A) in enumerate(zip(mesh.shape, hs, areas)):
        lo_bc, hi_bc = bcs[ax]
        if lo_bc.kind == "empty":
            continue
        # interior faces along ax (incl. the cyclic wrap face)
        idx = np.arange(nx * ny * nz).reshape(nx, ny, nz)
        sl_own = [slice(None)] * 3
        sl_nei = [slice(None)] * 3
        sl_own[ax] = slice(0, n_ax - 1)
        sl_nei[ax] = slice(1, n_ax)
        o = idx[tuple(sl_own)].ravel()
        m = idx[tuple(sl_nei)].ravel()
        if lo_bc.kind == "cyclic":
            sl_w = [slice(None)] * 3
            sl_w[ax] = slice(n_ax - 1, n_ax)
            sl_0 = [slice(None)] * 3
            sl_0[ax] = slice(0, 1)
            o = np.concatenate([o, idx[tuple(sl_w)].ravel()])
            m = np.concatenate([m, idx[tuple(sl_0)].ravel()])
        own.append(o)
        nei.append(m)
        msf.append(np.full(o.shape, A))
        dlt.append(np.full(o.shape, h))
        nrm.append(np.broadcast_to(eye[ax], (o.shape[0], 3)))
        # boundary patches on non-cyclic axes
        if lo_bc.kind != "cyclic":
            for side, bc in ((0, lo_bc), (1, hi_bc)):
                sl_b = [slice(None)] * 3
                sl_b[ax] = slice(0, 1) if side == 0 else slice(n_ax - 1, n_ax)
                ob = idx[tuple(sl_b)].ravel()
                a_c, b_c = bc.coeffs(h, -1 if side == 0 else +1)
                sign = -1.0 if side == 0 else 1.0
                patches.append(BoundaryPatch(
                    name=f"ax{ax}_{'lo' if side == 0 else 'hi'}",
                    owner=jnp.asarray(ob, jnp.int32),
                    mag_sf=jnp.full(ob.shape, A, dtype),
                    delta=jnp.full(ob.shape, h, dtype),
                    a=jnp.full(ob.shape, a_c, dtype),
                    b=jnp.full(ob.shape, b_c, dtype),
                    normal=jnp.asarray(np.broadcast_to(sign * eye[ax],
                                                       (ob.shape[0], 3)),
                                       dtype),
                    kind=bc.kind, n_axis=ax))

    if own:
        own_np = np.concatenate(own)
        nei_np = np.concatenate(nei)
        msf_np = np.concatenate(msf)
        dlt_np = np.concatenate(dlt)
        nrm_np = np.concatenate(nrm)
    else:  # degenerate 0-face mesh (all empty)
        own_np = np.zeros(0, np.int64)
        nei_np = np.zeros(0, np.int64)
        msf_np = np.zeros(0)
        dlt_np = np.zeros(0)
        nrm_np = np.zeros((0, 3))

    # faces stay in family-major construction order (per-axis slabs, wrap
    # last) — the ShiftPlan layout; the TPU shift path replaces the former
    # owner-sorted CSR order (ELL fallback is order-agnostic)
    plan = _box_plan(mesh.shape, bcs)

    X, Y, Z = (np.asarray(c) for c in mesh.cell_centers(jnp.float64))
    centers = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    return FaceListMesh(
        n_cells=mesh.n_cells,
        owner=jnp.asarray(own_np, jnp.int32),
        neighbour=jnp.asarray(nei_np, jnp.int32),
        mag_sf=jnp.asarray(msf_np, dtype),
        delta=jnp.asarray(dlt_np, dtype),
        weights=jnp.full(own_np.shape, 0.5, dtype),
        normal=jnp.asarray(nrm_np, dtype),
        volumes=jnp.full((mesh.n_cells,), mesh.volume, dtype),
        centers=jnp.asarray(centers, dtype),
        patches=tuple(patches), plan=plan).with_ell()


def graded_box(x_edges, y_edges, z_edges, bcs: FieldBCs,
               dtype=jnp.float64) -> FaceListMesh:
    """Non-uniform tensor-product box from explicit edge coordinates —
    the first mesh class the structured backend CANNOT represent (it assumes
    one uniform spacing per axis; mesh/structured.py:36-48). OpenFOAM's
    blockMesh `simpleGrading` output is exactly this shape.

    Face interpolation weights and owner->neighbour deltas follow the cell
    centers (OpenFOAM surfaceInterpolation::makeWeights for orthogonal
    meshes: w = d_nei_face / d_own_nei). Cyclic axes require matching edge
    spacing at the wrap (checked).
    """
    edges = [np.asarray(e, np.float64) for e in (x_edges, y_edges, z_edges)]
    ncell = [max(e.shape[0] - 1, 1) for e in edges]
    nx, ny, nz = ncell
    centers_1d = [0.5 * (e[1:] + e[:-1]) if e.shape[0] > 1
                  else np.asarray([0.0]) for e in edges]
    widths_1d = [np.diff(e) if e.shape[0] > 1 else np.asarray([1.0])
                 for e in edges]
    idx = np.arange(nx * ny * nz).reshape(nx, ny, nz)
    WX, WY, WZ = np.meshgrid(*widths_1d, indexing="ij")
    vols = (WX * WY * WZ).ravel()
    CX, CY, CZ = np.meshgrid(*centers_1d, indexing="ij")
    centers = np.stack([CX.ravel(), CY.ravel(), CZ.ravel()], axis=1)

    own, nei, msf, dlt, wgt, nrm = [], [], [], [], [], []
    patches = []
    eye = np.eye(3)
    for ax in range(3):
        lo_bc, hi_bc = bcs[ax]
        n_ax = ncell[ax]
        if lo_bc.kind == "empty":
            continue
        c1 = centers_1d[ax]
        w1 = widths_1d[ax]
        # cross-sectional face areas vary over the transverse cells
        tr = [a for a in range(3) if a != ax]
        A2 = np.meshgrid(*(widths_1d[a] for a in tr), indexing="ij")
        area_tr = (A2[0] * A2[1])          # (n_t1, n_t2)

        def axis_lattice(per_ax):
            """Broadcast a per-axis-slab array over the family lattice in
            C order (the ShiftPlan face layout)."""
            shp = [1, 1, 1]
            shp[ax] = len(per_ax)
            lat = [nx, ny, nz]
            lat[ax] = len(per_ax)
            return np.broadcast_to(np.asarray(per_ax).reshape(shp),
                                   tuple(lat)).ravel()

        def face_block(sl_o_ax, sl_n_ax, deltas, w_owns):
            sl_o = [slice(None)] * 3
            sl_n = [slice(None)] * 3
            sl_o[ax] = sl_o_ax
            sl_n[ax] = sl_n_ax
            o = idx[tuple(sl_o)].reshape(-1)
            m = idx[tuple(sl_n)].reshape(-1)
            own.append(o)
            nei.append(m)
            # transverse areas broadcast along ax in C order
            shp = [1, 1, 1]
            for t, a in enumerate(tr):
                shp[a] = area_tr.shape[t]
            nsl = len(deltas)
            lat = [nx, ny, nz]
            lat[ax] = nsl
            msf.append(np.broadcast_to(area_tr.reshape(tuple(shp)),
                                       tuple(lat)).ravel().copy())
            dlt.append(axis_lattice(deltas))
            wgt.append(axis_lattice(w_owns))
            nrm.append(np.broadcast_to(eye[ax], (o.shape[0], 3)))

        d_in = c1[1:] - c1[:-1]                          # (n_ax-1,)
        faces_in = edges[ax][1:n_ax]
        w_in = (c1[1:] - faces_in) / d_in
        if n_ax > 1:
            face_block(slice(0, n_ax - 1), slice(1, n_ax), d_in, w_in)
        if lo_bc.kind == "cyclic":
            if abs(w1[0] - w1[-1]) > 1e-12 * max(w1[0], w1[-1]):
                raise ValueError("cyclic axis needs matching end spacings")
            d = 0.5 * (w1[0] + w1[-1])
            face_block(slice(n_ax - 1, n_ax), slice(0, 1), [d], [0.5])
        else:
            for side, bc in ((0, lo_bc), (1, hi_bc)):
                i_b = 0 if side == 0 else n_ax - 1
                sl_b = [slice(None)] * 3
                sl_b[ax] = i_b
                ob = idx[tuple(sl_b)].reshape(-1)
                h = w1[i_b]                 # ghost at one cell-width out
                a_c, b_c = bc.coeffs(h, -1 if side == 0 else +1)
                sign = -1.0 if side == 0 else 1.0
                patches.append(BoundaryPatch(
                    name=f"ax{ax}_{'lo' if side == 0 else 'hi'}",
                    owner=jnp.asarray(ob, jnp.int32),
                    mag_sf=jnp.asarray(np.broadcast_to(area_tr.ravel(),
                                                       ob.shape).copy(),
                                       dtype),
                    delta=jnp.full(ob.shape, h, dtype),
                    a=jnp.full(ob.shape, a_c, dtype),
                    b=jnp.full(ob.shape, b_c, dtype),
                    normal=jnp.asarray(np.broadcast_to(sign * eye[ax],
                                                       (ob.shape[0], 3)),
                                       dtype),
                    kind=bc.kind, n_axis=ax))

    own_np = np.concatenate(own) if own else np.zeros(0, np.int64)
    nei_np = np.concatenate(nei) if nei else np.zeros(0, np.int64)
    msf_np = np.concatenate(msf) if msf else np.zeros(0)
    dlt_np = np.concatenate(dlt) if dlt else np.zeros(0)
    wgt_np = np.concatenate(wgt) if wgt else np.zeros(0)
    nrm_np = np.concatenate(nrm) if nrm else np.zeros((0, 3))
    return FaceListMesh(
        n_cells=nx * ny * nz,
        owner=jnp.asarray(own_np, jnp.int32),
        neighbour=jnp.asarray(nei_np, jnp.int32),
        mag_sf=jnp.asarray(msf_np, dtype),
        delta=jnp.asarray(dlt_np, dtype),
        weights=jnp.asarray(wgt_np, dtype),
        normal=jnp.asarray(nrm_np, dtype),
        volumes=jnp.asarray(vols, dtype),
        centers=jnp.asarray(centers, dtype),
        patches=tuple(patches),
        plan=_box_plan((nx, ny, nz), bcs)).with_ell()
