"""General polygonal-face mesh geometry + the GeneralMesh container.

Role parity: OpenFOAM's primitiveMesh geometry pipeline — face centres/area
vectors by fan triangulation about the estimated centre
(primitiveMeshFaceCentresAndAreas.C), cell centres/volumes by signed pyramid
decomposition (primitiveMeshCellCentresAndVols.C), interpolation weights
(surfaceInterpolation::makeWeights), and over-relaxed non-orthogonal delta
coefficients (surfaceInterpolation::makeNonOrthDeltaCoeffs) — reimplemented
as vectorized numpy over padded face-vertex arrays. The reference consumes
these through fvMesh/dfMatrixDataBase (src_gpu/dfMatrixDataBase.H:97-324:
owner/neighbour, face weights, Sf, magSf, deltaCoeffs, volumes).

GeneralMesh carries connectivity + geometry + NAMED boundary patches without
field boundary conditions; `with_bcs` / `with_vector_bcs` attach a concrete
field's BCs and produce the FaceListMesh instances the face-list solver
stack consumes (ops/fv_facelist.py, solvers/low_mach_fl.py). This is the
ingestion point for arbitrary (unstructured) meshes: blockMeshDict
(mesh/blockmesh.py) and OpenFOAM polyMesh (mesh/polymesh.py) both build it.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import numpy as np
import jax.numpy as jnp

from .facelist import BoundaryPatch, FaceListMesh
from .structured import BC

__all__ = ["GeneralMesh", "face_geometry", "cell_geometry",
           "build_general_mesh", "pad_faces"]


def pad_faces(faces: Sequence[Sequence[int]]) -> np.ndarray:
    """List of per-face vertex-id lists -> (nf, maxv) int64 array, padded by
    repeating the first vertex (a repeated vertex adds a zero-length edge,
    which contributes nothing to the fan sums)."""
    nf = len(faces)
    maxv = max((len(f) for f in faces), default=3)
    out = np.empty((nf, maxv), np.int64)
    for i, f in enumerate(faces):
        k = len(f)
        out[i, :k] = f
        out[i, k:] = f[0]
    return out


def face_geometry(points: np.ndarray, faces: np.ndarray):
    """(centres (nf,3), area vectors Sf (nf,3)) of padded polygon faces.

    OpenFOAM's exact algorithm: estimate the centre as the vertex mean, fan
    into triangles (v_i, v_{i+1}, cEst), area-weight the triangle centroids.
    Degenerate (zero-area) faces get centre = vertex mean and Sf = 0.
    """
    P = points[faces]                                  # (nf, maxv, 3)
    nv = faces.shape[1]
    c_est = P.mean(axis=1)                             # (nf, 3)
    nxt = np.roll(P, -1, axis=1)
    # triangle (v_i, v_{i+1}, cEst): normal & centroid sums
    n_tri = np.cross(nxt - P, c_est[:, None, :] - P)   # 2x area vectors
    a_tri = np.linalg.norm(n_tri, axis=2)              # (nf, maxv)
    c_tri = P + nxt + c_est[:, None, :]                # 3x centroid
    sum_n = n_tri.sum(axis=1)
    sum_a = a_tri.sum(axis=1)
    sum_ac = (a_tri[..., None] * c_tri).sum(axis=1)
    ok = sum_a > 1e-300
    ctr = np.where(ok[:, None], sum_ac / np.maximum(3.0 * sum_a, 1e-300)[:, None],
                   c_est)
    sf = 0.5 * sum_n
    # guard: padded repeats make some n_tri zero — already handled (a=0)
    return ctr, sf


def cell_geometry(n_cells: int, owner: np.ndarray, neighbour: np.ndarray,
                  f_ctr: np.ndarray, f_sf: np.ndarray,
                  f_ctr_nei: np.ndarray | None = None):
    """(cell centres (nc,3), volumes (nc,)) by signed pyramid decomposition.

    neighbour < 0 marks boundary faces (owner side only). f_ctr_nei:
    optional per-interior-face centres AS SEEN BY THE NEIGHBOUR cell —
    wrap (cyclic) faces sit at the periodic image on that side.
    """
    interior = neighbour >= 0
    fc_nei = f_ctr[interior] if f_ctr_nei is None else f_ctr_nei[interior]
    # estimated cell centre: mean of incident face centres
    c_est = np.zeros((n_cells, 3))
    cnt = np.zeros(n_cells)
    np.add.at(c_est, owner, f_ctr)
    np.add.at(cnt, owner, 1.0)
    np.add.at(c_est, neighbour[interior], fc_nei)
    np.add.at(cnt, neighbour[interior], 1.0)
    c_est /= np.maximum(cnt, 1.0)[:, None]

    ctr = np.zeros((n_cells, 3))
    vol = np.zeros(n_cells)

    def accumulate(cells, sign, fc, sf):
        pyr3 = sign * np.einsum("fi,fi->f", sf, fc - c_est[cells])
        pc = 0.75 * fc + 0.25 * c_est[cells]
        np.add.at(vol, cells, pyr3)
        np.add.at(ctr, cells, pyr3[:, None] * pc)

    accumulate(owner, +1.0, f_ctr, f_sf)
    accumulate(neighbour[interior], -1.0, fc_nei, f_sf[interior])
    ctr /= np.maximum(vol, 1e-300)[:, None]
    vol /= 3.0
    return ctr, vol


@dataclasses.dataclass(frozen=True)
class _PatchGeom:
    name: str
    ftype: str               # declared patch type (patch/wall/empty/wedge/..)
    owner: np.ndarray        # (nb,)
    mag_sf: np.ndarray
    normal: np.ndarray       # (nb, 3) outward unit
    f_ctr: np.ndarray        # (nb, 3)
    delta: np.ndarray        # (nb,) ghost spacing = 2 * n.(Cf - Co)


@dataclasses.dataclass(frozen=True)
class GeneralMesh:
    """Connectivity + geometry with NAMED patches; BC-free.

    Interior faces are sorted by owner (CSR row order). `with_bcs` attaches a
    scalar field's per-patch BCs; `with_vector_bcs` produces the component
    triple for vector fields (symmetry/wedge reflected per component through
    the diagonal of the reflection tensor — exact for axis-aligned patch
    normals; the advective boundary flux through symmetry/wedge is zeroed
    exactly by the solver via the patch `kind`).
    """
    n_cells: int
    owner: np.ndarray
    neighbour: np.ndarray
    mag_sf: np.ndarray
    delta: np.ndarray        # over-relaxed 1/nonOrthDeltaCoeffs
    weights: np.ndarray
    normal: np.ndarray
    volumes: np.ndarray
    centers: np.ndarray
    f_ctr: np.ndarray        # interior face centres
    patches: tuple           # tuple[_PatchGeom, ...]
    non_ortho_deg: np.ndarray  # per-interior-face non-orthogonality angle

    @property
    def patch_names(self):
        return tuple(p.name for p in self.patches)

    def _bc_for(self, spec, p: _PatchGeom, component: int | None):
        """Resolve the BC object for one patch from a user spec dict."""
        if p.ftype == "empty":
            return BC("empty")
        if p.ftype == "wedge":
            # geometric BC regardless of any user spec (OpenFOAM likewise
            # requires type wedge on wedge patches): the patch KIND must
            # stay "wedge" so the solvers' exact zero-flux rules fire —
            # a user-supplied zeroGradient here would relabel the kind and
            # silently re-enable the O(sin theta) per-component flux leak
            return BC("wedge")
        if spec is None or p.name not in spec:
            raise KeyError(f"no BC given for patch '{p.name}'")
        bc = spec[p.name]
        if isinstance(bc, (tuple, list)):
            if component is None:
                raise ValueError(f"patch '{p.name}': per-component BC tuple "
                                 "given for a scalar field")
            bc = bc[component]
        return bc

    def _patch_block(self, p: _PatchGeom, bc: BC, dtype,
                     component: int | None) -> BoundaryPatch:
        delta = p.delta.astype(np.float64)
        if bc.kind in ("symmetry", "wedge") and component is not None:
            # ghost_c = (1 - 2 n_c^2) u_c : diagonal of I - 2 n n^T
            a = 1.0 - 2.0 * p.normal[:, component] ** 2
            b = np.zeros_like(a)
            kind = "symmetry"
        elif bc.kind in ("symmetry", "wedge"):
            a = np.ones_like(delta)
            b = np.zeros_like(delta)
            kind = bc.kind
        else:
            a, b = bc.coeffs(delta, +1)
            a = np.broadcast_to(np.asarray(a, np.float64), delta.shape)
            b = np.broadcast_to(np.asarray(b, np.float64), delta.shape)
            kind = bc.kind
        # boundary non-orthogonality: Sf = (magSf/(n.df)) df + k_b against
        # df = f_ctr - C_own; the deferred k_b . grad_own term corrects
        # walls that are not normal to the owner-to-face line (the boundary
        # analogue of the interior over-relaxed split below). Only VALUE-type
        # BCs need it — gradient-type BCs (zeroGradient/fixedGradient/
        # symmetry) prescribe the normal flux directly, exactly.
        k_b_j = None
        if kind == "fixedValue":
            df = p.f_ctr - self.centers[p.owner]
            ndf = np.einsum("fi,fi->f", p.normal, df)
            k_b = p.mag_sf[:, None] * (
                p.normal - df / np.maximum(ndf, 1e-300)[:, None])
            k_b = np.where((p.mag_sf > 1e-300)[:, None], k_b, 0.0)
            if np.abs(k_b).max() > 1e-9 * max(p.mag_sf.max(), 1e-300):
                k_b_j = jnp.asarray(k_b, dtype)
        return BoundaryPatch(
            name=p.name,
            owner=jnp.asarray(p.owner, jnp.int32),
            mag_sf=jnp.asarray(p.mag_sf, dtype),
            delta=jnp.asarray(delta, dtype),
            a=jnp.asarray(a, dtype),
            b=jnp.asarray(b, dtype),
            normal=jnp.asarray(p.normal, dtype),
            kind=kind, k_no=k_b_j)

    def with_bcs(self, spec: Dict[str, BC] | None, dtype=jnp.float64,
                 component: int | None = None) -> FaceListMesh:
        """FaceListMesh with this scalar field's boundary conditions.

        spec: {patch_name: BC}; patches of declared type empty/wedge default
        to their geometric BC when unspecified.
        """
        blocks = tuple(
            self._patch_block(p, self._bc_for(spec, p, component), dtype,
                              component)
            for p in self.patches)
        # non-orthogonal / skew correction vectors (OpenFOAM corrected
        # snGrad + skewCorrected interpolation). Over-relaxed split:
        # Sf = (magSf/delta) d + k_no; skew = f_ctr - (own->nei line ^ face
        # plane). Dropped (None) when negligible so orthogonal meshes pay
        # nothing — from_structured/graded_box boxes never build them.
        d = self.centers[self.neighbour] - self.centers[self.owner]
        sf = self.mag_sf[:, None] * self.normal
        k_no = sf - (self.mag_sf / self.delta)[:, None] * d
        sfd = np.einsum("fi,fi->f", sf, d)
        lam = np.einsum("fi,fi->f", sf, self.f_ctr
                        - self.centers[self.owner]) / np.maximum(sfd, 1e-300)
        skew = self.f_ctr - (self.centers[self.owner] + lam[:, None] * d)
        scale = np.maximum(self.mag_sf.max(), 1e-300)
        d_scale = np.maximum(np.linalg.norm(d, axis=1).max(), 1e-300)
        k_no_j = (jnp.asarray(k_no, dtype)
                  if np.abs(k_no).max() > 1e-9 * scale else None)
        skew_j = (jnp.asarray(skew, dtype)
                  if np.abs(skew).max() > 1e-9 * d_scale else None)
        return FaceListMesh(
            n_cells=self.n_cells,
            owner=jnp.asarray(self.owner, jnp.int32),
            neighbour=jnp.asarray(self.neighbour, jnp.int32),
            mag_sf=jnp.asarray(self.mag_sf, dtype),
            delta=jnp.asarray(self.delta, dtype),
            weights=jnp.asarray(self.weights, dtype),
            normal=jnp.asarray(self.normal, dtype),
            volumes=jnp.asarray(self.volumes, dtype),
            centers=jnp.asarray(self.centers, dtype),
            patches=blocks, k_no=k_no_j, skew=skew_j).with_ell()

    def with_vector_bcs(self, spec, dtype=jnp.float64):
        """(m_x, m_y, m_z) FaceListMesh triple for a vector field. spec maps
        patch name -> BC (shared across components) or (BC, BC, BC)."""
        return tuple(self.with_bcs(spec, dtype, component=c)
                     for c in range(3))


def build_general_mesh(points: np.ndarray,
                       faces: Sequence[Sequence[int]] | np.ndarray,
                       owner: np.ndarray, neighbour: np.ndarray,
                       patch_defs: Sequence[tuple],
                       nei_offset: np.ndarray | None = None) -> GeneralMesh:
    """Assemble a GeneralMesh from raw polyMesh-style arrays.

    faces: per-face vertex id lists (or a padded array); owner (nf_total,);
    neighbour (n_interior,) — faces [0, n_interior) are interior, the rest
    boundary (OpenFOAM polyMesh convention). patch_defs: sequence of
    (name, type, startFace, nFaces). nei_offset: optional (n_interior, 3)
    translation added to the neighbour cell centre for wrap (cyclic)
    interior faces — brings the periodic image next to the face so
    deltas/weights are computed on the unwrapped geometry.
    """
    faces = faces if isinstance(faces, np.ndarray) else pad_faces(faces)
    owner = np.asarray(owner, np.int64)
    neighbour = np.asarray(neighbour, np.int64)
    n_int = neighbour.shape[0]
    n_cells = int(max(owner.max(initial=-1),
                      neighbour.max(initial=-1))) + 1

    f_ctr, f_sf = face_geometry(points, faces)
    full_nei = np.concatenate([neighbour,
                               -np.ones(owner.shape[0] - n_int, np.int64)])
    fc_nei_full = None
    if nei_offset is not None:
        # neighbour side of a wrap face sits at the periodic image:
        # f_ctr - nei_offset (nei_offset shifts the neighbour CENTRE the
        # other way)
        fc_nei_full = f_ctr.copy()
        fc_nei_full[:n_int] = f_ctr[:n_int] - np.asarray(nei_offset)
    c_ctr, c_vol = cell_geometry(n_cells, owner, full_nei, f_ctr, f_sf,
                                 f_ctr_nei=fc_nei_full)
    if (c_vol <= 0).any():
        bad = np.where(c_vol <= 0)[0]
        raise ValueError(f"non-positive cell volumes at cells {bad[:8]}"
                         f" (min {c_vol.min():.3e})")

    mag = np.linalg.norm(f_sf, axis=1)
    ok = mag > 1e-300
    unit = np.where(ok[:, None], f_sf / np.maximum(mag, 1e-300)[:, None],
                    np.array([1.0, 0.0, 0.0]))

    # interior: weights, deltas, non-orthogonality
    o_i, n_i = owner[:n_int], neighbour[:n_int]
    nei_ctr = c_ctr[n_i]
    if nei_offset is not None:
        nei_ctr = nei_ctr + np.asarray(nei_offset)
    d = nei_ctr - c_ctr[o_i]
    mag_d = np.linalg.norm(d, axis=1)
    nd = np.einsum("fi,fi->f", unit[:n_int], d)
    if (nd <= 0).any():
        raise ValueError("face normal points owner<-neighbour somewhere "
                         "(mesh orientation error)")
    # over-relaxed non-orthogonal delta: 1/max(n.d, 0.05|d|)
    delta_i = np.maximum(nd, 0.05 * mag_d)
    cosang = np.clip(nd / np.maximum(mag_d, 1e-300), -1.0, 1.0)
    non_ortho = np.degrees(np.arccos(cosang))
    # weights: |Sf.(Cn-Cf)| / (|Sf.(Cf-Co)| + |Sf.(Cn-Cf)|)
    sfd_own = np.abs(np.einsum("fi,fi->f", f_sf[:n_int],
                               f_ctr[:n_int] - c_ctr[o_i]))
    sfd_nei = np.abs(np.einsum("fi,fi->f", f_sf[:n_int],
                               nei_ctr - f_ctr[:n_int]))
    w = sfd_nei / np.maximum(sfd_own + sfd_nei, 1e-300)
    w = np.where(sfd_own + sfd_nei > 1e-300, w, 0.5)

    # sort interior faces by owner (CSR row order)
    order = np.argsort(o_i, kind="stable")

    patches = []
    for (name, ftype, start, nfp) in patch_defs:
        sl = slice(start, start + nfp)
        po = owner[sl]
        pn = unit[sl]
        # ghost spacing: 2 x owner-to-face projection (face halfway to ghost)
        dn = 2.0 * np.einsum("fi,fi->f", pn, f_ctr[sl] - c_ctr[po])
        dn = np.maximum(dn, 0.05 * 2.0 *
                        np.linalg.norm(f_ctr[sl] - c_ctr[po], axis=1))
        zero = mag[sl] <= 1e-300
        dn = np.where(zero, 1.0, dn)       # degenerate faces: inert spacing
        patches.append(_PatchGeom(
            name=name, ftype=ftype, owner=po.astype(np.int64),
            mag_sf=mag[sl].copy(), normal=pn.copy(),
            f_ctr=f_ctr[sl].copy(), delta=dn))

    return GeneralMesh(
        n_cells=n_cells,
        owner=o_i[order], neighbour=n_i[order],
        mag_sf=mag[:n_int][order], delta=delta_i[order],
        weights=w[order], normal=unit[:n_int][order],
        volumes=c_vol, centers=c_ctr, f_ctr=f_ctr[:n_int][order],
        patches=tuple(patches),
        non_ortho_deg=non_ortho[order])
