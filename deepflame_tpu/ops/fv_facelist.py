"""Finite-volume operators over face-list (CSR) connectivity.

Role parity: the same discrete-operator contract as ops/fv.py (itself
mirroring /root/reference/src_gpu/dfMatrixOpBase.H:84-343), but expressed as
gather/scatter over a FaceListMesh instead of shifts over a structured
block — the path that generalizes to unstructured meshes (BASELINE north
star: "gather/scatter Pallas kernels over CSR face-cell connectivity";
reference LDU assembly: dfMatrixOpBase.H:117-125 ldu_to_csr).

Equations are kept in PER-UNIT-VOLUME form (row_c = (1/V_c) sum_f ...),
matching the structured backend exactly so both backends are interchangeable
and cross-validated (tests/test_facelist.py).

The implicit matrix is coefficient-based LDU (diag + lower/upper per interior
face + folded boundary coefficients) — on this backend explicit coefficients
are cheaper than coloring probes, and diag(A) is free, exactly as OpenFOAM's
lduMatrix stores it.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..mesh.facelist import FaceListMesh

__all__ = ["FvMatrixFL", "apply_stencil_lattice",
           "interpolate_fl", "grad_fl", "grad_multi_fl",
           "div_flux_fl",
           "flux_of_fl", "sngrad_fl", "fvm_ddt_fl", "fvm_div_fl",
           "fvm_laplacian_fl", "fvm_source_implicit_fl",
           "laplacian_explicit_fl", "face_grad_fl",
           "laplacian_nonortho_corr_fl", "interpolate_skew_fl"]


# ------------------------------------------------------------- explicit ops
#
# SPMD note: every op that gathers cell values across faces first calls
# m.exchange(x) — on a shard-local mesh that refreshes the halo rows from
# their owning shards (mesh/facelist.py exchange; the reference's NCCL
# processor-patch exchange inside operator kernels, src_gpu/
# dfMatrixOpBase.H:139-155 & :287-295). On single-device meshes exchange is
# the identity, so the single-chip path is untouched.

def _fcol(a: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast a per-face (nf,) coefficient against batched (nf, ...)."""
    return a.reshape(a.shape + (1,) * (x.ndim - 1))


def interpolate_fl(m: FaceListMesh, x: jax.Array) -> jax.Array:
    """Linear owner/neighbour face interpolation (interior faces).
    Batched: x (n_cells, ...) -> (nf, ...) via ONE row gather per side.
    Shift-plan meshes run per-family slab arithmetic instead."""
    x = m.exchange(x)
    if m.plan is not None:
        if x.ndim == 1:
            return m.plan_interp(x)
        return jnp.stack([m.plan_interp(x[..., j])
                          for j in range(x.shape[-1])], axis=-1) \
            if x.ndim == 2 else _interp_generic(m, x)
    return _interp_generic(m, x)


def _interp_generic(m: FaceListMesh, x: jax.Array) -> jax.Array:
    w = _fcol(m.weights, x)
    return w * m.gather_own(x) + (1.0 - w) * m.gather_nei(x)


def flux_normal_fl(m: FaceListMesh, q: jax.Array) -> jax.Array:
    """Interior face-normal component (q_f . n_f) of a cell vector field
    q (n, 3). Plan meshes: three scalar slab interpolations (family
    normals are +e_ax); generic: batched interpolation + dot."""
    q = m.exchange(q)
    if m.plan is not None:
        return m.plan_flux_normal(q)
    uf = _interp_generic(m, q)
    return jnp.sum(uf * m.normal, axis=1)


def sngrad_fl(m: FaceListMesh, x: jax.Array) -> jax.Array:
    """Face-normal gradient (x_nei - x_own)/|d| on interior faces.
    Batched like interpolate_fl."""
    x = m.exchange(x)
    return (m.gather_nei(x) - m.gather_own(x)) / _fcol(m.delta, x)


def _boundary_face_value(p, x):
    """Face value on a boundary patch: (owner + ghost)/2 with the affine
    ghost — identical to the structured padder's face arithmetic.
    Batched: x (n_cells, ...) -> (nb, ...)."""
    xo = x[p.owner]
    ghost = _fcol(p.a, xo) * xo + _fcol(p.b, xo)
    return 0.5 * (xo + ghost)


def _boundary_sngrad(p, x):
    xo = x[p.owner]
    ghost = _fcol(p.a, xo) * xo + _fcol(p.b, xo)
    return (ghost - xo) / _fcol(p.delta, xo)


def flux_of_fl(m: FaceListMesh, u_cell: jax.Array,
               patches_u=None) -> tuple[jax.Array, list]:
    """Face-normal flux density phi_f = (u_f . n_f) from a cell vector field
    u_cell (n_cells, 3). Returns (interior phi (nf,), per-patch phi list).
    patches_u: optional per-component patch lists for the vector BCs; when
    None the scalar-style patches stored per component are not available, so
    boundary fluxes use owner-cell extrapolation (zeroGradient)."""
    uf = interpolate_fl(m, u_cell)                   # (nf, 3) batched
    phi = jnp.sum(uf * m.normal, axis=1)
    phi_b = []
    for ip, p in enumerate(m.patches):
        if p.kind in ("symmetry", "wedge", "empty"):
            # exact reflection: face value u - (u.n)n has zero normal flux
            # (the per-component affine ghost only captures the diagonal of
            # I - 2nn^T, which leaks O(sin theta) through tilted wedges)
            phi_b.append(jnp.zeros_like(p.mag_sf))
            continue
        if patches_u is not None:
            ub = jnp.stack([_boundary_face_value(patches_u[c][ip],
                                                 u_cell[:, c])
                            for c in range(3)], axis=1)
        else:
            ub = u_cell[p.owner]
        phi_b.append(jnp.sum(ub * p.normal, axis=1))
    return phi, phi_b


def div_flux_fl(m: FaceListMesh, phi: jax.Array, phi_b=None) -> jax.Array:
    """(1/V) sum_f phi_f magSf with outward orientation per cell.

    Halo rows (partial sums on a shard-local mesh) are refreshed on exit so
    state updates built from this divergence (rhoEqn) keep physical values
    everywhere — a NaN-free guarantee for the pointwise chemistry/thermo
    that runs on halo rows redundantly."""
    out = m.scatter_faces(phi * m.mag_sf)
    if phi_b is not None:
        for p, fb in zip(m.patches, phi_b):
            out = out + jax.ops.segment_sum(fb * p.mag_sf, p.owner,
                                            num_segments=m.n_cells)
    return m.exchange(out / m.volumes)


def grad_fl(m: FaceListMesh, x: jax.Array) -> jax.Array:
    """Gauss-linear cell gradient: x (n_cells,) -> (n_cells, 3), or
    batched x (n_cells, k) -> (n_cells, k, 3) through ONE wide gather /
    scatter (k fields share each face-row fetch — the TPU-friendly form).

    Owned rows see every incident face locally, so they are exact; halo
    rows (partial sums) are refreshed from the owning shard on exit, making
    the result safe to gather across faces (TVD upwind-cell gradients)."""
    if m.plan is not None and x.ndim == 2:
        # column loop: each scalar gradient is a fused slab stencil; a
        # single (nf, k, 3) face tensor would materialize hundreds of MB
        # through layout-hostile reshapes at production sizes
        return jnp.stack([grad_fl(m, x[:, j]) for j in range(x.shape[1])],
                         axis=1)
    if m.plan is not None and x.ndim == 1:
        out = m.plan_grad_interior(x)                        # (n, 3)
    else:
        out = _grad_interior_generic(m, x)
    for p in m.patches:
        fb = _boundary_face_value(p, x) * _fcol(p.mag_sf, x[p.owner])
        fbv = fb[..., None] * p.normal.reshape(
            (p.normal.shape[0],) + (1,) * (fb.ndim - 1) + (3,))
        out = out + jax.ops.segment_sum(fbv, p.owner,
                                        num_segments=m.n_cells)
    return m.exchange(out / m.volumes.reshape(
        (m.volumes.shape[0],) + (1,) * (out.ndim - 1)))


def _grad_interior_generic(m: FaceListMesh, x: jax.Array) -> jax.Array:
    xf = interpolate_fl(m, x)                                # (nf, ...)
    sf_vec = m.mag_sf[:, None] * m.normal                    # (nf, 3)
    face_vec = xf[..., None] * sf_vec.reshape(
        (sf_vec.shape[0],) + (1,) * (xf.ndim - 1) + (3,))
    return m.scatter_faces(face_vec)                         # (n, ..., 3)


def grad_multi_fl(meshes, X: jax.Array) -> jax.Array:
    """Gauss-linear gradient of k fields X (n_cells, k) that share interior
    geometry but carry DIFFERENT boundary coefficients (one FaceListMesh per
    column, e.g. the three velocity components' BC meshes): (n, k, 3) out.

    Interior work is ONE batched gather/scatter; only the (surface-sized)
    boundary terms differ per column, with patch a/b coefficients stacked
    columnwise. Shift-plan meshes loop columns (each a fused slab
    stencil through the column's own BC mesh) instead."""
    m = meshes[0]
    if m.plan is not None:
        return jnp.stack([grad_fl(meshes[min(c, len(meshes) - 1)], X[:, c])
                          for c in range(X.shape[1])], axis=1)
    k = X.shape[1]
    Xe = m.exchange(X)
    w = m.weights[:, None]
    xf = w * m.gather_own(Xe) + (1.0 - w) * m.gather_nei(Xe)  # (nf, k)
    sf_vec = m.mag_sf[:, None] * m.normal                    # (nf, 3)
    face_vec = xf[:, :, None] * sf_vec[:, None, :]           # (nf, k, 3)
    out = m.scatter_faces(face_vec)                          # (n, k, 3)
    for ip in range(len(m.patches)):
        ps = [mm.patches[ip] for mm in meshes]
        p0 = ps[0]
        xo = X[p0.owner]                                     # (nb, k)
        a = jnp.stack([p.a for p in ps], axis=1)
        b = jnp.stack([p.b for p in ps], axis=1)
        fb = (0.5 * (xo + a * xo + b)) * p0.mag_sf[:, None]  # (nb, k)
        fbv = fb[:, :, None] * p0.normal[:, None, :]
        out = out + jax.ops.segment_sum(fbv, p0.owner,
                                        num_segments=m.n_cells)
    return m.exchange(out / m.volumes[:, None, None])


def laplacian_explicit_fl(m: FaceListMesh, gamma_f: jax.Array, x: jax.Array,
                          gamma_b=None) -> jax.Array:
    """(1/V) sum_f gamma_f magSf snGrad(x) — explicit form."""
    x = m.exchange(x)
    sng = (m.gather_nei(x) - m.gather_own(x)) / m.delta
    out = m.scatter_faces(gamma_f * sng * m.mag_sf)
    for ip, p in enumerate(m.patches):
        gb = gamma_b[ip] if gamma_b is not None else 1.0
        out = out + jax.ops.segment_sum(
            gb * _boundary_sngrad(p, x) * p.mag_sf, p.owner,
            num_segments=m.n_cells)
    return out / m.volumes


def fvm_laplacian_corrected_fl(m: FaceListMesh, gamma_f: jax.Array, gamma_b,
                               x_curr: jax.Array, dtype=jnp.float64,
                               sign: float = 1.0) -> "FvMatrixFL":
    """sign * laplacian(gamma, x) with the non-orthogonal cross-diffusion
    part deferred against the current field value (OpenFOAM `Gauss linear
    corrected`): implicit over-relaxed orthogonal operator + explicit
    -sign*corr(x_curr) source. Identical to fvm_laplacian_fl on orthogonal
    meshes (k_no None)."""
    eqn = fvm_laplacian_fl(m, gamma_f, gamma_b, dtype, sign=sign)
    if m.k_no is not None or any(p.k_no is not None for p in m.patches):
        eqn = eqn.with_source(
            -sign * laplacian_nonortho_corr_fl(m, gamma_f, x_curr,
                                               gamma_b=gamma_b))
    return eqn


def face_grad_fl(m: FaceListMesh, x: jax.Array,
                 grad: jax.Array | None = None) -> jax.Array:
    """Face-interpolated cell gradient (nf, 3). Pass a precomputed grad_fl
    result to share one Gauss gradient across several corrections."""
    if grad is None:
        grad = grad_fl(m, x)
    g = grad[m.owner] if m.plan is None else m.gather_own(grad)
    gn = grad[m.neighbour] if m.plan is None else m.gather_nei(grad)
    w = _fcol(m.weights, g)
    return w * g + (1.0 - w) * gn


def laplacian_nonortho_corr_fl(m: FaceListMesh, gamma_f: jax.Array,
                               x: jax.Array,
                               grad: jax.Array | None = None,
                               gamma_b=None) -> jax.Array:
    """Explicit cross-diffusion correction of laplacian(gamma, x) on
    non-orthogonal meshes (per-volume units, add to an FvMatrixFL source).

    OpenFOAM `laplacian(gamma,x) Gauss linear corrected`: the face-normal
    gradient splits over-relaxed into the implicit orthogonal part
    (magSf/delta, already in fvm_laplacian_fl) plus k_no . grad_f(x)
    evaluated with the deferred (current-iterate) field — the reference's
    nonOrthogonalCorrector source (SURVEY §3.1 pEqn loop; OpenFOAM
    gaussLaplacianScheme correction()). Boundary patches with value-type
    BCs on tilted walls carry their own k_no (patch split against the
    owner-to-face-centroid vector; gamma_b per-patch diffusivities).
    Zero (and free) on fully orthogonal meshes."""
    need_b = any(p.k_no is not None for p in m.patches)
    if m.k_no is None and not need_b:
        return jnp.zeros((m.n_cells,), x.dtype)
    if grad is None:
        grad = grad_fl(m, x)
    out = jnp.zeros((m.n_cells,), x.dtype)
    if m.k_no is not None:
        gf = face_grad_fl(m, x, grad)
        corr = gamma_f * jnp.sum(m.k_no * gf, axis=1)
        out = out + m.scatter_faces(corr)
    for ip, p in enumerate(m.patches):
        if p.k_no is None:
            continue
        gb = gamma_b[ip] if gamma_b is not None else 1.0
        corr_b = gb * jnp.sum(p.k_no * grad[p.owner], axis=1)
        out = out + jax.ops.segment_sum(corr_b, p.owner,
                                        num_segments=m.n_cells)
    return out / m.volumes


def interpolate_skew_fl(m: FaceListMesh, x: jax.Array,
                        grad: jax.Array | None = None) -> jax.Array:
    """skewCorrected linear face interpolation: the linear owner/neighbour
    blend plus skew . grad_f(x) moving the interpolated value from the
    own->nei line's face intersection to the face centroid (OpenFOAM
    skewCorrectedSnGrad/skewCorrectionVectors role). Falls back to plain
    linear on skew-free meshes."""
    xf = interpolate_fl(m, x)
    if m.skew is None:
        return xf
    gf = face_grad_fl(m, x, grad)
    return xf + jnp.sum(m.skew * gf, axis=1)


def apply_stencil_lattice(X: jax.Array, diag_lat: jax.Array,
                          terms) -> jax.Array:
    """Variable-coefficient stencil matvec on the cell lattice (the
    FvMatrixFL.plan_stencil form). roll(-1) reads the +ax neighbour —
    garbage wrapped into the last plane of non-cyclic axes multiplies a
    zero coefficient (and is always finite: it is another plane of X).
    The whole expression is one XLA fusion: 7 shifted reads, 7 coefficient
    reads, 1 write. A/B-measured against the tiled-VMEM Pallas stencil
    kernel at 96^3 chem-OFF: roll 151.6 ms/step vs Pallas 193.5 — here the
    roll form is ALREADY one fusion per Krylov iteration, and the kernel
    call only adds the wrap-pad copy + double halo streaming and blocks
    fusion with the surrounding CG vector ops (the structured backend's
    padded-closure apply had the opposite economics). Pallas stays opt-in
    via DEEPFLAME_LATTICE_PALLAS=1 for future re-measurement."""
    import os as _os
    if jax.devices()[0].platform == "tpu" and X.dtype.itemsize <= 4 \
            and X.ndim == 3 and all(X.shape[ax] > 1 for ax, _, _ in terms) \
            and _os.environ.get("DEEPFLAME_LATTICE_PALLAS"):
        # (n=1 cyclic self-neighbour axes stay on the roll path, which
        # reduces them to (U+L)*X exactly; the kernel skips n=1 axes)
        from .pallas_kernels import fits_stencil_tiled, stencil_apply_tiled
        for _tx in (8, 4, 2):
            if fits_stencil_tiled(X.shape, X.dtype, tx=_tx):
                z = jnp.zeros_like(diag_lat)
                lo = [z, z, z]
                hi = [z, z, z]
                for ax, U, L in terms:
                    hi[ax] = U          # U multiplies roll(X, -1) = x_{+ax}
                    lo[ax] = L
                return stencil_apply_tiled(X, diag_lat, tuple(lo),
                                           tuple(hi), tx=_tx)
    out = diag_lat * X
    for ax, U, L in terms:
        out = out + U * jnp.roll(X, -1, axis=ax) + L * jnp.roll(X, 1, axis=ax)
    return out


# ----------------------------------------------------- implicit (FvMatrixFL)

@dataclasses.dataclass(frozen=True)
class FvMatrixFL:
    """LDU-coefficient implicit FV equation over a FaceListMesh.

    A(x)[c] = diag[c] x[c] + (1/V_c)(sum_{f: own=c} upper[f] x[nei_f]
                                     + sum_{f: nei=c} lower[f] x[own_f])
    Boundary (affine-ghost) contributions are pre-folded into diag/source.
    Division by V happens at apply time; diag/lower/upper are stored as
    raw face/cell coefficients times face area (OpenFOAM lduMatrix layout).
    """
    mesh: FaceListMesh
    diag_c: jax.Array       # (n_cells,) includes V-scaled cell terms
    lower: jax.Array        # (nf,) coefficient of x[owner] in neighbour row
    upper: jax.Array        # (nf,) coefficient of x[neighbour] in owner row
    source: jax.Array       # (n_cells,) explicit RHS (per-volume units)

    def __add__(self, other: "FvMatrixFL") -> "FvMatrixFL":
        return FvMatrixFL(self.mesh, self.diag_c + other.diag_c,
                          self.lower + other.lower,
                          self.upper + other.upper,
                          self.source + other.source)

    def with_source(self, s: jax.Array) -> "FvMatrixFL":
        return FvMatrixFL(self.mesh, self.diag_c, self.lower, self.upper,
                          self.source + s)

    def apply(self, x: jax.Array) -> jax.Array:
        m = self.mesh
        if m.plan is not None:
            return self._apply_plan(x)
        x = m.exchange(x)
        # owner rows accumulate upper*x[nei]; neighbour rows lower*x[own]
        off = m.scatter_both(self.upper * m.gather_nei(x),
                             self.lower * m.gather_own(x))
        return self.diag_c * x + off / m.volumes

    def _apply_plan(self, x: jax.Array) -> jax.Array:
        """Shift-plan matvec via the lattice-resident stencil form (see
        plan_stencil): one fused roll-stencil expression instead of 12
        serialized slab updates."""
        diag_lat, terms = self.plan_stencil()
        X = x.reshape(self.mesh.plan.shape)
        return apply_stencil_lattice(X, diag_lat, terms).reshape(-1)

    def plan_stencil(self, scale: jax.Array | None = None):
        """Lattice-resident stencil coefficients (plan meshes only):
        (diag_lat, ((ax, U, L), ...)) with the 1/V row scaling folded in,
        so the matvec is ONE fused expression over rolled views:

            out = diag_lat * X + sum_ax U_ax * roll(X, -1, ax)
                                        + L_ax * roll(X, +1, ax)

        U_ax[c] is the coefficient of the +ax neighbour in row c (zero on
        the last plane of non-cyclic axes; the wrap face's coefficient
        there on cyclic axes — roll supplies exactly the wrapped value).
        Precompute ONCE per solve and close over it: the coefficient
        reshapes/pads leave the Krylov while_loop entirely, and each
        iteration is a single 7-point stencil pass (the shape the
        structured backend's Pallas Helmholtz kernel covers — the round-4
        face-list profile put ~69% of the FV step in these loops).
        `scale`: optional per-cell row scaling (the pEqn's V/V_mean
        symmetrization), folded into every coefficient."""
        from ..mesh.facelist import _lattice_shape, _plan_segments
        m = self.mesh
        pl = m.plan
        shape = pl.shape
        dt = self.diag_c.dtype
        invV = (1.0 / m.volumes).reshape(shape)
        row = invV if scale is None else invV * scale.reshape(shape)
        diag_lat = self.diag_c.reshape(shape)
        if scale is not None:
            diag_lat = diag_lat * scale.reshape(shape)
        acc: dict[int, tuple] = {}
        for ax, is_wrap, start, count in _plan_segments(pl):
            n_ax = shape[ax]
            lat = _lattice_shape(shape, ax, is_wrap)
            up = self.upper[start:start + count].reshape(lat)
            lo = self.lower[start:start + count].reshape(lat)
            if ax not in acc:
                acc[ax] = (jnp.zeros(shape, dt), jnp.zeros(shape, dt))
            U, L = acc[ax]
            sl_o = [slice(None)] * 3
            sl_n = [slice(None)] * 3
            if is_wrap:
                sl_o[ax] = slice(n_ax - 1, n_ax)
                sl_n[ax] = slice(0, 1)
            else:
                sl_o[ax] = slice(0, n_ax - 1)
                sl_n[ax] = slice(1, n_ax)
            acc[ax] = (U.at[tuple(sl_o)].add(up),
                       L.at[tuple(sl_n)].add(lo))
        terms = tuple((ax, U * row, L * row)
                      for ax, (U, L) in sorted(acc.items()))
        return diag_lat, terms

    def rhs(self) -> jax.Array:
        return self.source

    def diag(self) -> jax.Array:
        return self.diag_c

    def H(self, x: jax.Array) -> jax.Array:
        """OpenFOAM H operator: b - (A(x) - diag*x) (same contract as the
        structured FvMatrix.H, ops/fv.py)."""
        return self.rhs() - (self.apply(x) - self.diag_c * x)

    def ell(self, width: int = 6, conn=None):
        """(nbr (n,w) int32, coef (n,w)) ELLPACK form of the off-diagonal:
        A(x) = diag_c*x + (1/V) sum_w coef[:,w] * x[nbr[:,w]].

        Precomputed once per matrix; `apply_ell` then needs ONE dense gather
        + masked sum per matvec — the layout for the Pallas SpMV kernel
        (pallas_kernels.ell_matvec) and for XLA's native gather.
        `conn` takes a precomputed ell_connectivity() triple — REQUIRED under
        jit/shard_map where mesh index leaves are tracers (the host-side
        connectivity walk cannot run on tracers)."""
        m = self.mesh
        face_ids, side, nbr = (conn if conn is not None
                               else m.ell_connectivity(width))
        f_safe = jnp.maximum(face_ids, 0)
        coef = jnp.where(side > 0, self.upper[f_safe],
                         jnp.where(side < 0, self.lower[f_safe], 0.0))
        coef = coef / m.volumes[:, None]
        return nbr, coef

    def apply_ell(self, x: jax.Array, nbr: jax.Array,
                  coef: jax.Array, pallas: bool = False) -> jax.Array:
        """Matvec through the ELL layout (equivalent to apply()): ONE dense
        gather + width-w reduction instead of two face->cell segment_sums.
        Halo-aware: nbr indices address the exchanged local vector, so the
        shard-local [owned | halo] layout works unchanged. With pallas=True
        the gather+reduce runs in the Mosaic ELL SpMV kernel
        (ops/pallas_kernels.ell_matvec — x held whole in VMEM)."""
        xe = self.mesh.exchange(x)
        if pallas:
            from .pallas_kernels import ell_matvec
            return ell_matvec(xe, self.diag_c, nbr, coef)
        return self.diag_c * x + jnp.sum(coef * xe[nbr], axis=1)


def _empty_matrix(m: FaceListMesh, dtype) -> FvMatrixFL:
    z_c = jnp.zeros((m.n_cells,), dtype)
    z_f = jnp.zeros((m.n_faces,), dtype)
    return FvMatrixFL(m, z_c, z_f, z_f, z_c)


def fvm_source_implicit_fl(m: FaceListMesh, coeff: jax.Array,
                           dtype=jnp.float64) -> FvMatrixFL:
    """coeff * x as an implicit diagonal term (e.g. rho/dt for ddt)."""
    e = _empty_matrix(m, dtype)
    return dataclasses.replace(e, diag_c=e.diag_c + coeff)


def fvm_ddt_fl(m: FaceListMesh, rho: jax.Array, rho_old: jax.Array,
               x_old: jax.Array, dt, dtype=jnp.float64) -> FvMatrixFL:
    """d(rho x)/dt Euler: (rho/dt) x - (rho_old/dt) x_old."""
    e = _empty_matrix(m, dtype)
    return FvMatrixFL(m, e.diag_c + rho / dt, e.lower, e.upper,
                      e.source + rho_old * x_old / dt)


def _tvd_limiter(scheme: str, r: jax.Array, k: float = 1.0) -> jax.Array:
    """Flux limiter value psi(r) (same formulas as ops/fv.py
    limited_face_values — the structured backend's scheme table)."""
    if scheme == "limitedLinear":
        return jnp.clip(2.0 * r / k, 0.0, 1.0)
    if scheme == "vanLeer":
        return (r + jnp.abs(r)) / (1.0 + jnp.abs(r))
    if scheme == "minmod":
        return jnp.clip(r, 0.0, 1.0)
    if scheme == "MUSCL":
        return jnp.maximum(0.0, jnp.minimum(jnp.minimum(2.0 * r,
                                                        0.5 * (r + 1.0)),
                                            2.0))
    if scheme == "superBee":
        return jnp.maximum(jnp.maximum(0.0, jnp.minimum(2.0 * r, 1.0)),
                           jnp.minimum(r, 2.0))
    if scheme == "QUICK":
        return jnp.maximum(0.0, jnp.minimum(jnp.minimum(2.0 * r,
                                                        0.25 * (3.0 + r)),
                                            2.0))
    if scheme == "vanAlbada":
        return jnp.maximum((r * r + r) / (r * r + 1.0), 0.0)
    if scheme == "OSPRE":
        return jnp.maximum(1.5 * (r * r + r) / (r * r + r + 1.0), 0.0)
    raise ValueError(f"unknown convection scheme {scheme}")


def fvm_div_fl(m: FaceListMesh, phi: jax.Array, bcs_phi_b,
               scheme: str = "upwind", dtype=jnp.float64,
               x_now: jax.Array | None = None,
               limiter_k: float = 1.0) -> FvMatrixFL:
    """Implicit div(phi, x). phi: interior face-normal flux density
    [field.m/s] (OUTWARD from owner), bcs_phi_b: per-patch boundary flux.

    upwind: face value = x_own where phi>0 else x_nei (matrix coefficients
    max/min split); linear: distance weights. TVD schemes (limitedLinear/
    vanLeer/minmod/MUSCL/superBee/QUICK/vanAlbada/OSPRE): implicit upwind +
    deferred-corrected limited anti-diffusion from the current iterate
    `x_now`, with the unstructured gradient-ratio
    r = 2 (grad_up . d_own->nei)/(x_nei - x_own) - 1 (Darwish & Moukalled;
    the structured backend's far-cell form specializes to this on uniform
    grids). Boundary faces: outflow takes the owner value (implicit),
    inflow takes the ghost (a*x_own + b): implicit a-part + explicit
    b-part."""
    F = phi * m.mag_sf
    tvd_src = None
    if scheme == "upwind":
        w_own_F = jnp.maximum(F, 0.0)        # coefficient of x_own
        w_nei_F = jnp.minimum(F, 0.0)        # coefficient of x_nei
    elif scheme == "linear":
        w = m.weights
        w_own_F = w * F
        w_nei_F = (1.0 - w) * F
    else:
        if x_now is None:
            raise ValueError(f"scheme '{scheme}' needs the current iterate "
                             "x_now for the deferred limiter")
        w_own_F = jnp.maximum(F, 0.0)
        w_nei_F = jnp.minimum(F, 0.0)
        g = grad_fl(m, x_now)                               # (n, 3)
        d_vec = m.gather_nei(m.centers) - m.gather_own(m.centers)
        x_now = m.exchange(x_now)
        xo, xn = m.gather_own(x_now), m.gather_nei(x_now)
        g_up = jnp.where((F >= 0)[:, None], m.gather_own(g),
                         m.gather_nei(g))
        g_up_d = jnp.sum(g_up * d_vec, axis=1)
        dx = xn - xo
        eps = jnp.asarray(jnp.finfo(x_now.dtype).eps, x_now.dtype)
        safe = jnp.where(jnp.abs(dx) > eps, dx, eps)
        r = 2.0 * g_up_d / safe - 1.0
        lim = _tvd_limiter(scheme, r, limiter_k)
        up = jnp.where(F >= 0, xo, xn)
        central = m.weights * xo + (1.0 - m.weights) * xn
        tvd_src = m.scatter_faces(F * lim * (central - up)) / m.volumes
    inv_v = 1.0 / m.volumes
    diag = m.scatter_both(w_own_F, -w_nei_F)
    upper = w_nei_F               # owner row, x_nei coefficient
    lower = -w_own_F              # neighbour row, x_own coefficient
    src = jnp.zeros((m.n_cells,), dtype)
    for p, phi_b in zip(m.patches, bcs_phi_b):
        Fb = phi_b * p.mag_sf
        if scheme != "linear":        # upwind + TVD: first-order boundary
            out_mask = Fb >= 0.0
            coeff_own = jnp.where(out_mask, Fb, Fb * p.a)
            src_b = jnp.where(out_mask, 0.0, Fb * p.b)
        else:
            coeff_own = Fb * 0.5 * (1.0 + p.a)
            src_b = Fb * 0.5 * p.b
        diag = diag + jax.ops.segment_sum(coeff_own, p.owner,
                                          num_segments=m.n_cells)
        src = src - jax.ops.segment_sum(src_b, p.owner,
                                        num_segments=m.n_cells)
    out = FvMatrixFL(m, diag * inv_v, lower, upper, src * inv_v)
    if tvd_src is not None:
        out = out.with_source(-tvd_src)
    return out


def fvm_laplacian_fl(m: FaceListMesh, gamma_f: jax.Array, gamma_b,
                     dtype=jnp.float64, sign: float = 1.0) -> FvMatrixFL:
    """sign * laplacian(gamma, x). gamma_f: interior-face diffusivity,
    gamma_b: per-patch boundary diffusivity list (scalars or arrays).

    laplacian = (1/V) sum_f gamma_f magSf (x_nei - x_own)/delta."""
    g = sign * gamma_f * m.mag_sf / m.delta
    inv_v = 1.0 / m.volumes
    diag = -m.scatter_both(g, g)
    upper = g                      # owner row
    lower = g                      # neighbour row
    src = jnp.zeros((m.n_cells,), dtype)
    for ip, p in enumerate(m.patches):
        gb = (gamma_b[ip] if gamma_b is not None else 1.0)
        gb = sign * gb * p.mag_sf / p.delta
        # flux into owner = gb*(ghost - x_own) = gb*((a-1) x_own + b)
        diag = diag + jax.ops.segment_sum(gb * (p.a - 1.0), p.owner,
                                          num_segments=m.n_cells)
        src = src - jax.ops.segment_sum(gb * p.b, p.owner,
                                        num_segments=m.n_cells)
    return FvMatrixFL(m, diag * inv_v, lower, upper, src * inv_v)
