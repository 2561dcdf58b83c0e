"""Structured block mesh + boundary-condition system.

Role parity: replaces OpenFOAM's fvMesh + LDU addressing and the GPU mesh
database (/root/reference/src_gpu/dfMatrixDataBase.H:97-324: owner/neighbor
indices, face weights, Sf, volumes, per-patch BC type enum at :81-93).

TPU-first design: every case in the reference test/example suite (0D cubes,
1D flame/detonation tubes, 2D/3D TGV, aachenBomb box...) is a block mesh, so
the primary mesh is a uniform structured block. Stencil operations become
array shifts — no gather/scatter, perfect XLA/MXU tiling — and multi-chip
domain decomposition is expressed by sharding the cell axes over a
`jax.sharding.Mesh` (GSPMD inserts the halo collectives the reference does by
hand with MPI/NCCL, dfMatrixOpBase.H:139-155).

Boundary conditions are affine ghost relations ghost = a * owner + b, which
makes every discrete operator split cleanly into an implicit part (homogeneous
ghosts, a*x) and a source part (b) — the matrix-free analogue of OpenFOAM's
internalCoeffs/boundaryCoeffs. Supported kinds cover the reference BC enum
(dfMatrixDataBase.H:81-93): fixedValue, zeroGradient, fixedGradient, cyclic,
symmetry, empty, inletOutlet (processor patches are subsumed by sharding).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

__all__ = ["StructuredMesh", "BC", "FieldBCs", "pad_field",
           "fixed_value", "zero_gradient", "cyclic", "fixed_gradient",
           "symmetry", "empty", "processor", "processor_parts"]


@dataclasses.dataclass(frozen=True)
class StructuredMesh:
    """Uniform structured block mesh (3D; 1D/2D cases use size-1 axes with
    'empty' BCs, like OpenFOAM's empty patches)."""
    nx: int
    ny: int
    nz: int
    dx: float
    dy: float
    dz: float
    x0: float = 0.0
    y0: float = 0.0
    z0: float = 0.0

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.nx, self.ny, self.nz)

    @property
    def n_cells(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def volume(self) -> float:
        return self.dx * self.dy * self.dz

    @property
    def spacing(self) -> tuple[float, float, float]:
        return (self.dx, self.dy, self.dz)

    def cell_centers(self, dtype=jnp.float64):
        x = self.x0 + (jnp.arange(self.nx, dtype=dtype) + 0.5) * self.dx
        y = self.y0 + (jnp.arange(self.ny, dtype=dtype) + 0.5) * self.dy
        z = self.z0 + (jnp.arange(self.nz, dtype=dtype) + 0.5) * self.dz
        return jnp.meshgrid(x, y, z, indexing="ij")

    @staticmethod
    def box(lengths: Sequence[float], cells: Sequence[int],
            origin: Sequence[float] = (0.0, 0.0, 0.0)) -> "StructuredMesh":
        nx, ny, nz = cells
        Lx, Ly, Lz = lengths
        return StructuredMesh(nx, ny, nz, Lx / nx, Ly / ny, Lz / nz,
                              origin[0], origin[1], origin[2])


@dataclasses.dataclass(frozen=True)
class BC:
    """Affine ghost boundary condition: ghost = a * owner + b.

    kind is kept for scheme-specific behavior (e.g. upwind at inlets); the
    (a, b) pair is what operators consume. `value` units: field units for
    fixedValue/inletOutlet, field units per metre for fixedGradient.
    """
    kind: str
    value: Any = 0.0

    def coeffs(self, h: float, side: int):
        """(a, b) for ghost = a*owner + b. h: cell spacing along the axis,
        side: -1 for the low face, +1 for the high face."""
        if self.kind == "fixedValue":
            return -1.0, 2.0 * self.value
        if self.kind in ("zeroGradient", "symmetry", "empty", "extrapolated"):
            return 1.0, 0.0
        if self.kind == "fixedGradient":
            return 1.0, side * self.value * h
        if self.kind == "symmetryNegate":   # normal velocity component at symmetry
            return -1.0, 0.0
        if self.kind == "inletOutlet":
            # treated as fixedValue here; convection schemes switch on flux sign
            return -1.0, 2.0 * self.value
        if self.kind == "affine":
            # precomputed (a, b), possibly array-valued (energy BCs resolve
            # T-space conditions to these; mesh/energy_bcs.py)
            return self.value
        raise ValueError(f"BC kind {self.kind} has no affine ghost")


def fixed_value(v) -> BC:
    return BC("fixedValue", v)


def zero_gradient() -> BC:
    return BC("zeroGradient")


def cyclic() -> BC:
    return BC("cyclic")


def fixed_gradient(g) -> BC:
    return BC("fixedGradient", g)


def symmetry(negate: bool = False) -> BC:
    return BC("symmetryNegate" if negate else "symmetry")


def empty() -> BC:
    return BC("empty")


def processor(axis_name: str, global_bc: BC) -> BC:
    """Processor (inter-shard) boundary for a mesh axis partitioned over a
    `shard_map` device-mesh axis `axis_name`.

    Role parity: OpenFOAM processor patches / the reference's NCCL halo
    exchange (/root/reference/src_gpu/dfMatrixOpBase.H:139-155,
    dfNcclBase.cu:23-60). Ghost layers come from the neighbouring shard via
    `lax.ppermute` over ICI; the first/last shard fall back to `global_bc`
    (the physical domain-edge BC) — unless `global_bc` is cyclic, in which
    case the ppermute ring IS the periodic wrap.
    """
    return BC("processor", (axis_name, global_bc))


def processor_parts(bc: BC) -> tuple[str, BC]:
    """(mesh-axis name, domain-edge BC) of a processor BC."""
    assert bc.kind == "processor"
    return bc.value


def _ring_planes(plane_lo: jax.Array, plane_hi: jax.Array, axis_name: str):
    """Halo exchange of one boundary plane per side over the shard ring.

    Returns (ghost_lo, ghost_hi): ghost_lo = LEFT neighbour's plane_hi,
    ghost_hi = RIGHT neighbour's plane_lo (ring-wrapped at the ends).
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return plane_hi, plane_lo
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    g_lo = jax.lax.ppermute(plane_hi, axis_name, fwd)
    g_hi = jax.lax.ppermute(plane_lo, axis_name, bwd)
    return g_lo, g_hi


def _edge_masks(axis_name: str):
    """(is_first_shard, is_last_shard) booleans for the shard ring."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    return idx == 0, idx == n - 1


def _pad_axis_processor(out, axis: int, lo: BC, hi: BC, h: float,
                        homogeneous: bool, bc_only: bool) -> jax.Array:
    """Pad one sharded axis with halo planes from neighbouring shards,
    overriding with the physical BC ghost at the domain edges."""
    axis_name, gbc_lo = processor_parts(lo)
    axis_name_hi, gbc_hi = processor_parts(hi)
    assert axis_name == axis_name_hi, "processor axis names must match"
    n = out.shape[axis]
    own_lo = jax.lax.slice_in_dim(out, 0, 1, axis=axis)
    own_hi = jax.lax.slice_in_dim(out, n - 1, n, axis=axis)
    g_lo, g_hi = _ring_planes(own_lo, own_hi, axis_name)
    if gbc_lo.kind != "cyclic" or gbc_hi.kind != "cyclic":
        first, last = _edge_masks(axis_name)
    if gbc_lo.kind != "cyclic":
        a, b = gbc_lo.coeffs(h, -1)
        if homogeneous:
            edge = a * own_lo
        elif bc_only:
            edge = jnp.zeros_like(own_lo) + b
        else:
            edge = a * own_lo + b
        g_lo = jnp.where(first, edge, g_lo)
    if gbc_hi.kind != "cyclic":
        a, b = gbc_hi.coeffs(h, +1)
        if homogeneous:
            edge = a * own_hi
        elif bc_only:
            edge = jnp.zeros_like(own_hi) + b
        else:
            edge = a * own_hi + b
        g_hi = jnp.where(last, edge, g_hi)
    return jnp.concatenate([g_lo, out, g_hi], axis=axis)


# FieldBCs: ((x_lo, x_hi), (y_lo, y_hi), (z_lo, z_hi))
FieldBCs = tuple


def pad_field(f: jax.Array, bcs: FieldBCs, mesh: StructuredMesh,
              homogeneous: bool = False, bc_only: bool = False) -> jax.Array:
    """Pad a (nx, ny, nz) cell field with one ghost layer per side.

    homogeneous: ghost = a * owner (drop b)  — for implicit matvecs.
    bc_only:     ghost = b, interior zeroed  — for source extraction.
    default:     ghost = a * owner + b       — for explicit (fvc) operators.
    """
    if bc_only:
        interior = jnp.zeros_like(f)
    else:
        interior = f
    out = interior
    spacing = mesh.spacing
    for axis in range(3):
        lo, hi = bcs[axis]
        h = spacing[axis]
        if lo.kind == "processor" or hi.kind == "processor":
            if lo.kind != hi.kind:
                raise ValueError("processor BC must be paired on both sides")
            out = _pad_axis_processor(out, axis, lo, hi, h,
                                      homogeneous, bc_only)
            continue
        if lo.kind == "cyclic" or hi.kind == "cyclic":
            if lo.kind != hi.kind:
                raise ValueError("cyclic BC must be paired on both sides")
            if bc_only:
                # cyclic has no inhomogeneous part; pad zeros
                out = _pad_axis_const(out, axis, 0.0, 0.0)
            else:
                out = _pad_axis_wrap(out, axis)
            continue
        a_lo, b_lo = lo.coeffs(h, -1)
        a_hi, b_hi = hi.coeffs(h, +1)
        own_lo = jax.lax.slice_in_dim(out, 0, 1, axis=axis)
        own_hi = jax.lax.slice_in_dim(out, out.shape[axis] - 1, out.shape[axis],
                                      axis=axis)
        if homogeneous:
            g_lo = a_lo * own_lo
            g_hi = a_hi * own_hi
        elif bc_only:
            g_lo = jnp.zeros_like(own_lo) + b_lo
            g_hi = jnp.zeros_like(own_hi) + b_hi
        else:
            g_lo = a_lo * own_lo + b_lo
            g_hi = a_hi * own_hi + b_hi
        out = jnp.concatenate([g_lo, out, g_hi], axis=axis)
    return out


def pad_n(f: jax.Array, bcs: FieldBCs, mesh: StructuredMesh,
          n_ghost: int) -> jax.Array:
    """Pad with n_ghost layers per side on every axis: first layer by the
    affine BC relation, outer layers by exact wrap (cyclic) or replication
    (physical boundaries) — for wide stencils (WENO5 needs 3)."""
    P = pad_field(f, bcs, mesh)
    for axis in range(3):
        kind = bcs[axis][0].kind
        cyc = kind == "cyclic"
        proc = kind == "processor"
        if proc:
            axis_name, gbc_lo = processor_parts(bcs[axis][0])
            _, gbc_hi = processor_parts(bcs[axis][1])
        for layer in range(1, n_ghost):
            n = P.shape[axis]
            if cyc or proc:
                # padded = [g..., c0..c_{m-1}, ...g]; the next-lower wrap
                # value sits at index n - 2*layer - 1 of the CURRENT padded
                # array (for processor axes: of the NEIGHBOUR's identically
                # shaped padded array — exchange the same slices)
                lo = jax.lax.slice_in_dim(P, n - 2 * layer - 1,
                                          n - 2 * layer, axis=axis)
                hi = jax.lax.slice_in_dim(P, 2 * layer, 2 * layer + 1,
                                          axis=axis)
                if proc:
                    g_lo, g_hi = _ring_planes(hi, lo, axis_name)
                    # domain edges (non-cyclic global BC): replicate the BC
                    # ghost — matches the unsharded branch below
                    if gbc_lo.kind != "cyclic" or gbc_hi.kind != "cyclic":
                        first, last = _edge_masks(axis_name)
                    if gbc_lo.kind != "cyclic":
                        g_lo = jnp.where(
                            first,
                            jax.lax.slice_in_dim(P, 0, 1, axis=axis), g_lo)
                    if gbc_hi.kind != "cyclic":
                        g_hi = jnp.where(
                            last,
                            jax.lax.slice_in_dim(P, n - 1, n, axis=axis),
                            g_hi)
                    lo, hi = g_lo, g_hi
            else:
                lo = jax.lax.slice_in_dim(P, 0, 1, axis=axis)
                hi = jax.lax.slice_in_dim(P, n - 1, n, axis=axis)
            P = jnp.concatenate([lo, P, hi], axis=axis)
    return P


def extend_padded(P: jax.Array, axis: int, bcs: FieldBCs):
    """Second ghost layer for wide (TVD/MUSCL) stencils.

    P is a once-padded field (n+2 along axis). Returns (Pm, Pp), each n+3:
    Pm prepends the far-low ghost, Pp appends the far-high ghost. Cyclic axes
    wrap exactly (required for flux consistency at the periodic seam — the two
    duplicate wrap faces must see identical stencils); other BCs replicate the
    ghost (first-order at physical boundaries, standard practice)."""
    n = P.shape[axis]
    if bcs[axis][0].kind == "cyclic":
        # padded indices: [ghost=c_{n-1}, c_0..c_{n-1}, ghost=c_0]
        far_lo = jax.lax.slice_in_dim(P, n - 3, n - 2, axis=axis)  # c_{n-2}
        far_hi = jax.lax.slice_in_dim(P, 2, 3, axis=axis)          # c_1
    elif bcs[axis][0].kind == "processor":
        axis_name, gbc_lo = processor_parts(bcs[axis][0])
        _, gbc_hi = processor_parts(bcs[axis][1])
        # far-lo = LEFT neighbour's second-from-top cell c_{nl-2} (their
        # P[n-3]); far-hi = RIGHT neighbour's c_1 (their P[2])
        send_fwd = jax.lax.slice_in_dim(P, n - 3, n - 2, axis=axis)
        send_bwd = jax.lax.slice_in_dim(P, 2, 3, axis=axis)
        far_lo, far_hi = _ring_planes(send_bwd, send_fwd, axis_name)
        if gbc_lo.kind != "cyclic" or gbc_hi.kind != "cyclic":
            first, last = _edge_masks(axis_name)
        if gbc_lo.kind != "cyclic":
            far_lo = jnp.where(
                first, jax.lax.slice_in_dim(P, 0, 1, axis=axis), far_lo)
        if gbc_hi.kind != "cyclic":
            far_hi = jnp.where(
                last, jax.lax.slice_in_dim(P, n - 1, n, axis=axis), far_hi)
    else:
        far_lo = jax.lax.slice_in_dim(P, 0, 1, axis=axis)
        far_hi = jax.lax.slice_in_dim(P, n - 1, n, axis=axis)
    Pm = jnp.concatenate([far_lo, P], axis=axis)
    Pp = jnp.concatenate([P, far_hi], axis=axis)
    return Pm, Pp


def _pad_axis_wrap(f: jax.Array, axis: int) -> jax.Array:
    lo = jax.lax.slice_in_dim(f, f.shape[axis] - 1, f.shape[axis], axis=axis)
    hi = jax.lax.slice_in_dim(f, 0, 1, axis=axis)
    return jnp.concatenate([lo, f, hi], axis=axis)


def _pad_axis_const(f: jax.Array, axis: int, lo_val, hi_val) -> jax.Array:
    lo = jnp.zeros_like(jax.lax.slice_in_dim(f, 0, 1, axis=axis)) + lo_val
    hi = jnp.zeros_like(lo) + hi_val
    return jnp.concatenate([lo, f, hi], axis=axis)
