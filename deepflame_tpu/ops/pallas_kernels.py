"""Pallas TPU kernels for hot structured-grid operators.

The framework's default compute path is XLA-fused jnp (shifts + elementwise),
which the compiler already maps well; these kernels cover the cases where
explicit VMEM residency and fusion control pay: the variable-coefficient
7-point operator evaluated many times per solve (CG matvec / multigrid
smoother — the role AmgX's hand-written CUDA kernels play in the reference,
src_gpu/AmgXSolver.cu).

`helmholtz_apply` computes  out = d * x - div(gamma grad x)  from a
ghost-padded field, whole arrays VMEM-resident (fits comfortably up to
~96^3 f32 per operand; larger grids use the XLA path). Grid dimension 1 —
the kernel is one fused pass with no HBM round-trips between the seven
stencil reads, the coefficient loads, and the write.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["helmholtz_apply", "helmholtz_apply_tiled", "fits_vmem",
           "fits_vmem_tiled", "gj_inverse_lanes", "ell_matvec",
           "mlp_fused_lanes", "stencil_apply_tiled", "fits_stencil_tiled"]


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                w4_ref, b4_ref, out_ref, *, compute_dtype):
    """One (species, lane-block) program of the fused DF-ODENet MLP:
    x (Bt, F) -> gelu(x@W1+b1) -> gelu(@W2+b2) -> gelu(@W3+b3) -> @W4+b4.

    ALL hidden activations live in VMEM for the block's lifetime — the XLA
    path writes each (S, B, 1600)-shaped layer output to HBM and reads it
    back for the next matmul (the measured bottleneck: activation traffic
    ~90 kB/lane vs ~22 B/lane of x/out). Matmuls run on the MXU in
    `compute_dtype` (bf16) with f32 accumulation."""
    cd = compute_dtype
    f32 = jnp.float32
    h = x_ref[:].astype(cd)
    sp = pl.program_id(0)
    for w_ref, b_ref, last in ((w1_ref, b1_ref, False),
                               (w2_ref, b2_ref, False),
                               (w3_ref, b3_ref, False),
                               (w4_ref, b4_ref, True)):
        W = w_ref[0].astype(cd)                       # (in, out)
        h = jax.lax.dot_general(h, W, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        # biases arrive UNBLOCKED (full (S, o) in VMEM, species row read by
        # program id): a (1, o) block fails Mosaic's tiling rule whenever o
        # is not lane-aligned AND S != 1 (drm19's S = 20 surfaced it)
        h = h + b_ref[sp].astype(f32)[None, :]
        if not last:
            # erf-GELU with erf evaluated by the Abramowitz-Stegun 7.1.26
            # rational polynomial (|err| <= 1.5e-7 — below f32 activation
            # noise): Mosaic implements neither erf nor erfc, so
            # jax.nn.gelu(approximate=False)/lax.erf cannot lower here
            z = h * jnp.asarray(0.7071067811865476, f32)
            az = jnp.abs(z)
            t = 1.0 / (1.0 + 0.3275911 * az)
            poly = t * (0.254829592 + t * (-0.284496736 + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429))))
            erf_abs = 1.0 - poly * jnp.exp(-az * az)
            erf_z = jnp.sign(z) * erf_abs
            h = (0.5 * h * (1.0 + erf_z)).astype(cd)
    out_ref[0, 0, :] = h[:, 0].astype(out_ref.dtype)


def mlp_fused_lanes(x: jax.Array, Ws, bs, compute_dtype=jnp.bfloat16,
                    block: int = 256, interpret: bool = False) -> jax.Array:
    """Fused stacked-species MLP: x (B, F) through S parallel [F, 1600,
    800, 400, 1] nets -> (B, S).

    Ws: 4 stacked weights [(S,F,1600), (S,1600,800), (S,800,400),
    (S,400,1)]; bs: matching stacked biases [(S,o)...]. Grid is
    (S, B/block) with the lane-block loop INNERMOST, so each species'
    weights are fetched into VMEM once and stay resident across every
    lane block (weight traffic = S x 3.2 MB total, not per block).
    Replaces the lax.map-chunked XLA path whose inter-layer activations
    round-trip HBM (~3x the matmul time at 96^3).

    block=256 keeps the per-step scoped VMEM under the 16 MB limit:
    double-buffered blocks (W2 alone is 5.1 MB f32) + the f32 hidden
    activations put block=512 at ~16.8 MB — the "intermittent" axon
    remote-compile 500s on full-step graphs were this stack OOM."""
    B, F = x.shape
    S = Ws[0].shape[0]
    pad = (-B) % block
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    Bp = B + pad
    ms = pl.ANY if interpret else pltpu.VMEM
    bs_spec = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=ms)
    import functools
    kern = functools.partial(_mlp_kernel, compute_dtype=compute_dtype)
    in_specs = [bs_spec((block, F), lambda i, j: (j, 0))]
    for W, b in zip(Ws, bs):
        in_specs.append(bs_spec((1,) + W.shape[1:], lambda i, j: (i, 0, 0)))
        in_specs.append(bs_spec(b.shape, lambda i, j: (0, 0)))
    # out is (S, 1, Bp): a (1, 1, block) block's LAST TWO dims are
    # (1, block) == (overall middle, lane-aligned) — the 2D (S, Bp) form's
    # (1, block) block violates Mosaic's tiling rule whenever S > 8
    # (drm19's 20 species surfaced it; H2's 8 fit one sublane tile)
    out = pl.pallas_call(
        kern,
        grid=(S, Bp // block),
        in_specs=in_specs,
        out_specs=bs_spec((1, 1, block), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((S, 1, Bp), x.dtype),
        interpret=interpret,
    )(xp, *[a for Wb in zip(Ws, bs) for a in Wb])
    return out[:, 0, :B].T


def ell_matvec(x: jax.Array, diag: jax.Array, nbr: jax.Array,
               coef: jax.Array, block: int = 2048,
               interpret: bool = False) -> jax.Array:
    """ELLPACK SpMV: out[c] = diag[c] x[c] + sum_w coef[c,w] x[nbr[c,w]].

    Prototype CSR/ELL gather kernel over face-cell connectivity (the
    BASELINE north-star "gather/scatter Pallas kernels over CSR face-cell
    connectivity"; reference SpMV: src_gpu CUDA + AmgX). The cell vector is
    kept whole in VMEM (fits for <=~1M cells f32); per-block gathers and
    the width-w reduction run on the VPU.
    """
    n = x.shape[0]
    w = nbr.shape[1]
    pad = (-n) % block
    if pad:
        xp = jnp.pad(x, (0, pad))
        diag = jnp.pad(diag, (0, pad))
        nbr = jnp.pad(nbr, ((0, pad), (0, 0)))
        coef = jnp.pad(coef, ((0, pad), (0, 0)))
    else:
        xp = x
    npad = n + pad

    def kern(x_ref, xb_ref, d_ref, nbr_ref, coef_ref, out_ref):
        xall = x_ref[:]
        acc = d_ref[:] * xb_ref[:]
        idx = nbr_ref[:]
        cf = coef_ref[:]
        for j in range(w):
            acc = acc + cf[:, j] * jnp.take(xall, idx[:, j], axis=0)
        out_ref[:] = acc

    ms = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kern,
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec(memory_space=ms),                       # full x
            pl.BlockSpec((block,), lambda i: (i,), memory_space=ms),  # x blk
            pl.BlockSpec((block,), lambda i: (i,), memory_space=ms),
            pl.BlockSpec((block, w), lambda i: (i, 0), memory_space=ms),
            pl.BlockSpec((block, w), lambda i: (i, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,), memory_space=ms),
        out_shape=jax.ShapeDtypeStruct((npad,), x.dtype),
        interpret=interpret,
    )(xp, xp, diag, nbr, coef)
    return out[:n]


def _gj_kernel(W_ref, out_ref, *, n):
    """Batched row-equilibrated unpivoted Gauss-Jordan inverse, one VMEM
    block of lanes. W_ref/out_ref: (n, n, B) — matrix dims leading, lanes
    last, so every row op is a well-tiled (2n, B)/(B,) vector op and the
    whole tableau stays VMEM-resident across the n elimination steps
    (the XLA path rewrites the full tableau through HBM n times)."""
    W = W_ref[:]                                     # (n, n, B)
    s = 1.0 / jnp.maximum(jnp.max(jnp.abs(W), axis=1), 1e-30)   # (n, B)
    A = W * s[:, None, :]
    B_lanes = W.shape[-1]
    eye = jnp.broadcast_to(
        jnp.eye(n, dtype=W.dtype)[:, :, None], (n, n, B_lanes))
    M = jnp.concatenate([A, eye], axis=1)            # (n, 2n, B)
    for k in range(n):
        row_k = M[k]                                 # (2n, B)
        pv = row_k[k]
        row_k = row_k / jnp.where(jnp.abs(pv) > 1e-30, pv,
                                  jnp.asarray(1e-30, W.dtype))[None, :]
        col_k = M[:, k, :]                           # (n, B)
        rowsel = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0) == k
        M = M - col_k[:, None, :] * row_k[None, :, :] \
            + jnp.where(rowsel, row_k[None, :, :], 0.0)
    out_ref[:] = M[:, n:, :] * s[None, :, :]


def gj_inverse_lanes(W_t: jax.Array, block: int = 2048,
                     interpret: bool = False) -> jax.Array:
    """W_t: (n, n, L) lanes-last batch of small matrices -> (n, n, L)
    inverses (row-equilibrated unpivoted Gauss-Jordan; see the integrator's
    notes on why no pivoting). L must be a multiple of `block` — callers
    pad. VMEM per block at n=16: 16*32*2048*4 B = 4 MiB."""
    n = W_t.shape[0]
    L = W_t.shape[-1]
    assert L % block == 0, (L, block)
    import functools
    kern = functools.partial(_gj_kernel, n=n)
    return pl.pallas_call(
        kern,
        grid=(L // block,),
        in_specs=[pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(W_t.shape, W_t.dtype),
        interpret=interpret,
    )(W_t)


def fits_vmem(shape, dtype, budget_bytes: int = 10 * 2**20) -> bool:
    """Whole-array kernel feasibility, accounting for TPU tile padding: the
    last dim pads to the 128-lane width and the second-to-last to the
    sublane count — a (128,128,1) array occupies (128,128,128) in VMEM, so
    thin-z 2D fields must NOT take this path.

    Budget is the sum of the named operands; Mosaic's stencil-slice
    temporaries add ~50% on top, and the scoped-vmem limit is 16 MiB —
    measured: 64^3 f32 (named ~13 MiB) OOMs at 18.9 MiB scoped, 48^3
    (named ~7.6 MiB) fits. 10 MiB keeps the real usage under the limit."""
    import numpy as np
    per = np.dtype(dtype).itemsize
    if per > 4:
        return False        # Mosaic has no 64-bit support (f64 accuracy mode)
    sub = {4: 8, 2: 16, 1: 32}.get(per, 8)

    def padded_bytes(s):
        d0, d1, d2 = s
        return d0 * (-(-d1 // sub) * sub) * (-(-d2 // 128) * 128) * per

    nx, ny, nz = shape
    total = (padded_bytes((nx + 2, ny + 2, nz + 2))       # padded x
             + padded_bytes((nx + 1, ny, nz))             # gamma_x
             + padded_bytes((nx, ny + 1, nz))             # gamma_y
             + padded_bytes((nx, ny, nz + 1))             # gamma_z
             + 2 * padded_bytes(shape))                   # diag + out
    return total < budget_bytes


def _tiled_kernel(xp0_ref, xp1_ref, gx0_ref, gx1_ref, gy_ref, gz_ref,
                  d_ref, out_ref, *, inv_h2, tx):
    """One x-tile of the 7-point variable-coefficient Helmholtz operator.

    The x halo arrives as TWO consecutive tx-plane blocks of the padded
    field (Pallas blocked indexing cannot express overlapping windows, so
    tile i reads blocks i and i+1 and uses planes [0, tx+2) of their
    concatenation — the i+1 block's tail planes beyond the array end are
    OOB padding that is never read). Same trick for the (nx+1)-plane
    gamma_x face array."""
    xp = jnp.concatenate([xp0_ref[:], xp1_ref[:2]], axis=0)   # (tx+2, .. )
    x = xp[1:-1, 1:-1, 1:-1]                                  # (tx, ny, nz)
    out = d_ref[:] * x
    ih2x, ih2y, ih2z = inv_h2
    if ih2x != 0.0:
        gx = jnp.concatenate([gx0_ref[:], gx1_ref[:1]], axis=0)  # (tx+1,..)
        flux_hi = gx[1:, :, :] * (xp[2:, 1:-1, 1:-1] - x)
        flux_lo = gx[:-1, :, :] * (x - xp[:-2, 1:-1, 1:-1])
        out = out - (flux_hi - flux_lo) * ih2x
    if ih2y != 0.0:
        gy = gy_ref[:]
        flux_hi = gy[:, 1:, :] * (xp[1:-1, 2:, 1:-1] - x)
        flux_lo = gy[:, :-1, :] * (x - xp[1:-1, :-2, 1:-1])
        out = out - (flux_hi - flux_lo) * ih2y
    if ih2z != 0.0:
        gz = gz_ref[:]
        flux_hi = gz[:, :, 1:] * (xp[1:-1, 1:-1, 2:] - x)
        flux_lo = gz[:, :, :-1] * (x - xp[1:-1, 1:-1, :-2])
        out = out - (flux_hi - flux_lo) * ih2z
    out_ref[:] = out


def fits_vmem_tiled(shape, dtype, tx: int = 8,
                    budget_bytes: int = 10 * 2**20) -> bool:
    """VMEM feasibility of ONE x-tile of the tiled Helmholtz kernel (the
    per-program working set; Pallas double-buffers the pipeline, hence the
    conservative budget)."""
    import numpy as np
    per = np.dtype(dtype).itemsize
    if per > 4:
        return False                      # Mosaic: no 64-bit
    nx, ny, nz = shape
    if nx % tx != 0:
        return False
    sub = {4: 8, 2: 16, 1: 32}.get(per, 8)

    def padded_bytes(s):
        d0, d1, d2 = s
        return d0 * (-(-d1 // sub) * sub) * (-(-d2 // 128) * 128) * per

    total = (2 * padded_bytes((tx, ny + 2, nz + 2))        # xp blocks i, i+1
             + 2 * padded_bytes((tx, ny, nz))              # gx blocks
             + padded_bytes((tx, ny + 1, nz))              # gy
             + padded_bytes((tx, ny, nz + 1))              # gz
             + 2 * padded_bytes((tx, ny, nz)))             # diag + out
    return total < budget_bytes


def helmholtz_apply_tiled(x_padded: jax.Array, gamma, diag: jax.Array,
                          spacing, active_axes=None, tx: int = 8,
                          interpret: bool = False) -> jax.Array:
    """Tiled variant of `helmholtz_apply` for grids whose whole-array
    working set exceeds VMEM (the production 96^3-128^3 LES meshes): grid
    over nx/tx x-tiles, each program streams its (tx+2)-plane halo window
    through VMEM. Requires tx | nx and tx >= 2."""
    nx, ny, nz = diag.shape
    assert nx % tx == 0 and tx >= 2, (nx, tx)
    if active_axes is None:
        active_axes = tuple(ax for ax, n in enumerate((nx, ny, nz)) if n > 1)
    inv_h2 = tuple((1.0 / spacing[ax] ** 2) if ax in active_axes else 0.0
                   for ax in range(3))
    import functools
    kern = functools.partial(_tiled_kernel, inv_h2=inv_h2, tx=tx)
    ms = pl.ANY if interpret else pltpu.VMEM
    bs = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=ms)
    return pl.pallas_call(
        kern,
        grid=(nx // tx,),
        in_specs=[
            bs((tx, ny + 2, nz + 2), lambda i: (i, 0, 0)),      # xp blk i
            bs((tx, ny + 2, nz + 2), lambda i: (i + 1, 0, 0)),  # xp blk i+1
            bs((tx, ny, nz), lambda i: (i, 0, 0)),              # gx blk i
            bs((tx, ny, nz), lambda i: (i + 1, 0, 0)),          # gx blk i+1
            bs((tx, ny + 1, nz), lambda i: (i, 0, 0)),          # gy
            bs((tx, ny, nz + 1), lambda i: (i, 0, 0)),          # gz
            bs((tx, ny, nz), lambda i: (i, 0, 0)),              # diag
        ],
        out_specs=bs((tx, ny, nz), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(diag.shape, diag.dtype),
        interpret=interpret,
    )(x_padded, x_padded, gamma[0], gamma[0], gamma[1], gamma[2], diag)


def _stencil_tiled_kernel(xp0_ref, xp1_ref, d_ref, lx_ref, hx_ref, ly_ref,
                          hy_ref, lz_ref, hz_ref, out_ref, *, axes):
    """One x-tile of the general (asymmetric) 7-point stencil
    out = d x + lo_ax x_{-ax} + hi_ax x_{+ax}. Same two-consecutive-block
    halo trick as _tiled_kernel. Coefficients are CELL arrays with
    boundary ghosts already folded into d (FvMatrix.stencil())."""
    xp = jnp.concatenate([xp0_ref[:], xp1_ref[:2]], axis=0)   # (tx+2, ..)
    x = xp[1:-1, 1:-1, 1:-1]
    out = d_ref[:] * x
    if 0 in axes:
        out = out + lx_ref[:] * xp[:-2, 1:-1, 1:-1] \
                  + hx_ref[:] * xp[2:, 1:-1, 1:-1]
    if 1 in axes:
        out = out + ly_ref[:] * xp[1:-1, :-2, 1:-1] \
                  + hy_ref[:] * xp[1:-1, 2:, 1:-1]
    if 2 in axes:
        out = out + lz_ref[:] * xp[1:-1, 1:-1, :-2] \
                  + hz_ref[:] * xp[1:-1, 1:-1, 2:]
    out_ref[:] = out


def fits_stencil_tiled(shape, dtype, tx: int = 8,
                       budget_bytes: int = 10 * 2**20) -> bool:
    """VMEM feasibility of one x-tile of the general stencil kernel."""
    import numpy as np
    per = np.dtype(dtype).itemsize
    if per > 4:
        return False                      # Mosaic: no 64-bit
    nx, ny, nz = shape
    if nx % tx != 0 or tx < 2:
        return False
    sub = {4: 8, 2: 16, 1: 32}.get(per, 8)

    def padded_bytes(s):
        d0, d1, d2 = s
        return d0 * (-(-d1 // sub) * sub) * (-(-d2 // 128) * 128) * per

    total = (2 * padded_bytes((tx, ny + 2, nz + 2))        # xp blocks i, i+1
             + 8 * padded_bytes((tx, ny, nz)))             # d + 6 coeff + out
    return total < budget_bytes


def stencil_apply_tiled(x: jax.Array, D: jax.Array, lo, hi, tx: int = 8,
                        interpret: bool = False) -> jax.Array:
    """General 7-point stencil apply (the fused-Krylov matvec for FvMatrix
    stencil coefficients): out = D x + sum_ax (lo_ax x_{-ax} + hi_ax
    x_{+ax}), with x wrapped-padded (cyclic neighbors exact; non-cyclic
    boundary coefficients are zero so the wrap reads there are masked).

    Replaces the roll-based XLA expression whose 6 rolls each materialize
    a full-field copy (measured: the 9-species BiCGStab at 96^3 spends
    44 ms/step in roll+multiply traffic)."""
    nx, ny, nz = x.shape[-3:]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(1, 1)] * 3, mode="wrap")
    axes = tuple(ax for ax in range(3) if (nx, ny, nz)[ax] > 1)
    import functools
    kern = functools.partial(_stencil_tiled_kernel, axes=axes)
    ms = pl.ANY if interpret else pltpu.VMEM
    bs = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=ms)
    return pl.pallas_call(
        kern,
        grid=(nx // tx,),
        in_specs=[
            bs((tx, ny + 2, nz + 2), lambda i: (i, 0, 0)),      # xp blk i
            bs((tx, ny + 2, nz + 2), lambda i: (i + 1, 0, 0)),  # xp blk i+1
            bs((tx, ny, nz), lambda i: (i, 0, 0)),              # D
            bs((tx, ny, nz), lambda i: (i, 0, 0)),              # lo_x
            bs((tx, ny, nz), lambda i: (i, 0, 0)),              # hi_x
            bs((tx, ny, nz), lambda i: (i, 0, 0)),              # lo_y
            bs((tx, ny, nz), lambda i: (i, 0, 0)),              # hi_y
            bs((tx, ny, nz), lambda i: (i, 0, 0)),              # lo_z
            bs((tx, ny, nz), lambda i: (i, 0, 0)),              # hi_z
        ],
        out_specs=bs((tx, ny, nz), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(D.shape, D.dtype),
        interpret=interpret,
    )(xp, xp, D, lo[0], hi[0], lo[1], hi[1], lo[2], hi[2])


def _kernel(xp_ref, gx_ref, gy_ref, gz_ref, d_ref, out_ref, *, inv_h2):
    xp = xp_ref[:]
    x = xp[1:-1, 1:-1, 1:-1]
    out = d_ref[:] * x
    ih2x, ih2y, ih2z = inv_h2
    if ih2x != 0.0:
        gx = gx_ref[:]
        flux_hi = gx[1:, :, :] * (xp[2:, 1:-1, 1:-1] - x)
        flux_lo = gx[:-1, :, :] * (x - xp[:-2, 1:-1, 1:-1])
        out = out - (flux_hi - flux_lo) * ih2x
    if ih2y != 0.0:
        gy = gy_ref[:]
        flux_hi = gy[:, 1:, :] * (xp[1:-1, 2:, 1:-1] - x)
        flux_lo = gy[:, :-1, :] * (x - xp[1:-1, :-2, 1:-1])
        out = out - (flux_hi - flux_lo) * ih2y
    if ih2z != 0.0:
        gz = gz_ref[:]
        flux_hi = gz[:, :, 1:] * (xp[1:-1, 1:-1, 2:] - x)
        flux_lo = gz[:, :, :-1] * (x - xp[1:-1, 1:-1, :-2])
        out = out - (flux_hi - flux_lo) * ih2z
    out_ref[:] = out


def helmholtz_apply(x_padded: jax.Array, gamma, diag: jax.Array,
                    spacing, active_axes=None,
                    interpret: bool = False) -> jax.Array:
    """out = diag * x - sum_ax d/dx[gamma dx/dx]  (cell field result).

    x_padded: (nx+2, ny+2, nz+2) ghost-padded field; gamma: per-axis face
    arrays ((nx+1,ny,nz), ...); diag: (nx,ny,nz); spacing: (dx,dy,dz).
    active_axes: axes with >1 cell (others skipped); default inferred.
    """
    nx, ny, nz = diag.shape
    if active_axes is None:
        active_axes = tuple(ax for ax, n in enumerate((nx, ny, nz)) if n > 1)
    inv_h2 = tuple((1.0 / spacing[ax] ** 2) if ax in active_axes else 0.0
                   for ax in range(3))
    import functools
    kern = functools.partial(_kernel, inv_h2=inv_h2)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(diag.shape, diag.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        interpret=interpret,
    )(x_padded, gamma[0], gamma[1], gamma[2], diag)
