"""Geometric multigrid preconditioner for the pressure equation.

Role parity: OpenFOAM GAMG and the reference's AmgX AGGREGATION-AMG V-cycle
with MULTICOLOR_DILU smoothing (/root/reference/examples/.../system/
amgxpOptions:1-20; src_gpu/AmgXSolver.cu). On a structured block the
"aggregation" is exact factor-2 geometric coarsening: restriction is the
2^d-child average, prolongation is parent injection (adjoint pair), and each
level's operator is a re-discretized diag + variable-coefficient Laplacian
with coarsened face coefficients — all shift/reshape ops, no setup graphs.

Used as one V(nu1,nu2)-cycle per CG iteration (MG-preconditioned CG), with
damped-Jacobi smoothing (the TPU-friendly analogue of multicolor DILU: fully
parallel, no sequential sweeps).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..mesh.structured import StructuredMesh
from .fv import fvm_laplacian, fvm_source_implicit

__all__ = ["make_mg_preconditioner"]


def _coarsen_cell(f):
    """2^d-child average along even-sized axes > 1."""
    for ax in range(3):
        n = f.shape[ax]
        if n > 1 and n % 2 == 0:
            sh = list(f.shape)
            sh[ax] = n // 2
            sh.insert(ax + 1, 2)
            f = f.reshape(sh).mean(axis=ax + 1)
    return f


def _refine_cell(f, target_shape):
    for ax in range(3):
        if f.shape[ax] != target_shape[ax]:
            f = jnp.repeat(f, 2, axis=ax)
    return f


def _coarsen_faces(gamma, mesh: StructuredMesh):
    """Coarsen per-axis face-coefficient arrays: keep every 2nd face along the
    normal, average 2x2 transverse children."""
    out = []
    for ax in range(3):
        g = gamma[ax]
        n_ax = mesh.shape[ax]
        if n_ax > 1 and n_ax % 2 == 0:
            idx = [slice(None)] * 3
            idx[ax] = slice(0, None, 2)
            g = g[tuple(idx)]
        for t in range(3):
            if t == ax:
                continue
            nt = g.shape[t]
            if mesh.shape[t] > 1 and mesh.shape[t] % 2 == 0:
                sh = list(g.shape)
                sh[t] = nt // 2
                sh.insert(t + 1, 2)
                g = g.reshape(sh).mean(axis=t + 1)
        out.append(g)
    return tuple(out)


def _can_coarsen(mesh: StructuredMesh, min_cells: int = 4) -> bool:
    return any(n > min_cells and n % 2 == 0 for n in mesh.shape)


def _coarse_mesh(mesh: StructuredMesh) -> StructuredMesh:
    f = [2 if (n > 1 and n % 2 == 0) else 1 for n in mesh.shape]
    return StructuredMesh(mesh.nx // f[0], mesh.ny // f[1], mesh.nz // f[2],
                          mesh.dx * f[0], mesh.dy * f[1], mesh.dz * f[2],
                          mesh.x0, mesh.y0, mesh.z0)


def make_mg_preconditioner(mesh: StructuredMesh, bcs, diag_coeff, gamma_faces,
                           dtype, n_levels: int = 10, nu_pre: int = 2,
                           nu_post: int = 2, n_coarse_iters: int = 20,
                           omega: float = 0.8) -> Callable:
    """Build M_inv(r): one V-cycle for the operator
    A = Sp(diag_coeff) - laplacian(gamma_faces).

    diag_coeff: cell field (e.g. psi/dt); gamma_faces: per-axis face arrays
    (e.g. rho rAU on faces); bcs: the pressure BCs (used on every level).
    """
    # build level hierarchy (host loop; shapes static)
    levels = []
    m, d, g = mesh, diag_coeff, gamma_faces
    for _ in range(n_levels):
        eqn = (fvm_source_implicit(d, m, bcs, dtype=dtype)
               + fvm_laplacian(g, m, bcs, dtype=dtype, sign=-1.0))
        # analytic interior diagonal (ignores BC corrections — fine for a
        # damped-Jacobi smoother, and far cheaper than coloring probes):
        # diag = d + sum_ax (gamma_lo + gamma_hi)/h^2
        diag = d
        for ax, h in enumerate(m.spacing):
            if m.shape[ax] == 1:
                continue
            n_f = g[ax].shape[ax]
            lo = jax.lax.slice_in_dim(g[ax], 0, n_f - 1, axis=ax)
            hi = jax.lax.slice_in_dim(g[ax], 1, n_f, axis=ax)
            diag = diag + (lo + hi) / (h * h)
        inv_diag = 1.0 / jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
        levels.append((m, eqn, inv_diag))
        if not _can_coarsen(m):
            break
        g = _coarsen_faces(g, m)
        d = _coarsen_cell(d)
        m = _coarse_mesh(m)

    def smooth(lvl, x, b, n_iters):
        _, eqn, inv_diag = levels[lvl]
        for _ in range(n_iters):
            x = x + omega * inv_diag * (b - eqn.apply(x))
        return x

    def v_cycle(lvl, b):
        m_l, eqn, inv_diag = levels[lvl]
        x = jnp.zeros_like(b)
        if lvl == len(levels) - 1:
            return smooth(lvl, x, b, n_coarse_iters)
        x = smooth(lvl, x, b, nu_pre)
        r = b - eqn.apply(x)
        r_c = _coarsen_cell(r)
        e_c = v_cycle(lvl + 1, r_c)
        x = x + _refine_cell(e_c, m_l.shape)
        return smooth(lvl, x, b, nu_post)

    return lambda r: v_cycle(0, r)
