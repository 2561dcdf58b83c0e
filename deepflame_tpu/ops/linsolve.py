"""Matrix-free Krylov solvers: preconditioned CG and BiCGStab.

Role parity: replaces OpenFOAM's GAMG/PBiCGStab and the reference's AmgX GPU
solver stack (/root/reference/src_gpu/AmgXSolver.cu, /root/reference/src/
dfMatrix/ — AGGREGATION AMG V-cycle, tol 1e-5 for pressure per
examples/.../system/amgxpOptions:1-20).

TPU-first: the operator is a fused stencil function, so each Krylov iteration
is a handful of elementwise ops + shifts + two global reductions. Under
sharding, dot products become psums automatically (the reference's explicit
MPI allreduce in lduMatrix solvers). Convergence control uses a fixed maximum
iteration count with early exit inside lax.while_loop — shape-static for XLA.
Preconditioning: Jacobi (diagonal), with the exact diagonal from FvMatrix
coloring; geometric multigrid for pressure lives in ops/multigrid.py.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..parallel.context import gsum, gmean

__all__ = ["SolverResult", "cg", "bicgstab", "solve_fvmatrix"]


class SolverResult(NamedTuple):
    x: jax.Array
    initial_residual: jax.Array   # OpenFOAM-style normalized initial residual
    final_residual: jax.Array
    iterations: jax.Array


def _dot(a, b):
    # global over the shard axis when the step runs distributed (the MPI
    # allreduce inside every OpenFOAM lduMatrix solver)
    return gsum(a * b)


def _safe_div(a, b):
    """a / b guarded against zero denominators in a dtype-aware way
    (adding 1e-300 is a silent no-op in float32 — it underflows to 0)."""
    tiny = jnp.asarray(jnp.finfo(jnp.result_type(b)).tiny, jnp.result_type(b))
    safe = jnp.where(jnp.abs(b) > tiny, b, jnp.where(b >= 0, tiny, -tiny))
    return a / safe


def _norm_factor(A, b, x):
    """OpenFOAM lduMatrix normFactor: ||A xref - b|| with xref = mean(x)."""
    xbar = gmean(x) * jnp.ones_like(x)
    Axbar = A(xbar)
    norm = gsum(jnp.abs(A(x) - Axbar)) + gsum(jnp.abs(b - Axbar))
    return jnp.maximum(norm, jnp.asarray(jnp.finfo(b.dtype).tiny, b.dtype))


def cg(A: Callable, b: jax.Array, x0: jax.Array, M_inv: Callable | None = None,
       tol: float = 1e-6, rel_tol: float = 0.0, max_iter: int = 1000,
       ) -> SolverResult:
    """Preconditioned conjugate gradient for SPD A (the pressure equation)."""
    if M_inv is None:
        M_inv = lambda r: r
    norm = _norm_factor(A, b, x0)
    r = b - A(x0)
    res0 = gsum(jnp.abs(r)) / norm
    z = M_inv(r)
    p = z
    rz = _dot(r, z)

    def cond(c):
        x, r, p, rz, it, res = c
        return jnp.logical_and(it < max_iter,
                               jnp.logical_and(res > tol, res > rel_tol * res0))

    def body(c):
        x, r, p, rz, it, res_in = c
        # Freeze converged lanes: under vmap, while_loop's batching rule keeps
        # applying the body to EVERY lane until the slowest lane's cond turns
        # false. Iterating a converged lane past convergence breaks the
        # recurrences down in f32 (residual dot products underflow), so make
        # such iterations exact no-ops.
        act = jnp.logical_and(res_in > tol, res_in > rel_tol * res0)
        Ap = A(p)
        alpha = _safe_div(rz, _dot(p, Ap))
        x_n = x + alpha * p
        r_n = r - alpha * Ap
        z = M_inv(r_n)
        rz_new = _dot(r_n, z)
        beta = _safe_div(rz_new, rz)
        p_n = z + beta * p
        res = gsum(jnp.abs(r_n)) / norm
        # breakdown guard: a non-finite step keeps the last good x and exits
        # (res = -1) — the outer corrector loop re-solves from there
        ok = jnp.isfinite(res)
        upd = jnp.logical_and(act, ok)
        x = jnp.where(upd, x_n, x)
        r = jnp.where(upd, r_n, r)
        p = jnp.where(upd, p_n, p)
        rz = jnp.where(upd, rz_new, rz)
        res = jnp.where(act, jnp.where(ok, res, -1.0), res_in)
        return (x, r, p, rz, it + 1, res)

    x, r, p, rz, it, res = jax.lax.while_loop(
        cond, body, (x0, r, p, rz, jnp.asarray(0), res0))
    return SolverResult(x, res0, res, it)


def bicgstab(A: Callable, b: jax.Array, x0: jax.Array,
             M_inv: Callable | None = None, tol: float = 1e-6,
             rel_tol: float = 0.0, max_iter: int = 1000) -> SolverResult:
    """Preconditioned BiCGStab for nonsymmetric A (convection-diffusion)."""
    if M_inv is None:
        M_inv = lambda r: r
    norm = _norm_factor(A, b, x0)
    r = b - A(x0)
    res0 = gsum(jnp.abs(r)) / norm
    r_hat = r
    one = jnp.ones((), b.dtype)

    def cond(c):
        x, r, p, v, rho, alpha, omega, it, res = c
        return jnp.logical_and(it < max_iter,
                               jnp.logical_and(res > tol, res > rel_tol * res0))

    def body(c):
        x, r, p, v, rho, alpha, omega, it, res_in = c
        # Freeze converged lanes (see cg.body: vmap's while_loop batching
        # iterates every lane until the slowest finishes; post-convergence
        # BiCGStab iterations break down in f32).
        act = jnp.logical_and(res_in > tol, res_in > rel_tol * res0)
        rho_new = _dot(r_hat, r)
        beta = _safe_div(rho_new, rho) * _safe_div(alpha, omega)
        p_n = r + beta * (p - omega * v)
        p_hat = M_inv(p_n)
        v_n = A(p_hat)
        alpha_n = _safe_div(rho_new, _dot(r_hat, v_n))
        s = r - alpha_n * v_n
        s_hat = M_inv(s)
        t = A(s_hat)
        omega_n = _safe_div(_dot(t, s), _dot(t, t))
        x_n = x + alpha_n * p_hat + omega_n * s_hat
        r_n = s - omega_n * t
        res = gsum(jnp.abs(r_n)) / norm
        ok = jnp.isfinite(res)
        upd = jnp.logical_and(act, ok)
        x = jnp.where(upd, x_n, x)
        r = jnp.where(upd, r_n, r)
        p = jnp.where(upd, p_n, p)
        v = jnp.where(upd, v_n, v)
        rho = jnp.where(upd, rho_new, rho)
        alpha = jnp.where(upd, alpha_n, alpha)
        omega = jnp.where(upd, omega_n, omega)
        res = jnp.where(act, jnp.where(ok, res, -1.0), res_in)
        return (x, r, p, v, rho, alpha, omega, it + 1, res)

    z = jnp.zeros_like(b)
    x, r, p, v, rho, alpha, omega, it, res = jax.lax.while_loop(
        cond, body, (x0, r, z, z, one, one, one, jnp.asarray(0), res0))
    return SolverResult(x, res0, res, it)


def solve_fvmatrix(eqn, x0: jax.Array, symmetric: bool = False,
                   tol: float = 1e-7, rel_tol: float = 0.0,
                   max_iter: int = 1000) -> SolverResult:
    """Solve an FvMatrix with Jacobi preconditioning (diag from coloring)."""
    b = eqn.rhs()
    apply = eqn.apply
    mesh = getattr(eqn, "mesh", None)
    plan = getattr(mesh, "plan", None) if mesh is not None else None
    if plan is not None:
        # shift-plan (tensor-product) face-list mesh: run the ENTIRE Krylov
        # loop lattice-resident. Coefficients are precomputed once here
        # (plan_stencil) so each while_loop iteration is a single fused
        # 7-point stencil pass, and the flat<->lattice relayout reshapes
        # happen exactly twice per solve instead of twice per iteration.
        from .fv_facelist import apply_stencil_lattice
        diag_lat, terms = eqn.plan_stencil()
        A = lambda X: apply_stencil_lattice(X, diag_lat, terms)
        d_inv = 1.0 / jnp.where(jnp.abs(diag_lat) > 1e-300, diag_lat, 1.0)
        M_inv = lambda r: d_inv * r
        solver = cg if symmetric else bicgstab
        res = solver(A, b.reshape(plan.shape), x0.reshape(plan.shape),
                     M_inv, tol, rel_tol, max_iter)
        return SolverResult(res.x.reshape(-1), res.initial_residual,
                            res.final_residual, res.iterations)
    if mesh is not None and getattr(mesh, "w_own", None) is not None:
        # shard-local face-list mesh: halo/pad rows are not this shard's
        # equations — zero them out of b and A so every Krylov reduction
        # (dot products, |r| norms) sums exactly the globally-owned rows
        b = mesh.restrict(b)
        apply = lambda x: mesh.restrict(eqn.apply(x))
        d = eqn.diag()
    else:
        # structured backend: fused 7-point stencil path when available
        # (one roll-multiply expression per matvec + free exact diagonal
        # instead of ~40 unfusable face intermediates + 8 coloring probes
        # per solve — the species BiCGStab alone cost 66 ms/step at 96^3
        # through the padded-closure apply)
        st = eqn.stencil() if hasattr(eqn, "stencil") else None
        if st is not None:
            D, lo, hi = st
            apply = lambda x: eqn.stencil_apply(x, D, lo, hi)
            if jax.devices()[0].platform == "tpu" and D.dtype.itemsize <= 4:
                from .pallas_kernels import (fits_stencil_tiled,
                                             stencil_apply_tiled)
                shape = eqn.mesh.shape
                for _tx in (8, 4, 2):
                    if fits_stencil_tiled(shape, D.dtype, tx=_tx):
                        apply = (lambda tx: lambda x: stencil_apply_tiled(
                            x, D, lo, hi, tx=tx))(_tx)
                        break
            d = D
        else:
            d = eqn.diag()
    d_inv = 1.0 / jnp.where(jnp.abs(d) > 1e-300, d, 1.0)
    M_inv = lambda r: d_inv * r
    if symmetric:
        return cg(apply, b, x0, M_inv, tol, rel_tol, max_iter)
    return bicgstab(apply, b, x0, M_inv, tol, rel_tol, max_iter)
