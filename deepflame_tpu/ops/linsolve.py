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

__all__ = ["SolverResult", "cg", "bicgstab", "solve_fvmatrix"]


class SolverResult(NamedTuple):
    x: jax.Array
    initial_residual: jax.Array   # OpenFOAM-style normalized initial residual
    final_residual: jax.Array
    iterations: jax.Array


def _dot(a, b):
    return jnp.sum(a * b)


def _safe_div(a, b):
    """a / b guarded against zero denominators in a dtype-aware way
    (adding 1e-300 is a silent no-op in float32 — it underflows to 0)."""
    tiny = jnp.asarray(jnp.finfo(jnp.result_type(b)).tiny, jnp.result_type(b))
    safe = jnp.where(jnp.abs(b) > tiny, b, jnp.where(b >= 0, tiny, -tiny))
    return a / safe


def _norm_factor(A, b, x):
    """OpenFOAM lduMatrix normFactor: ||A xref - b|| with xref = mean(x)."""
    xbar = jnp.mean(x) * jnp.ones_like(x)
    Axbar = A(xbar)
    norm = jnp.sum(jnp.abs(A(x) - Axbar)) + jnp.sum(jnp.abs(b - Axbar))
    return jnp.maximum(norm, jnp.asarray(jnp.finfo(b.dtype).tiny, b.dtype))


def cg(A: Callable, b: jax.Array, x0: jax.Array, M_inv: Callable | None = None,
       tol: float = 1e-6, rel_tol: float = 0.0, max_iter: int = 1000,
       ) -> SolverResult:
    """Preconditioned conjugate gradient for SPD A (the pressure equation)."""
    if M_inv is None:
        M_inv = lambda r: r
    norm = _norm_factor(A, b, x0)
    r = b - A(x0)
    res0 = jnp.sum(jnp.abs(r)) / norm
    z = M_inv(r)
    p = z
    rz = _dot(r, z)

    def cond(c):
        x, r, p, rz, it, res = c
        return jnp.logical_and(it < max_iter,
                               jnp.logical_and(res > tol, res > rel_tol * res0))

    def body(c):
        x, r, p, rz, it, _ = c
        Ap = A(p)
        alpha = _safe_div(rz, _dot(p, Ap))
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = _dot(r, z)
        beta = _safe_div(rz_new, rz)
        p = z + beta * p
        res = jnp.sum(jnp.abs(r)) / norm
        return (x, r, p, rz_new, it + 1, res)

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
    res0 = jnp.sum(jnp.abs(r)) / norm
    r_hat = r
    one = jnp.ones((), b.dtype)

    def cond(c):
        x, r, p, v, rho, alpha, omega, it, res = c
        return jnp.logical_and(it < max_iter,
                               jnp.logical_and(res > tol, res > rel_tol * res0))

    def body(c):
        x, r, p, v, rho, alpha, omega, it, _ = c
        rho_new = _dot(r_hat, r)
        beta = _safe_div(rho_new, rho) * _safe_div(alpha, omega)
        p = r + beta * (p - omega * v)
        p_hat = M_inv(p)
        v = A(p_hat)
        alpha = _safe_div(rho_new, _dot(r_hat, v))
        s = r - alpha * v
        s_hat = M_inv(s)
        t = A(s_hat)
        omega = _safe_div(_dot(t, s), _dot(t, t))
        x = x + alpha * p_hat + omega * s_hat
        r = s - omega * t
        res = jnp.sum(jnp.abs(r)) / norm
        return (x, r, p, v, rho_new, alpha, omega, it + 1, res)

    z = jnp.zeros_like(b)
    x, r, p, v, rho, alpha, omega, it, res = jax.lax.while_loop(
        cond, body, (x0, r, z, z, one, one, one, jnp.asarray(0), res0))
    return SolverResult(x, res0, res, it)


def solve_fvmatrix(eqn, x0: jax.Array, symmetric: bool = False,
                   tol: float = 1e-7, rel_tol: float = 0.0,
                   max_iter: int = 1000) -> SolverResult:
    """Solve an FvMatrix with Jacobi preconditioning (diag from coloring)."""
    b = eqn.rhs()
    d = eqn.diag()
    d_inv = 1.0 / jnp.where(jnp.abs(d) > 1e-300, d, 1.0)
    M_inv = lambda r: d_inv * r
    if symmetric:
        return cg(eqn.apply, b, x0, M_inv, tol, rel_tol, max_iter)
    return bicgstab(eqn.apply, b, x0, M_inv, tol, rel_tol, max_iter)
