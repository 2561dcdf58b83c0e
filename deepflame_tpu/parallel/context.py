"""Distributed-collective context for SPMD domain decomposition.

Role parity: the reference's MPI reduction layer — `reduce(...)` calls inside
lduMatrix solvers (dot products, norm factors), `Pstream` gMax/gMin for
Courant numbers and min/max(T) step logs
(/root/reference/applications/solvers/dfLowMachFoam/dfLowMachFoam.C:478,
compressibleCourantNo.H), and the MPI_Allreduce hidden inside every OpenFOAM
`solve()`.

TPU-first: the whole solver step runs inside ONE `jax.shard_map` over a device
mesh; this module carries the mesh-axis name through the call stack so that
scalar reductions (Krylov dot products, residual norms, diagnostics) become
`lax.psum`/`lax.pmax` over ICI. When no axis is active (single-chip or GSPMD
mode) every helper degrades to the plain local reduction — the same code path
serves both.

Usage: the distributed wrapper (parallel/distributed.py) traces the solver
step under `with shard_axis(name): ...`; library code calls gsum/gmax/...
unconditionally.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

__all__ = ["shard_axis", "current_axis", "gsum", "gmax", "gmin", "gmean",
           "gsize", "cell_weight", "current_cell_weight", "compensated"]

_AXIS: list[str | None] = [None]
_WEIGHT: list = [None]
_COMP: list[bool] = [False]


@contextlib.contextmanager
def shard_axis(name: str | None):
    """Activate a shard_map mesh axis for global reductions during tracing."""
    _AXIS.append(name)
    try:
        yield
    finally:
        _AXIS.pop()


@contextlib.contextmanager
def cell_weight(w):
    """Activate a per-cell ownership weight (1 = real owned cell, 0 = halo/
    pad slot) so that gmean over shard-local cell arrays averages exactly
    the REAL cells — bit-matching the single-device mean up to summation
    order. Only arrays whose leading dim matches the weight length are
    affected; everything else keeps plain mean semantics."""
    _WEIGHT.append(w)
    try:
        yield
    finally:
        _WEIGHT.pop()


def current_cell_weight():
    return _WEIGHT[-1]


def current_axis() -> str | None:
    return _AXIS[-1]


@contextlib.contextmanager
def compensated(on: bool = True):
    """Route every gsum/gmean (Krylov dots, residual norms, conservation
    accounting) through the compensated two-float reduction
    (ops/compensated.sum2) — the TPU accuracy tier's f64-class
    accumulations without f64 hardware (VERDICT r3 item 9)."""
    _COMP.append(on)
    try:
        yield
    finally:
        _COMP.pop()


def gsum(x):
    """Global sum of all elements (psum over the shard axis if active).
    Under `with compensated():`, the local reduction is the two-float
    block-Neumaier sum (f64-class accumulation in f32)."""
    if _COMP[-1]:
        from ..ops.compensated import sum2
        s = sum2(x)
    else:
        s = jnp.sum(x)
    ax = current_axis()
    return jax.lax.psum(s, ax) if ax is not None else s


def gmax(x):
    m = jnp.max(x)
    ax = current_axis()
    return jax.lax.pmax(m, ax) if ax is not None else m


def gmin(x):
    m = jnp.min(x)
    ax = current_axis()
    return jax.lax.pmin(m, ax) if ax is not None else m


def gsize(x) -> jax.Array | int:
    """Global element count (static per shard; psum over shards). The
    active axis may be a TUPLE of mesh-axis names (multi-axis domain
    decomposition)."""
    ax = current_axis()
    if ax is None:
        return x.size
    if isinstance(ax, (tuple, list)):
        n = 1
        for a in ax:
            n *= jax.lax.axis_size(a)
        return x.size * n
    return x.size * jax.lax.axis_size(ax)


def gmean(x):
    w = _WEIGHT[-1]
    if (w is not None and hasattr(x, "ndim") and x.ndim >= 1
            and x.shape[0] == w.shape[0]):
        wb = w.reshape(w.shape + (1,) * (x.ndim - 1))
        num = gsum(jnp.where(wb > 0, x, jnp.zeros_like(x)))
        cnt = gsum(wb * jnp.ones_like(x, dtype=w.dtype))
        return num / cnt
    return gsum(x) / gsize(x)
