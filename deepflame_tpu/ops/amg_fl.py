"""Aggregation AMG preconditioner for FvMatrixFL (face-list/CSR backend).

Role parity: the reference's AmgX AGGREGATION-mode AMG for the pressure
equation on general meshes (/root/reference/src/dfMatrix/amgxSolver.H:58-82;
examples/.../system/amgxpOptions:1-20 — selector AGGREGATION, V-cycle) and
OpenFOAM's GAMG pairGAMGAgglomeration (faceAreaPair weights).
ops/multigrid.py plays this role for structured blocks via factor-2
geometric coarsening; THIS module coarsens arbitrary owner/neighbour face
lists.

TPU-first split of the classic AMG setup/solve phases:
- HOST, once per mesh connectivity: greedy pairwise aggregation over
  geometric face weights magSf/delta (the coefficient pattern of any
  Laplacian on this mesh up to the smooth gamma factor), producing static
  per-level index maps (cell->aggregate, fine face->coarse face + flip).
  Shapes are static, so the whole V-cycle traces into one XLA program.
- DEVICE, once per solve: Galerkin coarse operators P^T A P for
  piecewise-constant P are three segment_sums per level over the static
  maps — coefficients (rho*rAU each PIMPLE corrector) stay fresh with no
  host round-trip, unlike AmgX's full device-side setup-graph rebuild.
- V(nu1,nu2)-cycle with damped-Jacobi smoothing (the parallel analogue of
  AmgX's MULTICOLOR_DILU: no sequential sweeps), used as M_inv inside the
  matrix-free CG of ops/linsolve.py. PCG is invariant to positive scalar
  scaling of M, so this V-scaled hierarchy preconditions the Vn-scaled
  system solved in low_mach_fl._pressure_loop as-is.

The hierarchy operates on the VOLUME-SCALED symmetric form
Av = diag(V) A (A is FvMatrixFL's per-unit-volume operator):
Av[c,c] = V_c diag_c[c], Av[own_f, nei_f] = upper[f],
Av[nei_f, own_f] = lower[f].
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AMGSetupFL", "make_amg_fl"]


class _Level(NamedTuple):
    agg: jax.Array           # (n_fine,) fine cell -> coarse cell
    n_fine: int
    n_coarse: int
    f2c: jax.Array           # (nf_fine,) fine face -> coarse face (pad nf_c)
    flip: jax.Array          # (nf_fine,) fine orientation opposite coarse
    internal: jax.Array      # (nf_fine,) face inside one aggregate
    internal_cell: jax.Array  # (nf_fine,) aggregate of an internal face
    #                           (pad n_coarse for external faces)
    c_own: jax.Array         # (nf_coarse,)
    c_nei: jax.Array         # (nf_coarse,)
    nf_coarse: int


def _pairwise_aggregate(own: np.ndarray, nei: np.ndarray, w: np.ndarray,
                        n: int) -> tuple[np.ndarray, int]:
    """Greedy heavy-edge matching: visit faces by descending weight, pair
    both cells if still unmatched (pairGAMGAgglomeration's strategy). A
    second sweep absorbs unmatched cells into the aggregate across their
    heaviest face (size cap 3 keeps coarse stencils bounded); isolated
    leftovers stay singletons. Returns (cell -> aggregate id, count)."""
    order = np.argsort(-w, kind="stable")
    mate = -np.ones(n, np.int64)
    for f in order:
        a, b = own[f], nei[f]
        if mate[a] < 0 and mate[b] < 0:
            mate[a] = b
            mate[b] = a
    agg = -np.ones(n, np.int64)
    nxt = 0
    for c in range(n):
        if agg[c] >= 0:
            continue
        agg[c] = nxt
        if mate[c] >= 0:
            agg[mate[c]] = nxt
        nxt += 1
    size = np.bincount(agg, minlength=nxt)
    heaviest = {}
    for f in order:
        a, b = own[f], nei[f]
        if mate[a] < 0 and a not in heaviest:
            heaviest[a] = b
        if mate[b] < 0 and b not in heaviest:
            heaviest[b] = a
    for c, nb in heaviest.items():
        tgt = agg[nb]
        if size[tgt] < 3:
            size[agg[c]] -= 1
            agg[c] = tgt
            size[tgt] += 1
    used = np.unique(agg)
    remap = np.zeros(nxt, np.int64)
    remap[used] = np.arange(len(used))
    return remap[agg], len(used)


@dataclasses.dataclass(frozen=True)
class AMGSetupFL:
    """Static aggregation hierarchy for one FaceListMesh connectivity."""
    levels: tuple            # tuple[_Level, ...]
    n_coarsest: int

    def preconditioner(self, eqn, volumes: jax.Array, nu_pre: int = 2,
                       nu_post: int = 2, n_coarse_iters: int = 20,
                       omega: float = 0.8) -> Callable:
        """M_inv(r) = one V-cycle for the V-scaled operator of `eqn`
        (an FvMatrixFL). Coarse operators are Galerkin-built on device from
        the current coefficients (three segment_sums per level)."""
        D = eqn.diag() * volumes
        up, lo = eqn.upper, eqn.lower
        ops = []                       # per level: (D, up, lo, inv_diag)
        for lv in self.levels:
            inv_d = 1.0 / jnp.where(jnp.abs(D) > 1e-300, D, 1.0)
            ops.append((D, up, lo, inv_d))
            # Galerkin P^T Av P, piecewise-constant P: fine diagonals and
            # intra-aggregate faces fold into the coarse diagonal;
            # inter-aggregate faces sum into coarse faces (flip swaps the
            # upper/lower roles when the fine orientation is reversed)
            D_c = jax.ops.segment_sum(D, lv.agg, num_segments=lv.n_coarse)
            both = jnp.where(lv.internal, up + lo, 0.0)
            D_c = D_c + jax.ops.segment_sum(
                both, lv.internal_cell, num_segments=lv.n_coarse + 1)[:-1]
            up_c = jax.ops.segment_sum(jnp.where(lv.flip, lo, up), lv.f2c,
                                       num_segments=lv.nf_coarse + 1)[:-1]
            lo_c = jax.ops.segment_sum(jnp.where(lv.flip, up, lo), lv.f2c,
                                       num_segments=lv.nf_coarse + 1)[:-1]
            D, up, lo = D_c, up_c, lo_c
        inv_d = 1.0 / jnp.where(jnp.abs(D) > 1e-300, D, 1.0)
        ops.append((D, up, lo, inv_d))
        n_levels = len(ops)

        def apply_level(i, x):
            if i == 0:
                # the mesh's own fused scatter (exchange-aware on shards)
                return volumes * eqn.apply(x)
            D_l, up_l, lo_l, _ = ops[i]
            lv = self.levels[i - 1]
            off = (jax.ops.segment_sum(up_l * x[lv.c_nei], lv.c_own,
                                       num_segments=lv.n_coarse)
                   + jax.ops.segment_sum(lo_l * x[lv.c_own], lv.c_nei,
                                         num_segments=lv.n_coarse))
            return D_l * x + off

        def smooth(i, x, b, n_iters):
            inv_d = ops[i][3]
            for _ in range(n_iters):
                x = x + omega * inv_d * (b - apply_level(i, x))
            return x

        def v_cycle(i, b):
            x = jnp.zeros_like(b)
            if i == n_levels - 1:
                return smooth(i, x, b, n_coarse_iters)
            x = smooth(i, x, b, nu_pre)
            r = b - apply_level(i, x)
            lv = self.levels[i]
            r_c = jax.ops.segment_sum(r, lv.agg, num_segments=lv.n_coarse)
            e_c = v_cycle(i + 1, r_c)
            x = x + e_c[lv.agg]
            return smooth(i, x, b, nu_post)

        return lambda r: v_cycle(0, r)


def make_amg_fl(mesh, max_levels: int = 25,
                min_coarse: int = 48) -> AMGSetupFL:
    """Host-side setup: the static aggregation hierarchy for a FaceListMesh,
    from geometric face weights magSf/delta (once per connectivity; reused
    across steps/correctors since only coefficients change)."""
    own = np.asarray(mesh.owner).astype(np.int64)
    nei = np.asarray(mesh.neighbour).astype(np.int64)
    w = np.asarray(mesh.mag_sf, np.float64) / np.asarray(mesh.delta,
                                                         np.float64)
    n = int(mesh.n_cells)
    levels = []
    while n > min_coarse and len(levels) < max_levels:
        agg, n_c = _pairwise_aggregate(own, nei, w, n)
        if n_c >= n:                   # no progress (disconnected leftovers)
            break
        co, cn = agg[own], agg[nei]
        internal = co == cn
        ext = ~internal
        a = np.minimum(co[ext], cn[ext])
        b = np.maximum(co[ext], cn[ext])
        key = a * n_c + b
        uniq, inv = np.unique(key, return_inverse=True)
        nf_c = len(uniq)
        f2c = np.full(own.shape[0], nf_c, np.int64)      # pad slot: dropped
        f2c[ext] = inv
        flip = co > cn
        internal_cell = np.where(internal, co, n_c)      # pad slot: dropped
        levels.append(_Level(
            agg=jnp.asarray(agg, jnp.int32), n_fine=n, n_coarse=n_c,
            f2c=jnp.asarray(f2c, jnp.int32), flip=jnp.asarray(flip),
            internal=jnp.asarray(internal),
            internal_cell=jnp.asarray(internal_cell, jnp.int32),
            c_own=jnp.asarray(uniq // n_c, jnp.int32),
            c_nei=jnp.asarray(uniq % n_c, jnp.int32), nf_coarse=nf_c))
        w_next = np.zeros(nf_c)
        np.add.at(w_next, inv, w[ext])
        own = (uniq // n_c).astype(np.int64)
        nei = (uniq % n_c).astype(np.int64)
        w, n = w_next, n_c
    return AMGSetupFL(levels=tuple(levels), n_coarsest=n)
