"""Batched stiff ODE integration for chemistry: vmapped adaptive Rosenbrock.

Role parity: replaces per-cell Cantera/CVODE integration
(/root/reference/src/dfChemistryModel/dfChemistryModel.C:738-780 `solveSingle`:
one `ReactorNet::advance` per cell, with MPI dynamic load balancing to paper
over the wildly varying per-cell cost) and the batched GPU ODE backend
(`opencc_ode_all`, /root/reference/applications/solvers/dfLowMachFoam/YEqn.H:42-75).

TPU-first design: every cell advances through the SAME program — an adaptive
Rosenbrock(2)3 step (Shampine's ode23s scheme: L-stable, one Jacobian + one LU
factorization + three solves per step) inside `lax.while_loop`, `vmap`ped over
cells. Per-cell step-size adaptivity is preserved (each lane carries its own
dt and error controller); lanes that finish early idle via masking until the
batch drains. Cost balance across a batch is therefore set by the stiffest
cell — callers mitigate by temperature-binning batches (see `solve_chemistry`),
which replaces the reference's MPI cell-migration load balancer
(/root/reference/src/dfChemistryModel/loadBalancing/) with a data layout.

The Jacobian is exact via forward-mode AD of the RHS; the (ns+1)x(ns+1) linear
solves are batched LU — XLA maps these small dense solves well.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["RosenbrockOptions", "rosenbrock_integrate"]

# ode23s constants: d = 1/(2 + sqrt(2)), e32 = 6 + sqrt(2)
_ROS_D = 1.0 / (2.0 + 2.0**0.5)
_ROS_E32 = 6.0 + 2.0**0.5

# L-stable 4-stage order-4 Rosenbrock (ROS4) with an embedded order-3
# estimate, for the reference-grade tolerance tier: the error estimate is
# O(dt^4) locally (vs ode23s's O(dt^3)), so the controller's dt scales as
# tol^(1/4) instead of tol^(1/3) — substantially fewer substeps at
# rtol <= 1e-6 at near-identical per-substep cost (the same ONE Jacobian +
# ONE Gauss-Jordan inverse; one extra W_inv solve and three cheap J@v
# einsums). Coefficients derived + order-verified by tools/derive_ros4.py:
# the 8 autonomous order-4 conditions solved with gamma the L-stability
# root of g^4-4g^3+3g^2-(2/3)g+1/24, structure a4j = a3j (F4 = F3, three
# RHS evaluations), and the [1; beta; alpha^2; B] moment matrix made
# singular so an embedded order-3 b-hat exists on the same stages.
# Observed convergence order 3.93-3.99 (non-stiff nonlinear test); the
# usual stiff order reduction to ~3 still beats ode23s's 2.
_R4_G = 0.572816062482135
_R4_A21 = 0.5
_R4_A31 = -0.7361196555332076
_R4_A32 = 1.7361196555332077
_R4_G21 = -0.7278829824396041
_R4_G31 = -0.6385225800103846
_R4_G32 = -0.3124952497020243
_R4_G41 = 0.7179640104563134
_R4_G42 = 0.16039078642619697
_R4_G43 = -1.3190296151055532
_R4_B = (0.16666666665853, 0.6666666666766059,
         0.02765774684458492, 0.13900891982034194)
_R4_E = (-0.7499999999999577, 1.0,
         -0.7205237842112873, 0.47052378421121177)   # b - b_hat


class RosenbrockOptions(NamedTuple):
    rtol: float = 1e-6
    atol: float = 1e-12
    dt_init: float = 1e-8
    dt_min: float = 1e-14
    max_steps: int = 10_000
    safety: float = 0.9
    grow: float = 5.0
    shrink: float = 0.2
    # stiff-tier method order: 2 = ode23s (default), 4 = ROS4 (the
    # reference-grade tier's pick — fewer substeps at tight tolerance)
    order: int = 2


def _gj_inverse(W):
    """Row-equilibrated unpivoted Gauss-Jordan inverse of a small matrix.

    TPU-first replacement for pivoted LU: `jax.scipy.linalg.lu_factor`'s
    row-pivot search lowers to sequential scalar work that is ~60x slower on
    TPU than the whole Jacobian evaluation (measured: 311 ms vs 5 ms for
    110k x 10x10 f32 batch). Gauss-Jordan with rank-1 updates is n fori_loop
    iterations of pure vector ops — fully batchable under vmap. No pivoting:
    W = I - gamma*dt*J from the Rosenbrock step is row-equilibrated first,
    and a numerically bad solve surfaces as a large embedded-error estimate,
    so the controller rejects the step and retries with smaller dt (W -> I,
    perfectly conditioned) — the same self-healing CVODE relies on for its
    own occasional bad Newton solves."""
    n = W.shape[-1]
    s = 1.0 / jnp.maximum(jnp.max(jnp.abs(W), axis=-1), 1e-30)
    A = W * s[:, None]
    M = jnp.concatenate([A, jnp.eye(n, dtype=W.dtype)], axis=-1)

    # unrolled over the (small, static) dimension: under vmap each iteration
    # is a handful of wide vector ops, and unrolling lets XLA fuse the whole
    # elimination into a few kernels instead of paying while-loop trip
    # latency n times per Rosenbrock substep (the chemistry hot loop is
    # launch-latency-bound at CFD batch sizes)
    for k in range(n):
        row_k = M[k]                                            # (2n,)
        pv = row_k[k]
        row_k = row_k / jnp.where(jnp.abs(pv) > 1e-30, pv,
                                  jnp.asarray(1e-30, W.dtype))
        col_k = M[:, k]                                         # (n,)
        onehot = jax.nn.one_hot(k, n, dtype=W.dtype)
        # eliminate column k everywhere, then restore the normalized pivot row
        M = M - jnp.outer(col_k, row_k) + jnp.outer(onehot, row_k)
    # A = S W  =>  W^-1 = A^-1 S: scale the COLUMNS of A^-1 by s
    return M[:, n:] * s[None, :]


def _step(rhs: Callable, y, dt, jac, f0):
    """One ode23s Rosenbrock step (autonomous system).

    Returns (y_new, err_vec, solve_res). One matrix inverse, three matvecs.
    f0 = rhs(y) comes from the caller (free byproduct of jax.linearize).
    solve_res is the relative residual ||W k1 - f0|| / ||f0|| of the
    unpivoted Gauss-Jordan solve — an accept-time guard: a consistently
    wrong inverse can corrupt k1/k2/k3 AND the embedded error estimate the
    same way, so the error test alone cannot be trusted to catch it."""
    n = y.shape[-1]
    eye = jnp.eye(n, dtype=y.dtype)
    W = eye - (dt * _ROS_D) * jac
    W_inv = _gj_inverse(W)
    solve = lambda b: W_inv @ b

    k1 = solve(f0)
    f0n = jnp.sqrt(jnp.mean(f0 * f0))
    solve_res = jnp.sqrt(jnp.mean((W @ k1 - f0) ** 2)) / (f0n + 1e-300)
    f1 = rhs(y + 0.5 * dt * k1)
    k2 = solve(f1 - k1) + k1
    y_new = y + dt * k2
    f2 = rhs(y_new)
    k3 = solve(f2 - _ROS_E32 * (k2 - f1) - 2.0 * (k1 - f0))
    err = (dt / 6.0) * (k1 - 2.0 * k2 + k3)
    return y_new, err, solve_res


# relative residual above which a Gauss-Jordan solve is deemed bad and the
# step rejected outright (dt shrinks, W -> I, conditioning recovers)
_SOLVE_RES_MAX = 1e-3


def _gj_inverse_batched(W):
    """Batched row-equilibrated unpivoted Gauss-Jordan inverse.

    W: (L, n, n) lanes-first. Internally the tableau is held lanes-LAST,
    (n, 2n, L): the minor-most two axes of every intermediate are then
    (2n, L) / (n, L), which tile the TPU's (sublane, lane) registers with
    ~1.2x padding — lanes-first tableaus pad (n, 2n) = e.g. (10, 20) up to
    (16, 128), ~10x wasted vector work, and this inverse dominates the
    stiff-chemistry substep cost."""
    L, n, _ = W.shape
    Wt = jnp.moveaxis(W, 0, -1)                       # (n, n, L)
    s = 1.0 / jnp.maximum(jnp.max(jnp.abs(Wt), axis=1), 1e-30)   # (n, L)
    A = Wt * s[:, None, :]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=W.dtype)[:, :, None],
                           (n, n, L))
    M = jnp.concatenate([A, eye], axis=1)             # (n, 2n, L)
    for k in range(n):
        row_k = M[k]                                  # (2n, L)
        pv = row_k[k]                                 # (L,)
        row_k = row_k / jnp.where(jnp.abs(pv) > 1e-30, pv,
                                  jnp.asarray(1e-30, W.dtype))[None, :]
        col_k = M[:, k, :]                            # (n, L)
        onehot = jnp.zeros((n,), W.dtype).at[k].set(1.0)
        M = M - col_k[:, None, :] * row_k[None, :, :] \
            + onehot[:, None, None] * row_k[None, :, :]
    # A = S W  =>  W^-1 = A^-1 S: scale the COLUMNS of A^-1 by s
    W_inv = M[:, n:, :] * s[None, :, :]               # (n, n, L)
    return W_inv                                      # lanes-last


def rk23_attempt_batched(rhs_b: Callable, y: jax.Array, dt: jax.Array,
                         opts: RosenbrockOptions = RosenbrockOptions()):
    """ONE explicit Bogacki-Shampine 3(2) step over [0, dt] per lane.

    The cheap tier for NON-stiff lanes: 4 batched RHS evaluations, no
    Jacobian, no matrix inversion (~4x cheaper than a Rosenbrock substep).
    Returns (y_new, accepted, dt_suggestion). Acceptance uses the embedded
    2nd-order error against the SAME atol/rtol the implicit controller
    enforces — a stiff lane blows through the error test (explicit
    instability shows up as a large embedded error) and falls back to the
    implicit tier, the LSODA-style auto-switch. dt = 0 lanes return y
    unchanged, accepted."""
    dtv = dt[:, None]
    k1 = rhs_b(y)
    k2 = rhs_b(y + 0.5 * dtv * k1)
    k3 = rhs_b(y + 0.75 * dtv * k2)
    y3 = y + dtv * ((2.0 / 9.0) * k1 + (1.0 / 3.0) * k2 + (4.0 / 9.0) * k3)
    k4 = rhs_b(y3)
    err = dtv * ((-5.0 / 72.0) * k1 + (1.0 / 12.0) * k2
                 + (1.0 / 9.0) * k3 + (-1.0 / 8.0) * k4)
    scale = opts.atol + opts.rtol * jnp.maximum(jnp.abs(y), jnp.abs(y3))
    enorm = jnp.maximum(jnp.sqrt(jnp.mean((err / scale) ** 2, axis=1)), 1e-30)
    accept = jnp.logical_and(enorm <= 1.0,
                             jnp.all(jnp.isfinite(y3), axis=1))
    factor = jnp.clip(opts.safety * enorm ** (-1.0 / 3.0),
                      opts.shrink, opts.grow)
    dt_sugg = jnp.maximum(dt * factor, jnp.asarray(opts.dt_min, y.dtype))
    return y3, accept, dt_sugg


def _inverse_batched_dispatch(W):
    """(L, n, n) -> lanes-last (n, n, L) inverses. On TPU, a Pallas kernel
    keeps the Gauss-Jordan tableau VMEM-resident (the XLA path streams it
    through HBM n times — measured ~45% of the whole stiff substep);
    elsewhere, the jnp path."""
    L, n, _ = W.shape
    # Pallas kernel uses pltpu VMEM BlockSpecs — TPU only; GPU and CPU
    # backends take the XLA path. Mosaic has no 64-bit support, so the f64
    # accuracy mode also falls back to XLA.
    if jax.devices()[0].platform == "tpu" and W.dtype.itemsize <= 4:
        from ..ops.pallas_kernels import gj_inverse_lanes
        cap = max((1 * 2**20) // (n * 2 * n * W.dtype.itemsize), 256)
        block = min(1 << (int(cap).bit_length() - 1), 2048)
        Lp = -(-L // block) * block
        Wt = jnp.moveaxis(W, 0, -1)
        if Lp != L:
            pad = jnp.broadcast_to(
                jnp.eye(n, dtype=W.dtype)[:, :, None], (n, n, Lp - L))
            Wt = jnp.concatenate([Wt, pad], axis=-1)
        return gj_inverse_lanes(Wt, block)[..., :L]
    return _gj_inverse_batched(W)


def rosenbrock_integrate_batched(rhs_b: Callable, y0: jax.Array,
                                 t_end: jax.Array,
                                 opts: RosenbrockOptions = RosenbrockOptions(),
                                 dt_start=None, return_nstep: bool = False):
    """Manually batched adaptive ode23s over a lane batch.

    rhs_b: batched RHS (L, n) -> (L, n). y0: (L, n); t_end, dt_start: (L,).
    Each lane carries its own adaptive controller; finished lanes freeze
    (their state no longer changes) while the batch drains. Returns
    (y_final (L, n), dt_suggestion (L,)).

    Equivalent to vmap(rosenbrock_integrate) but with the Gauss-Jordan
    tableau held lanes-last (see _gj_inverse_batched) — vmap cannot express
    that layout change, and it is worth ~an order of magnitude on TPU.
    """
    dtype = y0.dtype
    L, n = y0.shape
    basis = jnp.eye(n, dtype=dtype)

    def jac_and_f(y):
        f0, jvp = jax.linearize(rhs_b, y)
        # tangent e_i broadcast across lanes: column i of every lane's J
        J_cols = jax.vmap(lambda e: jvp(jnp.broadcast_to(e, (L, n))))(basis)
        return f0, jnp.moveaxis(J_cols, 0, -1)        # (L, n, n)

    def cond(carry):
        y, t, dt, en_prev, rej, nstep = carry
        return jnp.logical_and(jnp.any(t < t_end * (1.0 - 1e-12)),
                               nstep < opts.max_steps)

    p_est = 4.0 if opts.order == 4 else 3.0   # error-estimate order

    def body(carry):
        y, t, dt, en_prev, rej, nstep = carry
        act = t < t_end * (1.0 - 1e-12)               # (L,)
        dt_c = jnp.minimum(dt, t_end - t)
        dt_c = jnp.maximum(dt_c, jnp.asarray(opts.dt_min, dtype))
        f0, jac = jac_and_f(y)
        eye = jnp.eye(n, dtype=dtype)
        d_gamma = _R4_G if opts.order == 4 else _ROS_D
        W = eye[None] - (dt_c[:, None, None] * d_gamma) * jac
        W_inv = _inverse_batched_dispatch(W)          # (n, n, L)
        solve = lambda b: jnp.einsum("nml,lm->ln", W_inv, b)
        k1 = solve(f0)
        # accept-time guard on the unpivoted solve (see _step docstring)
        Wk1 = jnp.einsum("lnm,lm->ln", W, k1)
        f0n = jnp.sqrt(jnp.mean(f0 * f0, axis=1))
        solve_ok = (jnp.sqrt(jnp.mean((Wk1 - f0) ** 2, axis=1))
                    <= _SOLVE_RES_MAX * (f0n + 1e-300))
        if opts.order == 4:
            # ROS4 (see coefficient block above): same Jacobian + inverse,
            # four solves, three RHS evaluations (F4 reuses F3), three J@v
            # products for the dt*J*sum(g_ij k_j) stage sources.
            jv = lambda v: jnp.einsum("lnm,lm->ln", jac, v)
            dtc = dt_c[:, None]
            F2 = rhs_b(y + dtc * (_R4_A21 * k1))
            k2 = solve(F2 + dtc * jv(_R4_G21 * k1))
            F3 = rhs_b(y + dtc * (_R4_A31 * k1 + _R4_A32 * k2))
            k3 = solve(F3 + dtc * jv(_R4_G31 * k1 + _R4_G32 * k2))
            k4 = solve(F3 + dtc * jv(_R4_G41 * k1 + _R4_G42 * k2
                                     + _R4_G43 * k3))
            y_new = y + dtc * (_R4_B[0] * k1 + _R4_B[1] * k2
                               + _R4_B[2] * k3 + _R4_B[3] * k4)
            err = dtc * (_R4_E[0] * k1 + _R4_E[1] * k2
                         + _R4_E[2] * k3 + _R4_E[3] * k4)
        else:
            f1 = rhs_b(y + (0.5 * dt_c)[:, None] * k1)
            k2 = solve(f1 - k1) + k1
            y_new = y + dt_c[:, None] * k2
            f2 = rhs_b(y_new)
            k3 = solve(f2 - _ROS_E32 * (k2 - f1) - 2.0 * (k1 - f0))
            err = (dt_c / 6.0)[:, None] * (k1 - 2.0 * k2 + k3)
        scale = opts.atol + opts.rtol * jnp.maximum(jnp.abs(y),
                                                    jnp.abs(y_new))
        enorm = jnp.sqrt(jnp.mean((err / scale) ** 2, axis=1))
        enorm = jnp.maximum(enorm, 1e-30)
        accept = jnp.logical_and(enorm <= 1.0,
                                 jnp.all(jnp.isfinite(y_new), axis=1))
        accept = jnp.logical_and(accept, solve_ok)
        accept = jnp.logical_and(accept, act)
        # PI (Gustafsson) controller: the integral-only factor
        # enorm^(-1/p) oscillates at the stability boundary (accept/reject
        # limit cycles — the dominant waste at tight tolerances). Blend in
        # the previous accepted error (beta1 = 0.7/p, beta2 = 0.4/p,
        # p = estimate order) and never grow right after a rejection.
        pi_fac = (opts.safety * enorm ** (-0.7 / p_est)
                  * en_prev ** (0.4 / p_est))
        i_fac = opts.safety * enorm ** (-1.0 / p_est)
        factor = jnp.where(accept, pi_fac, jnp.minimum(i_fac, 1.0))
        factor = jnp.clip(factor, opts.shrink, opts.grow)
        factor = jnp.where(rej, jnp.minimum(factor, 1.0), factor)
        # a bad solve also poisons the error estimate: force shrink
        factor = jnp.where(solve_ok, factor, opts.shrink)
        dt_next = jnp.maximum(dt_c * factor, jnp.asarray(opts.dt_min, dtype))
        dt = jnp.where(act, dt_next, dt)
        en_prev = jnp.where(accept, enorm, en_prev)
        rej = jnp.where(act, jnp.logical_and(~accept, solve_ok), rej)
        y = jnp.where(accept[:, None], y_new, y)
        t = jnp.where(accept, t + dt_c, t)
        return (y, t, dt, en_prev, rej, nstep + 1)

    t0 = jnp.zeros((L,), dtype)
    if dt_start is None:
        dt0 = jnp.minimum(jnp.full((L,), opts.dt_init, dtype), t_end)
    else:
        dt0 = jnp.clip(jnp.asarray(dt_start, dtype), opts.dt_min, None)
    en0 = jnp.ones((L,), dtype)
    rej0 = jnp.zeros((L,), bool)
    y_f, t_f, dt_f, _, _, n_f = jax.lax.while_loop(
        cond, body, (y0, t0, dt0, en0, rej0, 0))
    if return_nstep:
        return y_f, dt_f, n_f
    return y_f, dt_f


def rosenbrock_attempt(rhs: Callable, y: jax.Array, dt: jax.Array,
                       opts: RosenbrockOptions = RosenbrockOptions()):
    """ONE error-controlled ode23s step over [0, dt] (vmap for a batch).

    Returns (y_new, accepted, dt_suggestion). A single-attempt implicit
    probe: utility/testing API (the production fast tier in
    `solve_chemistry` is the cheaper explicit `rk23_attempt_batched`).
    Lanes whose embedded error fails tolerance are NOT advanced
    (accepted=False). dt=0 lanes return y unchanged, accepted."""
    n = y.shape[-1]
    basis = jnp.eye(n, dtype=y.dtype)
    f0, jvp = jax.linearize(rhs, y)
    jac = jax.vmap(jvp)(basis).T
    y_new, err, solve_res = _step(rhs, y, dt, jac, f0)
    scale = opts.atol + opts.rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
    enorm = jnp.maximum(jnp.sqrt(jnp.mean((err / scale) ** 2)), 1e-30)
    accept = jnp.logical_and(enorm <= 1.0, jnp.all(jnp.isfinite(y_new)))
    accept = jnp.logical_and(accept, solve_res <= _SOLVE_RES_MAX)
    factor = jnp.clip(opts.safety * enorm ** (-1.0 / 3.0),
                      opts.shrink, opts.grow)
    dt_sugg = jnp.maximum(dt * factor, jnp.asarray(opts.dt_min, y.dtype))
    return y_new, accept, dt_sugg


def rosenbrock_integrate(rhs: Callable, y0: jax.Array, t_end: jax.Array,
                         opts: RosenbrockOptions = RosenbrockOptions(),
                         dt_start=None, return_dt: bool = False):
    """Integrate dy/dt = rhs(y) from 0 to t_end for ONE cell (vmap for a batch).

    y0: (n,) state; t_end: scalar. Adaptive step control with PI-style scaling
    on the embedded 3rd-order error estimate.

    dt_start: optional per-lane initial step (CVODE-style warm start — carry
    the controller's converged step across CFD steps; a cold restart from
    opts.dt_init costs ~2 extra substeps per cell per CFD step, which
    dominates the bill for the 98% of cells whose stable step exceeds the
    CFD step). return_dt: also return the controller's next-step suggestion.
    """
    dtype = y0.dtype
    n = y0.shape[-1]
    basis = jnp.eye(n, dtype=dtype)

    def jac_and_f(y):
        # one linearization gives f(y) AND the exact Jacobian (columns =
        # jvp(e_i), vectorized) — saves a full RHS eval per step vs jacfwd
        f0, jvp = jax.linearize(rhs, y)
        J_cols = jax.vmap(jvp)(basis)     # row i = J @ e_i = column i of J
        return f0, J_cols.T

    def cond(carry):
        y, t, dt, nstep = carry
        return jnp.logical_and(t < t_end * (1.0 - 1e-12), nstep < opts.max_steps)

    def body(carry):
        y, t, dt, nstep = carry
        dt = jnp.minimum(dt, t_end - t)
        f0, jac = jac_and_f(y)
        y_new, err, solve_res = _step(rhs, y, dt, jac, f0)
        scale = opts.atol + opts.rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        # rms error norm
        enorm = jnp.sqrt(jnp.mean((err / scale) ** 2))
        enorm = jnp.maximum(enorm, 1e-30)
        accept = jnp.logical_and(enorm <= 1.0, jnp.all(jnp.isfinite(y_new)))
        accept = jnp.logical_and(accept, solve_res <= _SOLVE_RES_MAX)
        factor = jnp.clip(opts.safety * enorm ** (-1.0 / 3.0), opts.shrink, opts.grow)
        factor = jnp.where(solve_res <= _SOLVE_RES_MAX, factor, opts.shrink)
        dt_next = jnp.maximum(dt * factor, jnp.asarray(opts.dt_min, dtype))
        y = jnp.where(accept, y_new, y)
        t = jnp.where(accept, t + dt, t)
        return (y, t, dt_next, nstep + 1)

    t0 = jnp.zeros((), dtype)
    if dt_start is None:
        dt0 = jnp.minimum(jnp.asarray(opts.dt_init, dtype), t_end)
    else:
        dt0 = jnp.clip(jnp.asarray(dt_start, dtype), opts.dt_min, None)
    y_f, t_f, dt_f, n_f = jax.lax.while_loop(cond, body, (y0, t0, dt0, 0))
    if return_dt:
        return y_f, dt_f
    return y_f
