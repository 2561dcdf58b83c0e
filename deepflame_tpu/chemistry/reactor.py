"""0D reactors and the cell-batch chemistry solve used by the CFD solvers.

Role parity:
  - `constant_pressure_rhs` / `constant_volume_rhs` + `integrate_state`:
    the df0DFoam solver (/root/reference/applications/solvers/df0DFoam/
    df0DFoam.C: constant-pressure or constant-volume autoignition, `constProp
    == "volume"` branch at df0DFoam.C:110).
  - `solve_chemistry`: the chemistry engine entry `dfChemistryModel::solve`
    (/root/reference/src/dfChemistryModel/dfChemistryModel.C:355-384) — given
    per-cell (T, p, Y, dt) it returns the reaction-rate source RR_i =
    rho (Y_new - Y_old)/dt and heat release Qdot, exactly the quantities the
    reference writes back in solveSingle (dfChemistryModel.C:738-780).

The reference integrates each cell at constant temperature (`react.setEnergy(0)`,
dfChemistryModel.C:759) and corrects thermo afterwards; we integrate the full
coupled (T, Y) system at constant pressure, which is strictly more accurate at
the same splitting level. RR is identical in form.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import GAS_CONSTANT
from .kinetics import KineticsData, production_rates
from .thermo import ThermoData
from .integrator import (RosenbrockOptions, rk23_attempt_batched,
                         rosenbrock_integrate, rosenbrock_integrate_batched)

__all__ = ["constant_pressure_rhs", "constant_volume_rhs", "ignite",
           "solve_chemistry", "ChemistryResult"]


def constant_pressure_rhs(thermo: ThermoData, kin: KineticsData, p):
    """RHS for state s = [T, Y...] at fixed pressure p (scalar)."""
    def rhs(s):
        T, Y = s[0], s[1:]
        rho = thermo.rho(p, T, Y)
        wdot = production_rates(kin, thermo, T, rho, Y)       # kmol/m^3/s
        dY = wdot * kin.W / rho
        h_molar = thermo.h_RT(T) * (GAS_CONSTANT * T)          # J/kmol
        cp = thermo.cp_mass(T, Y)
        dT = -jnp.dot(h_molar, wdot) / (rho * cp)
        return jnp.concatenate([dT[None], dY])
    return rhs


def constant_pressure_rhs_batched(thermo: ThermoData, kin: KineticsData, p):
    """Batched RHS for states s = (L, 1+ns) at fixed per-lane pressure p (L,).

    Same math as `constant_pressure_rhs` without vmap — feeds the manually
    batched integrator (lane-last Gauss-Jordan tiling)."""
    def rhs(s):
        T, Y = s[:, 0], s[:, 1:]
        rho = thermo.rho(p, T, Y)
        wdot = production_rates(kin, thermo, T, rho, Y)       # (L, ns)
        dY = wdot * kin.W / rho[:, None]
        h_molar = thermo.h_RT(T) * (GAS_CONSTANT * T[:, None])  # J/kmol
        cp = thermo.cp_mass(T, Y)
        dT = -jnp.einsum("ls,ls->l", h_molar, wdot) / (rho * cp)
        return jnp.concatenate([dT[:, None], dY], axis=1)
    return rhs


def constant_volume_rhs(thermo: ThermoData, kin: KineticsData, rho):
    """RHS for state s = [T, Y...] at fixed density rho (scalar)."""
    def rhs(s):
        T, Y = s[0], s[1:]
        wdot = production_rates(kin, thermo, T, rho, Y)
        dY = wdot * kin.W / rho
        # internal energy: u_i = h_i - R T (molar)
        u_molar = (thermo.h_RT(T) - 1.0) * (GAS_CONSTANT * T)
        cv = thermo.cv_mass(T, Y)
        dT = -jnp.dot(u_molar, wdot) / (rho * cv)
        return jnp.concatenate([dT[None], dY])
    return rhs


def ignite(thermo: ThermoData, kin: KineticsData, T0, p0, Y0, t_end,
           n_out: int = 200, const: str = "pressure",
           opts: RosenbrockOptions = RosenbrockOptions()):
    """0D reactor trajectory: returns (times, T(t), Y(t)) at n_out points.

    const='pressure' (HP reactor) or 'volume' (UV reactor, p evolves).
    """
    T0 = jnp.asarray(T0)
    dtype = T0.dtype
    s0 = jnp.concatenate([T0[None], jnp.asarray(Y0, dtype)])
    if const == "pressure":
        rhs = constant_pressure_rhs(thermo, kin, jnp.asarray(p0, dtype))
    elif const == "volume":
        rho0 = thermo.rho(jnp.asarray(p0, dtype), T0, jnp.asarray(Y0, dtype))
        rhs = constant_volume_rhs(thermo, kin, rho0)
    else:
        raise ValueError(const)
    dt_out = jnp.asarray(t_end / n_out, dtype)

    def scan_body(s, _):
        s_next = rosenbrock_integrate(rhs, s, dt_out, opts)
        return s_next, s_next

    _, traj = jax.lax.scan(scan_body, s0, None, length=n_out)
    times = (jnp.arange(1, n_out + 1, dtype=dtype)) * dt_out
    return times, traj[:, 0], traj[:, 1:]


class ChemistryResult(NamedTuple):
    T: jax.Array       # (...,) new temperature
    Y: jax.Array       # (..., ns) new mass fractions
    RR: jax.Array      # (..., ns) rho (Y_new - Y_old)/dt [kg/m^3/s]
    Qdot: jax.Array    # (...,) heat release rate [J/m^3/s]
    dt_next: jax.Array | None = None   # (...,) warm-start step suggestion


def _stratified_cross_shard(run, key, inputs, n_out, ax):
    """Cross-device chemistry load balance (the reference's DLB cell
    migration, /root/reference/src/dfChemistryModel/loadBalancing/
    LoadBalancer.C:124-232, recast for SPMD): under lockstep shard_map the
    WORST-loaded shard gates every step — a flame front concentrated in one
    shard's slab makes the other shards idle through its while_loop tail.

    TPU-native rebalance: each shard sorts its lanes by stiffness `key`,
    deals them round-robin into P groups (each group then carries an equal
    slice of every stiffness stratum), and one `lax.all_to_all` gives every
    shard one group from every shard — so each shard integrates ~1/P of the
    GLOBAL stiff cells. A second all_to_all (its own inverse) returns the
    results. Cost: 2 all-to-alls of the chemistry state over ICI per step,
    against a while_loop tail that can run 10-100x longer on the front
    shard.

    run: callable over the flat lane arrays -> n_out flat outputs.
    inputs: tuple of (L, ...) arrays (lane axis leading). key: (L,)
    stiffness measure (stiffest = largest). Lanes are padded to a multiple
    of P with inactive copies of lane 0 (t_end must be 0 there; callers pad
    with te = 0)."""
    L = inputs[0].shape[0]
    P = jax.lax.axis_size(ax)
    pad = (-L) % P
    Lp = L + pad

    def pack(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:],
                                              x.dtype)], axis=0)
        return x

    keyp = pack(key)
    if pad:
        # padded lanes: coldest (sort first, never exchanged into hot work)
        keyp = keyp.at[L:].set(-jnp.inf)
    order = jnp.argsort(keyp)                      # cold ... stiff
    inv_order = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))

    def fwd(x):
        xs = pack(x)[order]
        g = xs.reshape(Lp // P, P, *xs.shape[1:])
        g = jnp.swapaxes(g, 0, 1)                  # (P, Lp/P, ...) groups
        g = jax.lax.all_to_all(g, ax, split_axis=0, concat_axis=0,
                               tiled=False)
        return g.reshape(Lp, *xs.shape[1:])

    def bwd(y):
        g = y.reshape(P, Lp // P, *y.shape[1:])
        g = jax.lax.all_to_all(g, ax, split_axis=0, concat_axis=0,
                               tiled=False)
        ys = jnp.swapaxes(g, 0, 1).reshape(Lp, *y.shape[1:])
        return ys[inv_order][:L]

    outs = run(*[fwd(x) for x in inputs])
    return tuple(bwd(o) for o in outs[:n_out])


def solve_chemistry(thermo: ThermoData, kin: KineticsData,
                    T, p, Y, dt,
                    opts: RosenbrockOptions = RosenbrockOptions(),
                    T_threshold: float = 200.0,
                    n_bins: int = 32, dt_start=None,
                    fast_tier: bool = True, sort: str = "T",
                    cross_shard: bool = False) -> ChemistryResult:
    """Advance chemistry in every cell by dt at constant pressure.

    T, p: (...,); Y: (..., ns); dt: scalar or per-cell array (EDC integrates
    over the fine-structure residence time tau*, per cell). Cells with
    T < T_threshold are frozen (the reference's `unReactT_`/frozenTemperature
    mask, /root/reference/src_gpu/dfChemistrySolver.cu:5-21).

    Load balancing (n_bins > 1): cells are sorted by temperature and the batch
    is split into n_bins sequential chunks (lax.map). Each chunk's adaptive
    while_loop terminates at its OWN stiffest lane instead of the global
    worst case, so cold/frozen chunks cost ~nothing — the data-layout
    replacement for the reference's MPI cell-migration balancer
    (/root/reference/src/dfChemistryModel/loadBalancing/, SURVEY.md §2.11.2).
    """
    batch_shape = T.shape
    ns = Y.shape[-1]
    Tf = T.reshape(-1)
    pf = p.reshape(-1)
    Yf = Y.reshape(-1, ns)
    s0 = jnp.concatenate([Tf[:, None], Yf], axis=1)
    dt_f = jnp.broadcast_to(jnp.asarray(dt, Tf.dtype), batch_shape).reshape(-1)

    def integrate_chunk(s_chunk, p_chunk, te_chunk, d0_chunk):
        rhs_b = constant_pressure_rhs_batched(thermo, kin, p_chunk)
        return rosenbrock_integrate_batched(rhs_b, s_chunk, te_chunk, opts,
                                            dt_start=d0_chunk)

    active = Tf > T_threshold
    t_ends = jnp.where(active, dt_f, 0.0)
    if dt_start is None:
        dt0_f = jnp.full_like(Tf, opts.dt_init)
    else:
        dt0_f = jnp.broadcast_to(
            jnp.asarray(dt_start, Tf.dtype), batch_shape).reshape(-1)

    # ---- explicit fast tier (LSODA-style auto-switch): one wide embedded
    # RK23 attempt over the whole CFD step for every lane — 4 batched RHS
    # evals, no Jacobian/inversion. Non-stiff lanes (the bulk of a reacting
    # domain) finish here; lanes failing the SAME atol/rtol error test
    # (incl. explicitly-unstable stiff lanes, whose error estimate blows
    # up) fall through to the adaptive implicit tier below.
    if fast_tier:
        rhs_all = constant_pressure_rhs_batched(thermo, kin, pf)
        y_fast, acc_f, dt_sugg = rk23_attempt_batched(rhs_all, s0, t_ends,
                                                      opts)
        accepted = acc_f
        dt_fast = jnp.where(t_ends > 0, dt_sugg, dt0_f)
        t_ends_rem = jnp.where(accepted, 0.0, t_ends)
    else:
        accepted = None
        t_ends_rem = t_ends

    def run_integration(s0, pf, t_ends_rem, dt0_f):
        return _integrate_binned(integrate_chunk, s0, pf, t_ends_rem,
                                 dt0_f, ns, n_bins, fast_tier, sort, opts,
                                 Tf_key=s0[:, 0])

    if cross_shard:
        from ..parallel.context import current_axis
        ax = current_axis()
        if ax is not None:
            # stiffness key: warm-start dt when available (small converged
            # step = stiff), else temperature; inactive lanes coldest
            key = (jnp.where(t_ends_rem > 0, -dt0_f, -jnp.inf)
                   if dt_start is not None
                   else jnp.where(t_ends_rem > 0, Tf, -jnp.inf))
            s1, dt_next = _stratified_cross_shard(
                run_integration, key, (s0, pf, t_ends_rem, dt0_f), 2, ax)
        else:
            s1, dt_next = run_integration(s0, pf, t_ends_rem, dt0_f)
    else:
        s1, dt_next = run_integration(s0, pf, t_ends_rem, dt0_f)

    if fast_tier:
        s1 = jnp.where(accepted[:, None], y_fast, s1)
        dt_next = jnp.where(accepted, dt_fast, dt_next)
    T1 = s1[:, 0]
    Y1 = jnp.clip(s1[:, 1:], 0.0, 1.0)
    Y1 = Y1 / jnp.sum(Y1, axis=-1, keepdims=True)
    rho = thermo.rho(pf, Tf, Yf)
    RR = rho[:, None] * (Y1 - Yf) / jnp.maximum(dt_f, 1e-30)[:, None]
    # heat release from formation enthalpies: Qdot = -sum hf_i RR_i
    Qdot = -jnp.einsum("ns,s->n", RR, thermo.h_formation)
    return ChemistryResult(
        T=T1.reshape(batch_shape),
        Y=Y1.reshape(batch_shape + (ns,)),
        RR=RR.reshape(batch_shape + (ns,)),
        Qdot=Qdot.reshape(batch_shape),
        dt_next=dt_next.reshape(batch_shape),
    )


def _integrate_binned(integrate_chunk, s0, pf, t_ends_rem, dt0_f, ns,
                      n_bins, fast_tier, sort, opts, Tf_key):
    """Temperature/stiffness-binned batched integration over flat lanes
    (the data-layout half of the load balancing; see solve_chemistry).

    Compact path (round 5): with the explicit fast tier in front, only the
    stiff minority reaches this integrator (measured 2% of a 96^3 reacting
    LES step) — but permuting the FULL lane set into sorted order costs
    ~10 ns per gathered row on TPU (~91 ms of a 116 ms chemistry call at
    885k lanes: 7 giant gather fusions in the trace). So: argsort the key
    (TPU sort is fast — 1.3 ms), gather ONLY the K stiffest rows, bin and
    integrate those, and scatter the results back. Exactness is preserved
    by a lax.cond on the actual reject count: if it ever exceeds K (no
    fast tier, ignition fronts filling the domain), the full sorted-binned
    path runs instead."""
    n = s0.shape[0]
    Tf = Tf_key
    if n_bins > 1 and n >= 2 * n_bins:
        chunk = -(-n // n_bins)                      # ceil
        pad = chunk * n_bins - n
        # group lanes of similar stiffness into the same chunk; padding and
        # fast-tier-finished lanes go to the cold end as no-op lanes.
        # sort="T": by temperature (stiffness proxy). sort="dt": by the
        # warm-started controller step — a DIRECT per-lane stiffness
        # measure (small converged dt = stiff); stiffest lanes sort last,
        # matching the hot-at-end layout the cold-half folding assumes.
        if sort == "dt":
            key = jnp.where(t_ends_rem > 0, -dt0_f, -jnp.inf)
        else:
            key = jnp.where(t_ends_rem > 0, Tf, -jnp.inf)

        n_hot_bins = max(4, n_bins // 8)
        K = n_hot_bins * chunk
        if fast_tier and n_bins >= 8 and K < n:
            def _compact_path(ops_):
                s0_, pf_, te_, d0_ = ops_
                order_c = jnp.argsort(key)
                idx = order_c[n - K:]                # K stiffest lanes
                s0_c, pf_c = s0_[idx], pf_[idx]
                te_c, d0_c = te_[idx], d0_[idx]
                s0_b = s0_c.reshape(n_hot_bins, chunk, ns + 1)
                pf_b = pf_c.reshape(n_hot_bins, chunk)
                te_b = te_c.reshape(n_hot_bins, chunk)
                d0_b = d0_c.reshape(n_hot_bins, chunk)
                outs, dtns = [], []
                # coldest half of the compact set: one wide immediate-exit
                # slab (these lanes are fast-tier survivors, te = 0)
                n_cold = n_hot_bins // 2
                o_c, d_c = integrate_chunk(
                    s0_b[:n_cold].reshape(n_cold * chunk, ns + 1),
                    pf_b[:n_cold].reshape(-1), te_b[:n_cold].reshape(-1),
                    d0_b[:n_cold].reshape(-1))
                outs.append(o_c.reshape(n_cold, chunk, ns + 1))
                dtns.append(d_c.reshape(n_cold, chunk))
                for b in range(n_cold, n_hot_bins):
                    o_b, d_b = integrate_chunk(s0_b[b], pf_b[b], te_b[b],
                                               d0_b[b])
                    outs.append(o_b[None])
                    dtns.append(d_b[None])
                out = jnp.concatenate(outs, 0).reshape(K, ns + 1)
                dtn = jnp.concatenate(dtns, 0).reshape(K)
                return s0_.at[idx].set(out), d0_.at[idx].set(dtn)

            def _full_path(ops_):
                return _sorted_binned(integrate_chunk, key, *ops_, ns=ns,
                                      n_bins=n_bins, chunk=chunk, pad=pad,
                                      fast_tier=fast_tier, opts=opts)

            n_rej = jnp.sum(t_ends_rem > 0)
            return jax.lax.cond(n_rej <= K, _compact_path, _full_path,
                                (s0, pf, t_ends_rem, dt0_f))
        return _sorted_binned(integrate_chunk, key, s0, pf, t_ends_rem,
                              dt0_f, ns=ns, n_bins=n_bins, chunk=chunk,
                              pad=pad, fast_tier=fast_tier, opts=opts)
    return integrate_chunk(s0, pf, t_ends_rem, dt0_f)


def _sorted_binned(integrate_chunk, key, s0, pf, t_ends_rem, dt0_f, *, ns,
                   n_bins, chunk, pad, fast_tier, opts):
    """Full sorted-binned integration (every lane permuted into stiffness
    order) — the general path; also the overflow branch of the compact
    scheme above."""
    n = s0.shape[0]
    if True:                              # (kept indentation of the
        order = jnp.argsort(key)          # pre-round-5 in-line body)
        s0_s = jnp.concatenate([jnp.zeros((pad, ns + 1), s0.dtype)
                                .at[:, 0].set(300.0), s0[order]])
        pf_s = jnp.concatenate([jnp.full((pad,), 101325.0, pf.dtype),
                                pf[order]])
        te_s = jnp.concatenate([jnp.zeros((pad,), t_ends_rem.dtype),
                                t_ends_rem[order]])
        d0_s = jnp.concatenate([jnp.full((pad,), opts.dt_init, dt0_f.dtype),
                                dt0_f[order]])
        # Unrolled (Python-level) bin loop: each bin is its own while_loop
        # in the HLO. lax.map costs ~170 us of dispatch per trip on TPU
        # (dynamic-slice in/out around the nested loop) — ~5 ms of pure
        # overhead at 32 bins, comparable to the useful work.
        s0_b = s0_s.reshape(n_bins, chunk, ns + 1)
        pf_b = pf_s.reshape(n_bins, chunk)
        te_b = te_s.reshape(n_bins, chunk)
        d0_b = d0_s.reshape(n_bins, chunk)
        outs, dtns = [], []
        if fast_tier and n_bins >= 4:
            # The cold half of the sorted array is (almost always) entirely
            # fast-tier-finished: fold its bins into ONE wide slab whose
            # while_loop exits immediately, and keep narrow bins (same
            # width as before) only over the hot half where the stiff
            # rejects live. Cuts the serialized per-bin launch overhead
            # roughly in half without widening any hot bin.
            n_cold = n_bins // 2
            o_c, d_c = integrate_chunk(
                s0_b[:n_cold].reshape(n_cold * chunk, ns + 1),
                pf_b[:n_cold].reshape(-1), te_b[:n_cold].reshape(-1),
                d0_b[:n_cold].reshape(-1))
            outs.append(o_c.reshape(n_cold, chunk, ns + 1))
            dtns.append(d_c.reshape(n_cold, chunk))
            start = n_cold
        else:
            start = 0
        for b in range(start, n_bins):
            o_b, d_b = integrate_chunk(s0_b[b], pf_b[b], te_b[b], d0_b[b])
            outs.append(o_b[None] if o_b.ndim == 2 else o_b)
            dtns.append(d_b[None] if d_b.ndim == 1 else d_b)
        out = jnp.concatenate(outs, axis=0)
        dtn = jnp.concatenate(dtns, axis=0)
        # inverse permutation by scatter (argsort of a permutation costs a
        # full 885k-lane sort ~6 ms at 96^3; the scatter is one write pass)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype))
        s1 = out.reshape(n_bins * chunk, ns + 1)[pad:][inv]
        dt_next = dtn.reshape(n_bins * chunk)[pad:][inv]
        return s1, dt_next
