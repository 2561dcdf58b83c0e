"""In-graph (scan-repeated) substep anatomy — immune to the ~3 ms axon
per-call dispatch floor — plus actual while-trip counts per hot bin.

Usage: python tools/probe_chem4.py [--n 96]
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

REPS = 32


def timeit_call(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    args = ap.parse_args()

    from deepflame_tpu.chemistry.reactor import (
        constant_pressure_rhs_batched)
    from deepflame_tpu.chemistry.integrator import (
        _inverse_batched_dispatch, rosenbrock_integrate_batched)

    solver, state = _build_3d_les(n=args.n, dtype=jnp.float32)
    dt = 2.5e-7
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    state = jax.block_until_ready(step(state))

    th, kin = solver.thermo, solver.combustion.kinetics
    opts = solver.combustion.ode_opts
    Tf = np.asarray(state.T.reshape(-1))
    ns = state.Y.shape[0]
    Yf = np.asarray(jnp.moveaxis(state.Y, 0, -1).reshape(-1, ns))
    pf = np.asarray(state.p.reshape(-1))
    d0f = np.asarray(state.chem_dt.reshape(-1))
    order = np.argsort(Tf)
    n = ns + 1
    basis = jnp.eye(n, dtype=jnp.float32)

    for L in (6912, 27648, 110592):
        hot = order[-L:]
        s0 = jnp.asarray(np.concatenate([Tf[hot, None], Yf[hot]], axis=1),
                         jnp.float32)
        p0 = jnp.asarray(pf[hot], jnp.float32)
        rhs_b = constant_pressure_rhs_batched(th, kin, p0)

        def scan_of(f):
            @jax.jit
            def g(y):
                def body(c, _):
                    out = f(c)
                    return out, None
                y2, _ = jax.lax.scan(body, y, None, length=REPS)
                return y2
            return g

        f_rhs = scan_of(lambda y: y + 1e-12 * rhs_b(y))
        t_rhs = timeit_call(f_rhs, s0) / REPS

        def jacstep(y):
            f0, jvp = jax.linearize(rhs_b, y)
            Jc = jax.vmap(lambda e: jvp(jnp.broadcast_to(e, y.shape)))(basis)
            jac = jnp.moveaxis(Jc, 0, -1)
            return y + 1e-12 * f0 + 1e-14 * jnp.einsum("lnm,lm->ln", jac, y)
        t_jac = timeit_call(scan_of(jacstep), s0) / REPS

        def substep(y):
            f0, jvp = jax.linearize(rhs_b, y)
            Jc = jax.vmap(lambda e: jvp(jnp.broadcast_to(e, y.shape)))(basis)
            jac = jnp.moveaxis(Jc, 0, -1)
            W = jnp.eye(n, dtype=y.dtype)[None] - (1e-8 * 0.293) * jac
            W_inv = _inverse_batched_dispatch(W)
            solve = lambda b: jnp.einsum("nml,lm->ln", W_inv, b)
            k1 = solve(f0)
            f1 = rhs_b(y + 1e-8 * 0.5 * k1)
            k2 = solve(f1 - k1) + k1
            f2 = rhs_b(y + 1e-8 * k2)
            k3 = solve(f2 - 6.0 * (k2 - f1) - 2.0 * (k1 - f0))
            return y + 1e-12 * (k1 + k2 + k3)
        t_sub = timeit_call(scan_of(substep), s0) / REPS

        def inv_only(y):
            W = jnp.eye(n, dtype=y.dtype)[None] + 1e-6 * (
                y[:, :, None] * y[:, None, :])
            W_inv = _inverse_batched_dispatch(W)
            return y + 1e-12 * jnp.einsum("nml,lm->ln", W_inv, y)
        t_inv = timeit_call(scan_of(inv_only), s0) / REPS

        print(f"width {L:6d}: rhs {t_rhs*1e6:8.1f} us  "
              f"jac {t_jac*1e6:8.1f} us  gj_inv {t_inv*1e6:8.1f} us  "
              f"substep {t_sub*1e6:8.1f} us", flush=True)

    # ---- actual trip counts in the production binned layout
    accn_key = None
    from deepflame_tpu.chemistry.reactor import rk23_attempt_batched
    s_all = jnp.asarray(np.concatenate([Tf[:, None], Yf], 1), jnp.float32)
    p_all = jnp.asarray(pf, jnp.float32)
    te = jnp.full((len(Tf),), dt, jnp.float32)
    rhs_all = constant_pressure_rhs_batched(th, kin, p_all)
    _, acc, _ = jax.jit(lambda s, t: rk23_attempt_batched(rhs_all, s, t,
                                                          opts))(s_all, te)
    te_rem = np.where(np.asarray(acc), 0.0, np.asarray(te))
    key = np.where(te_rem > 0, Tf, -np.inf)
    o = np.argsort(key)
    n_bins, chunk = 128, -(-len(key) // 128)
    pad = n_bins * chunk - len(key)
    s_s = np.concatenate([np.tile([[300.] + [0.] * ns], (pad, 1)),
                          np.concatenate([Tf[:, None], Yf], 1)[o]])
    p_s = np.concatenate([np.full(pad, 101325.0), pf[o]])
    t_s = np.concatenate([np.zeros(pad), te_rem[o]])
    d_s = np.concatenate([np.full(pad, opts.dt_init), d0f[o]])

    @jax.jit
    def run_bin(s, p, t, d):
        rhs = constant_pressure_rhs_batched(th, kin, p)
        return rosenbrock_integrate_batched(rhs, s, t, opts, dt_start=d,
                                            return_nstep=True)

    trips = []
    for b in range(n_bins - 8, n_bins):
        sl = slice(b * chunk, (b + 1) * chunk)
        _, _, nst = run_bin(jnp.asarray(s_s[sl], jnp.float32),
                            jnp.asarray(p_s[sl], jnp.float32),
                            jnp.asarray(t_s[sl], jnp.float32),
                            jnp.asarray(d_s[sl], jnp.float32))
        trips.append(int(nst))
    print(f"while-trips, last 8 bins (stiffest): {trips}  "
          f"total {sum(trips)}")


if __name__ == "__main__":
    main()
