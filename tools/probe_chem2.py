"""In-jit chemistry composition at 96^3: full solve vs fast tier vs sort
machinery, and bin-count sensitivity. All variants one jit each.

Usage: python tools/probe_chem2.py [--n 96]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_3d_les


def timeit(fn, *args, reps=5):
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

    from deepflame_tpu.chemistry.reactor import solve_chemistry
    solver, state = _build_3d_les(n=args.n, dtype=jnp.float32)
    dt = 2.5e-7
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    state = jax.block_until_ready(step(state))

    th, kin = solver.thermo, solver.combustion.kinetics
    opts = solver.combustion.ode_opts
    T, p = state.T, state.p
    Yt = jnp.moveaxis(state.Y, 0, -1)
    d0 = state.chem_dt

    def chem(n_bins, fast_tier=True, sort="T"):
        f = jax.jit(functools.partial(
            solve_chemistry, th, kin, opts=opts, n_bins=n_bins,
            fast_tier=fast_tier, sort=sort))
        return timeit(lambda: f(T, p, Yt, dt, dt_start=d0))

    for nb, ft, srt in [(128, True, "T"), (128, True, "dt"),
                        (64, True, "T"), (32, True, "T"), (8, True, "T"),
                        (4, True, "T"), (1, True, "T")]:
        t = chem(nb, ft, srt)
        print(f"solve_chemistry n_bins={nb:4d} sort={srt:2s}: {t*1e3:7.1f} ms",
              flush=True)

    # sort machinery cost in isolation
    Tf = T.reshape(-1)
    big = jnp.concatenate([Tf[:, None], Yt.reshape(-1, Yt.shape[-1])], 1)

    t = timeit(jax.jit(lambda x: jnp.argsort(x)), Tf)
    print(f"argsort 885k f32:          {t*1e3:7.1f} ms")

    @jax.jit
    def sort_gather_inv(key, s):
        o = jnp.argsort(key)
        inv = jnp.argsort(o)
        return s[o][inv]

    t = timeit(sort_gather_inv, Tf, big)
    print(f"2x argsort + 2x gather(885k,10): {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
