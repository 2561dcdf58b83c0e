"""Per-phase timing of the flagship 3D LES bench step on the real chip:
chemistry vs transport(everything else), plus total, to target optimization."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_3d_les


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))      # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    n = 48
    solver, state = _build_3d_les(n=n, dtype=jnp.float32)
    dt = 2.5e-7

    step = jax.jit(lambda s: solver.step(s, dt)[0])
    # warm state: a few steps in so chemistry is in a representative regime
    for _ in range(3):
        state = step(state)
    jax.block_until_ready(state)

    t_full = timeit(step, state)

    # chemistry alone
    def chem_only(s):
        Yt = jnp.moveaxis(s.Y, 0, -1)
        return solver.combustion.correct(s.T, s.p, Yt, dt, None).RR
    t_chem = timeit(jax.jit(chem_only), state)

    # transport-only step (chemistry off) on same state
    import dataclasses
    solver_nochem = dataclasses.replace(
        solver, config=dataclasses.replace(solver.config, chemistry=False))
    step_nc = jax.jit(lambda s: solver_nochem.step(s, dt)[0])
    t_trans = timeit(step_nc, state)

    # transport substeps: momentum / pressure breakdown via diag of full step
    cells = n ** 3
    print(f"full step     : {t_full*1e3:8.2f} ms  ({cells/t_full/1e6:6.2f} Mcup/s)")
    print(f"chemistry only: {t_chem*1e3:8.2f} ms  ({100*t_chem/t_full:5.1f}%)")
    print(f"no-chem step  : {t_trans*1e3:8.2f} ms  ({100*t_trans/t_full:5.1f}%)")
    print(f"sum check     : {(t_chem+t_trans)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
