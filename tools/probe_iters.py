"""Per-equation Krylov iteration counts in the jitted bench step (f32 TPU)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_3d_les


def main():
    n = 48
    solver, state = _build_3d_les(n=n, dtype=jnp.float32)
    dt = 2.5e-7
    step = jax.jit(lambda s: solver.step(s, dt))
    for _ in range(3):
        state = step(state)[0]
    state, diag = step(state)
    jax.block_until_ready(state)
    for k in sorted(diag):
        print(f"{k:18s} {float(diag[k]):.4g}")


if __name__ == "__main__":
    main()
