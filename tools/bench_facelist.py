"""Face-list (CSR) backend throughput vs the structured backend — the
"CSR tax" on TPU.

The north star names the gather/scatter face-cell-connectivity path
explicitly (BASELINE.json); until round 3 all throughput evidence was
structured-backend only.  This benchmarks the SAME physics (3D reacting LES
TGV, Sigma SGS, H2_Li stiff chemistry, f32) through both backends on the
same box mesh, plus a chemistry-OFF tier that isolates the FV/mesh-path
cost (chemistry is connectivity-blind, so the ON tier dilutes the tax).

Usage: python tools/bench_facelist.py [--n 64] [--steps 5]
Writes markdown rows + a JSON blob to stdout.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_pair(n, chemistry, dtype):
    import jax.numpy as jnp
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.combustion import Laminar, NoCombustion
    from deepflame_tpu.mesh import StructuredMesh, cyclic
    from deepflame_tpu.mesh.facelist import from_structured
    from deepflame_tpu.solvers.low_mach import LowMachConfig, LowMachSolver
    from deepflame_tpu.solvers.low_mach_fl import LowMachSolverFL
    from deepflame_tpu.turbulence import sigma_model

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    L = 2.0 * np.pi * 1e-3
    mesh = StructuredMesh.box([L, L, L], [n, n, n])
    bcs = ((cyclic(), cyclic()),) * 3
    if chemistry:
        comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
            rtol=1e-4, atol=1e-8, max_steps=2000, grow=10.0),
            n_bins=64 if n >= 96 else 32)
    else:
        comb = NoCombustion(th, kin)
    cfg = LowMachConfig(chemistry=chemistry,
                        inert_index=int(mech.species_index("N2")))
    les = sigma_model()
    sol_s = LowMachSolver(mesh=mesh, thermo=th, transport=tr,
                          combustion=comb, bcs_U=(bcs, bcs, bcs), bcs_p=bcs,
                          bcs_h=bcs, bcs_Y=bcs, bcs_rho=bcs, config=cfg,
                          turbulence=les)
    fl = from_structured(mesh, bcs, dtype)
    sol_f = LowMachSolverFL(m_p=fl, m_h=fl, m_Y=fl, m_rho=fl,
                            m_U=(fl, fl, fl), thermo=th, transport=tr,
                            combustion=comb, config=cfg, les=les)

    ns = mech.n_species
    Yu = np.zeros(ns)
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yu[iH2], Yu[iO2], Yu[iN2] = 0.0285, 0.2264, 0.7451
    X, Yg, Z = mesh.cell_centers(dtype)
    k = 2.0 * np.pi / L
    U = jnp.stack([10.0 * jnp.sin(k * X) * jnp.cos(k * Yg) * jnp.cos(k * Z),
                   -10.0 * jnp.cos(k * X) * jnp.sin(k * Yg) * jnp.cos(k * Z),
                   jnp.zeros(mesh.shape, dtype)])
    r2 = (X - L / 2) ** 2 + (Yg - L / 2) ** 2 + (Z - L / 2) ** 2
    T = jnp.where(r2 < (L / 6) ** 2, 2000.0, 700.0).astype(dtype)
    p = jnp.full(mesh.shape, 101325.0, dtype)
    Y = jnp.asarray(np.tile(Yu[:, None, None, None], (1,) + mesh.shape),
                    dtype)
    s_s = sol_s.initial_state(p, T, Y, U)
    s_f = sol_f.initial_state(
        p.reshape(-1), T.reshape(-1),
        jnp.asarray(np.asarray(Y).reshape(ns, -1).T),
        jnp.stack([U[c].reshape(-1) for c in range(3)], 1))
    return sol_s, s_s, sol_f, s_f


def time_steps(sol, state, dt, n_steps, which):
    import jax
    if which == "face-list":
        # mesh arrays as traced args — compile time flat in mesh size
        from deepflame_tpu.solvers.low_mach_fl import make_step_fl
        raw = make_step_fl(sol)
        step = lambda s: raw(s, dt)[0]
    else:
        step = jax.jit(lambda s: sol.step(s, dt)[0])
    t0 = time.perf_counter()
    state = jax.block_until_ready(step(state))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(state)
    jax.block_until_ready(state)
    wall = time.perf_counter() - t0
    import jax.numpy as jnp
    assert bool(jnp.all(jnp.isfinite(state.T))), f"non-finite {which} state"
    return wall / n_steps * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, "f32")
    import jax.numpy as jnp

    dt = 2.5e-7
    rows = []
    for chemistry in (False, True):
        sol_s, s_s, sol_f, s_f = build_pair(args.n, chemistry, jnp.float32)
        ms_s, cs_s = time_steps(sol_s, s_s, dt, args.steps, "structured")
        ms_f, cs_f = time_steps(sol_f, s_f, dt, args.steps, "face-list")
        cells = args.n ** 3
        rows.append({
            "n": args.n, "chemistry": chemistry,
            "structured_ms": ms_s, "facelist_ms": ms_f,
            "csr_tax": ms_f / ms_s,
            "structured_cups": cells * 1e3 / ms_s,
            "facelist_cups": cells * 1e3 / ms_f,
            "compile_s": [cs_s, cs_f],
        })
        tier = "chem ON (rtol 1e-4)" if chemistry else "chem OFF (FV only)"
        print(f"| {args.n}^3 | {tier} | {ms_s:.1f} ms | {ms_f:.1f} ms | "
              f"{ms_f / ms_s:.2f}x | {cells * 1e3 / ms_f / 1e6:.2f} M cu/s |",
              flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
