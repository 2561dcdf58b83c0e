"""DNN-chemistry-mode throughput + MFU — the apples-to-apples line against
the reference A100 port's device-resident chemistry.

The CUDA port's on-GPU chemistry is the fp16 TorchScript DF-ODENet
(src_gpu/dfChemistrySolver.cu:112-123, batch 4096); CVODE cells go to CPU
ranks. This framework runs the SAME architecture ([ns+2,1600,800,400,1] per
species, inference.py:90-167) fused into the jitted step on the MXU. This
tool reports cell-updates/s with DNN chemistry and an MFU estimate for the
MLP matmuls (the one workload where TPU-vs-GPU comparison is
matmul-for-matmul at equal parameter count).

Weights are randomly initialized with y_std scaled to ~0 so RR ~ 0 and the
5 timed steps stay finite: the MLP cost is data-INdependent (fixed matmul
shapes, no while_loops), so throughput equals the trained-checkpoint case.

Usage: python tools/bench_dnn.py [--n 64] [--steps 5]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_PEAK_BF16 = 197e12     # TPU v5e peak bf16 matmul FLOP/s (public spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 matmuls with f32 accumulation (the "
                         "reference device chemistry runs fp16)")
    ap.add_argument("--mech",
                    default="/root/reference/mechanisms/H2/H2_Li.yaml",
                    help="e.g. /root/reference/mechanisms/CH4/drm19/"
                         "drm19.yaml for the 21-species crossover bench")
    ap.add_argument("--stiff", action="store_true",
                    help="bench the STIFF tier instead (same config/mech) "
                         "for the DNN-vs-stiff crossover table")
    args = ap.parse_args()
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, "f32")
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_3d_les
    from deepflame_tpu.chemistry.dnn import DFODENet, init_params
    from deepflame_tpu.combustion.dnn_chemistry import DNNChemistry
    import dataclasses

    n = args.n
    dt = 2.5e-7
    solver, state = _build_3d_les(n=n, dtype=jnp.float32,
                                  mech_path=args.mech)
    th, kin = solver.combustion.thermo, solver.combustion.kinetics
    ns = state.Y.shape[0]
    if not args.stiff:
        net = DFODENet(
            nets=init_params(jax.random.PRNGKey(0), ns),
            x_mean=jnp.zeros(ns + 2), x_std=jnp.ones(ns + 2),
            y_mean=jnp.zeros(ns - 1), y_std=jnp.full(ns - 1, 1e-12),
            delta_t=dt, frozen_T=700.0,
            compute_dtype=jnp.bfloat16 if args.bf16 else None)
        comb = DNNChemistry(th, kin, net=net)
        solver = dataclasses.replace(solver, combustion=comb)

    step = jax.jit(lambda s: solver.step(s, dt)[0])
    t0 = time.perf_counter()
    state = jax.block_until_ready(step(state))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state = step(state)
    jax.block_until_ready(state)
    wall = (time.perf_counter() - t0) / args.steps
    assert bool(jnp.all(jnp.isfinite(state.T))), "non-finite state"

    cells = n ** 3
    sizes = (ns + 2, 1600, 800, 400, 1)
    flops_cell = (ns - 1) * 2 * sum(a * b for a, b in
                                    zip(sizes[:-1], sizes[1:]))
    mlp_flops = cells * flops_cell
    mfu = mlp_flops / wall / V5E_PEAK_BF16
    mname = os.path.basename(args.mech).split(".")[0]
    out = {
        "n": n, "cells": cells, "step_ms": wall * 1e3,
        "cell_updates_per_s": cells / wall,
        "mlp_flops_per_step": mlp_flops,
        "mlp_mfu_vs_bf16_peak": mfu,
        "bf16": args.bf16, "mech": mname, "ns": ns, "stiff": args.stiff,
        "compile_s": compile_s,
    }
    mode = ("stiff tier (rtol 1e-4)" if args.stiff
            else "DNN chemistry (DF-ODENet in-loop)")
    print(f"| {n}^3 | {mname} ({ns} sp) | {mode} | "
          f"{wall * 1e3:.1f} ms | {cells / wall / 1e6:.2f} M cu/s | "
          f"MLP {mlp_flops / 1e12:.1f} TFLOP/step -> "
          f"{mfu * 100:.0f}% of bf16 peak |", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
