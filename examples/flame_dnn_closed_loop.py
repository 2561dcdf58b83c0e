"""Closed-loop DNN-chemistry validation: DF-ODENet vs stiff ODE in a flame.

Role parity: /root/reference/test/Tu500K-Phi1 — the reference's CI case for
in-loop DNN chemistry (inference.py:121-167): a 1D H2/air premixed flame at
T_u = 500 K, phi = 1, advanced with the DNN surrogate, validated against the
CVODE path. Here: the SAME inlet-anchored flame configuration
(examples/flame_1d_anchored.py, VALIDATION.md) is advanced twice from the
same initial state — once with the batched Rosenbrock stiff integrator
(`Laminar`), once with a DF-ODENet trained by examples/train_dfodenet.py
(`DNNChemistry`) — and the fields are compared, plus per-step wall time.

Train the net first (TPU, ~15 min):
  python examples/train_dfodenet.py --samples 16384 --epochs 30 \
      --t-lo 600 --t-hi 2800 --dtype f32 --out /tmp/dfodenet_h2_tu500.npz
Then:
  python examples/flame_dnn_closed_loop.py --ckpt /tmp/dfodenet_h2_tu500.npz
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/dfodenet_h2_tu500.npz")
    ap.add_argument("--cells", type=int, default=512)
    ap.add_argument("--length", type=float, default=0.012)
    ap.add_argument("--u-in", type=float, default=5.0)
    ap.add_argument("--T-u", type=float, default=500.0)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--frozen-T", type=float, default=600.0)
    ap.add_argument("--mech", default="/root/reference/mechanisms/H2/H2_Li.yaml")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--dump-states", default=None,
                    help="save (T,p,Y) flame-manifold states sampled from "
                         "the ODE run (training augmentation, the DeePCK "
                         "manifold-sampling role)")
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.dnn import load_npz_checkpoint
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.chemistry.reactor import ignite
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.combustion.dnn_chemistry import DNNChemistry
    from deepflame_tpu.mesh import (StructuredMesh, zero_gradient, empty,
                                    fixed_value)
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.utils.flame_speed import flame_position

    mech = load_mechanism(args.mech)
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    ns = mech.n_species
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    W = np.asarray(mech.molecular_weights)
    X = np.zeros(ns)
    X[iH2], X[iO2], X[iN2] = 1.0, 0.5, 0.5 * 3.76
    Yu = X * W / (X * W).sum()
    T_u, p0 = args.T_u, 101325.0

    _, Tb_t, Yb_t = ignite(th, kin, jnp.asarray(1400.0, dtype), p0,
                           jnp.asarray(Yu, dtype), 5e-3,
                           opts=RosenbrockOptions(rtol=1e-4, atol=1e-8,
                                                  max_steps=20000))
    Yb = np.asarray(Yb_t[-1])
    h_u = th.h_mass(jnp.asarray(T_u, dtype), jnp.asarray(Yu, dtype))
    T_b = float(th.T_from_h(h_u, jnp.asarray(Yb, dtype),
                            jnp.asarray(2400.0, dtype)))
    print(f"T_ad(T_u={T_u:.0f}K) = {T_b:.0f} K")

    n, L = args.cells, args.length
    mesh = StructuredMesh.box([L, L / n, L / n], [n, 1, 1])
    e = (empty(), empty())
    bU = ((fixed_value(args.u_in), zero_gradient()), e, e)
    bU0 = ((fixed_value(0.0), zero_gradient()), e, e)
    bp = ((zero_gradient(), fixed_value(p0)), e, e)
    h_in = float(h_u)
    bh = ((fixed_value(h_in), zero_gradient()), e, e)
    rho_u = float(th.rho(jnp.asarray(p0, dtype), jnp.asarray(T_u, dtype),
                         jnp.asarray(Yu, dtype)))
    brho = ((fixed_value(rho_u), zero_gradient()), e, e)
    bY = [((fixed_value(float(Yu[k])), zero_gradient()), e, e)
          for k in range(ns)]

    ode_opts = RosenbrockOptions(
        rtol=1e-6 if args.dtype == "f64" else 1e-4,
        atol=1e-12 if args.dtype == "f64" else 1e-8, max_steps=20000,
        grow=10.0)
    net = load_npz_checkpoint(args.ckpt, frozen_T=args.frozen_T, dtype=dtype)
    models = {
        "ode": Laminar(th, kin, ode_opts=ode_opts),
        "dnn": DNNChemistry(th, kin, ode_opts=ode_opts, net=net),
    }

    Xc, _, _ = mesh.cell_centers(dtype)
    w = 6.0 * mesh.dx
    prof = 0.5 * (1.0 + jnp.tanh((Xc - 0.45 * L) / w))
    T0 = (T_u + (T_b - T_u) * prof).astype(dtype)
    Y0 = (jnp.asarray(Yu, dtype)[:, None, None, None] * (1 - prof)
          + jnp.asarray(Yb, dtype)[:, None, None, None] * prof)
    rho0 = th.rho(jnp.full(mesh.shape, p0, dtype), T0,
                  jnp.moveaxis(Y0, 0, -1))
    U0 = jnp.stack([rho_u * args.u_in / rho0, jnp.zeros_like(T0),
                    jnp.zeros_like(T0)])

    dt = 5.0 * mesh.dx / 1500.0
    print(f"dt = {dt:.2e} s, {args.steps} steps "
          f"-> t_end = {dt * args.steps * 1e3:.2f} ms")
    xs = np.asarray(Xc).squeeze()
    results = {}
    for name, comb in models.items():
        solver = LowMachSolver(
            mesh=mesh, thermo=th, transport=tr, combustion=comb,
            bcs_U=(bU, bU0, bU0), bcs_p=bp, bcs_h=bh, bcs_Y=bY, bcs_rho=brho,
            config=LowMachConfig(chemistry=True, inert_index=int(iN2)))
        s = solver.initial_state(jnp.full(mesh.shape, p0, dtype), T0, Y0, U0)
        step = jax.jit(lambda st: solver.step(st, dt)[0])
        s = step(s)                          # compile + 1 step
        jax.block_until_ready(s.T)
        dump = (name == "ode" and args.dump_states)
        harvested = []
        t0 = time.perf_counter()
        for i in range(args.steps - 1):
            s = step(s)
            if dump and (i + 1) % max(args.steps // 40, 1) == 0:
                harvested.append((np.asarray(s.T).ravel(),
                                  np.asarray(s.p).ravel(),
                                  np.asarray(s.Y).reshape(ns, -1).T))
        jax.block_until_ready(s.T)
        wall = time.perf_counter() - t0
        if dump and harvested:
            Ts = np.concatenate([h[0] for h in harvested])
            ps = np.concatenate([h[1] for h in harvested])
            Ys = np.concatenate([h[2] for h in harvested])
            np.savez(args.dump_states, T=Ts, p=ps, Y=Ys)
            print(f"dumped {Ts.shape[0]} manifold states "
                  f"-> {args.dump_states}")
        T = np.asarray(s.T).squeeze()
        results[name] = dict(T=T, Y=np.asarray(s.Y).squeeze(),
                             ms_per_step=wall / (args.steps - 1) * 1e3,
                             xf=flame_position(xs, T))
        xf_mm = results[name]["xf"] * 1e3
        print(f"{name}: T_max={T.max():7.1f} K  x_f={xf_mm:6.3f} mm  "
              f"{results[name]['ms_per_step']:.2f} ms/step")

    To, Td = results["ode"]["T"], results["dnn"]["T"]
    Yo, Yd = results["ode"]["Y"], results["dnn"]["Y"]
    l2 = np.linalg.norm(Td - To) / np.linalg.norm(To)
    linf = np.abs(Td - To).max() / To.max()
    dxf = results["dnn"]["xf"] - results["ode"]["xf"]
    print(f"\nT field:  L2 rel = {l2:.4f}   Linf rel = {linf:.4f}")
    print(f"flame position diff = {dxf*1e3:+.3f} mm "
          f"({dxf/mesh.dx:+.1f} cells)")
    for k, sp in ((iH2, "H2"), (mech.species_index("OH"), "OH"),
                  (mech.species_index("H2O"), "H2O")):
        e_sp = np.abs(Yd[k] - Yo[k]).max() / max(Yo[k].max(), 1e-12)
        print(f"Y_{sp:<4} Linf rel = {e_sp:.4f}")
    sp_up = results["ode"]["ms_per_step"] / results["dnn"]["ms_per_step"]
    print(f"speedup (full step, DNN vs Rosenbrock): {sp_up:.2f}x")


if __name__ == "__main__":
    main()
