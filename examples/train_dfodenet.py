"""Train a DF-ODENet chemistry surrogate from 0D reactor data.

Role parity: the reference downloads pre-trained DF-ODENet checkpoints from
AIS Square (README.md:32) trained on exactly this kind of data (DeePCK
pipeline, DOI 10.1016/j.cpc.2023.108842). In a zero-egress environment we
instead regenerate the training set with the in-repo stiff integrator and
train the identical architecture (per-species GELU MLP [ns+2,1600,800,400,1],
BCT lambda=0.1 targets over a fixed delta_t) with optax.

Usage: python examples/train_dfodenet.py [--mech H2_Li] [--samples 20000]
       [--epochs 20] [--delta-t 1e-6] [--out dfodenet_h2.npz]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mech", default="/root/reference/mechanisms/H2/H2_Li.yaml")
    ap.add_argument("--samples", type=int, default=8192)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--delta-t", type=float, default=1e-6)
    ap.add_argument("--hidden", default="1600,800,400")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="dfodenet.npz")
    ap.add_argument("--pre-burn-max", type=float, default=1e-4)
    ap.add_argument("--rtol", type=float, default=1e-7)
    ap.add_argument("--t-lo", type=float, default=800.0,
                    help="lower bound of sampled initial temperatures")
    ap.add_argument("--t-hi", type=float, default=2600.0)
    ap.add_argument("--manifold", default=None,
                    help="npz of (T,p,Y) states harvested from a flame run "
                         "(examples/flame_dnn_closed_loop.py --dump-states) "
                         "appended to the random-ignition dataset, x3 with "
                         "perturbations (the DeePCK manifold-sampling role)")
    ap.add_argument("--dtype", default="f64",
                    help="dataset-generation precision (f32 for TPU)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    import optax

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics)
    from deepflame_tpu.chemistry.dnn import (bct, init_params, mlp_apply,
                                             DFODENet)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.chemistry.reactor import solve_chemistry

    gen_dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    if args.dtype == "f32" and args.rtol < 1e-5:
        args.rtol = 1e-5
    mech = load_mechanism(args.mech)
    th = make_thermo(mech, gen_dtype)
    kin = make_kinetics(mech, gen_dtype)
    ns = mech.n_species
    print(f"mechanism: {mech.name} ({ns} species)")

    # ---- dataset: random flammable states advanced by delta_t (float64 ODE)
    rng = np.random.default_rng(0)
    n = args.samples
    iH2 = mech.species_index("H2") if "H2" in mech.species_names else 0
    iO2 = mech.species_index("O2")
    iN2 = mech.species_index("N2") if "N2" in mech.species_names else ns - 1
    phi = rng.uniform(0.4, 2.0, n)
    T0 = rng.uniform(args.t_lo, args.t_hi, n)
    p0 = rng.uniform(0.5, 3.0, n) * 101325.0
    W = mech.molecular_weights
    Y = np.zeros((n, ns))
    nH2 = 2.0 * phi
    mH2, mO2, mN2 = nH2 * W[iH2], 1.0 * W[iO2], 3.76 * W[iN2]
    tot = mH2 + mO2 + mN2
    Y[:, iH2], Y[:, iO2], Y[:, iN2] = mH2 / tot, mO2 / tot, mN2 / tot
    # perturb with partially-burnt states: advance a random time first
    pre_t = rng.uniform(0.0, args.pre_burn_max, n)
    opts = RosenbrockOptions(rtol=args.rtol,
                             atol=1e-13 if args.dtype == "f64" else 1e-9,
                             max_steps=100000)
    print("generating dataset (pre-burn)...")
    pre = solve_chemistry(th, kin, jnp.asarray(T0), jnp.asarray(p0),
                          jnp.asarray(Y), jnp.asarray(pre_t), opts=opts)
    T_in, Y_in = np.asarray(pre.T), np.asarray(pre.Y)
    if args.manifold:
        man = np.load(args.manifold)
        Tm, pm, Ym = (np.asarray(man[k], np.float64) for k in ("T", "p", "Y"))
        keep = Tm > min(args.t_lo, 500.0)     # frozen cells train nothing
        Tm, pm, Ym = Tm[keep], pm[keep], Ym[keep]
        reps = [(Tm, pm, Ym)]
        for scale in (0.01, 0.03):            # perturbed copies off-manifold
            rT = Tm * (1.0 + scale * rng.standard_normal(Tm.shape))
            rY = Ym * np.exp(scale * rng.standard_normal(Ym.shape))
            rY = rY / rY.sum(axis=1, keepdims=True)
            reps.append((rT, pm, rY))
        Tm = np.concatenate([r[0] for r in reps])
        pm = np.concatenate([r[1] for r in reps])
        Ym = np.concatenate([r[2] for r in reps])
        print(f"manifold augmentation: +{Tm.shape[0]} states "
              f"(T in [{Tm.min():.0f}, {Tm.max():.0f}] K)")
        T_in = np.concatenate([T_in, Tm])
        p0 = np.concatenate([p0, pm])
        Y_in = np.concatenate([Y_in, Ym])
        n = T_in.shape[0]
    print("generating dataset (targets)...")
    tgt = solve_chemistry(th, kin, jnp.asarray(T_in), jnp.asarray(p0),
                          jnp.asarray(Y_in), args.delta_t, opts=opts)
    Y_out = np.asarray(tgt.Y)

    lam = 0.1
    X_bct = np.concatenate([T_in[:, None], p0[:, None],
                            np.asarray(bct(jnp.asarray(Y_in), lam))], axis=1)
    D_bct = np.asarray(bct(jnp.asarray(Y_out), lam)
                       - bct(jnp.asarray(Y_in), lam))[:, :-1]   # exclude inert
    x_mean, x_std = X_bct.mean(0), X_bct.std(0) + 1e-10
    y_mean, y_std = D_bct.mean(0), D_bct.std(0) + 1e-10
    Xn = ((X_bct - x_mean) / x_std).astype(np.float32)
    Dn = ((D_bct - y_mean) / y_std).astype(np.float32)

    # ---- model + training
    hidden = tuple(int(h) for h in args.hidden.split(","))
    key = jax.random.PRNGKey(0)
    nets = init_params(key, ns, hidden)
    opt = optax.adam(args.lr)

    def loss_fn(nets, xb, db):
        preds = jnp.concatenate([mlp_apply(net, xb) for net in nets], axis=-1)
        return jnp.mean((preds - db) ** 2)

    opt_state = opt.init(nets)

    @jax.jit
    def train_step(nets, opt_state, xb, db):
        l, g = jax.value_and_grad(loss_fn)(nets, xb, db)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(nets, updates), opt_state, l

    nb = n // args.batch
    for ep in range(args.epochs):
        perm = rng.permutation(n)
        tot_l = 0.0
        for b in range(nb):
            idx = perm[b * args.batch:(b + 1) * args.batch]
            nets, opt_state, l = train_step(nets, opt_state,
                                            jnp.asarray(Xn[idx]),
                                            jnp.asarray(Dn[idx]))
            tot_l += float(l)
        print(f"epoch {ep + 1}/{args.epochs}: mse={tot_l / nb:.5f}", flush=True)

    # ---- save as npz (flat arrays)
    flat = {}
    for i, net in enumerate(nets):
        for j, (Wm, bm) in enumerate(net):
            flat[f"net{i}_W{j}"] = np.asarray(Wm)
            flat[f"net{i}_b{j}"] = np.asarray(bm)
    np.savez(args.out, x_mean=x_mean, x_std=x_std, y_mean=y_mean, y_std=y_std,
             delta_t=args.delta_t, n_species=ns, n_layers=len(nets[0]),
             **flat)
    print(f"saved {args.out}")

    # ---- quick validation: RR correlation on held-out states
    net = DFODENet(nets=nets,
                   x_mean=jnp.asarray(x_mean, jnp.float32),
                   x_std=jnp.asarray(x_std, jnp.float32),
                   y_mean=jnp.asarray(y_mean, jnp.float32),
                   y_std=jnp.asarray(y_std, jnp.float32),
                   delta_t=args.delta_t, frozen_T=500.0)
    m = min(1024, n)
    rho = np.asarray(th.rho(jnp.asarray(p0[:m]), jnp.asarray(T_in[:m]),
                            jnp.asarray(Y_in[:m])))
    RR_dnn = np.asarray(net.rates(jnp.asarray(T_in[:m], jnp.float32),
                                  jnp.asarray(p0[:m], jnp.float32),
                                  jnp.asarray(Y_in[:m], jnp.float32),
                                  jnp.asarray(rho, jnp.float32)))
    RR_ref = (Y_out[:m] - Y_in[:m]) * rho[:, None] / args.delta_t
    for i in range(ns - 1):
        c = np.corrcoef(RR_dnn[:, i], RR_ref[:, i])[0, 1]
        print(f"species {mech.species_names[i]:>6}: RR corr = {c:.4f}")


if __name__ == "__main__":
    main()
