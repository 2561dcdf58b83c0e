"""0D constant-pressure / constant-volume reactor (df0DFoam parity).

Role parity: /root/reference/applications/solvers/df0DFoam — single-cell
autoignition with `constProp` pressure|volume (df0DFoam.C:110). Prints the
ignition delay and final state; optionally writes the trajectory.

Usage: python examples/reactor_0d.py [--mech .../H2_Li.yaml] [--T0 1200]
       [--p0 101325] [--phi 1.0] [--const pressure|volume] [--t-end 2e-4]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mech", default="/root/reference/mechanisms/H2/H2_Li.yaml")
    ap.add_argument("--T0", type=float, default=1200.0)
    ap.add_argument("--p0", type=float, default=101325.0)
    ap.add_argument("--phi", type=float, default=1.0)
    ap.add_argument("--fuel", default="H2")
    ap.add_argument("--const", default="pressure", choices=["pressure", "volume"])
    ap.add_argument("--t-end", type=float, default=2e-4)
    ap.add_argument("--n-out", type=int, default=400)
    ap.add_argument("--out", default=None, help="write trajectory .csv")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, "f64")
    import jax.numpy as jnp

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.chemistry.reactor import ignite

    mech = load_mechanism(args.mech)
    th, kin = make_thermo(mech), make_kinetics(mech)
    ns = mech.n_species
    W = mech.molecular_weights
    iF = mech.species_index(args.fuel)
    iO2 = mech.species_index("O2")
    iN2 = mech.species_index("N2") if "N2" in mech.species_names else None
    # phi F + stoich O2 (+ 3.76 N2); stoich O2 per fuel from element balance
    E = mech.element_matrix
    els = dict(zip(mech.element_names, range(len(mech.element_names))))
    nC = E[els["C"], iF] if "C" in els else 0.0
    nH = E[els["H"], iF] if "H" in els else 0.0
    o2_stoich = nC + nH / 4.0
    moles = np.zeros(ns)
    moles[iF] = args.phi
    moles[iO2] = o2_stoich
    if iN2 is not None:
        moles[iN2] = o2_stoich * 3.76
    Y0 = moles * W / (moles * W).sum()

    opts = RosenbrockOptions(rtol=1e-8, atol=1e-14, max_steps=200_000)
    times, T, Y = ignite(th, kin, args.T0, args.p0, Y0, args.t_end,
                         n_out=args.n_out, const=args.const, opts=opts)
    times, T, Y = np.asarray(times), np.asarray(T), np.asarray(Y)
    dT = np.gradient(T, times)
    tau = times[int(np.argmax(dT))]
    print(f"mixture: phi={args.phi} {args.fuel}/air, T0={args.T0} K, "
          f"p0={args.p0:.0f} Pa, const-{args.const}")
    print(f"ignition delay (max dT/dt): {tau * 1e6:.2f} us")
    print(f"final T: {T[-1]:.1f} K")
    for s in mech.species_names:
        yf = Y[-1, mech.species_index(s)]
        if yf > 1e-4:
            print(f"  Y[{s}] = {yf:.5f}")
    if args.out:
        hdr = "time T " + " ".join(mech.species_names)
        np.savetxt(args.out, np.column_stack([times, T, Y]), header=hdr)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
