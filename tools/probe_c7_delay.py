"""0D ignition-delay map of the aachenBomb C7_oneStep mechanism at chamber
conditions (VERDICT r4 item 4b): is the upstream-side pocket at the spray
tip ABLE to auto-ignite within the case time?

Both frameworks integrate the SAME mechanism file (production rates pinned
to Cantera-parity by tests/test_chemistry_core.py), so a delay difference
between the frameworks is excluded by construction; this probe records
WHERE in (T, phi) space ignition is possible within 2.3 ms at 50 bar —
the discriminator between "our chemistry is slow" and "our vapor/
temperature field never enters the ignitable window".

Usage: python tools/probe_c7_delay.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from deepflame_tpu.chemistry import load_mechanism, make_thermo, make_kinetics
from deepflame_tpu.chemistry.integrator import RosenbrockOptions
from deepflame_tpu.chemistry.reactor import ignite


def main():
    mech = load_mechanism("/root/reference/test/aachenBomb_2D/C7_oneStep.yaml")
    th = make_thermo(mech)
    kin = make_kinetics(mech)
    ns = mech.n_species
    iF = mech.species_index("C7H16")
    iO2 = mech.species_index("O2")
    iN2 = mech.species_index("N2")
    W = np.asarray(mech.molecular_weights)
    p0 = 5e6                                 # chamber pressure
    # stoichiometric F/A mass ratio for C7H16 + 11 O2
    fa_st = W[iF] / (11.0 * W[iO2] / 0.23199)
    opts = RosenbrockOptions(rtol=1e-8, atol=1e-14, max_steps=100000)

    print(f"C7_oneStep ignition delay [ms] at p = 50 bar "
          f"(chamber 800 K; '-' = no ignition within 5 ms)")
    phis = [0.5, 1.0, 2.0, 3.0, 5.0]
    Ts = [750.0, 800.0, 850.0, 900.0, 1000.0]
    print("T\\phi " + "".join(f"{ph:>9.1f}" for ph in phis))
    for T0 in Ts:
        row = []
        for phi in phis:
            f_mass = phi * fa_st
            Y = np.zeros(ns)
            Y[iF] = f_mass / (1.0 + f_mass)
            Y[iO2] = 0.23199 / (1.0 + f_mass)
            Y[iN2] = 1.0 - Y[iF] - Y[iO2]
            t, Tt, _ = ignite(th, kin, jnp.asarray(T0), p0, jnp.asarray(Y),
                              5e-3, n_out=400, const="pressure", opts=opts)
            Tn = np.asarray(Tt)
            hot = np.where(Tn > T0 + 400.0)[0]
            row.append(f"{float(t[hot[0]])*1e3:9.3f}" if len(hot)
                       else "        -")
        print(f"{T0:5.0f} " + "".join(row), flush=True)


if __name__ == "__main__":
    main()
