"""2D supercritical reacting TGV (dfLowMachFoam twoD_supercirticalTGV
parity) — the real-gas (Peng-Robinson) case family.

Role parity: /root/reference/examples/dfLowMachFoam/notorch/
twoD_supercirticalTGV: CH4/O2 Taylor-Green mixing at p = 10.1325 MPa
(above methane's critical pressure), 2-step BFER CH4 mechanism
(2s_CH4_BFER_N2.yaml, shipped in-case), 128x128 fully-cyclic box of size
2*pi*3e-5 m, shipped nonuniform initial T/U/species fields (0/*), dt 1e-8,
endTime 1e-5 s.

The real-gas branch mirrors the reference's: CanteraMixture.H:116-140
switches ONLY psi (and rho) to the cubic-EoS value — here
chemistry.real_gas.make_real_gas wraps the ideal thermo with exact
Peng-Robinson rho/psi (tests/test_real_gas.py), and the rest of the
thermo interface passes through.

Caveat: the shipped initial T field reaches 150 K (transcritical CH4);
NASA-7 fits bottom out at their 200 K validity floor here, and dense-fluid
caloric/transport corrections (the reference's Chung transport +
useThermoTranNN real-fluid NN, whose checkpoint is a download) are not
applied — the run demonstrates the PR-psi solver path end-to-end, not
cryogenic-property parity.

Usage: python examples/supercritical_tgv_2d.py [--steps 1000]
       [--platform cpu] [--ideal]  (--ideal reruns with ideal-gas psi for
       the compressibility comparison)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CASE = ("/root/reference/examples/dfLowMachFoam/notorch/"
        "twoD_supercirticalTGV")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--dt", type=float, default=1e-8)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--ideal", action="store_true",
                    help="ideal-gas psi instead of Peng-Robinson")
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.chemistry.real_gas import make_real_gas
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.runtime.openfoam_io import read_case_fields
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

    mech = load_mechanism(os.path.join(CASE, "2s_CH4_BFER_N2.yaml"))
    th_ideal = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    th = th_ideal if args.ideal else make_real_gas(mech, th_ideal)

    n = 128
    L = 2.0 * np.pi * 3e-5                     # blockMeshDict scale
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))

    names = ["T", "U", "CH4", "O2", "N2", "H2O", "CO", "CO2"]
    f = read_case_fields(CASE, "0", names, (n, n, 1))
    ns = mech.n_species
    Y = np.zeros((ns, n, n, 1))
    for sp in ("CH4", "O2", "N2", "H2O", "CO", "CO2"):
        Y[mech.species_index(sp)] = f[sp]
    Y = np.clip(Y, 0.0, 1.0)
    Y /= Y.sum(axis=0, keepdims=True)
    p0 = jnp.full(mesh.shape, 1.01325e7, dtype)
    T0 = jnp.asarray(f["T"], dtype)
    U0 = jnp.asarray(f["U"], dtype)

    comb = Laminar(th_ideal, kin, ode_opts=RosenbrockOptions(
        rtol=1e-6 if args.dtype == "f64" else 1e-4,
        atol=1e-10 if args.dtype == "f64" else 1e-8, max_steps=10000))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))))
    s = solver.initial_state(p0, T0, jnp.asarray(Y, dtype), U0)

    rho0 = np.asarray(s.rho)
    W_mean = np.asarray(th_ideal.W_mix(jnp.moveaxis(s.Y, 0, -1)))
    Z_factor = float(np.mean(
        np.asarray(s.p) / (rho0 * 8314.462618 / W_mean * np.asarray(s.T))))
    print(f"initial: T=[{float(s.T.min()):.1f},{float(s.T.max()):.1f}] K  "
          f"rho=[{rho0.min():.1f},{rho0.max():.1f}] kg/m3  "
          f"mean compressibility Z = {Z_factor:.4f} "
          f"({'ideal' if args.ideal else 'Peng-Robinson'})")

    dt = args.dt
    step = jax.jit(lambda st: solver.step(st, dt)[0])
    import time as _t
    t0 = _t.perf_counter()
    ke0 = float(jnp.sum(s.rho * jnp.sum(s.U**2, 0)))
    out = max(args.steps // 20, 1)
    for i in range(args.steps):
        s = step(s)
        if (i + 1) % out == 0:
            ke = float(jnp.sum(s.rho * jnp.sum(s.U**2, 0)))
            print(f"t={float(s.time)*1e6:7.3f} us  "
                  f"T=[{float(s.T.min()):7.1f},{float(s.T.max()):7.1f}] "
                  f"KE/KE0={ke/ke0:.4f} "
                  f"Y_CO_max={float(s.Y[mech.species_index('CO')].max()):.4f}",
                  flush=True)
            if not np.isfinite(float(s.T.max())):
                raise RuntimeError("diverged")
    print(f"wall: {_t.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
