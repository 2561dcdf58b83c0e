"""2D temporally evolving planar CH4 jet (dfLowMachFoam
twoD_temporally_evolving_jet parity).

Role parity: /root/reference/examples/dfLowMachFoam/notorch/
twoD_temporally_evolving_jet/CH4 — a fresh CH4/air slab (900 K, u~+34 m/s
with seeded fluctuations) shearing against hot equilibrium products
(2500 K, u=-84 m/s) on a 16x16 mm box, cyclic in x, zeroGradient in y
(system/setFieldsDict gives the two states; 0/U.gz carries the seeded
jet-slab perturbations, ambient -84 m/s; drm19 mechanism, dt 1e-9..adaptive,
endTime 1e-4). The Kelvin-Helmholtz rollup ignites the slab against the
hot products — a canonical DNS configuration for autoignition in shear.

The reference mesh is 800x550 with y-grading focused on the shear layers
(blockMeshDict multi-section simpleGrading); by default this script runs
the same physical configuration on a reduced uniform grid (the structured
backend), which resolves the rollup at 256^2. Initial perturbations are
seeded white-in-band fluctuations with the shipped file's measured
amplitudes (u' ~ 10 m/s, v' ~ 8 m/s inside the slab).

Usage: python examples/temporal_jet_2d.py [--n 256] [--steps 400]
       [--dt 2e-8] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CASE = ("/root/reference/examples/dfLowMachFoam/notorch/"
        "twoD_temporally_evolving_jet/CH4")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="cells per side")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--dt", type=float, default=2e-8)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty, zero_gradient
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

    mech = load_mechanism(os.path.join(CASE, "drm19.yaml"))
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)

    n = args.n
    L = 0.016                       # blockMeshDict: 16 mm box
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (zero_gradient(), zero_gradient()),
         (empty(), empty()))

    ns = mech.n_species
    X, Yg, _ = (np.asarray(c) for c in mesh.cell_centers())
    # jet slab: y in [7.5, 8.5] mm (setFieldsDict boxToCell), smoothed over
    # ~2 cells so the shear layer is grid-resolved
    d = L / n
    slab = (0.5 * (1.0 + np.tanh((Yg - 0.0075) / (1.5 * d)))
            * 0.5 * (1.0 + np.tanh((0.0085 - Yg) / (1.5 * d))))

    T0 = 2500.0 + slab * (900.0 - 2500.0)
    Y = np.zeros((ns, n, n, 1))
    Y[mech.species_index("CH4")] = 0.0552 * slab
    Y[mech.species_index("O2")] = 0.2201 * slab
    Y[mech.species_index("H2O")] = 0.1239 * (1.0 - slab)
    Y[mech.species_index("CO2")] = 0.1514 * (1.0 - slab)
    Y[mech.species_index("N2")] = 1.0 - Y.sum(axis=0)
    Y = np.clip(Y, 0.0, 1.0)
    Y /= Y.sum(axis=0, keepdims=True)

    # velocities: ambient -84 m/s, slab mean +33.6 m/s with seeded
    # fluctuations (measured from the shipped 0/U: u' ~ 10, v' ~ 8 m/s)
    rng = np.random.default_rng(7)
    up = rng.normal(0.0, 10.0, (n, n, 1))
    vp = rng.normal(0.0, 8.0, (n, n, 1))
    U0 = np.zeros((3, n, n, 1))
    U0[0] = -84.0 + slab * (33.6 + 84.0 + up)
    U0[1] = slab * vp

    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=1e-6 if args.dtype == "f64" else 1e-4,
        atol=1e-10 if args.dtype == "f64" else 1e-8, max_steps=10000))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))))
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0, dtype),
                             jnp.asarray(T0, dtype), jnp.asarray(Y, dtype),
                             jnp.asarray(U0, dtype))

    dt = args.dt
    step = jax.jit(lambda st: solver.step(st, dt)[0])
    import time as _t
    t0 = _t.perf_counter()
    out = max(args.steps // 20, 1)
    iCH4 = mech.species_index("CH4")
    burn0 = float(jnp.sum(s.rho * s.Y[iCH4]))
    for i in range(args.steps):
        s = step(s)
        if (i + 1) % out == 0:
            burn = float(jnp.sum(s.rho * s.Y[iCH4]))
            # slab growth: momentum-thickness-like integral of the shear
            ux_mean = np.asarray(s.U[0]).mean(axis=0)[:, 0]
            width = float(np.sum((ux_mean - ux_mean.min())
                                 / max(ux_mean.max() - ux_mean.min(), 1e-9)
                                 > 0.1) * d * 1e3)
            print(f"t={float(s.time)*1e6:7.3f} us  "
                  f"T=[{float(s.T.min()):6.1f},{float(s.T.max()):7.1f}] "
                  f"fuel={burn/burn0:.4f}  jet width~{width:.2f} mm",
                  flush=True)
            if not np.isfinite(float(s.T.max())):
                raise RuntimeError("diverged")
    print(f"wall: {_t.perf_counter() - t0:.1f}s  "
          f"fuel consumed: {100*(1-float(jnp.sum(s.rho*s.Y[iCH4]))/burn0):.1f}%")


if __name__ == "__main__":
    main()
