"""2D homogeneous-isotropic-turbulence flame (dfLowMachFoam twoD_HIT_flame
parity).

Role parity: /root/reference/examples/dfLowMachFoam/notorch/twoD_HIT_flame/
CH4 — a premixed CH4/air kernel burning through decaying 2D turbulence on a
1024x1024 fully-cyclic box (drm19 mechanism shipped in-case, dt 1e-6,
endTime 1e-3). The reference ships nonuniform T/CH4/N2/O2 initial fields
but no velocity (0/ has no U file; the case expects the user to supply
one), so the initial turbulence here is the standard Passot-Pouquet
spectrum E(k) ~ (k/k0)^4 exp(-2(k/k0)^2), solenoidal by construction,
scaled to a requested u' — the conventional HIT-flame initialization.

The shipped scalar fields are imported directly when --n 1024 (their native
resolution); other sizes synthesize the same configuration (circular burned
kernel in stoichiometric CH4/air).

Usage: python examples/hit_flame_2d.py [--n 256] [--steps 400]
       [--u-rms 2.0] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CASE = ("/root/reference/examples/dfLowMachFoam/notorch/twoD_HIT_flame/CH4")


def passot_pouquet_2d(n, L, u_rms, k0=8, seed=0):
    """Solenoidal 2D velocity field with the Passot-Pouquet spectrum."""
    rng = np.random.default_rng(seed)
    k1 = np.fft.fftfreq(n, d=1.0 / n)
    KX, KY = np.meshgrid(k1, k1, indexing="ij")
    K = np.sqrt(KX**2 + KY**2)
    E = (K / k0) ** 4 * np.exp(-2.0 * (K / k0) ** 2)
    phase = np.exp(2j * np.pi * rng.random((n, n)))
    # stream function -> solenoidal u = (d psi/dy, -d psi/dx)
    psi_hat = np.sqrt(np.maximum(E, 0.0)) / np.maximum(K, 1e-10) * phase
    psi_hat[0, 0] = 0.0
    two_pi_L = 2.0 * np.pi / L
    u = np.real(np.fft.ifft2(1j * KY * two_pi_L * psi_hat))
    v = np.real(np.fft.ifft2(-1j * KX * two_pi_L * psi_hat))
    rms = np.sqrt(np.mean(u**2 + v**2) / 2.0)
    s = u_rms / max(rms, 1e-30)
    return u * s, v * s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--dt", type=float, default=1e-6)
    ap.add_argument("--u-rms", type=float, default=2.0)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--les", default="Sigma", help="SGS model (or 'none')")
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
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.runtime.openfoam_io import read_case_fields

    mech = load_mechanism(os.path.join(CASE, "drm19.yaml"))
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)

    n = args.n
    L = 0.01                       # blockMeshDict: 1 cm box
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))

    ns = mech.n_species
    if n == 1024:                  # shipped fields at native resolution
        f = read_case_fields(CASE, "0", ["T", "CH4", "N2", "O2"], (n, n, 1))
        T0 = f["T"]
        Y = np.zeros((ns, n, n, 1))
        Y[mech.species_index("CH4")] = f["CH4"]
        Y[mech.species_index("O2")] = f["O2"]
        Y[mech.species_index("N2")] = f["N2"]
    else:                          # same configuration, synthesized
        X, Yg, _ = (np.asarray(c) for c in mesh.cell_centers())
        r = np.sqrt((X - L / 2) ** 2 + (Yg - L / 2) ** 2)
        burned = 0.5 * (1.0 - np.tanh((r - L / 8) / (L / 64)))
        T0 = 300.0 + burned * 1900.0
        Y = np.zeros((ns, n, n, 1))
        # stoichiometric CH4/air
        Y[mech.species_index("CH4")] = 0.0552 * (1.0 - burned)
        Y[mech.species_index("O2")] = 0.22 * (1.0 - burned) + 0.0 * burned
        Y[mech.species_index("CO2")] = 0.1514 * burned
        Y[mech.species_index("H2O")] = 0.124 * burned
        Y[mech.species_index("N2")] = 1.0 - Y.sum(axis=0)
    Y = np.clip(Y, 0.0, 1.0)
    Y /= Y.sum(axis=0, keepdims=True)

    u, v = passot_pouquet_2d(n, L, args.u_rms)
    U0 = np.zeros((3, n, n, 1))
    U0[0, :, :, 0] = u
    U0[1, :, :, 0] = v

    turbulence = None
    if args.les != "none":
        import deepflame_tpu.turbulence as turb
        turbulence = {"Sigma": turb.sigma_model, "WALE": turb.wale,
                      "Smagorinsky": turb.smagorinsky,
                      "dynSmagorinsky": turb.dynamic_smagorinsky}[args.les]()
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=1e-6 if args.dtype == "f64" else 1e-4,
        atol=1e-10 if args.dtype == "f64" else 1e-8, max_steps=10000))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))),
        turbulence=turbulence)
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
            print(f"t={float(s.time)*1e3:7.4f} ms  "
                  f"T=[{float(s.T.min()):6.1f},{float(s.T.max()):7.1f}] "
                  f"fuel={burn/burn0:.4f} "
                  f"u_rms={float(jnp.sqrt(jnp.mean(jnp.sum(s.U**2, 0)/2))):.3f}",
                  flush=True)
            if not np.isfinite(float(s.T.max())):
                raise RuntimeError("diverged")
    print(f"wall: {_t.perf_counter() - t0:.1f}s  "
          f"fuel consumed: {100*(1-burn/burn0):.1f}%")


if __name__ == "__main__":
    main()
