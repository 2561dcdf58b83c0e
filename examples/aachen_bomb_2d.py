"""2D aachenBomb n-heptane spray combustion — reference-case parity anchor.

Role parity: /root/reference/test/aachenBomb_2D (dfLowMachFoam + spray).
Every case parameter below is read off the reference dicts:
  - mesh 41 x 100 cells over x in [-10, 10] mm, y in [0, 100] mm, 2 um (!)
    empty thickness (system/blockMeshDict: z = +-1e-3 with convertToMeters
    0.001 — the slab is TWO MICROMETERS; with massTotal 8e-8 kg the injected
    fuel equals the chamber's entire gas mass, i.e. the case is globally
    ~14x rich and spray sources dominate the gas), walls all around
  - ICs T = 800 K, p = 5 MPa, U = 0, k = 1, eps = 90, kEpsilon RAS
    (0/*, constant/turbulenceProperties)
  - coneInjection at (0, 99.5 mm), direction -y, thetaOuter 10 deg,
    massTotal 8e-8 kg over 1.25 ms with the tabulated flowRateProfile,
    flowRateAndDischarge (Cd 0.9, dOuter 1.2e-4), RosinRammler
    (d 1.5e-4, n 3, range [1e-6, 1.5e-4]), T0 380 K, liquidEvaporationBoil,
    RanzMarshall, sphereDrag, ReitzDiwakar, wall rebound
    (constant/sprayCloudProperties)
  - C7H16 one-step mechanism, CVODE rtol 1e-6 / atol 1e-10
    (constant/CanteraTorchProperties)
  - dt 2.5e-6 s, endTime 2.3 ms (system/controlDict)

The reference CI reads T at 4 stations of a 100-point y-line sample at
x = 0 (floats 158/168/174/192 of data_T.xy => points i = 78/83/86/95,
y = i * 0.1/99) at t = 2.3 ms and asserts 809.163 / 1793.4 / 908.059 /
2493.09 K (corrtest.cpp:41-44,73-78 — note the 1e-4 tolerance there is a
bit-reproducibility check of the SAME binary, not a discretization-
independent target; deviations here measure physics parity).

Usage: python examples/aachen_bomb_2d.py [--dtype f32] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# system/sample: lineUniform x=0, y 0..0.1, 100 pts; corrtest float indices
STATIONS_I = [78, 83, 86, 95]
ANCHORS = [809.163, 1793.4, 908.059, 2493.09]

# constant/sprayCloudProperties flowRateProfile (relative rates)
FLOW_PROFILE = (
    (0.0, 0.1272), (4.16667e-05, 6.1634), (8.33333e-05, 9.4778),
    (0.000125, 9.5806), (0.000166667, 9.4184), (0.000208333, 9.0926),
    (0.00025, 8.7011), (0.000291667, 8.2239), (0.000333333, 8.0401),
    (0.000375, 8.8450), (0.000416667, 8.9174), (0.000458333, 8.8688),
    (0.0005, 8.8882), (0.000541667, 8.6923), (0.000583333, 8.0014),
    (0.000625, 7.2582), (0.000666667, 7.2757), (0.000708333, 6.9680),
    (0.00075, 6.7608), (0.000791667, 6.6502), (0.000833333, 6.7695),
    (0.000875, 5.5774), (0.000916667, 4.8649), (0.000958333, 5.0805),
    (0.001, 4.9547), (0.00104167, 4.5613), (0.00108333, 4.4536),
    (0.001125, 5.2651), (0.00116667, 5.2560), (0.00120833, 5.1737),
    (0.00125, 3.9213), (0.001251, 0.0),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=2.3e-3)
    ap.add_argument("--dt", type=float, default=2.5e-6)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--rtol", type=float, default=None)
    ap.add_argument("--out", default="postProcessing_aachen")
    ap.add_argument("--breakup", default="ReitzDiwakar",
                    help="ReitzDiwakar (case dict) | KHRT | none — "
                    "penetration-sensitivity falsification knob")
    ap.add_argument("--film-w", type=float, default=2.0 / 3.0,
                    help="film-T blend weight on droplet T (2/3 rule "
                    "default; sensitivity knob for the station-2 "
                    "falsification)")
    ap.add_argument("--mass-first", action="store_true",
                    help="v1.4 parcel update order: phase change before "
                         "drag (README.md:31)")
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
    from deepflame_tpu.lagrangian.cloud import ConeInjector, SprayCloud
    from deepflame_tpu.lagrangian.liquids import n_heptane
    from deepflame_tpu.mesh import StructuredMesh, fixed_value, \
        zero_gradient, empty
    from deepflame_tpu.runtime import Probes, FunctionObjectSet
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.solvers.spray import SpraySolver
    from deepflame_tpu.turbulence import KEpsilon

    mech = load_mechanism(
        "/root/reference/test/aachenBomb_2D/C7_oneStep.yaml")
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    # blockMeshDict: x 41 cells over [-10, 10] mm; y 100 cells over
    # [0, 100] mm; 2 mm empty z
    nx, ny = 41, 100
    # z span 2 um: blockMeshDict vertices +-1e-3 * convertToMeters 0.001
    mesh = StructuredMesh.box([0.02, 0.1, 2e-6], [nx, ny, 1],
                              origin=(-0.01, 0.0, -1e-6))
    e = (empty(), empty())
    wall_s = (zero_gradient(), zero_gradient())
    b_s = (wall_s, wall_s, e)                       # scalars: zeroGradient
    wall_u = (fixed_value(0.0), fixed_value(0.0))   # no-slip walls
    b_u = (wall_u, wall_u, e)
    rtol = args.rtol or (1e-6 if args.dtype == "f64" else 1e-4)
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=rtol, atol=1e-10 if args.dtype == "f64" else 1e-8,
        max_steps=20000, grow=10.0))
    gas_solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b_u, b_u, b_u), bcs_p=b_s, bcs_h=b_s, bcs_Y=b_s, bcs_rho=b_s,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))),
        turbulence=KEpsilon())
    liq = n_heptane()
    rho_l_inj = float(liq.rho(380.0))
    inj = ConeInjector(
        position=(0.0, 0.0995, 0.0), direction=(0.0, -1.0, 0.0),
        cone_angle_deg=20.0,                 # full angle = 2 x thetaOuter
        t_start=0.0, t_end=1.25e-3, T_inject=380.0,
        mdot_profile=FLOW_PROFILE, mass_total=8e-8,
        size_dist="RosinRammler", rr_d=1.5e-4, rr_n=3.0,
        rr_min=1e-6, rr_max=1.5e-4,
        u_from_flow=True, Cd=0.9, d_outer=1.2e-4, rho_liquid=rho_l_inj,
        parcels_per_step=50)                 # parcelsPerSecond 2e7 * dt
    rebound = tuple((ax, side, "rebound") for ax in (0, 1) for side in (0, 1))
    cloud = SprayCloud(mesh=mesh, liquid=liq, injector=inj,
                       mass_first=args.mass_first, film_w=args.film_w,
                       max_parcels=32768, evaporation="Spalding",
                       breakup=args.breakup, wall_interaction=rebound)
    iF = mech.species_index("C7H16")
    solver = SpraySolver(gas_solver=gas_solver, cloud=cloud, fuel_index=iF)

    ns = mech.n_species
    Y = np.zeros((ns,) + mesh.shape)
    Y[mech.species_index("O2")] = 0.23
    Y[mech.species_index("N2")] = 0.77
    # 0/T, 0/p: 800 K, 5 MPa; 0/k = 1, 0/epsilon = 90
    s = solver.initial_state(jnp.full(mesh.shape, 5e6, dtype),
                             jnp.full(mesh.shape, 800.0, dtype),
                             jnp.asarray(Y, dtype))
    s = s._replace(gas=gas_solver.initial_state(
        jnp.full(mesh.shape, 5e6, dtype), jnp.full(mesh.shape, 800.0, dtype),
        jnp.asarray(Y, dtype), k0=1.0, eps0=90.0))

    stations = [(0.0, i * 0.1 / 99, 0.0) for i in STATIONS_I]
    probes = Probes(mesh, stations, ["T"], out_dir=f"{args.out}/probes")
    fos = FunctionObjectSet([probes])

    dt = args.dt
    n_steps = int(round(args.t_end / dt))
    step = jax.jit(lambda st: solver.step(st, dt))
    import time as _t
    t0 = _t.perf_counter()
    for i in range(n_steps):
        s, diag = step(s)
        if (i + 1) % 40 == 0:
            fos(float(s.gas.time), {"T": np.asarray(s.gas.T)})
            act = np.asarray(s.cloud.active) > 0
            tip = float(np.asarray(s.cloud.pos[1])[act].min()) * 1e3 \
                if act.any() else float("nan")
            vy = np.asarray(s.gas.U[1, nx // 2, :, 0])
            Yf = np.asarray(s.gas.Y[iF, nx // 2, :, 0])
            vap = np.where(Yf > 0.005)[0]
            y_vap = (vap[0] * 0.1 / ny + 0.05 / ny) * 1e3 if vap.size \
                else float("nan")
            print(f"t={float(s.gas.time)*1e3:7.3f} ms  "
                  f"T=[{float(s.gas.T.min()):6.1f},{float(s.gas.T.max()):7.1f}] "
                  f"parcels={int(diag['cloud_n_active'])} "
                  f"liq={float(diag['cloud_liquid_mass'])*1e6:8.4f} mg "
                  f"inj={float(s.cloud.m_injected)*1e6:7.4f} mg "
                  f"Yf_max={float(s.gas.Y[iF].max()):.4f} "
                  f"tip={tip:5.1f} mm vap={y_vap:5.1f} mm "
                  f"w_jet={vy.min():6.2f} m/s", flush=True)
    fos.write()
    Tn = np.asarray(s.gas.T)
    print(f"wall: {_t.perf_counter() - t0:.1f}s")
    # reference-matched sampling (system/sample): lineUniform x=0, 100 pts
    # over y in [0, 0.1], interpolated from the x = 0 cell column (the TGV
    # anchor showed matched sampling matters in steep gradients)
    ix0 = nx // 2                                   # x = 0 column (odd nx)
    y_cells = (np.arange(ny) + 0.5) * 0.1 / ny
    T_col = Tn[ix0, :, 0]
    y_line = np.arange(100) * 0.1 / 99
    T_line = np.interp(y_line, y_cells, T_col)
    os.makedirs(args.out, exist_ok=True)
    np.savetxt(os.path.join(args.out, "data_T.xy"),
               np.stack([y_line, T_line], 1), fmt="%.6g")
    print("y-profile (x=0): " + " ".join(
        f"{y_line[i]*1e3:.0f}mm:{T_line[i]:.0f}" for i in range(55, 100, 4)))
    print("station results at t = %.4f ms:" % (float(s.gas.time) * 1e3))
    for k, (i_st, ref) in enumerate(zip(STATIONS_I, ANCHORS)):
        Tk = float(T_line[i_st])
        Tp = float(Tn[probes.idx[k]])
        print(f"  y={i_st * 0.1 / 99 * 1e3:6.2f} mm: T = {Tk:8.2f} K "
              f"(cell {Tp:8.2f}) | reference {ref:8.2f} K  "
              f"dev {100 * (Tk - ref) / ref:+7.2f}%")


if __name__ == "__main__":
    main()
