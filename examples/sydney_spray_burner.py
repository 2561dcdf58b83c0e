"""Sydney dilute spray burner (ethanol) on the REFERENCE's real mesh:
Euler-Lagrangian spray + k-epsilon RAS + 34-species ethanol chemistry on
the 6-block axisymmetric wedge, face-list backend with the overlay spray
adapter.

Role parity: /root/reference/examples/dfSprayFoam/sydneySprayBurner — the
only dfSprayFoam case on a non-box mesh, exercising patchInjection +
RosinRammler + stochasticDispersionRAS + ReitzDiwakar + gravity together.
Every case parameter is read off the reference dicts:
  - mesh: system/blockMeshDict (6-block wedge, r 0..104 mm, z -50..500 mm,
    graded), ingested directly by mesh/blockmesh.py
  - streams (0/U, 0/T, 0/<species>): fuel jet 24 m/s @ 267 K carrying
    Y(C2H5OH)=0.056 vapor (O2 0.220, N2 0.724); hot pilot 11.6 m/s @
    2493 K of burnt products (CO2 0.20, H2O 0.082, N2 0.718); air coflow
    4.5 m/s @ 293 K
  - spray (constant/sprayCloudProperties): patchInjection on inletFuel,
    massTotal 0.24e-3 kg over 1 s, U0 (0 0 24), T0 267 K, RosinRammler
    d=20 um n=3 in [5, 100] um, sphereDrag + gravity (0 0 -9.81),
    RanzMarshall, liquidEvaporation (ethanol), ReitzDiwakar breakup,
    stochasticDispersionRAS
  - turbulence: kEpsilon; k inlets 0.1125 / internal 3.6; epsilon inlets
    13.95 / internal 1527 (0/k, 0/epsilon)
  - chemistry: laminar finite-rate, ethanol66.yaml (34 species / 69
    reactions, parsed by chemistry/mechanism.py), inert N2
    (constant/CanteraTorchProperties)
  - dt 2e-7, endTime 0.15 s (system/controlDict) — this example defaults
    to a short window (20 ms) with dt 2e-6 for a tractable demonstration;
    pass --t-end 0.15 --dt 2e-7 for the full reference envelope

The Lagrangian phase runs through lagrangian/overlay.py: parcels live on a
uniform background grid over the wedge's bounding box (O(1) jittable
locate) and exchange mass/momentum/energy with the face-list gas solver
through conservative segment-sum reduction — the TPU-native replacement
for the reference's face-walking particle::trackToFace.

Usage: python examples/sydney_spray_burner.py [--chemistry] [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CASE = "/root/reference/examples/dfSprayFoam/sydneySprayBurner"
R_GAS = 8314.462618


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=0.02)
    ap.add_argument("--dt", type=float, default=2e-6)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--chemistry", action="store_true",
                    help="finite-rate ethanol66 chemistry (reference "
                         "combustionModel laminar); default runs the "
                         "evaporating-spray flow inert")
    ap.add_argument("--parcels-per-step", type=int, default=4)
    ap.add_argument("--max-parcels", type=int, default=16384)
    ap.add_argument("--out", default="postProcessing_sydney")
    ap.add_argument("--les", default=None,
                    choices=["Smagorinsky", "WALE", "Sigma"],
                    help="run LES SGS instead of the k-epsilon RAS (the "
                         "reference's LES family on general meshes, "
                         "src/TurbulenceModels Sigma.H:28-44)")
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.combustion import Laminar, NoCombustion
    from deepflame_tpu.lagrangian.cloud import PatchFuncInjector, SprayCloud
    from deepflame_tpu.lagrangian.liquids import ethanol
    from deepflame_tpu.lagrangian.overlay import OverlaySprayCloud
    from deepflame_tpu.mesh import BC, fixed_value, zero_gradient
    from deepflame_tpu.mesh.blockmesh import read_blockmesh
    from deepflame_tpu.solvers.low_mach import LowMachConfig
    from deepflame_tpu.solvers.low_mach_fl import LowMachSolverFL
    from deepflame_tpu.solvers.spray import SprayFLSolver
    from deepflame_tpu.turbulence.les import LESModel
    from deepflame_tpu.turbulence.wall_functions_fl import \
        make_wall_functions_fl

    mech = load_mechanism(os.path.join(CASE, "ethanol66.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    ns = mech.n_species
    print(f"mechanism: {ns} species / {mech.n_reactions} reactions")

    gm = read_blockmesh(os.path.join(CASE, "system/blockMeshDict"))
    print(f"mesh: {gm.n_cells} cells, patches {gm.patch_names}")
    names = gm.patch_names
    zg = zero_gradient()

    def spc(i):
        return mech.species_index(i)

    # stream compositions (0/<species>)
    def composition(vals):
        Y = np.zeros(ns)
        for sp, v in vals.items():
            Y[spc(sp)] = v
        return Y

    Y_fuel = composition({"C2H5OH": 0.056, "O2": 0.220, "N2": 0.724})
    Y_pilot = composition({"CO2": 0.20, "H2O": 0.082, "N2": 0.718})
    Y_air = composition({"O2": 0.233, "N2": 0.767})
    T_in = {"inletFuel": 267.0, "inletPilot": 2493.0, "inletAir": 293.0}
    U_in = {"inletFuel": 24.0, "inletPilot": 11.6, "inletAir": 4.5}
    Y_in = {"inletFuel": Y_fuel, "inletPilot": Y_pilot, "inletAir": Y_air}

    def sbc(vals, outlet=None):
        d = {n: zg for n in names}
        d.update({k: fixed_value(v) for k, v in vals.items()})
        if outlet is not None:
            d["outlet"] = BC("inletOutlet", outlet)
        return d

    # p: totalPressure outlet ~ fixed static at low Mach
    bc_p = {n: zg for n in names}
    bc_p["outlet"] = fixed_value(1e5)

    # U: fixed axial inlets, noSlip walls, pressureInletOutletVelocity
    # outlet (zeroGradient on outflow)
    def u_bcs(c):
        d = {}
        for n in names:
            if n in U_in:
                d[n] = fixed_value(U_in[n] if c == 2 else 0.0)
            elif n.startswith("wall"):
                d[n] = fixed_value(0.0)
            else:
                d[n] = zg
        return d

    # h: fixed inlet enthalpy from the stream (T, Y) state
    def h_of(T, Y):
        return float(th.h_mass(jnp.asarray([T], jnp.float64),
                               jnp.asarray(Y, jnp.float64)[None, :])[0])

    bc_h = sbc({n: h_of(T_in[n], Y_in[n]) for n in T_in})

    # rho: inlet-state density (ideal gas at the stream state)
    def rho_of(T, Y):
        W = 1.0 / np.sum(np.asarray(Y) / np.asarray(mech.molecular_weights))
        return 1e5 * W / (R_GAS * T)

    bc_rho = sbc({n: rho_of(T_in[n], Y_in[n]) for n in T_in})

    # per-species Y BCs: group species by their (fuel, pilot, air) inlet
    # triple so each distinct composition costs one vmapped group
    triples = {}
    for i in range(ns):
        key = (float(Y_fuel[i]), float(Y_pilot[i]), float(Y_air[i]))
        triples.setdefault(key, []).append(i)
    groups = []
    for (vf, vp, va), idx in triples.items():
        bc = sbc({"inletFuel": vf, "inletPilot": vp, "inletAir": va})
        groups.append((gm.with_bcs(bc, dtype), tuple(idx)))
    print(f"species BC groups: {len(groups)} "
          f"(sizes {[len(g[1]) for g in groups]})")

    # k / epsilon (0/k, 0/epsilon)
    bc_k = sbc({n: 0.1125 for n in U_in})
    bc_eps = sbc({n: 13.95 for n in U_in})

    wf = make_wall_functions_fl(gm, ("wallTube", "wallOutside"), dtype)

    if args.chemistry:
        comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
            rtol=1e-4, atol=1e-8, max_steps=2000, grow=10.0))
    else:
        comb = NoCombustion(th, kin)
    cfg = LowMachConfig(chemistry=args.chemistry,
                        inert_index=int(spc("N2")),
                        div_scheme="limitedLinear",
                        gravity=(0.0, 0.0, -9.81),
                        p_tol=3e-9, p_rel_tol=1e-3, max_iter_p=3000,
                        use_pallas="never")

    gas = LowMachSolverFL(
        m_p=gm.with_bcs(bc_p, dtype),
        m_h=gm.with_bcs(bc_h, dtype),
        m_Y=groups[0][0],
        m_Y_groups=tuple(groups),
        m_rho=gm.with_bcs(bc_rho, dtype),
        m_U=tuple(gm.with_bcs(u_bcs(c), dtype) for c in range(3)),
        m_k=None if args.les else gm.with_bcs(bc_k, dtype),
        m_eps=None if args.les else gm.with_bcs(bc_eps, dtype),
        thermo=th, transport=tr, combustion=comb, config=cfg,
        wall_fns=None if args.les else wf,
        les=(LESModel(kind=args.les) if args.les else None))

    # ===== spray: patchInjection on inletFuel (r < 5.25 mm disc at
    # z = -50 mm), area-weighted radial placement on the wedge
    liq = ethanol()
    inj = PatchFuncInjector(
        lo=(0.0, 0.0, -0.0499), hi=(0.00525, 0.0, -0.0499),
        radial_axis=0,
        u_const=(0.0, 0.0, 24.0),
        mdot=0.24e-3, t_start=0.0, t_end=1.0,
        T_inject=267.0,
        size_dist="RosinRammler", rr_d=2e-5, rr_n=3.0,
        rr_min=5e-6, rr_max=1e-4,
        parcels_per_step=args.parcels_per_step)
    ctr = np.asarray(gm.centers)
    vol = np.asarray(gm.volumes)
    spray_kwargs = dict(
        liquid=liq, injector=inj, max_parcels=args.max_parcels,
        evaporation="Spalding", drag="SchillerNaumann",
        gravity=(0.0, 0.0, -9.81), breakup="ReitzDiwakar",
        dispersion=True)
    over = OverlaySprayCloud.build(ctr, vol, spray_kwargs,
                                   resolution=(128, 1, 256))
    sol = SprayFLSolver(gas_solver=gas, cloud=over,
                        fuel_index=int(spc("C2H5OH")))

    n = gm.n_cells
    Y0 = np.broadcast_to(Y_air, (n, ns)).copy()
    U0 = np.zeros((n, 3))
    U0[:, 2] = 4.5
    s = sol.initial_state(jnp.asarray(np.full(n, 1e5), dtype),
                          jnp.asarray(np.full(n, 293.0), dtype),
                          jnp.asarray(Y0, dtype), jnp.asarray(U0, dtype),
                          key=jax.random.PRNGKey(0), k0=3.6, eps0=1527.0)

    # axial stations for the jet development (z/D profiles are the Sydney
    # burner's published observable; D_jet = 10.5 mm)
    axis_sel = ctr[:, 0] < 0.0006
    z_axis = ctr[axis_sel, 2]
    ax_order = np.argsort(z_axis)
    z_st = np.array([0.0, 0.05, 0.1, 0.2, 0.3, 0.4])

    def stations(state, f):
        v = np.asarray(f, np.float64)[axis_sel]
        return np.interp(z_st, z_axis[ax_order], v[ax_order])

    os.makedirs(args.out, exist_ok=True)
    dt = args.dt
    n_steps = int(round(args.t_end / dt))
    step = jax.jit(lambda st: sol.step(st, dt))
    import time as _t
    t0 = _t.perf_counter()
    log_every = max(n_steps // 50, 1)
    iF = int(spc("C2H5OH"))
    for i in range(n_steps):
        s, dg = step(s)
        if (i + 1) % log_every == 0:
            g = s.gas
            Tst = stations(s, g.T)
            print(f"t={float(g.time)*1e3:7.3f} ms  "
                  f"T=[{float(g.T.min()):6.1f},{float(g.T.max()):7.1f}] "
                  f"Yf_max={float(g.Y[:, iF].max()):.4f} "
                  f"w_max={float(g.U[:, 2].max()):5.1f} "
                  f"k_max={float(dg.get('k_max', 0.0)):.2f} "
                  f"parcels={int(dg['cloud_n_active'])} "
                  f"liq={float(dg['cloud_liquid_mass'])*1e6:.3f} mg  "
                  f"T_axis: " + " ".join(f"{v:.0f}" for v in Tst),
                  flush=True)
            if not np.isfinite(float(g.T.max())):
                raise RuntimeError("diverged")
    print(f"wall: {_t.perf_counter() - t0:.1f}s")

    g = s.gas
    np.savez(os.path.join(args.out, "fields.npz"),
             ctr=ctr, T=np.asarray(g.T), Y_fuel=np.asarray(g.Y[:, iF]),
             U=np.asarray(g.U), rho=np.asarray(g.rho),
             k=np.asarray(g.turb[0]) if g.turb else np.zeros(0),
             eps=np.asarray(g.turb[1]) if g.turb else np.zeros(0),
             parcel_pos=np.asarray(s.cloud.pos),
             parcel_d=np.asarray(s.cloud.d),
             parcel_active=np.asarray(s.cloud.active))
    print("saved", os.path.join(args.out, "fields.npz"))


if __name__ == "__main__":
    main()
