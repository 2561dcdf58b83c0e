"""1D planar shock propagating into a water mist (inert two-phase).

Role parity: /root/reference/examples/dfHighSpeedFoam/oneD_shockWaterMist —
dfHighSpeedFoam with chemistry OFF + basicSprayCloud: a Mach ~1.3 shock
(driver state 1.093 bar / 318 K / u = 125.076 m/s into quiescent air at
0.66 bar / 275 K, setFieldsDict) runs through a uniform fog of 2.4 um
water droplets (cloudPositions: one parcel every 5 mm over x in
[0, 1.1] m, nParticle 2.2e5, sphereDrag + RanzMarshall +
liquidEvaporationBoil, no breakup). Domain x in [-0.1, 1.1] m, 240 cells
(blockMeshDict, convertToMeters 0.01).

Physical checks: (a) the dry incident shock speed matches the
Rankine-Hugoniot value for the driver state; (b) in the fog the shock
decelerates and the pressure jump relaxes (momentum + heat + mass
exchange with the droplets) — the attenuation measured by Jourdan et al.
style fog experiments this case models.

Usage: python examples/shock_watermist_1d.py [--cells 240] [--dry]
       [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=240)
    ap.add_argument("--t-end", type=float, default=2.0e-3)
    ap.add_argument("--dry", action="store_true",
                    help="no mist: bare Rankine-Hugoniot check")
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--cfl", type=float, default=0.3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.lagrangian.cloud import ManualInjector, SprayCloud
    from deepflame_tpu.lagrangian.liquids import water
    from deepflame_tpu.mesh import StructuredMesh, zero_gradient, empty
    from deepflame_tpu.solvers.high_speed import (HighSpeedConfig,
                                                  HighSpeedSolver)
    from deepflame_tpu.solvers.spray import HighSpeedSpraySolver

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech, dtype)
    kin = make_kinetics(mech, dtype)
    tr = make_transport(mech, dtype)
    n = args.cells
    x_lo, x_hi = -0.1, 1.1
    Lx = x_hi - x_lo
    w = Lx / n
    mesh = StructuredMesh.box([Lx, w, w], [n, 1, 1])

    e = (empty(), empty())
    zg = (zero_gradient(), zero_gradient())
    b_scalar = (zg, e, e)
    cfg = HighSpeedConfig(flux="HLLC", rk_order=2, limiter="vanLeer",
                          chemistry="none")
    gas = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                          bcs_rho=b_scalar, bcs_U=(b_scalar,) * 3,
                          bcs_p=b_scalar, bcs_Y=b_scalar, config=cfg)

    # fog: one parcel per 5 mm over x in [0, 1.1] m of the PHYSICAL frame;
    # mesh frame is shifted by +0.1
    n_parcels = 220
    xs_p = 0.1 + 0.0025 + 0.005 * np.arange(n_parcels)
    half = 0.5 * w
    positions = np.stack([xs_p, np.full_like(xs_p, half),
                          np.full_like(xs_p, half)], axis=1)
    inj = ManualInjector(positions=positions, soi=0.0, d0=2.4e-6,
                         n_particle=2.2e5, T_inject=275.0,
                         rho_liquid=997.0)
    cloud = SprayCloud(mesh=mesh, liquid=water(), injector=inj,
                       max_parcels=n_parcels, evaporation="Spalding",
                       breakup="none", wall_interaction=())
    iH2O = mech.species_index("H2O")
    solver = HighSpeedSpraySolver(gas_solver=gas, cloud=cloud, transport=tr,
                                  vapor_index=int(iH2O))

    ns = mech.n_species
    iO2, iN2 = mech.species_index("O2"), mech.species_index("N2")
    Yv = np.zeros(ns)
    Yv[iO2], Yv[iN2] = 0.23149482, 0.76204518       # 0_orig air
    Yv /= Yv.sum()
    X, _, _ = mesh.cell_centers(dtype)
    Xphys = X - 0.1
    driver = Xphys < 0.0
    T = jnp.where(driver, 318.0, 275.0).astype(dtype)
    p = jnp.where(driver, 109312.5, 66000.0).astype(dtype)
    Y = jnp.asarray(np.tile(Yv[:, None, None, None], (1,) + mesh.shape),
                    dtype)
    u0 = jnp.asarray(np.where(np.asarray(driver), 125.076, 0.0), dtype)
    U0 = jnp.stack([u0, jnp.zeros_like(u0), jnp.zeros_like(u0)])
    if args.dry:
        s = gas.initial_state(p, T, Y, U=U0)
        stepper, prims = gas, gas.primitives
    else:
        s = solver.initial_state(p, T, Y, U=U0)
        stepper, prims = solver, (lambda st: gas.primitives(st.gas))

    dt = args.cfl * mesh.dx / 900.0
    n_steps = int(args.t_end / dt)
    out_every = max(n_steps // 40, 1)
    step = jax.jit(lambda st: stepper.step(st, dt)[0])
    xs = np.asarray(Xphys).squeeze()
    front_t, front_x = [], []
    t0, t_wall = 0.0, time.perf_counter()
    for i in range(n_steps):
        s = step(s)
        t0 += dt
        if (i + 1) % out_every == 0:
            _, _, p_n, T_n, _ = prims(s)
            p_np = np.asarray(p_n).squeeze()
            # shock position: steepest pressure gradient
            ix = int(np.argmin(np.diff(p_np)))
            front_t.append(t0)
            front_x.append(xs[ix])
            extra = ""
            if not args.dry:
                c = s.cloud
                m_liq = float(np.sum(np.pi / 6.0 * np.asarray(c.d) ** 3
                                     * 997.0 * np.asarray(c.n_part)
                                     * np.asarray(c.active)))
                extra = f"  liquid={m_liq*1e6:7.3f} mg"
            print(f"t={t0*1e3:7.3f} ms  shock={xs[ix]*1000:7.1f} mm  "
                  f"p_max={p_np.max()/1e3:7.2f} kPa  "
                  f"T_max={float(np.asarray(T_n).max()):6.1f} K{extra}",
                  flush=True)
            if not np.isfinite(p_np.max()):
                print("DIVERGED")
                return
    ft, fx = np.asarray(front_t), np.asarray(front_x)
    # Rankine-Hugoniot incident shock for the two uniform states: with
    # p2/p1 = 1.6563, gamma = 1.4, a1 = sqrt(1.4 * 287 * 275) = 332.4 m/s
    # -> Ms = sqrt((gamma+1)/(2 gamma) (p2/p1 - 1) + 1) = 1.256,
    # shock speed = 417 m/s
    sel = (fx > 0.1) & (fx < 1.0)
    if sel.sum() >= 4:
        v = np.polyfit(ft[sel], fx[sel], 1)[0]
        tag = "dry (RH value 417 m/s)" if args.dry else \
            "through fog (expect < dry 417 m/s: mist attenuation)"
        print(f"\nshock speed in x in [0.1, 1.0] m: {v:.1f} m/s — {tag}")
    print(f"wall time: {time.perf_counter() - t_wall:.1f}s "
          f"for {n_steps} steps")


if __name__ == "__main__":
    main()
