"""Sandia flame D on the REFERENCE's real mesh: flareFGM + k-epsilon on the
6-block graded axisymmetric wedge, face-list backend.

Role parity: /root/reference/test/dfLowMachFoam/twoD_SandiaD_flareFGM ==
examples/dfLowMachFoam/fgm/twoD_SandiaD_flareFGM (same blockMeshDict).
Every case parameter is read off the reference dicts:
  - mesh: system/blockMeshDict (ingested directly by mesh/blockmesh.py)
  - U: jet 49.6 / pilot 11.4 / coflow 0.9 m/s axial (0/U)
  - Z: jet 0.1561, pilot 0.042944785, air 0 on the PURE-CH4 mixture-fraction
    basis (0/Z); this repo's generated table uses the JET stream (25% CH4 /
    75% air by volume) as Z=1, so the BCs are rescaled by 1/0.1561
  - c: pilot 1 (burnt), others 0 (0/c); scaledPV true
  - k: internal 30, inlets 1; epsilon: internal 30000, inlets 1 (0/k, 0/eps)
  - T inlets 294 K; p 1e5 Pa outlet; kEpsilon RAS
    (constant/turbulenceProperties)
  - flareFGMCoeffs: solveEnthalpy true, Sct 0.7
    (constant/combustionProperties)
  - dt 1e-5, endTime 1.1 s (system/controlDict); the CI reads T at 11
    axis stations z = 0..0.5 m at t = 1.1 s (system/sample,
    corrtest.cpp:59-71: 307.94 ... 1983.34 ... 1081.90 K)

Usage: python examples/sandia_d_wedge_fgm.py [--t-end 1.1] [--platform cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DICT = ("/root/reference/examples/dfLowMachFoam/fgm/twoD_SandiaD_flareFGM/"
        "system/blockMeshDict")
TBL = os.path.join(os.path.dirname(__file__), "..", "data",
                   "flare_CH4_drm19_SandiaD_4D.tbl")
Z_JET_REF = 0.1561            # 0/Z inletCH4 (pure-CH4 basis)
Z_PILOT_REF = 0.042944785276073615
ANCHORS = [307.93594, 311.34987, 378.77716, 658.02573, 1106.6115,
           1543.0465, 1888.2342, 1983.3421, 1797.2623, 1488.0969, 1081.8983]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", default=TBL)
    ap.add_argument("--t-end", type=float, default=1.1)
    ap.add_argument("--dt", type=float, default=1e-5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--n-outer", type=int, default=1)
    ap.add_argument("--div-u", default="limitedLinear")
    ap.add_argument("--out", default="postProcessing_sandia")
    ap.add_argument("--ras", default="RNG", choices=["RNG", "standard"],
                    help="RAS model; the case dict specifies RNGkEpsilon "
                         "(constant/turbulenceProperties:23-28)")
    ap.add_argument("--c1", type=float, default=None,
                    help="override C_eps1 (case dict: RNG C1 1.52)")
    ap.add_argument("--deepfgm", action="store_true",
                    help="DeePFGM parity: distill the table into an NN and "
                         "run the manifold through it (twoD_SandiaD_DeePFGM)")
    ap.add_argument("--restore", default=None,
                    help="resume from a checkpoint.npz written by a prior "
                         "run (startFrom latestTime parity)")
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.combustion.fgm.table import read_flare_table
    from deepflame_tpu.mesh import zero_gradient, fixed_value
    from deepflame_tpu.mesh.blockmesh import read_blockmesh
    from deepflame_tpu.solvers.fgm import FGMConfig
    from deepflame_tpu.solvers.fgm_fl import FGMSolverFL

    table = read_flare_table(args.table, dtype=dtype)
    meta = json.load(open(args.table + ".json"))
    print(f"table {os.path.basename(args.table)}: Z_st = {meta['Z_st']:.4f} "
          f"(jet-stream basis)")
    gm = read_blockmesh(DICT)
    print(f"mesh: {gm.n_cells} cells, {gm.owner.shape[0]} interior faces, "
          f"patches {gm.patch_names}")

    zg = zero_gradient()
    names = gm.patch_names

    def sbc(vals):
        d = {n: zg for n in names}
        d.update({k: fixed_value(v) for k, v in vals.items()})
        return d

    # 0/Z values rescaled to the generated table's jet-stream Z basis
    z_jet, z_pilot = 1.0, Z_PILOT_REF / Z_JET_REF
    bc_p = {n: zg for n in names}
    bc_p["outlet"] = fixed_value(1e5)
    bc_Z = sbc({"inletCH4": z_jet, "inletPilot": z_pilot, "inletAir": 0.0})
    bc_c = sbc({"inletCH4": 0.0, "inletPilot": 1.0, "inletAir": 0.0})
    bc_var = sbc({"inletCH4": 0.0, "inletPilot": 0.0, "inletAir": 0.0})
    bc_He = {n: zg for n in names}
    # 0/k: turbulentIntensityKineticEnergyInlet k = 1.5 (I |U|)^2
    # (I = 0.0458 / 0.0628 / 0.0471); 0/epsilon:
    # turbulentMixingLengthDissipationRateInlet eps = Cmu^0.75 k^1.5 / L
    # (L = 0.504 / 0.735 / 19.677 mm) — resolved here to their values
    def k_in(I, U):
        return 1.5 * (I * U) ** 2

    def eps_in(kv, L):
        return 0.09 ** 0.75 * kv ** 1.5 / L

    k_jet, k_pil, k_air = k_in(0.0458, 49.6), k_in(0.0628, 11.4),         k_in(0.0471, 0.9)
    bc_k = sbc({"inletCH4": k_jet, "inletPilot": k_pil, "inletAir": k_air})
    bc_eps = sbc({"inletCH4": eps_in(k_jet, 0.000504),
                  "inletPilot": eps_in(k_pil, 0.000735),
                  "inletAir": eps_in(k_air, 0.019677)})
    # rho at fixed-velocity inlets must be the INLET-state density, not the
    # owner cell's (zeroGradient rho feeds the prescribed mass influx with
    # the cell density -> runaway mass accumulation in the first axis cell;
    # OpenFOAM's rho boundary is 'calculated' from the thermo state)
    from deepflame_tpu.combustion.fgm.table import lookup as _lk
    GAS_R = 8314.462618

    def rho_inlet(Z_in, c_in, T_in=294.0):
        zz = jnp.asarray([Z_in])
        cc = jnp.asarray([c_in])
        zer = jnp.zeros(1)
        W = float(_lk(table, "mwt", (None, zz, cc, zer, zer, None))[0])
        T_in = float(_lk(table, "Tf", (None, zz, cc, zer, zer, None))[0])             if c_in > 0.5 else T_in
        return 1e5 * W / (GAS_R / 1.0) / T_in * 1.0 if False else             1e5 * W / (GAS_R * T_in)

    bc_rho = sbc({"inletCH4": rho_inlet(z_jet, 0.0),
                  "inletPilot": rho_inlet(z_pilot, 1.0),
                  "inletAir": rho_inlet(0.0, 0.0)})

    def u_bcs(c):
        vals = {"inletCH4": 49.6, "inletPilot": 11.4, "inletAir": 0.9}
        d = {}
        for n in names:
            if n in vals:
                d[n] = fixed_value(vals[n] if c == 2 else 0.0)
            elif n.startswith("wall"):
                d[n] = fixed_value(0.0)
            else:
                d[n] = zg
        return d

    # fvSolution parity: p GAMG tol 1e-9 relTol 1e-3 — on this graded
    # wedge (cell volumes span 4400x) a loosely-converged pressure at the
    # nozzle-lip ignition spike destabilizes the step
    cfg = FGMConfig(chemistry=False, div_scheme="limitedLinear",
                    solve_enthalpy=True, Sc_t=0.7,
                    n_outer=args.n_outer,
                    p_tol=3e-9, p_rel_tol=1e-3, max_iter_p=3000,
                    div_scheme_U=args.div_u,
                    use_pallas="never")
    deep_net = None
    if args.deepfgm:
        # DeePFGM parity (DeePFGM.C): replace the multilinear table lookup
        # with a distilled NN; cache the trained net beside the table
        from deepflame_tpu.combustion.fgm.deep import (DeepFGM,
                                                       train_deep_fgm)
        cache = args.table + ".deepfgm.npz"
        if os.path.exists(cache):
            d = np.load(cache, allow_pickle=True)
            nl = int(d["n_layers"])
            params = [(jnp.asarray(d[f"W{i}"], dtype),
                       jnp.asarray(d[f"b{i}"], dtype)) for i in range(nl)]
            deep_net = DeepFGM(params=params,
                               x_mean=jnp.asarray(d["x_mean"], dtype),
                               x_std=jnp.asarray(d["x_std"], dtype),
                               y_mean=jnp.asarray(d["y_mean"], dtype),
                               y_std=jnp.asarray(d["y_std"], dtype))
            print(f"DeePFGM: loaded cached net {os.path.basename(cache)}")
        else:
            print("DeePFGM: distilling table -> NN (one-time)...",
                  flush=True)
            deep_net = train_deep_fgm(table, hidden=(96, 96, 48),
                                      n_samples=60000, epochs=300,
                                      verbose=True, dtype=dtype)
            save = {"n_layers": len(deep_net.params),
                    "x_mean": np.asarray(deep_net.x_mean),
                    "x_std": np.asarray(deep_net.x_std),
                    "y_mean": np.asarray(deep_net.y_mean),
                    "y_std": np.asarray(deep_net.y_std)}
            for i, (W, bb) in enumerate(deep_net.params):
                save[f"W{i}"] = np.asarray(W)
                save[f"b{i}"] = np.asarray(bb)
            np.savez(cache, **save)
            print(f"DeePFGM: cached to {os.path.basename(cache)}")

    from deepflame_tpu.turbulence.wall_functions_fl import \
        make_wall_functions_fl
    from deepflame_tpu.solvers.low_mach_fl import rng_keps_kwargs
    wf = make_wall_functions_fl(gm, ("wallTube", "wallOutside"), dtype)
    # the case's actual turbulence model: RNGkEpsilon with C1 1.52
    # (constant/turbulenceProperties) — NOT standard k-epsilon
    if args.ras == "RNG":
        keps = rng_keps_kwargs(C1=args.c1 if args.c1 is not None else 1.52)
    else:
        keps = dict(C1=args.c1 if args.c1 is not None else 1.44)
    print(f"RAS: {args.ras} k-epsilon, C1 = {keps['C1']}")
    sol = FGMSolverFL(
        m_p=gm.with_bcs(bc_p, dtype), m_h=gm.with_bcs(bc_He, dtype),
        m_Y=gm.with_bcs(bc_Z, dtype), m_rho=gm.with_bcs(bc_rho, dtype),
        m_U=tuple(gm.with_bcs(u_bcs(c), dtype) for c in range(3)),
        m_c=gm.with_bcs(bc_c, dtype), m_var=gm.with_bcs(bc_var, dtype),
        m_k=gm.with_bcs(bc_k, dtype), m_eps=gm.with_bcs(bc_eps, dtype),
        thermo=None, transport=None, combustion=None, config=cfg,
        table=table, wall_fns=wf, deepfgm=deep_net, **keps)

    n = gm.n_cells
    ctr = np.asarray(gm.centers)
    # setFieldsDict: jet pipe pre-filled with jet mixture
    Z0 = np.zeros(n)
    Z0[(ctr[:, 0] < 0.0036) & (ctr[:, 2] < 0.0)] = z_jet
    c0 = np.zeros(n)
    U0 = np.zeros((n, 3))
    U0[:, 2] = 0.9
    s = sol.fgm_initial_state(
        jnp.asarray(np.full(n, 1e5), dtype), jnp.asarray(Z0, dtype),
        jnp.asarray(c0, dtype), jnp.asarray(U0, dtype), k0=30.0, eps0=3e4)
    if args.restore and os.path.exists(args.restore):
        ck = np.load(args.restore)
        leaves, treedef = jax.tree_util.tree_flatten(s)
        loaded = [jnp.asarray(ck[f"leaf{i}"], leaves[i].dtype)
                  for i in range(len(leaves))]
        s = jax.tree_util.tree_unflatten(treedef, loaded)
        print(f"restored checkpoint {args.restore} at t = "
              f"{float(s.time)*1e3:.2f} ms", flush=True)

    ctr_np = np.asarray(gm.centers)
    axis_sel = ctr_np[:, 0] < 0.0006
    z_axis = ctr_np[axis_sel, 2]
    ax_order = np.argsort(z_axis)
    z_stations = np.linspace(0.0, 0.5, 11)

    def station_T(state):
        T_ax = np.asarray(state.T, np.float64)[axis_sel]
        return np.interp(z_stations, z_axis[ax_order], T_ax[ax_order])

    os.makedirs(args.out, exist_ok=True)
    dt = args.dt
    n_steps = int(round((args.t_end - float(s.time)) / dt))
    step = jax.jit(lambda st: sol.step(st, dt))
    import time as _t
    t0 = _t.perf_counter()
    log_every = max(n_steps // 100, 1)
    if os.environ.get('SANDIA_DENSE_LOG'):
        log_every = 5
    for i in range(n_steps):
        s, dg = step(s)
        if (i + 1) % log_every == 0:
            Tst = station_T(s)
            print(f"t={float(s.time)*1e3:8.2f} ms  "
                  f"T=[{float(s.T.min()):6.1f},{float(s.T.max()):7.1f}] "
                  f"c_max={float(s.c.max()):.3f} "
                  f"Z_max={float(s.Z.max()):.3f} "
                  f"p_max={float(s.p.max()):.3e}@{np.array2string(ctr_np[int(np.argmax(np.asarray(s.p)))], precision=4)} rho_max={float(s.rho.max()):.3f} "
                  f"w_max={float(s.U[:, 2].max()):.1f} p_res={float(dg['p_res_0']):.2e} itp={int(dg.get('iters_p', -1))}"
                  f"@z={float(ctr_np[int(np.argmax(np.abs(np.asarray(s.U[:, 2])))), 2])*1e3:.0f}mm"
                  f",r={float(ctr_np[int(np.argmax(np.abs(np.asarray(s.U[:, 2])))), 0])*1e3:.1f}mm  stations: "
                  + " ".join(f"{v:.0f}" for v in Tst), flush=True)
            # checkpoint the station profile (a cut run still yields data)
            np.savetxt(os.path.join(args.out, "data_T.xy"),
                       np.stack([z_stations, Tst], 1), fmt="%.6g",
                       header=f"t = {float(s.time):.6f} s")
            # full-state checkpoint (atomic) so a cut run can --restore
            leaves, _ = jax.tree_util.tree_flatten(s)
            ck_path = os.path.join(args.out, "checkpoint.npz")
            np.savez(ck_path + ".tmp.npz",
                     **{f"leaf{j}": np.asarray(lf)
                        for j, lf in enumerate(leaves)})
            os.replace(ck_path + ".tmp.npz", ck_path)
            if not (np.isfinite(float(s.T.max()))
                    and np.isfinite(float(jnp.abs(s.U).max()))
                    and np.isfinite(float(s.k.max()))):
                raise RuntimeError("diverged")
    print(f"wall: {_t.perf_counter() - t0:.1f}s")
    if os.environ.get("SANDIA_DUMP"):
        np.savez(os.environ["SANDIA_DUMP"],
                 ctr=ctr_np, T=np.asarray(s.T), Z=np.asarray(s.Z),
                 c=np.asarray(s.c), k=np.asarray(s.k),
                 eps=np.asarray(s.eps), U=np.asarray(s.U),
                 rho=np.asarray(s.rho), Zvar=np.asarray(s.Zvar),
                 cvar=np.asarray(s.cvar), p=np.asarray(s.p))
        print("dumped", os.environ["SANDIA_DUMP"])

    # function-object outputs on the FL mesh (sample sets +
    # surfaceFieldValue{regionType patch} parity — the same postProcessing
    # layout the structured cases get; replaces this script's former
    # ad-hoc-only extraction)
    from deepflame_tpu.runtime import LineSample, PatchFieldValue
    p0 = ctr_np[axis_sel][np.argmin(z_axis)]
    axis_line = LineSample(gm, 2, (float(p0[0]), float(p0[1]), 0.0),
                           ["T", "Z", "c"],
                           out_dir=os.path.join(args.out, "sample"),
                           tol=6e-4)
    axis_line(float(s.time), {"T": np.asarray(s.T), "Z": np.asarray(s.Z),
                              "c": np.asarray(s.c)})
    axis_line.write()
    outlet_T = PatchFieldValue(gm, "outlet", ["T"],
                               ops=("areaAverage", "max"),
                               out_dir=os.path.join(args.out,
                                                    "patchFieldValue"))
    outlet_T(float(s.time), {"T": np.asarray(s.T)})
    print("outlet areaAverage(T), max(T):", outlet_T.rows[0][1:])
    outlet_T.write()

    # reference-matched sampling: 11 points on the axis (x=0) z in [0, 0.5]
    # (system/sample lineUniform), from the first (axis) cell column
    T_st = station_T(s)
    np.savetxt(os.path.join(args.out, "data_T.xy"),
               np.stack([z_stations, T_st], 1), fmt="%.6g")
    print("stations (z [m], T [K], reference):")
    for zz, tt, ref in zip(z_stations, T_st, ANCHORS):
        print(f"  z={zz:5.2f}: T = {tt:8.2f} | ref {ref:8.2f} "
              f"({100*(tt-ref)/ref:+6.1f}%)")


if __name__ == "__main__":
    main()
