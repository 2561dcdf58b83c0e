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
    ap.add_argument("--out", default="postProcessing_sandia")
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
    bc_k = sbc({"inletCH4": 1.0, "inletPilot": 1.0, "inletAir": 1.0})
    bc_eps = sbc({"inletCH4": 1.0, "inletPilot": 1.0, "inletAir": 1.0})
    bc_rho = {n: zg for n in names}

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

    cfg = FGMConfig(chemistry=False, div_scheme="limitedLinear",
                    solve_enthalpy=True, Sc_t=0.7,
                    use_pallas="never")
    sol = FGMSolverFL(
        m_p=gm.with_bcs(bc_p, dtype), m_h=gm.with_bcs(bc_He, dtype),
        m_Y=gm.with_bcs(bc_Z, dtype), m_rho=gm.with_bcs(bc_rho, dtype),
        m_U=tuple(gm.with_bcs(u_bcs(c), dtype) for c in range(3)),
        m_c=gm.with_bcs(bc_c, dtype), m_var=gm.with_bcs(bc_var, dtype),
        m_k=gm.with_bcs(bc_k, dtype), m_eps=gm.with_bcs(bc_eps, dtype),
        thermo=None, transport=None, combustion=None, config=cfg,
        table=table)

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

    dt = args.dt
    n_steps = int(round(args.t_end / dt))
    step = jax.jit(lambda st: sol.step(st, dt)[0])
    import time as _t
    t0 = _t.perf_counter()
    log_every = max(n_steps // 100, 1)
    for i in range(n_steps):
        s = step(s)
        if (i + 1) % log_every == 0:
            print(f"t={float(s.time)*1e3:8.2f} ms  "
                  f"T=[{float(s.T.min()):6.1f},{float(s.T.max()):7.1f}] "
                  f"c_max={float(s.c.max()):.3f} "
                  f"Z_max={float(s.Z.max()):.3f} "
                  f"k_max={float(s.k.max()):.2e} "
                  f"w_max={float(s.U[:, 2].max()):.1f}", flush=True)
            if not np.isfinite(float(s.T.max())):
                raise RuntimeError("diverged")
    print(f"wall: {_t.perf_counter() - t0:.1f}s")

    # reference-matched sampling: 11 points on the axis (x=0) z in [0, 0.5]
    # (system/sample lineUniform). Interpolate T from the nearest axis cell
    # column (cells with smallest r).
    Tn = np.asarray(s.T, np.float64)
    r = ctr[:, 0]
    axis_cells = r < 0.0006   # first cell column (prism centroids ~0.48 mm)
    z_ax = ctr[axis_cells, 2]
    T_ax = Tn[axis_cells]
    order = np.argsort(z_ax)
    z_st = np.linspace(0.0, 0.5, 11)
    T_st = np.interp(z_st, z_ax[order], T_ax[order])
    os.makedirs(args.out, exist_ok=True)
    np.savetxt(os.path.join(args.out, "data_T.xy"),
               np.stack([z_st, T_st], 1), fmt="%.6g")
    print("stations (z [m], T [K], reference):")
    for zz, tt, ref in zip(z_st, T_st, ANCHORS):
        print(f"  z={zz:5.2f}: T = {tt:8.2f} | ref {ref:8.2f} "
              f"({100*(tt-ref)/ref:+6.1f}%)")


if __name__ == "__main__":
    main()
