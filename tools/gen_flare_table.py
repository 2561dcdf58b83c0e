"""Generate a physics-derived FlaRe FGM table from in-repo 1D flamelets.

Role parity: the reference's FlaRe toolkit produces the (downloadable, not
shipped) `flare_CH4_SandiaD_4D.tbl` consumed by flareFGM
(/root/reference/src/dfCombustionModels/FGM/flameletTableSolver/tableSolver.C:
52-200; examples/dfLowMachFoam/fgm/twoD_SandiaD_flareFGM/constant/
combustionProperties `tablePath flare_CH4_SandiaD_4D.tbl`). In this
zero-egress environment we regenerate the same artifact class from first
principles with this repo's own solvers:

  1. premixed laminar flamelets: for each mixture fraction Z on the table's
     z-axis, mix the fuel/oxidizer streams, and solve an inlet-anchored 1D
     freely-propagating flame with the LowMachSolver (the configuration
     validated in examples/flame_1d_anchored.py / VALIDATION.md);
  2. parametrize each flamelet by the scaled progress variable
     c = (Yc - Yc_u) / (Yc_b - Yc_u),  Yc = sum of PV species mass fractions
     (CO2+CO+H2O+H2 for CH4; H2O for H2), and resample T, Y_i, cp, W, nu and
     the PV source  omgc = (dYc/dt)_chem / dYc  [1/s] onto the c-axis;
  3. presumed-PDF turbulence closure: convolve every table with independent
     beta-PDFs in Z and c over the gz = Zvar/(Z(1-Z)) and gc axes, including
     the correlation moments cOc = <c om_c> and ZOc = <Z om_c> used by the
     cvar/Zcvar transport equations (baseFGM cvarEqn/ZcvarEqn);
  4. laminar flame property rows (z, sl, th, tau, kctau) from the flamelet
     solutions: S_L (consumption speed), thermal thickness, tau = th/sl.

Non-flammable z rows carry the pure-mixing state (omgc = 0, properties
interpolated unburnt->equilibrium along c) so lookups outside the flammable
range stay physical.

Usage:
  python tools/gen_flare_table.py --fuel H2  --out data/flare_H2_Li_4D.tbl
  python tools/gen_flare_table.py --fuel CH4 --out data/flare_CH4_drm19_4D.tbl
      [--sandia]   # fuel stream = Sandia D main jet (25% CH4 / 75% air vol)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def beta_pdf_weights(grid, mean, gvar):
    """Integration weights w[k] approximating int f(x) Beta(x; mean, var) dx
    ~ sum_k w[k] f(grid[k]) on the (non-uniform) grid, for normalized
    variance gvar = var/(mean(1-mean)). Handles the delta limits (gvar->0:
    delta at mean; gvar->1: two deltas at 0/1 with weights 1-mean, mean) the
    same way the FlaRe/beta-PDF literature does."""
    g = np.asarray(grid, np.float64)
    n = g.shape[0]
    w = np.zeros(n)
    mean = float(min(max(mean, 0.0), 1.0))
    if gvar <= 1e-6 or mean <= 1e-9 or mean >= 1.0 - 1e-9:
        # delta at the mean: linear interpolation weights
        k = np.searchsorted(g, mean, side="right") - 1
        k = min(max(k, 0), n - 2)
        f = (mean - g[k]) / max(g[k + 1] - g[k], 1e-300)
        w[k], w[k + 1] = 1.0 - f, f
        return w
    if gvar >= 0.98:
        w[0], w[-1] = 1.0 - mean, mean
        return w
    var = gvar * mean * (1.0 - mean)
    a = mean * (mean * (1.0 - mean) / var - 1.0)
    b = (1.0 - mean) * (mean * (1.0 - mean) / var - 1.0)
    a, b = max(a, 1e-4), max(b, 1e-4)
    # integrate the Beta CDF over cell-centered intervals (robust for the
    # integrable endpoint singularities when a<1 or b<1)
    from math import lgamma
    edges = np.concatenate([[g[0]], 0.5 * (g[1:] + g[:-1]), [g[-1]]])
    # regularized incomplete beta via the continued fraction (scipy-free)
    def betainc(x):
        x = np.clip(x, 0.0, 1.0)
        out = np.empty_like(x)
        ln_beta = lgamma(a) + lgamma(b) - lgamma(a + b)

        def cf(xx, aa, bb):
            # Lentz continued fraction for I_x(a,b), xx < (a+1)/(a+b+2)
            qab, qap, qam = aa + bb, aa + 1.0, aa - 1.0
            c, d = 1.0, 1.0 - qab * xx / qap
            d = 1.0 / np.where(np.abs(d) < 1e-300, 1e-300, d)
            h = d
            for m in range(1, 200):
                m2 = 2 * m
                aa1 = m * (bb - m) * xx / ((qam + m2) * (aa + m2))
                d = 1.0 + aa1 * d
                d = 1.0 / np.where(np.abs(d) < 1e-300, 1e-300, d)
                c = 1.0 + aa1 / np.where(np.abs(c) < 1e-300, 1e-300, c)
                h = h * d * c
                aa2 = -(aa + m) * (qab + m) * xx / ((aa + m2) * (qap + m2))
                d = 1.0 + aa2 * d
                d = 1.0 / np.where(np.abs(d) < 1e-300, 1e-300, d)
                c = 1.0 + aa2 / np.where(np.abs(c) < 1e-300, 1e-300, c)
                dl = d * c
                h = h * dl
                if np.all(np.abs(dl - 1.0) < 1e-12):
                    break
            return h
        with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
            front = np.exp(a * np.log(np.maximum(x, 1e-300))
                           + b * np.log(np.maximum(1.0 - x, 1e-300)) - ln_beta)
            use_direct = x < (a + 1.0) / (a + b + 2.0)
            res_d = front * cf(np.clip(x, 1e-300, 1 - 1e-12), a, b) / a
            res_c = 1.0 - front * cf(np.clip(1.0 - x, 1e-300, 1 - 1e-12),
                                     b, a) / b
            out = np.where(use_direct, res_d, res_c)
        out[x <= 0.0] = 0.0
        out[x >= 1.0] = 1.0
        return np.clip(out, 0.0, 1.0)
    cdf = betainc(edges)
    w = np.maximum(np.diff(cdf), 0.0)
    s = w.sum()
    return w / s if s > 0 else beta_pdf_weights(grid, mean, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuel", default="CH4", choices=["CH4", "H2"])
    ap.add_argument("--mech", default=None)
    ap.add_argument("--sandia", action="store_true",
                    help="fuel stream = Sandia D main jet "
                         "(25%% CH4 / 75%% air by volume)")
    ap.add_argument("--nz-flam", type=int, default=7,
                    help="flamelet solves across the flammable range")
    ap.add_argument("--nc", type=int, default=21)
    ap.add_argument("--ngz", type=int, default=5)
    ap.add_argument("--ngc", type=int, default=5)
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--out", default="data/flare_table.tbl")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="f32",
                    help="f32 (TPU-friendly; tables are smooth) or f64")
    ap.add_argument("--resume", default=None,
                    help="npz cache of flamelet solutions to reuse/extend")
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.chemistry.kinetics import production_rates
    from deepflame_tpu.chemistry.reactor import ignite
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.combustion.fgm.table import (FlameletTable,
                                                    write_flare_table)
    from deepflame_tpu.mesh import (StructuredMesh, zero_gradient, empty,
                                    fixed_value)
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.utils.flame_speed import flame_position, flame_thickness

    if args.mech is None:
        args.mech = ("/root/reference/mechanisms/CH4/drm19.yaml"
                     if args.fuel == "CH4"
                     else "/root/reference/mechanisms/H2/H2_Li.yaml")
    mech = load_mechanism(args.mech)
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)
    ns = mech.n_species
    W = np.asarray(mech.molecular_weights)
    names = list(mech.species_names)
    idx = {s: names.index(s) for s in names}
    iF, iO2, iN2 = idx[args.fuel], idx["O2"], idx["N2"]
    ode_rtol = 1e-6 if args.dtype == "f64" else 1e-4
    ode_atol = 1e-12 if args.dtype == "f64" else 1e-8

    # ---- streams (mass-fraction space; Z == fuel-stream mixing fraction)
    X_ox = np.zeros(ns)
    X_ox[iO2], X_ox[iN2] = 0.21, 0.79
    Y_ox = X_ox * W / (X_ox * W).sum()
    X_fu = np.zeros(ns)
    if args.sandia:                     # 25% CH4 / 75% air by volume
        X_fu[iF] = 0.25
        X_fu[iO2], X_fu[iN2] = 0.75 * 0.21, 0.75 * 0.79
    else:
        X_fu[iF] = 1.0
    Y_fu = X_fu * W / (X_fu * W).sum()

    # stoichiometric Z from element balance: need (O2 demand) == (O2 supply)
    nu_O2 = 0.5 if args.fuel == "H2" else 2.0
    # moles O2 per kg mix at mixing fraction Z
    def o2_excess(Z):
        Y = Z * Y_fu + (1 - Z) * Y_ox
        return Y[iO2] / W[iO2] - nu_O2 * Y[iF] / W[iF]
    from scipy.optimize import brentq  # scipy is available via jax deps
    Z_st = brentq(o2_excess, 1e-6, 1.0 - 1e-6)
    print(f"Z_st = {Z_st:.4f}")

    # PV species
    pv_names = ["CO2", "CO", "H2O", "H2"] if args.fuel == "CH4" else ["H2O"]
    pv_idx = [idx[s] for s in pv_names if s in idx]

    T_u, p0 = 300.0, 101325.0

    def mix(Z):
        return Z * Y_fu + (1 - Z) * Y_ox

    # ---- equilibrium (burnt) state per Z: 0D ignition, then re-equilibrate
    # at the h-CONSISTENT temperature. A single hot-seed ignite equilibrates
    # at the seed's (elevated) enthalpy — more dissociation, LESS H2O/CO2 —
    # which under-estimates Yc_b and makes the scaled progress variable
    # saturate mid-flame. Each re-equilibration pass conserves its own
    # enthalpy (const-p reactor), so starting it from (T_from_h(h_u, Yb), Yb)
    # converges to the equilibrium at the unburnt enthalpy.
    def burnt_state(Z):
        Yu = mix(Z)
        h_u = th.h_mass(jnp.asarray(T_u, dtype), jnp.asarray(Yu, dtype))
        ig_opts = RosenbrockOptions(rtol=ode_rtol, atol=ode_atol,
                                    max_steps=40000)
        T_seed, Y_seed = 1600.0, Yu
        T_b, Yb = T_u, Yu
        for it in range(3):
            _, Tb_t, Yb_t = ignite(th, kin, jnp.asarray(T_seed, dtype), p0,
                                   jnp.asarray(Y_seed, dtype), 2e-2,
                                   opts=ig_opts)
            Yb = np.asarray(Yb_t[-1])
            T_b = float(th.T_from_h(h_u, jnp.asarray(Yb, dtype),
                                    jnp.asarray(2000.0, dtype)))
            if it == 0 and T_b < T_u + 300.0:   # did not burn: pure mixing
                return T_u, Yu, False
            T_seed, Y_seed = T_b, Yb
        return T_b, Yb, True

    # ---- z-axis: endpoints + flammable band clustered around Z_st
    z_flam = Z_st * np.concatenate([np.linspace(0.55, 1.0, args.nz_flam // 2,
                                                endpoint=False),
                                    np.linspace(1.0, 1.9,
                                                args.nz_flam
                                                - args.nz_flam // 2)])
    z_axis = np.unique(np.concatenate(
        [[0.0], [0.35 * Z_st], z_flam, [min(3.2 * Z_st, 0.8), 1.0]]))
    nz = z_axis.shape[0]
    print(f"z-axis ({nz}): {np.array2string(z_axis, precision=4)}")

    c_axis = np.linspace(0.0, 1.0, args.nc)
    gz_axis = np.array([0.0, 0.05, 0.15, 0.35, 0.7])[:args.ngz]
    gc_axis = np.array([0.0, 0.05, 0.15, 0.35, 0.7])[:args.ngc]

    # ---- flamelet solve per z point
    def solve_flamelet(Z, sl_guess):
        """Inlet-anchored premixed flame at mixing fraction Z; returns a dict
        of profiles + laminar props, or None if non-flammable."""
        T_b, Yb, flam = burnt_state(Z)
        Yu = mix(Z)
        if not flam:
            return dict(flam=False, T_b=T_b, Yu=Yu, Yb=Yb)
        n, u_in = args.cells, sl_guess
        # domain: ~25 thermal thicknesses (estimate delta ~ alpha/S_L)
        Yu_j = jnp.asarray(Yu, dtype)
        rho_u = float(th.rho(jnp.asarray(p0, dtype), jnp.asarray(T_u, dtype),
                             Yu_j))
        # thermal-thickness scaling: delta * S_L ~ const per fuel
        # (H2 stoich: 0.35 mm at 2.2 m/s measured, VALIDATION.md;
        # CH4 stoich: ~0.45 mm at 0.38 m/s, classic value)
        dsl = 7.7e-4 if args.fuel == "H2" else 1.7e-4     # delta*S_L [m^2/s]
        delta = min(max(dsl / max(sl_guess, 0.05), 2e-4), 5e-3)
        L = 25.0 * delta
        mesh = StructuredMesh.box([L, L / n, L / n], [n, 1, 1])
        e = (empty(), empty())
        bU = ((fixed_value(u_in), zero_gradient()), e, e)
        bU0 = ((fixed_value(0.0), zero_gradient()), e, e)
        bp = ((zero_gradient(), fixed_value(p0)), e, e)
        h_in = float(th.h_mass(jnp.asarray(T_u, dtype), Yu_j))
        bh = ((fixed_value(h_in), zero_gradient()), e, e)
        brho = ((fixed_value(rho_u), zero_gradient()), e, e)
        bY = [((fixed_value(float(Yu[k])), zero_gradient()), e, e)
              for k in range(ns)]
        comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
            rtol=ode_rtol, atol=ode_atol, max_steps=20000, grow=10.0))
        solver = LowMachSolver(
            mesh=mesh, thermo=th, transport=tr, combustion=comb,
            bcs_U=(bU, bU0, bU0), bcs_p=bp, bcs_h=bh, bcs_Y=bY, bcs_rho=brho,
            config=LowMachConfig(chemistry=True, inert_index=int(iN2)))
        Xc, _, _ = mesh.cell_centers(dtype)
        w = 6.0 * mesh.dx
        prof = 0.5 * (1.0 + jnp.tanh((Xc - 0.45 * L) / w))
        T0 = (T_u + (T_b - T_u) * prof).astype(dtype)
        Y0 = (Yu_j[:, None, None, None] * (1 - prof)
              + jnp.asarray(Yb, dtype)[:, None, None, None] * prof)
        rho0 = th.rho(jnp.full(mesh.shape, p0, dtype), T0,
                      jnp.moveaxis(Y0, 0, -1))
        U0 = jnp.stack([rho_u * u_in / rho0, jnp.zeros_like(T0),
                        jnp.zeros_like(T0)])
        s = solver.initial_state(jnp.full(mesh.shape, p0, dtype), T0, Y0, U0)
        dt = 5.0 * mesh.dx / 1200.0
        # run >= 3 flame times so the inner structure is quasi-steady
        n_steps = max(args.steps, int(3.0 * delta / max(sl_guess, 0.05) / dt))
        step = jax.jit(lambda st: solver.step(st, dt)[0])
        t0 = time.perf_counter()
        for i in range(n_steps):
            s = step(s)
        xs = np.asarray(Xc).squeeze()
        T = np.asarray(s.T).squeeze()
        if not np.all(np.isfinite(T)):
            return None
        Y = np.asarray(s.Y).squeeze()          # (ns, n)
        p = np.asarray(s.p).squeeze()
        Yt = jnp.moveaxis(s.Y, 0, -1)
        rho = np.asarray(th.rho(s.p, s.T, Yt)).squeeze()
        wdot = np.asarray(production_rates(kin, th, s.T,
                                           th.rho(s.p, s.T, Yt),
                                           Yt)).squeeze()  # (n, ns) mol/m3/s
        WF = W[iF]
        sc = float(-np.sum(wdot[:, iF]) * WF * mesh.dx / (rho_u * Yu[iF]))
        thick = float(flame_thickness(xs, T))
        print(f"  Z={Z:.4f}: S_c={sc:.3f} m/s, delta={thick*1e3:.3f} mm, "
              f"T_max={T.max():.0f} K ({time.perf_counter()-t0:.0f}s)")
        return dict(flam=True, xs=xs, T=T, Y=Y, rho=rho, wdot=wdot, p=p,
                    sl=sc, th=thick, T_b=T_b, Yu=Yu, Yb=Yb)

    # ---- run (with resume cache)
    cache = {}
    if args.resume and os.path.exists(args.resume):
        dat = np.load(args.resume, allow_pickle=True)
        cache = dat["cache"].item()
        print(f"resumed {len(cache)} flamelets from {args.resume}")
    sl_guess = 0.4 if args.fuel == "CH4" else 2.0
    sols = {}
    flam_band = (z_flam.min() - 1e-12, z_flam.max() + 1e-12)
    for Z in z_axis:
        key = f"{Z:.6f}"
        if key in cache:
            sols[key] = cache[key]
            continue
        if Z < flam_band[0] or Z > flam_band[1]:
            T_b, Yb, _ = burnt_state(Z)
            sols[key] = dict(flam=False, T_b=T_b, Yu=mix(Z), Yb=Yb)
        else:
            r = solve_flamelet(Z, sl_guess)
            if r is None or not r["flam"]:
                T_b, Yb, _ = burnt_state(Z)
                r = dict(flam=False, T_b=T_b, Yu=mix(Z), Yb=Yb)
            else:
                sl_guess = max(min(r["sl"], 3.0), 0.08)
            sols[key] = r
        if args.resume:
            np.savez(args.resume, cache=np.asarray(sols, dtype=object))

    # ---- laminar-flamelet manifolds on (z, c): T, Y, cp, W, nu, omgc
    nc = args.nc
    omega_sp = [args.fuel]               # per-species source tables
    base = {k: np.zeros((nz, nc)) for k in
            ("omgc", "Tf", "cp", "mwt", "nu", "hiyi")}
    Ytab = np.zeros((len(names), nz, nc))
    Otab = np.zeros((len(omega_sp), nz, nc))
    lam_rows = dict(z=z_axis.copy(), sl=np.zeros(nz), th=np.zeros(nz),
                    tau=np.zeros(nz), kctau=np.zeros(nz))

    def props_of(T, Yrow):
        Tj = jnp.asarray(T, dtype)
        Yj = jnp.asarray(Yrow, dtype)
        cp = np.asarray(th.cp_mass(Tj, Yj))
        Wm = float(1.0 / np.sum(Yrow / W))
        X = Yrow / W * Wm
        mu = np.asarray(tr.mu_mix(Tj, jnp.asarray(X, dtype)))
        rho = np.asarray(th.rho(jnp.asarray(p0, dtype), Tj, Yj))
        h = np.asarray(th.h_mass(Tj, Yj))
        return float(cp), Wm, float(mu / rho), float(h)

    for j, Z in enumerate(z_axis):
        r = sols[f"{Z:.6f}"]
        Yu = r["Yu"]
        # recompute the burnt normalization fresh (resume caches may carry
        # pre-fix burnt states; the flame PROFILES in them stay valid)
        T_b, Yb, _ = burnt_state(Z)
        Yc_u = sum(Yu[i] for i in pv_idx)
        Yc_b = sum(Yb[i] for i in pv_idx)
        dYc = max(Yc_b - Yc_u, 1e-12)
        if not r["flam"] or dYc < 1e-6:
            # pure mixing/equilibrium row: linear blend in c, omgc = 0
            for k, c in enumerate(c_axis):
                T = T_u + c * (T_b - T_u)
                Yrow = (1 - c) * Yu + c * Yb
                cp, Wm, nu, h = props_of(T, Yrow)
                base["Tf"][j, k] = T
                base["cp"][j, k] = cp
                base["mwt"][j, k] = Wm
                base["nu"][j, k] = nu
                base["hiyi"][j, k] = h
                Ytab[:, j, k] = Yrow
            lam_rows["sl"][j] = 0.0
            lam_rows["th"][j] = 1e-3
            lam_rows["tau"][j] = 1.0
            continue
        T, Y, rho, wdot = r["T"], r["Y"], r["rho"], r["wdot"]
        Yc = Y[pv_idx].sum(axis=0)
        c_prof = np.clip((Yc - Yc_u) / dYc, 0.0, 1.0)
        # enforce monotone c(x) for the resample (running max)
        c_mono = np.maximum.accumulate(c_prof)
        omgc_prof = (wdot[:, pv_idx] * W[pv_idx]).sum(axis=1) / rho / dYc
        for k, c in enumerate(c_axis):
            i = np.searchsorted(c_mono, c)
            i = min(max(i, 1), c_mono.shape[0] - 1)
            f = (c - c_mono[i - 1]) / max(c_mono[i] - c_mono[i - 1], 1e-300)
            f = min(max(f, 0.0), 1.0)
            def interp(q):
                return (1 - f) * q[..., i - 1] + f * q[..., i]
            Tk = float(interp(T))
            Yrow = np.clip(interp(Y), 0.0, 1.0)
            Yrow /= Yrow.sum()
            cp, Wm, nu, h = props_of(Tk, Yrow)
            base["Tf"][j, k] = Tk
            base["cp"][j, k] = cp
            base["mwt"][j, k] = Wm
            base["nu"][j, k] = nu
            base["hiyi"][j, k] = h
            base["omgc"][j, k] = max(float(interp(omgc_prof)), 0.0)
            Ytab[:, j, k] = Yrow
            for q, sp in enumerate(omega_sp):
                Otab[q, j, k] = float(interp(wdot[:, idx[sp]] * W[idx[sp]]
                                             / rho))
        # endpoints exactly unburnt / burnt-equilibrium, omgc(1)=0
        base["omgc"][j, -1] = 0.0
        lam_rows["sl"][j] = r["sl"]
        lam_rows["th"][j] = r["th"]
        lam_rows["tau"][j] = r["th"] / max(r["sl"], 1e-6)
        lam_rows["kctau"][j] = 0.0

    # ---- beta-PDF convolution over (gz, gc); correlation moments
    ngz, ngc = gz_axis.shape[0], gc_axis.shape[0]
    shape6 = (1, nz, nc, ngz, ngc, 1)
    conv = {k: np.zeros(shape6) for k in
            ("omgc", "cOc", "ZOc", "cp", "mwt", "hiyi", "Tf", "nu")}
    convY = {s: np.zeros(shape6) for s in names}
    convO = {s: np.zeros(shape6) for s in omega_sp}
    # precompute weights: wz[j, gz_index, :], wc[k, gc_index, :]
    wz = np.stack([[beta_pdf_weights(z_axis, z, g) for g in gz_axis]
                   for z in z_axis])             # (nz, ngz, nz)
    wc = np.stack([[beta_pdf_weights(c_axis, c, g) for g in gc_axis]
                   for c in c_axis])             # (nc, ngc, nc)

    def convolve(F):
        # out[j,k,a,b] = sum_{j',k'} wz[j,a,j'] wc[k,b,k'] F[j',k']
        t1 = np.einsum("jaJ,JK->jaK", wz, F)
        return np.einsum("kbK,jaK->jkab", wc, t1)

    for k in ("Tf", "cp", "mwt", "nu", "hiyi", "omgc"):
        conv[k][0, :, :, :, :, 0] = convolve(base[k])
    conv["cOc"][0, :, :, :, :, 0] = convolve(base["omgc"]
                                             * c_axis[None, :])
    conv["ZOc"][0, :, :, :, :, 0] = convolve(base["omgc"]
                                             * z_axis[:, None])
    for q, s in enumerate(names):
        convY[s][0, :, :, :, :, 0] = convolve(Ytab[q])
    for q, s in enumerate(omega_sp):
        convO[s][0, :, :, :, :, 0] = convolve(Otab[q])

    tables = {k: conv[k] for k in conv}
    for s in omega_sp:
        tables[f"omega_{s}"] = convO[s]
    for s in names:                 # Y tables are keyed by bare species name
        tables[s] = convY[s]

    h_fu = float(th.h_mass(jnp.asarray(T_u, dtype), jnp.asarray(Y_fu, dtype)))
    h_ox = float(th.h_mass(jnp.asarray(T_u, dtype), jnp.asarray(Y_ox, dtype)))
    table = FlameletTable(
        axes=(np.array([0.0]), z_axis, c_axis, gz_axis, gc_axis,
              np.array([0.0])),
        tables={k: np.asarray(v) for k, v in tables.items()},
        scaled_pv=True, H_fuel=h_fu, H_ox=h_ox,
        omega_species=tuple(omega_sp), species=tuple(names),
        laminar={k: v[None, :] for k, v in lam_rows.items()})
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_flare_table(args.out, table)
    meta = dict(fuel=args.fuel, mech=os.path.basename(args.mech),
                sandia=bool(args.sandia), Z_st=Z_st,
                pv=pv_names, T_u=T_u, p0=p0,
                sl=dict(zip([f"{z:.4f}" for z in z_axis],
                            lam_rows["sl"].tolist())))
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
