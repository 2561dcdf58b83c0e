"""1D H2-air detonation with moving-patch local refinement (AMR).

Role parity: dfHighSpeedFoam's AMR-driven detonation runs — the reference
refines a band around the front every refineInterval with refCri =
max|grad rho| (/root/reference/applications/solvers/dfHighSpeedFoam/
dfHighSpeedFoam.C:113-138, dfDynamicRefineFvMesh.H:116-160). Here the same
physics runs on a COARSE grid plus a fixed-size fine patch (ratio r) that
tracks the front (deepflame_tpu/mesh/patch_amr.py) — static shapes, one
compiled step, no retraces.

Work accounting vs a uniform-fine run of the same resolution: uniform-fine
advances n_c*r cells * r substeps = n_c r^2 cell-updates per coarse dt;
the patch run advances n_c + pc r^2. With the default n_c=300, pc=40, r=4
that is 300+640=940 vs 4800 — a 5.1x cell-update saving.

Anchor: detonation speed 1979.33 m/s +- 1% (corrtest.cpp:47-49) at fine-
grid resolution.

Usage: python examples/detonation_1d_amr.py [--coarse-cells 300] [--ratio 4]
       [--patch-cells 40] [--t-end 9.5e-4] [--length 2.0]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coarse-cells", type=int, default=300)
    ap.add_argument("--ratio", type=int, default=4)
    ap.add_argument("--levels", type=int, default=1,
                    help="1: MovingPatchAMR (ratio r); 2+: NestedPatchAMR "
                    "2:1 cascade (ratio 2 per level) with multi-criteria "
                    "window tracking (mark_cells: |grad rho| + p window)")
    ap.add_argument("--patch-cells", type=int, default=40,
                    help="patch extent in COARSE cells")
    ap.add_argument("--buffer", type=int, default=6,
                    help="buffer width in coarse cells per side")
    ap.add_argument("--length", type=float, default=2.0)
    ap.add_argument("--t-end", type=float, default=9.5e-4)
    ap.add_argument("--dtype", default="f64")
    ap.add_argument("--flux", default="HLLC")
    ap.add_argument("--reflux", action="store_true",
                    help="Berger-Colella conservative interface coupling")
    ap.add_argument("--cfl", type=float, default=0.3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    from deepflame_tpu.runtime.platform import configure
    configure(args.platform, args.dtype)
    import jax.numpy as jnp
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    from deepflame_tpu.chemistry import load_mechanism, make_thermo, \
        make_kinetics
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.mesh import StructuredMesh, zero_gradient, symmetry, \
        empty
    from deepflame_tpu.mesh.patch_amr import MovingPatchAMR
    from deepflame_tpu.solvers.high_speed import (HighSpeedConfig,
                                                  HighSpeedSolver)

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech, dtype)
    kin = make_kinetics(mech, dtype)
    n_c = args.coarse_cells
    r = args.ratio
    Lx = args.length
    mesh = StructuredMesh.box([Lx, Lx / n_c, Lx / n_c], [n_c, 1, 1])
    e = (empty(), empty())
    b_scalar = ((zero_gradient(), zero_gradient()), e, e)
    b_un = ((symmetry(negate=True), zero_gradient()), e, e)
    cfg = HighSpeedConfig(
        flux=args.flux, rk_order=2, limiter="vanLeer", chemistry="ode",
        ode_opts=RosenbrockOptions(
            rtol=1e-6 if args.dtype == "f64" else 1e-4,
            atol=1e-12 if args.dtype == "f64" else 1e-8, max_steps=5000),
        T_threshold=500.0)
    coarse = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                             bcs_rho=b_scalar,
                             bcs_U=(b_un, b_scalar, b_scalar),
                             bcs_p=b_scalar, bcs_Y=b_scalar, config=cfg)
    if args.levels >= 2:
        # criteria-driven 2:1 nest (multiCritRefinement role,
        # dfDynamicRefineFvMesh.H:116-160): mark on density-gradient AND a
        # pressure window around the von Neumann spike; window = marked
        # centroid. Effective resolution = dx / 2^levels.
        from deepflame_tpu.mesh.amr import RefinementCriteria
        from deepflame_tpu.mesh.patch_amr import NestedPatchAMR
        crit = RefinementCriteria(
            gradients=(("rho", 0.03),),          # |grad rho| dx >= 0.03
            fields=(("p", 3e5, 1e9),),           # shocked region
            n_buffer=2)
        amr = NestedPatchAMR.build(coarse, pcs=(args.patch_cells,) * args.levels,
                                   ratio=2, buffer_c=args.buffer,
                                   isotropic=False, criteria=crit,
                                   reflux=args.reflux)
        r = 2 ** args.levels                     # effective ratio for output
    else:
        amr = MovingPatchAMR.build(coarse, pc=args.patch_cells, ratio=r,
                                   buffer_c=args.buffer, reflux=args.reflux)

    ns = mech.n_species
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yv = np.zeros(ns)
    Yv[iH2], Yv[iO2], Yv[iN2] = 0.02851, 0.226, 0.745
    Yv /= Yv.sum()
    X, _, _ = mesh.cell_centers(dtype)
    p0, T0 = 101325.0, 300.0
    drv_len = max(0.002 * Lx, 1.5 * mesh.dx / r)
    driver = X < drv_len
    T = jnp.where(driver, 2000.0, T0).astype(dtype)
    p = jnp.where(driver, 90.0 * p0, p0).astype(dtype)
    Y = jnp.asarray(np.tile(Yv[:, None, None, None], (1,) + mesh.shape),
                    dtype)
    ps = amr.initial_state(p, T, Y, offset=0)

    a_bound = 3500.0
    dt = args.cfl * mesh.dx / a_bound       # coarse-CFL dt; fine runs dt/r
    n_steps = int(args.t_end / dt)
    out_every = max(n_steps // 50, 1)
    step = jax.jit(lambda s: amr.step(s, dt)[0])
    xs = np.asarray(X).squeeze()
    dx_f = mesh.dx / r

    def deepest(node, lvl, x_base, dxl):
        """(deepest fine HighSpeedState, its x origin, its dx, its solver)."""
        x_base = x_base + int(node.offset) * dxl
        dxf = dxl / lvl.ratio if 0 in lvl.axes else dxl
        if lvl.child is None:
            return node.fine, x_base, dxf, lvl.fine
        return deepest(node.fine, lvl.child, x_base, dxf)

    front_t, front_x = [], []
    t_wall = time.perf_counter()
    for i in range(n_steps):
        ps = step(ps)
        if (i + 1) % out_every == 0:
            # front from the DEEPEST fine patch (finest-resolution position)
            if args.levels >= 2:
                sf_deep, x0f, dxf, fsol = deepest(ps, amr, 0.0, mesh.dx)
            else:
                sf_deep, x0f, dxf, fsol = (ps.fine,
                                           int(ps.offset) * mesh.dx,
                                           dx_f, amr.fine)
            _, _, p_f, T_f, _ = fsol.primitives(sf_deep)
            p_f = np.asarray(p_f).squeeze()
            off = int(ps.offset)
            ixf = int(np.argmax(p_f))
            x_front = x0f + (ixf + 0.5) * dxf
            front_t.append(float(ps.coarse.time))
            front_x.append(x_front)
            print(f"t={float(ps.coarse.time)*1e6:8.2f} us  "
                  f"front={x_front*1000:7.2f} mm  patch@[{off},{off+args.patch_cells})c  "
                  f"p_max={p_f.max()/1e3:8.1f} kPa  "
                  f"T_max={float(np.asarray(T_f).max()):7.1f} K", flush=True)
            if not np.isfinite(p_f.max()):
                print("DIVERGED")
                return
    ft, fx = np.asarray(front_t), np.asarray(front_x)
    sel = (fx > 0.3 * Lx) & (fx < 0.95 * Lx)
    if sel.sum() >= 4:
        v = np.polyfit(ft[sel], fx[sel], 1)[0]
        print(f"\nDetonation speed: {v:.1f} m/s  (CJ anchor 1979.33 +- 1%)")
        print(f"deviation: {100 * (v - 1979.33) / 1979.33:+.2f}%")
    cu_uniform = n_c * r * r
    if args.levels >= 2:
        # coarse + each level's fine array x substeps per coarse dt
        cu_patch = n_c + sum(args.patch_cells * 2 * 2 ** (l + 1)
                             for l in range(args.levels))
    else:
        cu_patch = n_c + args.patch_cells * r * r
    print(f"cell-updates per coarse dt: {cu_patch} vs uniform-fine "
          f"{cu_uniform} ({cu_uniform / cu_patch:.1f}x saving)")
    print(f"wall time: {time.perf_counter() - t_wall:.1f}s for {n_steps} steps")


if __name__ == "__main__":
    main()
