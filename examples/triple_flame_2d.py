"""2D triple (tribrachial) flame (dfLowMachFoam twoD_tripleFlame parity).

Role parity: /root/reference/examples/dfLowMachFoam/notorch/twoD_tripleFlame/
H2 — a laminar mixing layer: a diluted-H2 fuel stream (Y_H2 = 0.1765,
parabolic profile, peak ~5.3 m/s, band y in [11, 19] mm) issues between air
coflows (3 m/s) into a 50 x 30 mm domain (500 x 300 cells, y-cyclic); a hot
strip in the shipped initial T field (1200 K) ignites the layer and a
triple flame (lean premixed wing / diffusion trailing edge / rich premixed
wing) propagates upstream along the stoichiometric surface. ES80 H2
mechanism; shipped nonuniform T/U/H2/O2/N2 initial fields (0/*, imported
here in OpenFOAM blockMesh cell order for the case's 3-block lattice).

The reference's outlet is waveTransmissive (non-reflecting); here the
outlet is inletOutlet/zeroGradient — adequate for the subsonic outflow.

Usage: python examples/triple_flame_2d.py [--steps 400] [--platform cpu]
       [--every 20]
"""
import argparse
import gzip
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CASE = ("/root/reference/examples/dfLowMachFoam/notorch/twoD_tripleFlame/H2")
BLOCKS_Y = (110, 80, 110)            # blockMeshDict per-block y-cells
NX, NY = 500, 300


def _reorder_blocks(flat):
    """Shipped internalField (OpenFOAM 3-block blockMesh order, i fastest)
    -> (NX, NY) array."""
    out = np.empty((NX, NY) + flat.shape[1:], flat.dtype)
    off = 0
    y0 = 0
    for ny_b in BLOCKS_Y:
        blk = flat[off:off + NX * ny_b]
        out[:, y0:y0 + ny_b] = blk.reshape(ny_b, NX).swapaxes(0, 1) \
            if flat.ndim == 1 else \
            blk.reshape(ny_b, NX, flat.shape[1]).swapaxes(0, 1)
        off += NX * ny_b
        y0 += ny_b
    return out


def _fuel_profile():
    """The 80-value parabolic fuelInlet velocity list from 0/U."""
    with gzip.open(os.path.join(CASE, "0", "U.gz"), "rt") as f:
        text = f.read()
    m = re.search(r"fuelInlet\s*\{[^}]*?List<vector>\s*\n?\s*80\s*\n?\s*\(",
                  text, re.S)
    body = text[m.end():]
    body = body[:body.index(")\n;")] if ")\n;" in body \
        else body[:body.index(");")]
    vals = re.findall(r"\(([^)]*)\)", body)
    return np.array([float(v.split()[0]) for v in vals])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--dt", type=float, default=2e-6)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--every", type=int, default=20)
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
    from deepflame_tpu.mesh import (StructuredMesh, BC, cyclic, empty,
                                    fixed_value, zero_gradient)
    from deepflame_tpu.runtime.openfoam_io import read_openfoam_field_flat
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

    mech = load_mechanism("/root/reference/mechanisms/H2/ES80_H2-7-16.yaml")
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)

    mesh = StructuredMesh.box([0.05, 0.03, 0.0001], [NX, NY, 1])
    e = (empty(), empty())
    cy = (cyclic(), cyclic())

    # x-lo inflow: banded profile (air 3 m/s, fuel parabola in the middle)
    u_in = np.full((NY, 1), 3.0)
    u_in[110:190, 0] = _fuel_profile()
    T_in = 300.0
    Y_fuel = {"H2": 0.176471, "N2": 0.823529}
    Y_air = {"O2": 0.233100233100233, "N2": 0.766899766899767}
    ns = mech.n_species

    def y_inflow(sp):
        v = np.full((NY, 1), Y_air.get(sp, 0.0))
        v[110:190, 0] = Y_fuel.get(sp, 0.0)
        return v

    b_p = ((zero_gradient(), fixed_value(101325.0)), cy, e)
    b_T = ((fixed_value(T_in), zero_gradient()), cy, e)
    b_rho = ((zero_gradient(), zero_gradient()), cy, e)
    b_ux = ((BC("inletOutlet", u_in), zero_gradient()), cy, e)
    b_uy = ((fixed_value(0.0), zero_gradient()), cy, e)
    # per-species BCs must be a LIST (low_mach.py:131 — tuple means one
    # shared FieldBCs)
    bcs_Y = [((BC("inletOutlet", y_inflow(mech.species_names[i])),
               zero_gradient()), cy, e) for i in range(ns)]

    names = {"T": None, "U": None, "H2": None, "O2": None, "N2": None}
    for k in names:
        names[k] = _reorder_blocks(read_openfoam_field_flat(
            os.path.join(CASE, "0", k)))
    Y = np.zeros((ns, NX, NY, 1))
    for sp in ("H2", "O2", "N2"):
        Y[mech.species_index(sp), :, :, 0] = names[sp]
    Y = np.clip(Y, 0.0, 1.0)
    Y /= Y.sum(axis=0, keepdims=True)
    U0 = np.zeros((3, NX, NY, 1))
    U0[0, :, :, 0] = names["U"][:, :, 0]
    U0[1, :, :, 0] = names["U"][:, :, 1]
    T0 = names["T"][:, :, None]

    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(
        rtol=1e-6 if args.dtype == "f64" else 1e-4,
        atol=1e-10 if args.dtype == "f64" else 1e-8, max_steps=10000))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b_ux, b_uy, b_uy),
        bcs_p=b_p, bcs_h=b_T, bcs_Y=bcs_Y, bcs_rho=b_rho,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))))
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0, dtype),
                             jnp.asarray(T0, dtype), jnp.asarray(Y, dtype),
                             jnp.asarray(U0, dtype))

    dt = args.dt
    step = jax.jit(lambda st: solver.step(st, dt)[0])
    import time as _t
    t0 = _t.perf_counter()
    xs = (np.arange(NX) + 0.5) * 0.05 / NX
    for i in range(args.steps):
        s = step(s)
        if (i + 1) % args.every == 0:
            Tn = np.asarray(s.T[:, :, 0])
            hot = np.where(Tn.max(axis=1) > 1500.0)[0]
            x_tip = xs[hot[0]] * 1e3 if hot.size else float("nan")
            print(f"t={float(s.time)*1e3:7.3f} ms  "
                  f"T=[{Tn.min():6.1f},{Tn.max():7.1f}] "
                  f"flame tip x={x_tip:6.2f} mm "
                  f"u_max={float(jnp.abs(s.U).max()):.2f}", flush=True)
            if not np.isfinite(Tn.max()):
                raise RuntimeError("diverged")
    print(f"wall: {_t.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
