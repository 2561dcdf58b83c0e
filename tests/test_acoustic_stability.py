"""Acoustic stability of the low-Mach PIMPLE core at high acoustic CFL.

Regression for two coupled defects found on the 2D reacting TGV anchor case
(reference CI case, corrtest.cpp:51-57):

1. HbyA including the pressure-gradient source (OpenFOAM's UEqn.H() excludes
   it) applied the pressure force twice — once wide-stencil inside phiHbyA,
   once compact via snGrad — whose high-k wide-minus-compact remnant pumped
   an exponential acoustic instability (~x1.3/step) wherever a density
   gradient coexists with advection. Blow-up by step ~78 at dt 1e-6
   (acoustic CFL ~12); stable at CFL ~6 — a classic conditional instability.
2. rhorAUf built as interp(rho)*interp(rAU) instead of interp(rho*rAU)
   raises the ddtCorr recursion gain above 1 across density jumps (AM-HM).

The test reproduces the minimal unstable configuration — hot kernel (5x
density ratio) + vortex advection + acoustic CFL ~12, chemistry off — and
asserts the high-frequency pressure mode stays bounded.
"""
import numpy as np
import jax
import jax.numpy as jnp

from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                     make_kinetics, make_transport)
from deepflame_tpu.combustion import NoCombustion
from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig


def test_acoustic_stability_hot_kernel_vortex():
    dtype = jnp.float64
    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech, dtype)
    tr = make_transport(mech, dtype)
    kin = make_kinetics(mech, dtype)

    n = 48
    L = 2.0 * np.pi * 1e-3
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=False))

    ns = mech.n_species
    Y = np.zeros((ns,) + mesh.shape)
    Y[int(mech.species_index("N2"))] = 0.77
    Y[int(mech.species_index("O2"))] = 0.23
    X, Yg, _ = mesh.cell_centers(dtype)
    k = 2.0 * np.pi / L
    U = jnp.stack([4.0 * jnp.sin(k * X) * jnp.cos(k * Yg),
                   -4.0 * jnp.cos(k * X) * jnp.sin(k * Yg),
                   jnp.zeros(mesh.shape, dtype)])
    r2 = (X - L / 2) ** 2 + (Yg - L / 2) ** 2
    T = 300.0 + 1350.0 * jnp.exp(-r2 / (L / 8) ** 2)
    p = jnp.full(mesh.shape, 101325.0, dtype)
    s = solver.initial_state(p, T.astype(dtype), jnp.asarray(Y, dtype), U)

    # dt set for acoustic CFL ~12 at this coarser grid: c*dt/h ~ 600*dt/h
    h = L / n
    dt = 12.0 * h / 600.0
    step = jax.jit(lambda st: solver.step(st, dt)[0])

    def d2p(st):
        return float(jnp.max(jnp.abs(st.p[2:] - 2 * st.p[1:-1] + st.p[:-2])))

    hist = []
    for i in range(40):
        s = step(s)
        if (i + 1) % 10 == 0:
            hist.append(d2p(s))
            assert bool(jnp.all(jnp.isfinite(s.p))), f"NaN at step {i+1}"

    # bounded: the unstable scheme reaches 1e3+ by step 40 (x1.3/step);
    # the fixed scheme hovers at O(1) Pa
    assert hist[-1] < 50.0, hist
    # no systematic exponential growth across the run
    assert hist[-1] < 10.0 * max(hist[0], 1.0), hist
    assert float(jnp.max(jnp.abs(s.U))) < 10.0
