"""FGM: table IO round trip, lookup parity vs numpy, FGM solver E2E.

Anchors: tableSolver lookup1d-6d multilinear interpolation semantics
(/root/reference/src/dfCombustionModels/FGM/flameletTableSolver/
tableSolver.H:200-227) and the flareFGM transport/lookup loop.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.combustion.fgm.table import (
    FlameletTable, lookup, make_synthetic_table, read_flare_table,
    write_flare_table)


def test_table_io_roundtrip(tmp_path):
    tb = make_synthetic_table()
    path = str(tmp_path / "flare.tbl")
    write_flare_table(path, tb)
    tb2 = read_flare_table(path)
    assert tb2.shape == tb.shape
    assert tb2.scaled_pv == tb.scaled_pv
    for name in tb.tables:
        np.testing.assert_allclose(np.asarray(tb2.tables[name]),
                                   np.asarray(tb.tables[name]), rtol=1e-6)
    for ax in range(6):
        np.testing.assert_allclose(tb2.axes[ax], tb.axes[ax], rtol=1e-9)


def test_lookup_multilinear_parity():
    """lookup == scipy map_coordinates == manual multilinear interp on the
    interior; clamps at the edges."""
    tb = make_synthetic_table(NZ=11, NC=7, NGZ=4, NGC=3)
    rng = np.random.default_rng(0)
    z = rng.uniform(0.05, 0.95, 50)
    c = rng.uniform(0.05, 0.95, 50)
    gz = rng.uniform(0.01, 0.24, 50)
    gc = rng.uniform(0.01, 0.24, 50)
    ours = np.asarray(lookup(tb, "Tf", (None, jnp.asarray(z), jnp.asarray(c),
                                        jnp.asarray(gz), jnp.asarray(gc),
                                        None)))
    from scipy.ndimage import map_coordinates as mc
    tab = np.asarray(tb.tables["Tf"])[0, :, :, :, :, 0]

    def to_idx(x, ax):
        return np.interp(x, ax, np.arange(len(ax)))
    ref = mc(tab, [to_idx(z, tb.axes[1]), to_idx(c, tb.axes[2]),
                   to_idx(gz, tb.axes[3]), to_idx(gc, tb.axes[4])],
             order=1, mode="nearest")
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # out-of-range clamps (no NaN, no extrapolation blowup)
    v = float(lookup(tb, "Tf", (None, jnp.asarray(2.0), jnp.asarray(0.5),
                                jnp.asarray(0.0), jnp.asarray(0.0), None)))
    assert np.isfinite(v)


def test_fgm_solver_e2e():
    """2D premixed-front FGM case with a synthetic table: progress variable
    advances (omgc source), T follows the table, fields stay bounded."""
    from deepflame_tpu.chemistry import load_mechanism, make_thermo, \
        make_kinetics, make_transport
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.solvers.fgm import FGMSolver, FGMConfig

    mech = load_mechanism(os.path.join(os.path.dirname(__file__), "data",
                                       "air.yaml"))
    th = make_thermo(mech)
    tr = make_transport(mech)
    kin = make_kinetics(mech)
    tb = make_synthetic_table(dtype=jnp.float64)
    n = 16
    L = 1e-2
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    solver = FGMSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=FGMConfig(chemistry=False), table=tb, bcs_Z=b)
    X, Yg, _ = mesh.cell_centers()
    Z = jnp.full(mesh.shape, 0.3)          # at the flammable peak
    r2 = (X - L / 2) ** 2 + (Yg - L / 2) ** 2
    c0 = jnp.where(r2 < (L / 4) ** 2, 0.5, 0.0)
    p = jnp.full(mesh.shape, 101325.0)
    s = solver.fgm_initial_state(p, Z, c0)
    T0max = float(s.T.max())
    assert T0max > 1000.0   # burned kernel from the table

    dt = 1e-5
    step = jax.jit(lambda st: solver.step(st, dt))
    rc_tot0 = float(jnp.sum(s.rho * s.c))
    for _ in range(5):
        s, diag = step(s)
    assert np.all(np.isfinite(np.asarray(s.T)))
    assert np.all(np.isfinite(np.asarray(s.p)))
    # progress-variable mass grows (positive omgc source in the kernel;
    # diffusion conserves rho*c)
    assert float(jnp.sum(s.rho * s.c)) > rc_tot0
    assert float(s.c.max()) <= 1.0 + 1e-9
    assert 250.0 < float(s.T.min()) and float(s.T.max()) < 2500.0


def test_deepfgm_distillation():
    """DeePFGM: NN distilled from a table reproduces lookups; the FGM solver
    runs with the NN in place of the table."""
    from deepflame_tpu.combustion.fgm.deep import train_deep_fgm
    tb = make_synthetic_table(dtype=jnp.float64)
    net = train_deep_fgm(tb, hidden=(64, 64, 32), n_samples=8000,
                         epochs=400, batch=1024, lr=3e-3, seed=0)
    rng = np.random.default_rng(3)
    Z = jnp.asarray(rng.uniform(0.05, 0.95, 200))
    c = jnp.asarray(rng.uniform(0.05, 0.95, 200))
    gz = jnp.asarray(rng.uniform(0.0, 0.2, 200))
    gc = jnp.asarray(rng.uniform(0.0, 0.2, 200))
    out = net.query(Z, c, gz, gc)
    T_ref = np.asarray(lookup(tb, "Tf", (None, Z, c, gz, gc, None)))
    T_nn = np.asarray(out["Tf"])
    # temperature within a few % RMS of the table over the manifold
    rms = np.sqrt(np.mean((T_nn - T_ref) ** 2)) / T_ref.mean()
    assert rms < 0.05, rms
    assert np.all(np.asarray(out["omgc"]) >= 0.0)

    # solver runs with the NN manifold
    import os as _os
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.solvers.fgm import FGMSolver, FGMConfig
    mech = load_mechanism(_os.path.join(_os.path.dirname(__file__), "data",
                                        "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 12
    L = 1e-2
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    solver = FGMSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=FGMConfig(chemistry=False), table=tb, bcs_Z=b, deepfgm=net)
    X, Yg, _ = mesh.cell_centers()
    r2 = (X - L / 2) ** 2 + (Yg - L / 2) ** 2
    s = solver.fgm_initial_state(jnp.full(mesh.shape, 101325.0),
                                 jnp.full(mesh.shape, 0.3),
                                 jnp.where(r2 < (L / 4) ** 2, 0.5, 0.0))
    step = jax.jit(lambda st: solver.step(st, 1e-5))
    for _ in range(3):
        s, diag = step(s)
    assert np.all(np.isfinite(np.asarray(s.T)))
    assert float(s.c.max()) <= 1.0 + 1e-9


def test_fgm_enthalpy_loss_dimension():
    """NH>1 table + solveEnthalpy: an enthalpy deficit (He below adiabatic)
    moves the lookup along the hLoss axis (flareFGM.C:191-195) and lowers
    T vs the adiabatic lookup; with solve_enthalpy the He field is
    transported and bounded."""
    from deepflame_tpu.chemistry import load_mechanism, make_thermo, \
        make_kinetics, make_transport
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.solvers.fgm import FGMSolver, FGMConfig

    mech = load_mechanism(os.path.join(os.path.dirname(__file__), "data",
                                       "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    tb = make_synthetic_table(NH=4, dtype=jnp.float64)
    assert len(tb.axes[0]) == 4
    n = 12
    L = 1e-2
    mesh = StructuredMesh.box([L, L / n, L / n], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    solver = FGMSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=FGMConfig(chemistry=False, solve_enthalpy=True),
        table=tb, bcs_Z=b)
    Z = jnp.full(mesh.shape, 0.3)
    c0 = jnp.full(mesh.shape, 0.8)
    # direct lookup check: hLoss = h_ad - He
    He_ad = solver._adiabatic_enthalpy(Z)
    T_ad, *_ = solver._lookup_state(Z, jnp.zeros_like(Z), c0,
                                    jnp.zeros_like(Z), He=He_ad)
    T_loss, *_ = solver._lookup_state(Z, jnp.zeros_like(Z), c0,
                                      jnp.zeros_like(Z), He=He_ad - 5e5)
    assert float(T_loss.max()) < float(T_ad.min())  # heat loss cools
    # mid-range deficit interpolates monotonically
    T_half, *_ = solver._lookup_state(Z, jnp.zeros_like(Z), c0,
                                      jnp.zeros_like(Z), He=He_ad - 2.5e5)
    assert float(T_ad.min()) > float(T_half.max()) > float(T_loss.max())

    # e2e: transported He stays finite and T bounded
    s = solver.fgm_initial_state(jnp.full(mesh.shape, 101325.0), Z, c0)
    s = s._replace(He=s.He - 2e5)   # start with a uniform heat deficit
    step = jax.jit(lambda st: solver.step(st, 1e-5))
    for _ in range(4):
        s, diag = step(s)
    assert np.all(np.isfinite(np.asarray(s.He)))
    assert np.all(np.isfinite(np.asarray(s.T)))
    assert 250.0 < float(s.T.min()) and float(s.T.max()) < 2500.0
