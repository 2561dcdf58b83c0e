"""LTS rDeltaT field, splitting strategy, and the case driver."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
from deepflame_tpu.ops.lts import set_r_delta_t, smooth_field


def test_r_delta_t():
    n = 32
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    rho = jnp.ones(mesh.shape)
    # fast flow in the middle only
    phi_x = jnp.zeros((n + 1, 1, 1)).at[n // 2 - 2:n // 2 + 2].set(10.0)
    phi = (phi_x, jnp.zeros((n, 2, 1)), jnp.zeros((n, 1, 2)))
    rdt = set_r_delta_t(phi, rho, b, mesh, max_co=0.5, max_dt=1.0)
    r = np.asarray(rdt).squeeze()
    # fast region: rDeltaT = u/(Co h) = 10/(0.5/32) = 640; slow: 1/max_dt
    assert abs(r.max() - 10.0 / 0.5 * n) / (10.0 / 0.5 * n) < 0.1
    assert r.min() == pytest.approx(1.0)
    # smoothing spreads high values into neighbors
    mid = n // 2
    assert r[mid + 3] > r.min()
    # damping limits growth vs the previous field
    rdt2 = set_r_delta_t(phi, rho, b, mesh, max_co=0.5, max_dt=1.0,
                         r_delta_t_old=jnp.full(mesh.shape, 100.0),
                         damping=0.1)
    assert float(rdt2.max()) <= 110.0 * 1.0000001


def test_driver_with_splitting(tmp_path):
    """Driver runs the reacting hot-spot case with splittingStrategy and
    function objects + checkpoints."""
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.chemistry.integrator import RosenbrockOptions
    from deepflame_tpu.combustion import Laminar
    from deepflame_tpu.runtime import (ControlDict, FieldMinMax,
                                       FunctionObjectSet, latest_time)
    from deepflame_tpu.runtime.driver import run_case
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 12
    L = 2e-3
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(rtol=1e-6, atol=1e-12))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))))
    ns = mech.n_species
    Yf = np.zeros(ns)
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yf[iH2], Yf[iO2], Yf[iN2] = 0.0285, 0.2264, 0.7451
    X, Yg, _ = mesh.cell_centers()
    r2 = (X - L / 2) ** 2 + (Yg - L / 2) ** 2
    T = jnp.where(r2 < (L / 4) ** 2, 2200.0, 800.0)
    p = jnp.full(mesh.shape, 101325.0)
    Y = jnp.asarray(np.tile(Yf[:, None, None, None], (1,) + mesh.shape))
    state = solver.initial_state(p, T, Y)

    fmm = FieldMinMax(mesh, ["T"], out_dir=str(tmp_path / "fmm"))
    fos = FunctionObjectSet([fmm])
    ctrl = ControlDict(end_time=6e-6, delta_t=1e-6, write_interval=2e-6)
    final = run_case(solver, state, ctrl, function_objects=fos,
                     checkpoint_dir=str(tmp_path / "ckpt"), splitting=True,
                     fields_fn=lambda s: {"T": s.T}, log_every=100)
    assert float(final.time) == pytest.approx(6e-6)
    assert np.all(np.isfinite(np.asarray(final.T)))
    assert float(final.T.max()) > 2300.0     # chemistry fired under splitting
    assert len(fmm.rows) >= 2
    assert latest_time(str(tmp_path / "ckpt")) is not None


def test_driver_warm_restart(tmp_path):
    """run_case(restart=True) resumes from the latest checkpoint: the
    interrupted-then-resumed trajectory is bit-identical to an uninterrupted
    run (OpenFOAM `startFrom latestTime` parity), the write schedule stays on
    the global grid, and the adjustable dt persists via checkpoint meta."""
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.runtime import ControlDict
    from deepflame_tpu.runtime.checkpoint import load_meta
    from deepflame_tpu.runtime.driver import run_case
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

    DATA = os.path.join(os.path.dirname(__file__), "data")
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 10
    L = 0.1
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=False))
    X, Yg, _ = mesh.cell_centers()
    T0 = 300.0 + 50.0 * jnp.sin(2 * jnp.pi * X / L)
    p0 = jnp.full(mesh.shape, 101325.0)
    Y0 = jnp.ones((1,) + mesh.shape)
    state0 = solver.initial_state(p0, T0, Y0)

    dt = 1e-5
    # uninterrupted: 10 steps to 1e-4
    ref = run_case(solver, state0, ControlDict(end_time=1e-4, delta_t=dt,
                                               write_interval=1e-3),
                   log_every=100)
    # interrupted at 5e-5, then restarted
    ck = str(tmp_path / "ckpt")
    mid = run_case(solver, state0,
                   ControlDict(end_time=5e-5, delta_t=dt,
                               write_interval=5e-5),
                   checkpoint_dir=ck, log_every=100)
    assert load_meta(ck)["dt"] == pytest.approx(dt)
    fin = run_case(solver, state0,          # state0 is only the template
                   ControlDict(end_time=1e-4, delta_t=dt,
                               write_interval=5e-5),
                   checkpoint_dir=ck, restart=True, log_every=100)
    assert float(fin.time) == pytest.approx(1e-4)
    np.testing.assert_array_equal(np.asarray(fin.T), np.asarray(ref.T))
    np.testing.assert_array_equal(np.asarray(fin.U), np.asarray(ref.U))
    # write schedule stayed on the global grid: checkpoints at 5e-5 and 1e-4
    from deepflame_tpu.runtime import latest_time
    assert latest_time(ck) == pytest.approx(1e-4)


# ---------------------------------------------------------------------------
# Face-list LTS (setRDeltaT on arbitrary connectivity — dfLowMachFoam.C:255,
# dfHighSpeedFoam.C:182; closes the structured-only gap, VERDICT r4 item 6)
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_r_delta_t_fl_structured_parity():
    """FL convective rDeltaT == structured rDeltaT on the same cyclic box
    (surfaceSum(|phi| magSf)/(2 maxCo V rho) reduces to the structured
    per-axis form exactly on a uniform grid)."""
    from deepflame_tpu.mesh.facelist import (from_structured,
                                             structured_face_maps)
    from deepflame_tpu.ops.lts import set_r_delta_t_fl

    n = 32
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    rho = jnp.ones(mesh.shape)
    phi_x = jnp.zeros((n + 1, 1, 1)).at[n // 2 - 2:n // 2 + 2].set(10.0)
    phi = (phi_x, jnp.zeros((n, 2, 1)), jnp.zeros((n, 1, 2)))
    rdt_s = set_r_delta_t(phi, rho, b, mesh, max_co=0.5, max_dt=1.0)

    fl = from_structured(mesh, b)
    per_axis, _ = structured_face_maps(mesh, b)
    phi_fl = jnp.ravel(phi_x)[per_axis[0]]
    rdt_fl = set_r_delta_t_fl(fl, phi_fl, jnp.ones(n),
                              max_co=0.5, max_dt=1.0)
    np.testing.assert_allclose(np.asarray(rdt_fl),
                               np.asarray(rdt_s).ravel(), rtol=1e-12)
    # damping parity
    rdt_s2 = set_r_delta_t(phi, rho, b, mesh, max_co=0.5, max_dt=1.0,
                           r_delta_t_old=jnp.full(mesh.shape, 100.0),
                           damping=0.1)
    rdt_fl2 = set_r_delta_t_fl(fl, phi_fl, jnp.ones(n), max_co=0.5,
                               max_dt=1.0,
                               r_delta_t_old=jnp.full((n,), 100.0),
                               damping=0.1)
    np.testing.assert_allclose(np.asarray(rdt_fl2),
                               np.asarray(rdt_s2).ravel(), rtol=1e-12)


@pytest.mark.smoke
def test_lts_step_high_speed_fl():
    """FL density-based solver marches with a per-cell acoustic-LTS dt
    field: fields stay finite, the clock advances by min(dt) (pseudo-time
    steady-state marching, dfHighSpeedFoam LTS mode)."""
    import os
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics)
    from deepflame_tpu.mesh import zero_gradient
    from deepflame_tpu.mesh.facelist import from_structured
    from deepflame_tpu.ops.lts import set_r_delta_t_acoustic_fl
    from deepflame_tpu.solvers.high_speed import HighSpeedConfig
    from deepflame_tpu.solvers.high_speed_fl import HighSpeedSolverFL

    data = os.path.join(os.path.dirname(__file__), "data")
    mech = load_mechanism(os.path.join(data, "air.yaml"))
    th, kin = make_thermo(mech), make_kinetics(mech)
    n = 128
    mesh = StructuredMesh.box([1.0, 1e-2, 1e-2], [n, 1, 1])
    bcs = ((zero_gradient(), zero_gradient()),
           (empty(), empty()), (empty(), empty()))
    fl = from_structured(mesh, bcs)
    cfg = HighSpeedConfig(flux="HLLC", rk_order=1, limiter="vanLeer",
                          chemistry="none")
    solver = HighSpeedSolverFL(m_rho=fl, m_p=fl, m_Y=fl, m_U=(fl, fl, fl),
                               thermo=th, kinetics=kin, config=cfg)
    X, _, _ = mesh.cell_centers()
    x = jnp.ravel(X)
    from deepflame_tpu.chemistry.mechanism import GAS_CONSTANT
    W = mech.molecular_weights[0]
    p = jnp.where(x < 0.5, 1e5, 1e4)
    rho0 = jnp.where(x < 0.5, 1.0, 0.125)
    T = p * W / (rho0 * GAS_CONSTANT)
    Y = jnp.ones((n, 1))
    s = solver.initial_state(p, T, Y)
    rho, U, p_, T_, _ = solver.primitives(s)
    c = solver.thermo.sound_speed(T_, Y)
    un = jnp.zeros_like(fl.mag_sf)
    rdt = set_r_delta_t_acoustic_fl(fl, un, c, max_co=0.4, max_dt=1.0)
    dt_field = 1.0 / rdt
    assert dt_field.shape == (n,)
    t0 = float(s.time)
    for _ in range(3):
        s, diag = jax.jit(solver.step)(s, dt_field)
    assert np.isfinite(float(diag["T_max"]))
    assert np.isfinite(float(diag["p_max"]))
    # clock advanced by 3 * min(dt)
    np.testing.assert_allclose(float(s.time) - t0,
                               3.0 * float(jnp.min(dt_field)), rtol=1e-6)
