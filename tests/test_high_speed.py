"""Density-based solver validation (SURVEY.md §7 stage 7).

Anchors: Sod shock tube vs exact Riemann plateau values; exact conservation
of all conservative variables on periodic domains (the flux-difference form);
scheme cross-checks. The 1D H2 detonation speed anchor (1979.33 m/s,
corrtest.cpp:47-49) runs as examples/detonation_1d.py (too slow for unit CI).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.chemistry import (load_mechanism, make_thermo, make_kinetics)
from deepflame_tpu.mesh import StructuredMesh, zero_gradient, cyclic, empty
from deepflame_tpu.solvers.high_speed import (HighSpeedConfig, HighSpeedSolver)

import os
DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def air():
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    return mech, make_thermo(mech), make_kinetics(mech)


def make_solver(mech, th, kin, mesh, bcs_kind="transmissive", flux="HLLC",
                limiter="vanLeer", rk=2):  # noqa: D103
    if bcs_kind == "transmissive":
        b = ((zero_gradient(), zero_gradient()),) * 3
    else:
        b = ((cyclic(), cyclic()),) * 3
    bx = (b[0], (empty(), empty()), (empty(), empty()))
    cfg = HighSpeedConfig(flux=flux, rk_order=rk, limiter=limiter,
                          chemistry="none")
    return HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                           bcs_rho=bx, bcs_U=(bx, bx, bx), bcs_p=bx,
                           bcs_Y=bx, config=cfg)


@pytest.mark.smoke
@pytest.mark.parametrize("flux,limiter", [
    ("HLLC", "vanLeer"), ("HLLCP", "vanLeer"), ("AUSMDV", "vanLeer"),
    ("Kurganov", "vanLeer"), ("Tadmor", "vanLeer"), ("HLLC", "WENO5")])
def test_sod_shock_tube(air, flux, limiter):
    """Dimensional Sod problem in N2 (gamma ~ 1.4): star-region pressure and
    shock position vs the exact Riemann solution."""
    mech, th, kin = air
    n = 400
    mesh = StructuredMesh.box([1.0, 1e-2, 1e-2], [n, 1, 1])
    solver = make_solver(mech, th, kin, mesh, flux=flux, limiter=limiter)
    X, _, _ = mesh.cell_centers()
    pL, pR = 1e5, 1e4
    rhoL, rhoR = 1.0, 0.125
    from deepflame_tpu.constants import GAS_CONSTANT
    W = mech.molecular_weights[0]
    TL = pL * W / (rhoL * GAS_CONSTANT)
    TR = pR * W / (rhoR * GAS_CONSTANT)
    T = jnp.where(X < 0.5, TL, TR)
    p = jnp.where(X < 0.5, pL, pR)
    Y = jnp.ones((1,) + mesh.shape)
    s = solver.initial_state(p, T, Y)
    a0 = float(jnp.sqrt(1.4 * pL / rhoL))
    t_end = 0.25 / a0 * 1.0   # shock travels ~0.3 of domain
    dt = 0.4 * mesh.dx / (a0 * 1.8)
    nsteps = int(t_end / dt)

    step = jax.jit(lambda s: solver.step(s, dt)[0])
    for _ in range(nsteps):
        s = step(s)
    rho, U, p_f, T_f, _ = solver.primitives(s)
    rho = np.asarray(rho).squeeze()
    u = np.asarray(U[0]).squeeze()
    pf = np.asarray(p_f).squeeze()
    # exact star values for gamma=1.4 Sod: p* = 0.30313 p0, u* = 0.92745*sqrt(p0/rho0)/1.1832...
    # (classic nondim: u* = 0.92745 with aL = 1.1832 -> dimensional scale sqrt(pL/rhoL))
    vel_scale = np.sqrt(pL / rhoL)
    p_star = 0.30313 * pL
    u_star = 0.92745 * vel_scale
    # contact region: sample where u is near its plateau
    mask = (np.asarray(X).squeeze() > 0.55) & (np.asarray(X).squeeze() < 0.65)
    assert abs(pf[mask].mean() - p_star) / p_star < 0.03, flux
    assert abs(u[mask].mean() - u_star) / u_star < 0.03, flux
    # no negative density/pressure anywhere
    assert rho.min() > 0 and pf.min() > 0


def test_periodic_conservation(air):
    """Smooth periodic flow: exact conservation of rho, rhoU, rhoE, rhoY."""
    mech, th, kin = air
    n = 32
    mesh = StructuredMesh.box([1.0, 1.0, 1.0 / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    cfg = HighSpeedConfig(flux="HLLC", rk_order=3, chemistry="none")
    solver = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                             bcs_rho=b, bcs_U=(b, b, b), bcs_p=b, bcs_Y=b,
                             config=cfg)
    X, Yg, _ = mesh.cell_centers()
    T = 300.0 + 50.0 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Yg)
    p = jnp.full(mesh.shape, 1e5) + 1e3 * jnp.cos(2 * jnp.pi * X)
    U = jnp.stack([50.0 * jnp.sin(2 * jnp.pi * Yg),
                   30.0 * jnp.cos(2 * jnp.pi * X),
                   jnp.zeros(mesh.shape)])
    Y = jnp.ones((1,) + mesh.shape)
    s = solver.initial_state(p, T, Y, U)
    totals0 = [float(jnp.sum(x)) for x in (s.rho, s.rhoU[0], s.rhoU[1],
                                           s.rhoE, s.rhoY[0])]
    dt = 1e-5 * 1.0 / n
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    for _ in range(20):
        s = step(s)
    totals1 = [float(jnp.sum(x)) for x in (s.rho, s.rhoU[0], s.rhoU[1],
                                           s.rhoE, s.rhoY[0])]
    for a, b_, in zip(totals0, totals1):
        scale = max(abs(a), 1e-6 * abs(totals0[3]))
        assert abs(b_ - a) / scale < 1e-10, (a, b_)
    assert np.all(np.isfinite(np.asarray(s.rhoE)))


def test_reactive_ignition_const_volume(air):
    """Chemistry split at constant (rho, e): a uniform hot H2/O2/AR mixture in
    a periodic box ignites — T and p rise with rhoE exactly conserved."""
    mech = load_mechanism("/root/reference/mechanisms/H2/H2_AR.yaml")
    th = make_thermo(mech)
    kin = make_kinetics(mech)
    n = 4
    mesh = StructuredMesh.box([1e-2, 1e-2, 1e-2], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    cfg = HighSpeedConfig(flux="HLLC", rk_order=2, chemistry="ode")
    solver = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                             bcs_rho=b, bcs_U=(b, b, b), bcs_p=b, bcs_Y=b,
                             config=cfg)
    ns = mech.n_species
    Yv = np.zeros(ns)
    iH2, iO2 = mech.species_index("H2"), mech.species_index("O2")
    iAR = mech.species_index("AR")
    Yv[iH2], Yv[iO2], Yv[iAR] = 0.108, 0.862, 0.030   # ~stoichiometric H2-O2
    T = jnp.full(mesh.shape, 1300.0)
    p = jnp.full(mesh.shape, 101325.0)
    Y = jnp.asarray(np.tile(Yv[:, None, None, None], (1,) + mesh.shape))
    s = solver.initial_state(p, T, Y)
    E0 = float(jnp.sum(s.rhoE))
    dt = 2e-6
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    for _ in range(40):
        s = step(s)
    rho, U, p_f, T_f, Y_f = solver.primitives(s)
    assert float(T_f.max()) > 1400.0, "no ignition"
    assert abs(float(jnp.sum(s.rhoE)) - E0) / abs(E0) < 1e-9
    assert float(Y_f[iH2].max()) < Yv[iH2]


def test_weno5_periodic_conservation_and_accuracy(air):
    """WENO5: exact conservation at the cyclic seam; much lower dissipation
    than MUSCL on a smooth advected profile."""
    mech, th, kin = air
    n = 64
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    b = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    from deepflame_tpu.constants import GAS_CONSTANT
    W = mech.molecular_weights[0]

    def run(limiter, steps=100):
        cfg = HighSpeedConfig(flux="HLLC", rk_order=3, limiter=limiter,
                              chemistry="none")
        solver = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin,
                                 bcs_rho=b, bcs_U=(b, b, b), bcs_p=b,
                                 bcs_Y=b, config=cfg)
        X, _, _ = mesh.cell_centers()
        # entropy wave: density variation advected at constant u, p
        rho0 = 1.0 + 0.3 * jnp.sin(2 * jnp.pi * X) ** 4
        p0 = jnp.full(mesh.shape, 1e5)
        T0 = p0 * W / (rho0 * GAS_CONSTANT)
        U0 = jnp.stack([jnp.full(mesh.shape, 100.0),
                        jnp.zeros(mesh.shape), jnp.zeros(mesh.shape)])
        s = solver.initial_state(p0, T0, jnp.ones((1,) + mesh.shape), U0)
        m0 = float(jnp.sum(s.rho))
        dt = 0.3 * mesh.dx / 500.0
        step = jax.jit(lambda st: solver.step(st, dt)[0])
        for _ in range(steps):
            s = step(s)
        assert abs(float(jnp.sum(s.rho)) - m0) / m0 < 1e-11, limiter
        # amplitude retention of the density wave
        r = np.asarray(s.rho).squeeze()
        return r.max() - r.min()

    amp_weno = run("WENO5")
    amp_muscl = run("minmod")
    assert amp_weno > amp_muscl * 1.02, (amp_weno, amp_muscl)


def test_lts_per_cell_dt(air):
    """LTS machinery (dfHighSpeedFoam.C:182-186 parity): a per-cell dt field
    equal to a uniform scalar reproduces the scalar-dt step; the acoustic
    rDeltaT formula bounds the local CFL."""
    from deepflame_tpu.ops.lts import set_r_delta_t_acoustic
    mech, th, kin = air
    n = 32
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    solver = make_solver(mech, th, kin, mesh)
    X, _, _ = mesh.cell_centers(jnp.float64)
    p = jnp.where(X < 0.5, 2.0 * 101325.0, 101325.0)
    T = jnp.full(mesh.shape, 300.0)
    Y = jnp.ones((1,) + mesh.shape)
    s0 = solver.initial_state(p, T, Y)
    dt = 1e-6
    s_scalar, _ = solver.step(s0, dt)
    s_field, _ = solver.step(s0, jnp.full(mesh.shape, dt))
    np.testing.assert_allclose(np.asarray(s_field.rho),
                               np.asarray(s_scalar.rho), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(s_field.rhoE),
                               np.asarray(s_scalar.rhoE), rtol=1e-13)
    assert float(s_field.time) == float(s_scalar.time)
    # acoustic rDeltaT: local dt respects CFL against |u| + c
    rho, U, pr, Tn, _ = solver.primitives(s0)
    c = th.sound_speed(Tn, jnp.moveaxis(s0.rhoY / s0.rho[None], 0, -1))
    bcs = solver.bcs_p
    r_dt = set_r_delta_t_acoustic(U, c, bcs, mesh, max_co=0.5)
    dt_loc = 1.0 / np.asarray(r_dt)
    co = dt_loc * (np.abs(np.asarray(U[0])) + np.asarray(c)) / mesh.dx
    assert co.max() <= 2.0 * 0.5 + 1e-9    # the 2*maxCo normalization


def test_manual_injection_mist_sources(air):
    """ManualInjector releases all parcels once at SOI; drag on a moving gas
    extracts momentum (water-mist attenuation mechanism)."""
    from deepflame_tpu.chemistry import make_transport
    from deepflame_tpu.lagrangian.cloud import ManualInjector, SprayCloud
    from deepflame_tpu.lagrangian.liquids import water
    from deepflame_tpu.solvers.spray import HighSpeedSpraySolver
    mech, th, kin = air
    tr = make_transport(mech)
    n = 32
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    gas = make_solver(mech, th, kin, mesh)
    xs = np.linspace(0.4, 0.9, 64)
    h = 0.5 / n
    pos = np.stack([xs, np.full_like(xs, h), np.full_like(xs, h)], axis=1)
    inj = ManualInjector(positions=pos, soi=2e-6, d0=5e-6, n_particle=1e4,
                         T_inject=300.0, rho_liquid=997.0)
    cloud = SprayCloud(mesh=mesh, liquid=water(), injector=inj,
                       max_parcels=64, evaporation="Spalding",
                       breakup="none", wall_interaction=())
    solver = HighSpeedSpraySolver(gas_solver=gas, cloud=cloud, transport=tr,
                                  vapor_index=0)
    T = jnp.full(mesh.shape, 600.0)
    p = jnp.full(mesh.shape, 101325.0)
    Y = jnp.ones((1,) + mesh.shape)
    U = jnp.stack([jnp.full(mesh.shape, 50.0), jnp.zeros(mesh.shape),
                   jnp.zeros(mesh.shape)])
    s = solver.initial_state(p, T, Y, U)
    dt = 1e-6
    step = jax.jit(lambda st: solver.step(st, dt)[0])
    s = step(s)
    assert int(np.asarray(s.cloud.active).sum()) == 0    # before SOI
    s = step(s)
    s = step(s)
    n_act = int(np.asarray(s.cloud.active).sum())
    assert n_act == 64                                   # one-shot release
    # drag decelerates the gas where the mist sits; droplets accelerate
    ux = np.asarray(s.gas.rhoU[0] / s.gas.rho).squeeze()
    mist = (np.asarray(mesh.cell_centers(jnp.float64)[0]).squeeze() > 0.45) \
        & (np.asarray(mesh.cell_centers(jnp.float64)[0]).squeeze() < 0.85)
    assert ux[mist].mean() < 50.0 - 1e-6
    assert float(np.asarray(s.cloud.vel[0])[
        np.asarray(s.cloud.active) > 0].mean()) > 0.0
    assert np.all(np.isfinite(np.asarray(s.gas.rhoE)))
