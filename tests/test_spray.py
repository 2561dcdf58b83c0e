"""Lagrangian spray validation (SURVEY.md §7 stage 9, aachenBomb family).

Physics invariants: injected mass accounting, drag relaxation toward gas
velocity, evaporation shrinking droplets and sourcing vapor mass into the
gas, energy sink from latent heat, coupled E2E stability.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.lagrangian.cloud import ConeInjector, SprayCloud
from deepflame_tpu.lagrangian.liquids import n_heptane
from deepflame_tpu.mesh import StructuredMesh, zero_gradient, empty


def make_cloud(mdot=1e-3, u_mag=50.0, evap="Spalding", d_mean=5e-5):
    mesh = StructuredMesh.box([0.02, 0.1, 0.02], [8, 24, 8],
                              origin=(-0.01, -0.1, -0.01))
    inj = ConeInjector(position=(0.0, -0.001, 0.0), direction=(0, -1, 0),
                       u_mag=u_mag, mdot=mdot, t_start=0.0, t_end=1e-3,
                       d_mean=d_mean, parcels_per_step=16)
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=2048, evaporation=evap)
    return mesh, cloud


def gas_fields(mesh, T=800.0, dtype=jnp.float64):
    sh = mesh.shape
    return dict(rho=jnp.full(sh, 6.0, dtype), U=jnp.zeros((3,) + sh, dtype),
                T=jnp.full(sh, T, dtype), mu=jnp.full(sh, 2.5e-5, dtype),
                p=jnp.full(sh, 5e6, dtype), Yv=jnp.zeros(sh, dtype))


def test_injection_mass_accounting():
    mesh, cloud = make_cloud(evap="none")
    c = cloud.init(jax.random.PRNGKey(0))
    g = gas_fields(mesh, T=400.0)
    dt = 1e-5
    step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t))
    t = jnp.asarray(0.0)
    for i in range(10):
        c, src = step(c, t)
        t = t + dt
    stats = cloud.stats(c)
    m_inj = float(c.m_injected)
    m_liquid = float(stats["liquid_mass"])
    np.testing.assert_allclose(m_inj, 1e-3 * 10 * dt, rtol=1e-10)
    # all parcels still in domain, no evaporation -> mass conserved
    np.testing.assert_allclose(m_liquid, m_inj, rtol=1e-6)
    assert float(stats["n_active"]) == 160


def test_drag_relaxes_to_gas():
    """Single parcel batch (injection only in step 1) in still gas:
    velocity decays by drag."""
    mesh, cloud = make_cloud(u_mag=30.0, evap="none", d_mean=2e-5)
    # inject only during the first step
    cloud = type(cloud)(**{**cloud.__dict__,
                           "injector": type(cloud.injector)(
                               **{**cloud.injector.__dict__,
                                  "t_end": 1.5e-5})})
    c = cloud.init(jax.random.PRNGKey(1))
    g = gas_fields(mesh, T=400.0)
    dt = 2e-5
    step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t))
    t = jnp.asarray(0.0)
    c, _ = step(c, t)
    v0 = float(jnp.max(jnp.abs(c.vel) * c.active))
    for i in range(15):
        c, _ = step(c, t + (i + 1) * dt)
    v1 = float(jnp.max(jnp.abs(c.vel) * c.active))
    assert v1 < 0.7 * v0, (v0, v1)


def test_evaporation_sources():
    """Hot gas: droplets shrink, Srho > 0 where parcels are, Sh < 0 (latent
    sink + gas cooling), SY == Srho."""
    mesh, cloud = make_cloud(evap="Spalding", d_mean=3e-5)
    c = cloud.init(jax.random.PRNGKey(2))
    g = gas_fields(mesh, T=900.0)
    dt = 2e-5
    step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t))
    c, _ = step(c, jnp.asarray(0.0))
    d0 = float(jnp.sum(c.d * c.active) / jnp.maximum(jnp.sum(c.active), 1))
    total_evap = 0.0
    for i in range(10):
        c, src = step(c, jnp.asarray((i + 1) * dt))
        total_evap += float(jnp.sum(src.Srho)) * mesh.volume * dt
        np.testing.assert_allclose(np.asarray(src.SY), np.asarray(src.Srho))
    d1 = float(jnp.sum(c.d * c.active) / jnp.maximum(jnp.sum(c.active), 1))
    assert d1 < d0, "droplets did not shrink"
    assert total_evap > 0.0
    # mass balance: injected = liquid + evaporated (no escapes yet)
    m_balance = float(c.m_injected) - float(cloud.stats(c)["liquid_mass"]) \
        - total_evap
    assert abs(m_balance) / float(c.m_injected) < 0.05
    # latent heat sink: energy source negative where droplets evaporate
    assert float(jnp.sum(src.Sh)) < 0.0


def test_coupled_spray_solver():
    """E2E: spray into hot quiescent N2/O2 gas with the full PIMPLE solver —
    gas gains fuel vapor, stays finite, cools near the spray."""
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.mesh import zero_gradient
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.solvers.spray import SpraySolver

    mech = load_mechanism("/root/reference/mechanisms/C7H16/C7_oneStep.yaml")
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    mesh = StructuredMesh.box([0.02, 0.05, 0.02 / 6], [6, 12, 1],
                              origin=(-0.01, -0.05, 0.0))
    b = ((zero_gradient(), zero_gradient()),) * 3
    gas_solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=False))
    iFuel = mech.species_index("C7H16")
    inj = ConeInjector(position=(0.0, -0.002, 0.00166), direction=(0, -1, 0),
                       u_mag=30.0, mdot=5e-4, t_end=1e-3, d_mean=4e-5,
                       parcels_per_step=8)
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=512)
    solver = SpraySolver(gas_solver=gas_solver, cloud=cloud, fuel_index=iFuel)
    ns = mech.n_species
    Y = np.zeros((ns,) + mesh.shape)
    Y[mech.species_index("O2")] = 0.23
    Y[mech.species_index("N2")] = 0.77
    s = solver.initial_state(jnp.full(mesh.shape, 2e6),
                             jnp.full(mesh.shape, 900.0), jnp.asarray(Y))
    dt = 1e-5
    step = jax.jit(lambda st: solver.step(st, dt))
    for _ in range(6):
        s, diag = step(s)
    assert np.all(np.isfinite(np.asarray(s.gas.T)))
    assert np.all(np.isfinite(np.asarray(s.gas.U)))
    # fuel vapor appeared in the gas phase
    assert float(s.gas.Y[iFuel].max()) > 1e-6
    # evaporative cooling: minimum T dropped
    assert float(s.gas.T.min()) < 900.0
    assert float(diag["cloud_n_active"]) > 0


def test_reitz_diwakar_breakup():
    """High-We parcels break up: diameter drops toward the stable diameter,
    liquid mass is conserved through n_part scaling."""
    mesh, cloud = make_cloud(u_mag=250.0, evap="none", d_mean=1.5e-4)
    cloud = type(cloud)(**{**cloud.__dict__, "breakup": "ReitzDiwakar",
                           "injector": type(cloud.injector)(
                               **{**cloud.injector.__dict__,
                                  "t_end": 0.9e-5, "u_mag": 250.0})})
    c = cloud.init(jax.random.PRNGKey(5))
    g = gas_fields(mesh, T=500.0)
    dt = 1e-5
    step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t))
    c, _ = step(c, jnp.asarray(0.0))
    m0 = float(cloud.stats(c)["liquid_mass"])
    d0 = float((c.d * c.active).max())
    for i in range(8):
        c, _ = step(c, jnp.asarray((i + 1) * dt))
    d1 = float((c.d * c.active).max())
    m1 = float(cloud.stats(c)["liquid_mass"])
    assert d1 < 0.9 * d0, (d0, d1)
    # mass conserved (no evaporation; drag only)
    np.testing.assert_allclose(m1, m0, rtol=1e-6)


def test_dispersion_spreads_parcels():
    mesh, cloud = make_cloud(u_mag=20.0, evap="none", d_mean=3e-5)
    base = {**cloud.__dict__, "injector": type(cloud.injector)(
        **{**cloud.injector.__dict__, "t_end": 1.5e-5, "cone_angle_deg": 0.1})}
    cloud_no = type(cloud)(**base)
    cloud_yes = type(cloud)(**{**base, "dispersion": True})
    g = gas_fields(mesh, T=400.0)
    g["k_turb"] = jnp.full(mesh.shape, 20.0)
    dt = 1e-5

    def spread(cl):
        c = cl.init(jax.random.PRNGKey(7))
        step = jax.jit(lambda c, t: cl.evolve(c, g, dt, t))
        for i in range(10):
            c, _ = step(c, jnp.asarray(i * dt))
        act = np.asarray(c.active) > 0
        pos = np.asarray(c.pos)[:, act]
        return pos.std(axis=1).sum()

    assert spread(cloud_yes) > 1.5 * spread(cloud_no)


def test_wall_rebound_and_stick():
    """Parcels hitting a rebound wall reflect with restitution; a stick wall
    parks them with zero velocity; neither loses parcels."""
    mesh = StructuredMesh.box([0.02, 0.05, 0.02], [8, 10, 8],
                              origin=(-0.01, -0.05, -0.01))
    inj = ConeInjector(position=(0.0, -0.002, 0.0), direction=(0, -1, 0),
                       u_mag=30.0, mdot=1e-4, t_start=0.0, t_end=1.5e-5,
                       d_mean=5e-5, parcels_per_step=16, cone_angle_deg=1.0)
    for mode in ("rebound", "stick"):
        cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                           max_parcels=256, evaporation="none",
                           wall_interaction=(((1, 0, mode)),))
        c = cloud.init(jax.random.PRNGKey(3))
        g = dict(rho=jnp.full(mesh.shape, 30.0), U=jnp.zeros((3,) + mesh.shape),
                 T=jnp.full(mesh.shape, 400.0), mu=jnp.full(mesh.shape, 2e-5),
                 p=jnp.full(mesh.shape, 5e6), Yv=jnp.zeros(mesh.shape))
        dt = 5e-4  # drag tau ~4 ms: parcels cover ~0.08 m in 8 steps
        step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t)[0])
        t = 0.0
        for i in range(8):
            c = step(c, jnp.asarray(t))
            t += dt
        n_active = float(jnp.sum(c.active))
        assert n_active == 16.0, (mode, n_active)  # nobody escaped
        act = np.asarray(c.active) > 0
        vy = np.asarray(c.vel[1])[act]
        y = np.asarray(c.pos[1])[act]
        assert np.all(y >= -0.05 - 1e-12), mode
        if mode == "stick":
            # stuck parcels were zeroed on impact; drag keeps them ~0 in
            # quiescent gas
            assert np.all(np.abs(vy) < 0.5), vy
        else:
            # rebounded at least once: some upward or strongly damped motion
            assert np.all(np.abs(vy) < 30.0)


def test_spray_fgm_coupling():
    """Spray + FGM gas phase (FGMLiquidEvaporationBoil parity path): cold
    fuel parcels evaporating in hot gas feed the mixture fraction
    (SZ.source += rhoTrans/dt, baseFGM.C:511-513); Z grows where vapor is
    released and all manifold fields stay bounded."""
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.combustion.fgm.table import make_synthetic_table
    from deepflame_tpu.mesh import cyclic
    from deepflame_tpu.solvers.fgm import FGMSolver, FGMConfig
    from deepflame_tpu.solvers.spray import SpraySolver, SprayState
    import os

    mech = load_mechanism(os.path.join(os.path.dirname(__file__), "data",
                                       "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    tb = make_synthetic_table(dtype=jnp.float64)
    mesh = StructuredMesh.box([0.02, 0.04, 0.02], [6, 12, 6],
                              origin=(-0.01, -0.04, -0.01))
    inj = ConeInjector(position=(0.0, -0.001, 0.0), direction=(0, -1, 0),
                       u_mag=20.0, mdot=5e-4, t_start=0.0, t_end=1e-3,
                       d_mean=2e-5, parcels_per_step=8)
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=512, evaporation="Spalding")
    b = ((zero_gradient(), zero_gradient()),) * 3
    gas = FGMSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=FGMConfig(chemistry=False, combustion_on=False),
        table=tb, bcs_Z=b)
    solver = SpraySolver(gas_solver=gas, cloud=cloud, fuel_index=0)
    sh = mesh.shape
    s = solver.initial_state_fgm(jnp.full(sh, 5e5, jnp.float64),
                                 jnp.zeros(sh, jnp.float64),
                                 jnp.zeros(sh, jnp.float64))
    # hot quiescent gas so droplets evaporate
    s = SprayState(gas=s.gas._replace(T=jnp.full(sh, 900.0, jnp.float64)),
                   cloud=s.cloud)
    dt = 5e-6
    step = jax.jit(lambda st: solver.step(st, dt))
    for _ in range(6):
        s, diag = step(s)
    Z = np.asarray(s.gas.Z)
    assert np.all(np.isfinite(Z))
    assert Z.max() > 1e-8          # evaporation fed the mixture fraction
    assert Z.min() >= 0.0 and Z.max() <= 1.0
    assert np.all(np.isfinite(np.asarray(s.gas.T)))
    assert float(diag["cloud_n_active"]) > 0


def test_patch_func_injection():
    """PatchFuncInjection parity: parcels released across a patch rectangle
    with a position/time-dependent velocity function and a flow-rate
    profile; mass accounting follows the integrated profile."""
    from deepflame_tpu.lagrangian.cloud import PatchFuncInjector

    mesh = StructuredMesh.box([0.02, 0.1, 0.02], [8, 24, 8],
                              origin=(-0.01, -0.1, -0.01))
    # top patch (y = 0 plane): velocity magnitude varies with x, rate ramps
    inj = PatchFuncInjector(
        lo=(-0.008, -1e-4, -0.008), hi=(0.008, -1e-4, 0.008),
        u_fn=lambda x, y, z, t: jnp.stack(
            [jnp.zeros_like(x), -(20.0 + 1000.0 * jnp.abs(x)),
             jnp.zeros_like(x)]),
        mdot_fn=lambda t: 1e-3 * (1.0 + t / 1e-3),
        t_start=0.0, t_end=1e-3, d_mean=4e-5, parcels_per_step=16)
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=1024, evaporation="none")
    c = cloud.init(jax.random.PRNGKey(3))
    g = gas_fields(mesh, T=400.0)
    dt = 1e-5
    step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t))
    t = jnp.asarray(0.0)
    expected_mass = 0.0
    for i in range(8):
        expected_mass += float(1e-3 * (1.0 + float(t) / 1e-3) * dt)
        c, src = step(c, t)
        t = t + dt
    np.testing.assert_allclose(float(c.m_injected), expected_mass,
                               rtol=1e-10)
    stats = cloud.stats(c)
    np.testing.assert_allclose(float(stats["liquid_mass"]), expected_mass,
                               rtol=1e-6)
    act = np.asarray(c.active) > 0
    pos = np.asarray(c.pos)
    # all active parcels originated inside the patch rectangle footprint
    assert pos[0, act].min() >= -0.0081 and pos[0, act].max() <= 0.0081
    assert pos[1, act].max() <= 0.0
    # velocity function applied: downward speeds in [20, 28] initially
    vel = np.asarray(c.vel)
    assert (vel[1, act] < -15.0).all()


def test_khrt_breakup():
    """ReitzKHRT: high relative velocity strips droplets -> diameter falls,
    parcel liquid mass is conserved by the multiplicity increase; quiescent
    gas leaves diameters untouched."""
    mesh, cloud_fast = make_cloud(u_mag=250.0, evap="none", d_mean=1e-4)
    cloud_fast = dataclasses.replace(
        cloud_fast, breakup="KHRT",
        injector=dataclasses.replace(cloud_fast.injector, t_end=1.5e-6))
    c = cloud_fast.init(jax.random.PRNGKey(4))
    g = gas_fields(mesh, T=400.0)
    dt = 2e-6
    step = jax.jit(lambda c, t: cloud_fast.evolve(c, g, dt, t))
    t = jnp.asarray(0.0)
    for i in range(12):
        c, _ = step(c, t)
        t = t + dt
    stats = cloud_fast.stats(c)
    act = np.asarray(c.active) > 0
    d = np.asarray(c.d)[act]
    assert d.max() < 1e-4 * 0.9          # KH/RT stripping reduced d
    assert d.min() >= cloud_fast.d_min * 0.5
    # mass conserved (no evaporation): liquid == injected
    np.testing.assert_allclose(float(stats["liquid_mass"]),
                               float(c.m_injected), rtol=1e-6)
    # quiescent: no breakup at ~zero relative velocity
    cloud_slow = dataclasses.replace(cloud_fast, breakup="KHRT")
    inj_slow = dataclasses.replace(cloud_slow.injector, u_mag=0.05,
                                   t_end=3e-6)
    cloud_slow = dataclasses.replace(cloud_slow, injector=inj_slow)
    c2 = cloud_slow.init(jax.random.PRNGKey(5))
    step2 = jax.jit(lambda c, t: cloud_slow.evolve(c, g, dt, t))
    t = jnp.asarray(0.0)
    c2, _ = step2(c2, t)
    n0 = np.asarray(c2.n_part).copy()
    act0 = np.asarray(c2.active) > 0
    for i in range(5):
        c2, _ = step2(c2, t + (i + 1) * dt)
    # no breakup -> parcel multiplicities unchanged (d itself drifts
    # slightly from thermal expansion of the heating droplets)
    n1 = np.asarray(c2.n_part)
    np.testing.assert_allclose(n1[act0], n0[act0], rtol=1e-9)


def test_orourke_collision_coarsens():
    """O'Rourke coalescence: a dense, velocity-dispersed population in a
    few cells coarsens (d32 grows, active droplet count per parcel falls)
    while conserving liquid mass; a dilute population is unaffected."""
    mesh, cloud = make_cloud(u_mag=10.0, evap="none", d_mean=3e-5)
    cloud = dataclasses.replace(
        cloud, collision="ORourke", breakup="none",
        injector=dataclasses.replace(cloud.injector, mdot=5e-2,
                                     cone_angle_deg=40.0, u_mag=10.0,
                                     parcels_per_step=64))
    c = cloud.init(jax.random.PRNGKey(7))
    g = gas_fields(mesh, T=400.0)
    dt = 1e-5
    step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t))
    c, _ = step(c, jnp.asarray(0.0))
    s0 = cloud.stats(c)
    d32_0 = float(s0["d32"])
    for i in range(25):
        c, _ = step(c, jnp.asarray((i + 1) * dt))
    s1 = cloud.stats(c)
    assert float(s1["d32"]) > 1.03 * d32_0       # coarsening
    # mass exactly conserved by the mean-field closure
    np.testing.assert_allclose(float(s1["liquid_mass"]),
                               float(c.m_injected), rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(c.d)))

    # dilute control: same setup, tiny mdot -> no measurable coarsening
    cloud_d = dataclasses.replace(
        cloud, injector=dataclasses.replace(cloud.injector, mdot=1e-6,
                                            parcels_per_step=4))
    c2 = cloud_d.init(jax.random.PRNGKey(8))
    step2 = jax.jit(lambda c, t: cloud_d.evolve(c, g, dt, t))
    c2, _ = step2(c2, jnp.asarray(0.0))
    n_first = np.asarray(c2.n_part)[:4].copy()   # step-1 parcels
    for i in range(25):
        c2, _ = step2(c2, jnp.asarray((i + 1) * dt))
    # only coalescence rescales multiplicities; dilute -> none happened
    np.testing.assert_allclose(np.asarray(c2.n_part)[:4], n_first,
                               rtol=1e-9)


def test_wall_film_absorbs_and_conserves_mass():
    """Parcels impinging on a 'film' wall deposit their mass into the
    WallFilm (surfaceFilmModels parity); injected = in-flight + film."""
    from deepflame_tpu.lagrangian.film import WallFilm
    mesh = StructuredMesh.box([0.02, 0.02, 0.02], [8, 8, 8],
                              origin=(-0.01, -0.01, -0.01))
    inj = ConeInjector(position=(0.0, -0.006, 0.0), direction=(0, -1, 0),
                       cone_angle_deg=4.0, u_mag=20.0, mdot=1e-4,
                       t_start=0.0, t_end=1e-2, d_mean=4e-5,
                       parcels_per_step=8)
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=1024, evaporation="none",
                       wall_interaction=((1, 0, "film"),),
                       films=(WallFilm(axis=1, side=0),))
    c = cloud.init(jax.random.PRNGKey(3))
    g = gas_fields(mesh, T=350.0)
    dt = 2e-5
    step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t))
    for i in range(60):
        c, src = step(c, jnp.asarray(i * dt))
    stats = cloud.stats(c)
    m_inj = float(c.m_injected)
    m_flight = float(stats["liquid_mass"])
    m_film = float(stats["film_mass"])
    m_evap = float(stats["film_evaporated"])
    assert m_film > 0.2 * m_inj          # wall actually collected parcels
    # exact closure: in-flight + film + film-evaporated == injected
    np.testing.assert_allclose(m_flight + m_film + m_evap, m_inj, rtol=1e-10)
    # film landed under the injector, at the y=lo wall
    fm = np.asarray(c.films[0].m)
    assert fm.max() > 0
    # film temperature stays near injection/gas range
    fT = np.asarray(c.films[0].T)
    assert np.all(fT[fm > 0] > 250.0) and np.all(fT[fm > 0] < 400.0)


def test_wall_film_evaporates_into_gas():
    """Hot gas over a deposited film: film mass decreases, Srho/Sh sources
    appear in the wall-adjacent layer (thermoSingleLayer phase change)."""
    from deepflame_tpu.lagrangian.film import WallFilm, WallFilmState
    mesh = StructuredMesh.box([0.02, 0.02, 0.02], [8, 8, 8],
                              origin=(-0.01, -0.01, -0.01))
    inj = ConeInjector(position=(0.0, 0.008, 0.0), direction=(0, -1, 0),
                       mdot=0.0, t_start=1.0, t_end=2.0,  # no injection
                       parcels_per_step=4)
    fl = WallFilm(axis=1, side=0)
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=64, evaporation="none",
                       wall_interaction=((1, 0, "film"),), films=(fl,))
    c = cloud.init(jax.random.PRNGKey(4))
    # pre-load a film: 10 g/m^2 at 400 K on the wall
    f0 = c.films[0]
    f0 = WallFilmState(m=f0.m + 1e-2, mom=f0.mom, T=f0.T + 100.0,
                       m_evap=f0.m_evap)
    c = c._replace(films=(f0,))
    g = gas_fields(mesh, T=900.0)
    dt = 1e-5
    step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t))
    m0 = float(jnp.sum(c.films[0].m)) * fl.face_area(mesh)
    vol = mesh.volume
    evap_src = 0.0
    for i in range(40):
        c, src = step(c, jnp.asarray(i * dt))
        evap_src += float(jnp.sum(src.Srho)) * vol * dt
    m1 = float(jnp.sum(c.films[0].m)) * fl.face_area(mesh)
    assert m1 < m0                       # film evaporating
    # evaporated mass accounting closes: source integral == mass lost
    np.testing.assert_allclose(evap_src, m0 - m1, rtol=1e-6)
    np.testing.assert_allclose(float(c.films[0].m_evap), m0 - m1, rtol=1e-6)
    # energy sink (latent) in the wall layer
    assert float(jnp.sum(src.Sh)) < 0.0


def test_devolatilisation_single_kinetic_rate():
    """SingleKineticRateDevolatilisation parity: released volatile mass
    follows dm = min(dt*A1*exp(-E/(R T))*m_vol, m_vol) and sources into the
    gas; fast kinetics release everything."""
    mesh = StructuredMesh.box([0.02, 0.1, 0.02], [8, 24, 8],
                              origin=(-0.01, -0.1, -0.01))
    inj = ConeInjector(position=(0.0, -0.001, 0.0), direction=(0, -1, 0),
                       u_mag=5.0, mdot=1e-4, t_start=0.0, t_end=2.5e-5,
                       d_mean=5e-5, parcels_per_step=8)
    A1, E, Y0 = 2e4, 5e7, 0.4            # E in J/kmol (reference units)
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=256, evaporation="none",
                       devolatilisation=((A1, E, Y0),))
    c = cloud.init(jax.random.PRNGKey(5))
    g = gas_fields(mesh, T=1200.0)
    dt = 1e-5
    step = jax.jit(lambda c, t: cloud.evolve(c, g, dt, t))
    c, _ = step(c, jnp.asarray(0.0))     # inject
    mv0 = float(jnp.sum(c.m_vol * c.n_part[None]))
    np.testing.assert_allclose(mv0, Y0 * float(c.m_injected), rtol=1e-6)
    vol = mesh.volume
    released = 0.0
    for i in range(200):
        c, src = step(c, jnp.asarray((i + 1) * dt))
        released += float(jnp.sum(src.Srho)) * vol * dt
    m_inj = float(c.m_injected)          # includes all injection steps
    mv1 = float(jnp.sum(c.m_vol * c.n_part[None] * c.active[None]))
    # kinetics at parcel T (~300-400 K heating toward 1200 K): some release
    assert released > 0.0
    # released + remaining volatile == total injected volatile
    np.testing.assert_allclose(released + mv1, Y0 * m_inj, rtol=5e-3)
    # droplet mass shrank accordingly
    stats = cloud.stats(c)
    np.testing.assert_allclose(float(stats["liquid_mass"]),
                               m_inj - released, rtol=5e-3)


def test_gravity_terminal_velocity():
    """particleForces gravity parity: in still gas a parcel settles toward
    the analytic terminal velocity u_t = tau_p * g * (1 - rho_g/rho_l), and
    the momentum the gas receives is the drag reaction (= parcel weight at
    terminal), NOT the gravity impulse."""
    mesh = StructuredMesh.box([0.1, 0.4, 0.1], [4, 16, 4],
                              origin=(-0.05, -0.4, -0.05))
    inj = ConeInjector(position=(0.0, -0.01, 0.0), direction=(0, -1, 0),
                       u_mag=1e-3, mdot=1e-4, t_start=0.0, t_end=1.2e-5,
                       d_mean=5e-5, d_spread=0.0, cone_angle_deg=0.0,
                       parcels_per_step=4)
    g_y = -9.81
    cloud = SprayCloud(mesh=mesh, liquid=n_heptane(), injector=inj,
                       max_parcels=64, evaporation="none",
                       gravity=(0.0, g_y, 0.0))
    c = cloud.init(jax.random.PRNGKey(0))
    gas = dict(rho=jnp.full(mesh.shape, 1.2), U=jnp.zeros((3,) + mesh.shape),
               T=jnp.full(mesh.shape, 300.0),
               mu=jnp.full(mesh.shape, 1.8e-5),
               p=jnp.full(mesh.shape, 101325.0),
               Yv=jnp.zeros(mesh.shape))
    dt = 1e-4
    step = jax.jit(lambda c, t: cloud.evolve(c, gas, dt, t))
    c, _ = step(c, jnp.asarray(0.0))
    for i in range(300):
        c, src = step(c, jnp.asarray((i + 1) * dt))
    act = np.asarray(c.active) > 0
    assert act.sum() > 0
    v_y = np.asarray(c.vel[1])[act]
    # analytic terminal velocity (Stokes-corrected via the same drag law)
    rho_l = float(n_heptane().rho(jnp.asarray(300.0)))
    d = 5e-5
    g_eff = abs(g_y) * (1.0 - 1.2 / rho_l)
    # iterate u_t = tau_p(Re) * g_eff
    u_t = 0.05
    for _ in range(50):
        Re = 1.2 * u_t * d / 1.8e-5
        tau = rho_l * d * d / (18 * 1.8e-5 * (1 + 0.15 * Re ** 0.687))
        u_t = tau * g_eff
    np.testing.assert_allclose(-v_y, u_t, rtol=2e-2)
    # gas momentum source integrates to the drag reaction = -weight
    V = mesh.volume
    F_y = float(jnp.sum(src.SU[1]) * V)
    m_tot = float(jnp.sum(
        jnp.asarray(c.n_part) * jnp.asarray(c.active)
        * rho_l * np.pi / 6.0 * np.asarray(c.d) ** 3))
    np.testing.assert_allclose(F_y, -m_tot * g_eff, rtol=5e-2)
