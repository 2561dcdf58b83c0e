"""Lagrangian spray on general meshes via the background-overlay adapter
(lagrangian/overlay.py) + the face-list gas solver source coupling.

Role parity: the reference tracks parcels through arbitrary polyhedral
meshes (src/lagrangian/basic particle::trackToFace); the TPU design locates
parcels on a uniform overlay grid and reduces sources conservatively onto
the general mesh. Invariants tested:
  1. identity overlay (overlay == the mesh) reproduces the direct
     structured SprayCloud exactly;
  2. source integrals are independent of overlay resolution (conservative
     reduction);
  3. the coupled face-list spray solver (SprayFLSolver) matches the
     structured SpraySolver on a box mesh.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from deepflame_tpu.lagrangian.cloud import ConeInjector, SprayCloud
from deepflame_tpu.lagrangian.liquids import ethanol, n_heptane
from deepflame_tpu.lagrangian.overlay import OverlaySprayCloud
from deepflame_tpu.mesh import StructuredMesh, zero_gradient

SHAPE = (6, 12, 4)
ORIGIN = (-0.01, -0.05, -0.01)
EXT = [0.02, 0.05, 0.02]


def _mesh_and_cloud_kwargs(liquid=None, evap="Spalding"):
    mesh = StructuredMesh.box(EXT, list(SHAPE), origin=ORIGIN)
    inj = ConeInjector(position=(0.0, -0.002, 0.0), direction=(0, -1, 0),
                       u_mag=30.0, mdot=5e-4, t_end=1e-3, d_mean=4e-5,
                       parcels_per_step=8)
    kwargs = dict(liquid=liquid or n_heptane(), injector=inj,
                  max_parcels=512, evaporation=evap)
    return mesh, kwargs


def _flat_centers_volumes(mesh):
    X, Y, Z = mesh.cell_centers()
    ctr = np.stack([np.asarray(X).ravel(), np.asarray(Y).ravel(),
                    np.asarray(Z).ravel()], axis=1)
    vol = np.full(ctr.shape[0], mesh.volume)
    return ctr, vol


def _gas_structured(mesh, dtype=jnp.float64):
    X, Y, _ = mesh.cell_centers()
    T = 700.0 + 200.0 * jnp.asarray(Y > -0.02, dtype)
    sh = mesh.shape
    return dict(rho=jnp.full(sh, 6.0, dtype), U=jnp.zeros((3,) + sh, dtype),
                T=T, mu=jnp.full(sh, 2.5e-5, dtype),
                p=jnp.full(sh, 2e6, dtype), Yv=jnp.zeros(sh, dtype))


def test_identity_overlay_matches_direct():
    """Overlay with resolution == mesh shape and bounds == the mesh box is
    the mesh itself: cloud states and reduced sources must match the direct
    structured SprayCloud bit-for-bit (same PRNG key, same gas)."""
    mesh, kw = _mesh_and_cloud_kwargs()
    direct = SprayCloud(mesh=mesh, **kw)
    ctr, vol = _flat_centers_volumes(mesh)
    lo = np.asarray(ORIGIN)
    hi = lo + np.asarray(EXT)
    over = OverlaySprayCloud.build(ctr, vol, kw, resolution=SHAPE,
                                   bounds=(lo, hi))
    # identity map
    np.testing.assert_array_equal(
        np.asarray(over.cell_map).ravel(), np.arange(ctr.shape[0]))

    g = _gas_structured(mesh)
    g_fl = dict(rho=g["rho"].ravel(), T=g["T"].ravel(), p=g["p"].ravel(),
                mu=g["mu"].ravel(), Yv=g["Yv"].ravel(),
                U=g["U"].reshape(3, -1))
    c_d = direct.init(jax.random.PRNGKey(7))
    c_o = over.init(jax.random.PRNGKey(7))
    dt = 1e-5
    for i in range(6):
        t = jnp.asarray(i * dt)
        c_d, src_d = direct.evolve(c_d, g, dt, t)
        c_o, src_o = over.evolve(c_o, g_fl, dt, t)
    np.testing.assert_allclose(np.asarray(c_o.d), np.asarray(c_d.d),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c_o.pos), np.asarray(c_d.pos),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(src_o.Srho),
                               np.asarray(src_d.Srho).ravel(),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(src_o.Sh),
                               np.asarray(src_d.Sh).ravel(),
                               rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(src_o.SU),
                               np.asarray(src_d.SU).reshape(3, -1),
                               rtol=1e-10, atol=1e-10)


def test_source_integrals_resolution_independent():
    """Uniform gas: the TOTAL mass/energy/momentum source integrals must be
    identical (to roundoff) whether the overlay is the mesh itself or 2x
    finer — the overlay->mesh reduction is conservative by construction."""
    mesh, kw = _mesh_and_cloud_kwargs()
    ctr, vol = _flat_centers_volumes(mesh)
    lo = np.asarray(ORIGIN)
    hi = lo + np.asarray(EXT)
    g = dict(rho=jnp.full(SHAPE, 6.0), U=jnp.zeros((3,) + SHAPE),
             T=jnp.full(SHAPE, 900.0), mu=jnp.full(SHAPE, 2.5e-5),
             p=jnp.full(SHAPE, 2e6), Yv=jnp.zeros(SHAPE))
    g_fl = dict(rho=g["rho"].ravel(), T=g["T"].ravel(), p=g["p"].ravel(),
                mu=g["mu"].ravel(), Yv=g["Yv"].ravel(),
                U=g["U"].reshape(3, -1))

    totals = []
    for res in (SHAPE, tuple(2 * s for s in SHAPE)):
        over = OverlaySprayCloud.build(ctr, vol, kw, resolution=res,
                                       bounds=(lo, hi))
        c = over.init(jax.random.PRNGKey(3))
        dt = 1e-5
        tm, te = 0.0, 0.0
        for i in range(6):
            c, src = over.evolve(c, g_fl, dt, jnp.asarray(i * dt))
            tm += float(jnp.sum(src.Srho * over.volumes))
            te += float(jnp.sum(src.Sh * over.volumes))
        totals.append((tm, te))
    (m0, e0), (m1, e1) = totals
    assert m0 > 0.0 and e0 < 0.0
    np.testing.assert_allclose(m1, m0, rtol=1e-9)
    np.testing.assert_allclose(e1, e0, rtol=1e-9)


def test_coupled_spray_fl_matches_structured():
    """Full coupled step: SprayFLSolver (face-list gas + overlay cloud) vs
    the structured SpraySolver on the same box case — identical algorithm
    through both backends, fields agree to Krylov roundoff."""
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.mesh.facelist import from_structured
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    from deepflame_tpu.solvers.low_mach_fl import LowMachSolverFL
    from deepflame_tpu.solvers.spray import SpraySolver, SprayFLSolver

    mech = load_mechanism("/root/reference/mechanisms/C7H16/C7_oneStep.yaml")
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    mesh, kw = _mesh_and_cloud_kwargs()
    b = ((zero_gradient(), zero_gradient()),) * 3
    cfg = LowMachConfig(chemistry=False, use_pallas="never")
    comb = NoCombustion(th, kin)
    gas_s = LowMachSolver(mesh=mesh, thermo=th, transport=tr,
                          combustion=comb, bcs_U=(b, b, b), bcs_p=b,
                          bcs_h=b, bcs_Y=b, bcs_rho=b, config=cfg)
    gas_f = LowMachSolverFL(
        m_p=from_structured(mesh, b), m_h=from_structured(mesh, b),
        m_Y=from_structured(mesh, b), m_rho=from_structured(mesh, b),
        m_U=tuple(from_structured(mesh, b) for _ in range(3)),
        thermo=th, transport=tr, combustion=comb, config=cfg)

    iFuel = mech.species_index("C7H16")
    cloud_s = SprayCloud(mesh=mesh, **kw)
    ctr, vol = _flat_centers_volumes(mesh)
    lo = np.asarray(ORIGIN)
    hi = lo + np.asarray(EXT)
    over = OverlaySprayCloud.build(ctr, vol, kw, resolution=SHAPE,
                                   bounds=(lo, hi))
    sol_s = SpraySolver(gas_solver=gas_s, cloud=cloud_s, fuel_index=iFuel)
    sol_f = SprayFLSolver(gas_solver=gas_f, cloud=over, fuel_index=iFuel)

    ns = mech.n_species
    Y = np.zeros((ns,) + mesh.shape)
    Y[mech.species_index("O2")] = 0.23
    Y[mech.species_index("N2")] = 0.77
    p0 = jnp.full(mesh.shape, 2e6)
    T0 = jnp.full(mesh.shape, 900.0)
    key = jax.random.PRNGKey(11)
    s_s = sol_s.initial_state(p0, T0, jnp.asarray(Y), key=key)
    s_f = sol_f.initial_state(p0.ravel(), T0.ravel(),
                              jnp.asarray(Y.reshape(ns, -1).T), key=key)
    dt = 1e-5
    step_s = jax.jit(lambda st: sol_s.step(st, dt)[0])
    step_f = jax.jit(lambda st: sol_f.step(st, dt)[0])
    for _ in range(5):
        s_s = step_s(s_s)
        s_f = step_f(s_f)
    for name, a, b_ in (("T", s_s.gas.T, s_f.gas.T),
                        ("p", s_s.gas.p, s_f.gas.p),
                        ("rho", s_s.gas.rho, s_f.gas.rho)):
        rel = np.abs(np.asarray(a).ravel() - np.asarray(b_)).max() \
            / np.abs(np.asarray(b_)).max()
        assert rel < 1e-8, (name, rel)
    relY = np.abs(np.asarray(s_s.gas.Y).reshape(ns, -1).T
                  - np.asarray(s_f.gas.Y)).max()
    assert relY < 1e-9, relY
    # fuel vapor appeared and the cloud states agree
    assert float(s_f.gas.Y[:, iFuel].max()) > 1e-6
    np.testing.assert_allclose(np.asarray(s_f.cloud.d),
                               np.asarray(s_s.cloud.d), rtol=1e-6)


def test_ethanol_liquid_properties():
    """Ethanol (sydneySprayBurner fuel): boiling point at 1 atm, latent
    heat, density sanity vs standard handbook values."""
    liq = ethanol()
    # Antoine fit reproduces 1 atm at T_boil
    np.testing.assert_allclose(float(liq.p_sat(jnp.asarray(351.44))),
                               101325.0, rtol=0.02)
    assert 780.0 < float(liq.rho(jnp.asarray(300.0))) < 800.0
    assert 8.0e5 < float(liq.latent_heat(jnp.asarray(351.0))) < 9.5e5
