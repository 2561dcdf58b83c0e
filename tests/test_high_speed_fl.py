"""Density-based solver on the face-list backend (dfHighSpeedFoam on
arbitrary fvMesh parity, /root/reference/applications/solvers/
dfHighSpeedFoam/dfHighSpeedFoam.C:67-225; VERDICT r3 item 6).

Anchors mirror tests/test_high_speed.py: Sod star-region plateaus vs the
exact Riemann solution, exact conservation on periodic domains, and a
structured-vs-face-list cross-check on a uniform box (the unstructured
MUSCL ratio reduces exactly to the structured far-cell form on uniform
interior cells)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.chemistry import load_mechanism, make_kinetics, make_thermo
from deepflame_tpu.constants import GAS_CONSTANT
from deepflame_tpu.mesh import StructuredMesh, cyclic, empty, zero_gradient
from deepflame_tpu.mesh.facelist import from_structured
from deepflame_tpu.solvers.high_speed import HighSpeedConfig, HighSpeedSolver
from deepflame_tpu.solvers.high_speed_fl import HighSpeedSolverFL

pytestmark = pytest.mark.smoke

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def air():
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    return mech, make_thermo(mech), make_kinetics(mech)


def _fl_solver(th, kin, mesh, bcs, flux="HLLC", limiter="vanLeer", rk=2):
    cfg = HighSpeedConfig(flux=flux, rk_order=rk, limiter=limiter,
                          chemistry="none")
    fl = from_structured(mesh, bcs)
    return HighSpeedSolverFL(m_rho=fl, m_p=fl, m_Y=fl, m_U=(fl, fl, fl),
                             thermo=th, kinetics=kin, config=cfg)


@pytest.mark.parametrize("flux", ["HLLC", "AUSMDV", "Kurganov"])
def test_sod_shock_tube_fl(air, flux):
    mech, th, kin = air
    n = 400
    mesh = StructuredMesh.box([1.0, 1e-2, 1e-2], [n, 1, 1])
    bcs = ((zero_gradient(), zero_gradient()),
           (empty(), empty()), (empty(), empty()))
    solver = _fl_solver(th, kin, mesh, bcs, flux=flux)
    X, _, _ = mesh.cell_centers()
    x = jnp.ravel(X)
    pL, pR = 1e5, 1e4
    rhoL, rhoR = 1.0, 0.125
    W = mech.molecular_weights[0]
    TL = pL * W / (rhoL * GAS_CONSTANT)
    TR = pR * W / (rhoR * GAS_CONSTANT)
    T = jnp.where(x < 0.5, TL, TR)
    p = jnp.where(x < 0.5, pL, pR)
    Y = jnp.ones((n, 1))
    s = solver.initial_state(p, T, Y)
    a0 = float(jnp.sqrt(1.4 * pL / rhoL))
    t_end = 0.25 / a0
    dt = 0.4 * mesh.dx / (a0 * 1.8)
    nsteps = int(t_end / dt)
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    for _ in range(nsteps):
        s = step(s)
    rho, U, pf, Tf, _ = solver.primitives(s)
    u = np.asarray(U[:, 0])
    pf = np.asarray(pf)
    vel_scale = np.sqrt(pL / rhoL)
    p_star = 0.30313 * pL
    u_star = 0.92745 * vel_scale
    mask = (np.asarray(x) > 0.55) & (np.asarray(x) < 0.65)
    assert abs(pf[mask].mean() - p_star) / p_star < 0.03, flux
    assert abs(u[mask].mean() - u_star) / u_star < 0.03, flux
    assert float(jnp.min(rho)) > 0 and pf.min() > 0


def test_periodic_conservation_fl(air):
    mech, th, kin = air
    n = 32
    mesh = StructuredMesh.box([1.0, 1.0, 1.0 / n], [n, n, 1])
    bcs = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    solver = _fl_solver(th, kin, mesh, bcs, rk=2)
    X, Yg, _ = mesh.cell_centers()
    x, y = jnp.ravel(X), jnp.ravel(Yg)
    T = 300.0 + 50.0 * jnp.sin(2 * jnp.pi * x) * jnp.cos(2 * jnp.pi * y)
    p = 1e5 + 1e3 * jnp.cos(2 * jnp.pi * x)
    U = jnp.stack([50.0 * jnp.sin(2 * jnp.pi * y),
                   30.0 * jnp.cos(2 * jnp.pi * x),
                   jnp.zeros_like(x)], axis=1)
    Y = jnp.ones((n * n, 1))
    s = solver.initial_state(p, T, Y, U)
    V = solver.mesh.volumes
    tot = lambda st: [float(jnp.sum(st.rho * V)),
                      float(jnp.sum(st.rhoU[:, 0] * V)),
                      float(jnp.sum(st.rhoE * V)),
                      float(jnp.sum(st.rhoY[:, 0] * V))]
    t0 = tot(s)
    dt = 1e-5 / n
    step = jax.jit(lambda s: solver.step(s, dt)[0])
    for _ in range(20):
        s = step(s)
    t1 = tot(s)
    for a, b in zip(t0, t1):
        scale = max(abs(a), 1e-6 * abs(t0[2]))
        assert abs(b - a) / scale < 1e-10, (a, b)


def test_fl_matches_structured_uniform_box(air):
    """Same Sod problem through both backends on the same uniform mesh:
    the FL solver's unstructured MUSCL ratio and tangent-frame rotation
    must reproduce the structured axis-aligned discretization."""
    mech, th, kin = air
    n = 128
    mesh = StructuredMesh.box([1.0, 1e-2, 1e-2], [n, 1, 1])
    b1 = ((zero_gradient(), zero_gradient()),) * 3
    bx = (b1[0], (empty(), empty()), (empty(), empty()))
    cfg = HighSpeedConfig(flux="HLLC", rk_order=2, limiter="vanLeer",
                          chemistry="none")
    sol_s = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin, bcs_rho=bx,
                            bcs_U=(bx, bx, bx), bcs_p=bx, bcs_Y=bx,
                            config=cfg)
    sol_f = _fl_solver(th, kin, mesh, bx)
    X, _, _ = mesh.cell_centers()
    x = jnp.ravel(X)
    W = mech.molecular_weights[0]
    pL, pR, rhoL, rhoR = 1e5, 1e4, 1.0, 0.125
    TL = pL * W / (rhoL * GAS_CONSTANT)
    TR = pR * W / (rhoR * GAS_CONSTANT)
    T3 = jnp.where(X < 0.5, TL, TR)
    p3 = jnp.where(X < 0.5, pL, pR)
    s_s = sol_s.initial_state(p3, T3, jnp.ones((1,) + mesh.shape))
    s_f = sol_f.initial_state(jnp.ravel(p3), jnp.ravel(T3),
                              jnp.ones((n, 1)))
    dt = 0.4 * mesh.dx / (374.0 * 1.8)
    step_s = jax.jit(lambda s: sol_s.step(s, dt)[0])
    step_f = jax.jit(lambda s: sol_f.step(s, dt)[0])
    for _ in range(30):
        s_s = step_s(s_s)
        s_f = step_f(s_f)
    rel = np.abs(np.asarray(s_s.rho).ravel() - np.asarray(s_f.rho)).max() \
        / np.abs(np.asarray(s_s.rho)).max()
    # boundary-adjacent gradient stencils differ (Gauss-with-ghost vs
    # padded far-cell); interior physics must agree tightly
    assert rel < 5e-3, rel
    relE = np.abs(np.asarray(s_s.rhoE).ravel()
                  - np.asarray(s_f.rhoE)).max() \
        / np.abs(np.asarray(s_s.rhoE)).max()
    assert relE < 5e-3, relE


def test_fl_weno5_matches_structured_periodic(air):
    """WENO5-Z on a plan (lattice) face-list mesh == structured WENO5 on a
    fully periodic box (VERDICT r4 item 6: the WENOEXT arbitrary-fvMesh
    role): with every axis cyclic the lattice rolls give exactly the
    structured 5-cell stencils, so the two backends must agree to
    roundoff."""
    mech, th, kin = air
    n = 64
    mesh = StructuredMesh.box([1.0, 1e-2, 1e-2], [n, 1, 1])
    bx = ((cyclic(), cyclic()), (empty(), empty()), (empty(), empty()))
    cfg = HighSpeedConfig(flux="HLLC", rk_order=2, limiter="WENO5",
                          chemistry="none")
    sol_s = HighSpeedSolver(mesh=mesh, thermo=th, kinetics=kin, bcs_rho=bx,
                            bcs_U=(bx, bx, bx), bcs_p=bx, bcs_Y=bx,
                            config=cfg)
    sol_f = _fl_solver(th, kin, mesh, bx, limiter="WENO5")
    assert sol_f.m_rho.plan is not None
    X, _, _ = mesh.cell_centers()
    x = jnp.ravel(X)
    W = mech.molecular_weights[0]
    rho0 = 1.0 + 0.3 * np.sin(2 * np.pi * np.asarray(x))
    p0 = 1e5 * (1.0 + 0.1 * np.cos(4 * np.pi * np.asarray(x)))
    T0 = p0 * W / (rho0 * GAS_CONSTANT)
    s_s = sol_s.initial_state(jnp.asarray(p0).reshape(mesh.shape),
                              jnp.asarray(T0).reshape(mesh.shape),
                              jnp.ones((1,) + mesh.shape))
    s_f = sol_f.initial_state(jnp.asarray(p0), jnp.asarray(T0),
                              jnp.ones((n, 1)))
    dt = 0.3 * mesh.dx / 500.0
    step_s = jax.jit(lambda s: sol_s.step(s, dt)[0])
    step_f = jax.jit(lambda s: sol_f.step(s, dt)[0])
    for _ in range(20):
        s_s = step_s(s_s)
        s_f = step_f(s_f)
    for name in ("rho", "rhoE"):
        a = np.asarray(getattr(s_s, name)).ravel()
        b = np.asarray(getattr(s_f, name)).ravel()
        rel = np.abs(a - b).max() / np.abs(a).max()
        assert rel < 1e-11, (name, rel)


def test_fl_weno5_sod_boundary_fallback(air):
    """WENO5 on a plan mesh with PHYSICAL x boundaries: boundary-adjacent
    faces fall back to MUSCL; the Sod star region still matches the exact
    plateaus (same anchors as the structured WENO run)."""
    mech, th, kin = air
    n = 400
    mesh = StructuredMesh.box([1.0, 1e-2, 1e-2], [n, 1, 1])
    bcs = ((zero_gradient(), zero_gradient()),
           (empty(), empty()), (empty(), empty()))
    solver = _fl_solver(th, kin, mesh, bcs, limiter="WENO5")
    X, _, _ = mesh.cell_centers()
    x = jnp.ravel(X)
    pL, pR = 1e5, 1e4
    rhoL, rhoR = 1.0, 0.125
    W = mech.molecular_weights[0]
    TL = pL * W / (rhoL * GAS_CONSTANT)
    TR = pR * W / (rhoR * GAS_CONSTANT)
    T = jnp.where(x < 0.5, TL, TR)
    p = jnp.where(x < 0.5, pL, pR)
    s = solver.initial_state(p, T, jnp.ones((n, 1)))
    a0 = float(jnp.sqrt(1.4 * pL / rhoL))
    dt = 0.3 * mesh.dx / (a0 * 2.2)
    step = jax.jit(lambda st: solver.step(st, dt)[0])
    t_end = 1.2e-3
    for _ in range(int(t_end / dt)):
        s = step(s)
    rho = np.asarray(s.rho)
    p_arr = np.asarray(solver.primitives(s)[2])
    # exact star-state values for this Sod setup (gamma = 1.4)
    p_star, rho_star_L = 30313.0, 0.4263
    xs = np.asarray(x)
    star = (xs > 0.55) & (xs < 0.65)
    assert abs(np.median(p_arr[star]) - p_star) / p_star < 0.03
    assert abs(np.median(rho[star]) - rho_star_L) / rho_star_L < 0.03
    assert np.all(np.isfinite(rho))
