"""Wall-function tests: log-layer identities + RAS integration.

The high-Re wall treatment (turbulence/wall_functions.py; OpenFOAM
nutk/epsilon/omega WallFunction parity) has exact algebraic identities in
the equilibrium log layer which we verify numerically, plus smoke/limit
tests of the masked corrections inside KEpsilon / KOmegaSST.advance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.mesh import StructuredMesh, zero_gradient, empty, \
    fixed_value
from deepflame_tpu.turbulence import KEpsilon, KOmegaSST, WallFunctions


@pytest.fixture(scope="module")
def channel():
    n = 16
    mesh = StructuredMesh.box([0.1, 0.02, 0.02], [4, n, 1])
    wf = WallFunctions.for_walls(mesh, [(1, 0)], dtype=jnp.float64)
    return mesh, wf


def log_layer_state(mesh, wf, u_tau=0.5, nu=1e-5, rho0=1.0):
    """Equilibrium log-layer fields for a wall at y=0."""
    Cmu, kappa, E = wf.Cmu, wf.kappa, wf.E
    _, Yc, _ = mesh.cell_centers(jnp.float64)
    y = jnp.maximum(Yc, 1e-12)
    k = jnp.full(mesh.shape, u_tau ** 2 / np.sqrt(Cmu), jnp.float64)
    yp = u_tau * y / nu
    Up = u_tau * jnp.log(jnp.maximum(E * yp, 1.0 + 1e-9)) / kappa
    rho = jnp.full(mesh.shape, rho0, jnp.float64)
    mu = jnp.full(mesh.shape, rho0 * nu, jnp.float64)
    return y, k, Up, rho, mu


def test_nutk_recovers_wall_shear(channel):
    """tau_w = (nu + nut) U_p / y == u_tau^2 exactly for the log-law cell
    value (the defining property of nutkWallFunction)."""
    mesh, wf = channel
    u_tau, nu = 0.5, 1e-5
    y, k, Up, rho, mu = log_layer_state(mesh, wf, u_tau, nu)
    nut = wf.nut(rho, k, mu)
    mask = np.asarray(wf.mask) > 0
    tau = np.asarray((nu + nut) * Up / wf.y)[mask]
    np.testing.assert_allclose(tau, u_tau ** 2, rtol=1e-10)
    # y* in the wall cell must be the plain y+ when k is at equilibrium
    ys = np.asarray(wf.ystar(rho, k, mu))[mask]
    yp_wall = u_tau * 0.5 * mesh.dy / nu
    np.testing.assert_allclose(ys, yp_wall, rtol=1e-10)
    # off-mask cells get zero nut from the wall model
    assert float(jnp.abs(nut * (1.0 - wf.mask)).max()) == 0.0


def test_epsilon_wall_equals_log_layer_dissipation(channel):
    """eps|w = Cmu^(3/4) k^(3/2)/(kappa y) == u_tau^3/(kappa y) at
    equilibrium k = u_tau^2/sqrt(Cmu) — an exact identity."""
    mesh, wf = channel
    u_tau, nu = 0.5, 1e-5
    _, k, _, rho, mu = log_layer_state(mesh, wf, u_tau, nu)
    mask = np.asarray(wf.mask) > 0
    eps_w = np.asarray(wf.epsilon(k))[mask]
    y_w = np.asarray(wf.y)[mask]
    np.testing.assert_allclose(eps_w, u_tau ** 3 / (wf.kappa * y_w),
                               rtol=1e-10)


def test_production_balances_dissipation(channel):
    """G|w == eps|w in the equilibrium log layer (the wall-function forms
    are constructed to balance exactly there)."""
    mesh, wf = channel
    u_tau, nu = 0.5, 1e-5
    y, k, Up, rho, mu = log_layer_state(mesh, wf, u_tau, nu)
    U = jnp.stack([Up, jnp.zeros_like(Up), jnp.zeros_like(Up)])
    nut = wf.nut(rho, k, mu)
    G = wf.production(rho, k, mu, rho * nut, U, None, mesh)
    mask = np.asarray(wf.mask) > 0
    np.testing.assert_allclose(np.asarray(G)[mask],
                               np.asarray(wf.epsilon(k))[mask], rtol=1e-10)


def test_omega_wall_limits(channel):
    """omegaWallFunction: log limit k^(1/2)/(Cmu^(1/4) kappa y) for large
    y+, viscous limit 6 nu/(beta1 y^2) for small y+."""
    mesh, wf = channel
    rho = jnp.ones(mesh.shape, jnp.float64)
    # large k -> log limit dominates
    k_hi = jnp.full(mesh.shape, 10.0, jnp.float64)
    mu = jnp.full(mesh.shape, 1e-5, jnp.float64)
    w = np.asarray(wf.omega(rho, k_hi, mu))
    w_log = np.asarray(jnp.sqrt(k_hi) / (wf.Cmu ** 0.25 * wf.kappa * wf.y))
    mask = np.asarray(wf.mask) > 0
    np.testing.assert_allclose(w[mask], w_log[mask], rtol=1e-2)
    # tiny k -> viscous limit
    k_lo = jnp.full(mesh.shape, 1e-12, jnp.float64)
    w = np.asarray(wf.omega(rho, k_lo, mu, beta1=0.075))
    w_vis = np.asarray(6.0 * (mu / rho) / (0.075 * wf.y ** 2))
    np.testing.assert_allclose(w[mask], w_vis[mask], rtol=1e-3)


def _channel_solver(mesh, model):
    import os
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.mesh import cyclic
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
    DATA = os.path.join(os.path.dirname(__file__), "data")
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    e = (empty(), empty())
    bU = ((cyclic(), cyclic()), (fixed_value(0.0), zero_gradient()), e)
    bS = ((cyclic(), cyclic()), (zero_gradient(), zero_gradient()), e)
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(bU, bU, bU), bcs_p=bS, bcs_h=bS, bcs_Y=bS, bcs_rho=bS,
        config=LowMachConfig(chemistry=False), turbulence=model)
    return solver


def test_kepsilon_solver_with_wall_functions(channel):
    """Channel flow with a y=0 wall through the full solver: fields stay
    finite/positive, wall cells carry the epsilonWallFunction value
    exactly, and near-wall k is produced by the wall-layer G."""
    mesh, wf = channel
    model = KEpsilon(wall_fns=wf)
    solver = _channel_solver(mesh, model)
    _, Yg, _ = mesh.cell_centers()
    Ly = mesh.ny * mesh.dy
    U = jnp.stack([15.0 * jnp.sqrt(Yg / Ly), jnp.zeros(mesh.shape),
                   jnp.zeros(mesh.shape)])
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0),
                             jnp.full(mesh.shape, 300.0),
                             jnp.ones((1,) + mesh.shape), U,
                             k0=0.1, eps0=1.0)
    step = jax.jit(lambda st: solver.step(st, 2e-5))
    for _ in range(6):
        s, _ = step(s)
    k, eps = s.turb
    assert np.all(np.asarray(k) > 0) and np.all(np.isfinite(np.asarray(k)))
    mask = np.asarray(wf.mask) > 0
    np.testing.assert_allclose(np.asarray(eps)[mask],
                               np.asarray(wf.epsilon(k))[mask], rtol=1e-10)
    # wall-layer production keeps near-wall k alive
    assert np.asarray(k)[:, 0, :].mean() > 1e-6


def test_komegasst_solver_with_wall_functions(channel):
    from deepflame_tpu.turbulence import wall_distance
    mesh, wf = channel
    y_dist = wall_distance(mesh, [(1, 0)])
    model = KOmegaSST(y=y_dist, wall_fns=wf)
    solver = _channel_solver(mesh, model)
    _, Yg, _ = mesh.cell_centers()
    Ly = mesh.ny * mesh.dy
    U = jnp.stack([15.0 * jnp.sqrt(Yg / Ly), jnp.zeros(mesh.shape),
                   jnp.zeros(mesh.shape)])
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0),
                             jnp.full(mesh.shape, 300.0),
                             jnp.ones((1,) + mesh.shape), U,
                             k0=0.1, eps0=1.0)
    step = jax.jit(lambda st: solver.step(st, 2e-5))
    for _ in range(6):
        s, _ = step(s)
    k, w = s.turb
    assert np.all(np.asarray(k) > 0) and np.all(np.isfinite(np.asarray(k)))
    mask = np.asarray(wf.mask) > 0
    mu_mol = jnp.full(mesh.shape, 1.8e-5, k.dtype)
    np.testing.assert_allclose(
        np.asarray(w)[mask],
        np.asarray(wf.omega(s.rho, k, mu_mol, model.beta1))[mask],
        rtol=0.35)   # mu in-solver is the real air viscosity; loose check
