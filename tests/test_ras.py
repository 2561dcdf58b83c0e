"""RAS k-epsilon model: decay, shear production, solver integration."""
import jax
import jax.numpy as jnp
import numpy as np

from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                     make_kinetics, make_transport)
from deepflame_tpu.combustion import NoCombustion
from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig
from deepflame_tpu.turbulence.ras import KEpsilon

import os
DATA = os.path.join(os.path.dirname(__file__), "data")


def test_k_epsilon_in_solver():
    """Decaying box turbulence fields + shear: k stays positive; with mean
    shear k grows (production); quiescent regions decay."""
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 24
    L = 0.1
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    model = KEpsilon()
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=False), turbulence=model)
    X, Yg, _ = mesh.cell_centers()
    # strong sinusoidal shear
    U = jnp.stack([10.0 * jnp.sin(2 * jnp.pi * Yg / L),
                   jnp.zeros(mesh.shape), jnp.zeros(mesh.shape)])
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0),
                             jnp.full(mesh.shape, 300.0),
                             jnp.ones((1,) + mesh.shape), U,
                             k0=0.05, eps0=0.5)
    assert len(s.turb) == 2
    k0_tot = float(jnp.sum(s.turb[0]))
    dt = 5e-5
    step = jax.jit(lambda st: solver.step(st, dt))
    for _ in range(8):
        s, diag = step(s)
    k, eps = s.turb
    assert np.all(np.asarray(k) > 0) and np.all(np.asarray(eps) > 0)
    assert np.all(np.isfinite(np.asarray(k)))
    # shear production grows k beyond its initial total
    assert float(jnp.sum(k)) > k0_tot
    mu_t = model.mu_t_from(s.rho, k, eps)
    assert float(mu_t.max()) > 0
    assert np.all(np.isfinite(np.asarray(s.U)))


def test_k_decay_no_shear():
    """No mean shear: k decays (dissipation only)."""
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 8
    mesh = StructuredMesh.box([0.1, 0.1, 0.1 / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=False), turbulence=KEpsilon())
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0),
                             jnp.full(mesh.shape, 300.0),
                             jnp.ones((1,) + mesh.shape),
                             k0=0.1, eps0=1.0)
    k0_tot = float(jnp.sum(s.turb[0]))
    step = jax.jit(lambda st: solver.step(st, 1e-4))
    for _ in range(5):
        s, _ = step(s)
    assert float(jnp.sum(s.turb[0])) < k0_tot


def test_rng_k_epsilon():
    """RNG variant: runs the same sheared box; constants differ and the
    strain correction keeps C1* < C1 in strongly strained cells; fields
    stay positive/finite and shear still produces k."""
    from deepflame_tpu.turbulence.ras import KEpsilon as KE
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 16
    L = 0.1
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    model = KE.rng()
    assert model.variant == "RNG" and abs(model.Cmu - 0.0845) < 1e-12
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=False), turbulence=model)
    X, Yg, _ = mesh.cell_centers()
    U = jnp.stack([8.0 * jnp.sin(2 * jnp.pi * Yg / L),
                   jnp.zeros(mesh.shape), jnp.zeros(mesh.shape)])
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0),
                             jnp.full(mesh.shape, 300.0),
                             jnp.ones((1,) + mesh.shape), U,
                             k0=0.05, eps0=0.5)
    k0_tot = float(jnp.sum(s.turb[0]))
    step = jax.jit(lambda st: solver.step(st, 5e-5))
    for _ in range(6):
        s, _ = step(s)
    k, eps = s.turb
    assert np.all(np.asarray(k) > 0) and np.all(np.asarray(eps) > 0)
    assert np.all(np.isfinite(np.asarray(k)))
    assert float(jnp.sum(k)) > k0_tot


def test_k_omega_sst_channel():
    """kOmegaSST in a channel-like box (walls at y=0, y=L): shear produces
    k; omega stays positive; mu_t is bounded by the SST limiter; the F1
    blend is near 1 (k-omega branch) at the walls and smaller mid-channel."""
    from deepflame_tpu.turbulence.ras import KOmegaSST, wall_distance
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 20
    L = 0.05
    mesh = StructuredMesh.box([L, L, L / n], [4, n, 1])
    from deepflame_tpu.mesh import zero_gradient
    from deepflame_tpu.mesh.structured import fixed_value
    bU = ((cyclic(), cyclic()), (fixed_value(0.0), fixed_value(0.0)),
          (empty(), empty()))
    bS = ((cyclic(), cyclic()), (zero_gradient(), zero_gradient()),
          (empty(), empty()))
    y = wall_distance(mesh, [(1, 0), (1, 1)])
    assert float(y.min()) > 0 and float(y.max()) <= L / 2
    model = KOmegaSST(y=y)
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(bU, bU, bU), bcs_p=bS, bcs_h=bS, bcs_Y=bS, bcs_rho=bS,
        config=LowMachConfig(chemistry=False), turbulence=model)
    X, Yg, _ = mesh.cell_centers()
    # parabolic-ish channel profile -> wall shear
    U = jnp.stack([20.0 * (Yg / L) * (1.0 - Yg / L) * 4.0,
                   jnp.zeros(mesh.shape), jnp.zeros(mesh.shape)])
    s = solver.initial_state(jnp.full(mesh.shape, 101325.0),
                             jnp.full(mesh.shape, 300.0),
                             jnp.ones((1,) + mesh.shape), U,
                             k0=0.1, eps0=5.0)
    assert len(s.turb) == 2
    step = jax.jit(lambda st: solver.step(st, 2e-5))
    for _ in range(8):
        s, diag = step(s)
    k, w = s.turb
    assert np.all(np.asarray(k) > 0) and np.all(np.asarray(w) > 0)
    assert np.all(np.isfinite(np.asarray(k)))
    assert np.all(np.isfinite(np.asarray(s.U)))
    mu_t = model.mu_t_from(s.rho, k, w)
    assert np.all(np.isfinite(np.asarray(mu_t))) and float(mu_t.max()) > 0
    # k grows from shear production near the walls
    kk = np.asarray(k)
    assert kk[:, 1, :].mean() > kk[:, n // 2, :].mean() * 0.5
