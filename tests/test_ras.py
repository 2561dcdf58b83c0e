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
