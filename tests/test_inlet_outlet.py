"""Open-boundary (inlet/outlet) low-Mach flow: the non-cyclic BC path.

A 1D duct with fixed-velocity cold inflow and pressure outlet must reach a
steady state with matched inlet/outlet mass flux (global continuity through
the pEqn with mixed BC kinds)."""
import jax
import jax.numpy as jnp
import numpy as np

from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                     make_kinetics, make_transport)
from deepflame_tpu.combustion import NoCombustion
from deepflame_tpu.mesh import (StructuredMesh, fixed_value, zero_gradient,
                                empty)
from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

import os
DATA = os.path.join(os.path.dirname(__file__), "data")


def test_duct_inflow_outflow():
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 48
    L = 0.1
    mesh = StructuredMesh.box([L, L / n, L / n], [n, 1, 1])
    e = (empty(), empty())
    u_in = 2.0
    # u: fixed at inlet, zeroGradient at outlet; p: zeroGradient inlet,
    # fixed at outlet; T/Y/rho: fixed inlet, zeroGradient outlet
    bU = ((fixed_value(u_in), zero_gradient()), e, e)
    bU0 = ((fixed_value(0.0), zero_gradient()), e, e)
    bp = ((zero_gradient(), fixed_value(101325.0)), e, e)
    bs = ((fixed_value(300.0), zero_gradient()), e, e)
    # enthalpy inlet value = h(300 K) of pure N2
    h_in = float(th.h_mass(jnp.asarray(300.0), jnp.ones(1)))
    bh = ((fixed_value(h_in), zero_gradient()), e, e)
    rho_in = float(th.rho(jnp.asarray(101325.0), jnp.asarray(300.0),
                          jnp.ones(1)))
    brho = ((fixed_value(rho_in), zero_gradient()), e, e)
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(bU, bU0, bU0), bcs_p=bp, bcs_h=bh, bcs_Y=bs, bcs_rho=brho,
        config=LowMachConfig(chemistry=False, div_scheme="upwind"))
    T = jnp.full(mesh.shape, 300.0)
    p = jnp.full(mesh.shape, 101325.0)
    U0 = jnp.stack([jnp.full(mesh.shape, u_in), jnp.zeros(mesh.shape),
                    jnp.zeros(mesh.shape)])
    s = solver.initial_state(p, T, jnp.ones((1,) + mesh.shape), U0)
    dt = 2e-4
    step = jax.jit(lambda st: solver.step(st, dt))
    for _ in range(30):
        s, diag = step(s)
    u = np.asarray(s.U[0]).squeeze()
    pf = np.asarray(s.p).squeeze()
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(pf))
    # steady uniform duct flow: u everywhere ~ u_in, p near outlet value
    np.testing.assert_allclose(u, u_in, rtol=0.05)
    np.testing.assert_allclose(pf, 101325.0, rtol=1e-3)
    # inlet and outlet mass fluxes match (steady continuity)
    phi = np.asarray(s.phi[0]).squeeze()
    np.testing.assert_allclose(phi[0], phi[-1], rtol=0.02)
