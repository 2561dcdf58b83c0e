"""End-to-end low-Mach PIMPLE solver tests (SURVEY.md §7 stage 4 — the
minimum E2E model; anchors follow the reference's 2D reacting TGV case,
/root/reference/test/dfLowMachFoam/twoD_reactingTGV).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.chemistry import (load_mechanism, make_thermo, make_kinetics,
                                     make_transport)
from deepflame_tpu.chemistry.integrator import RosenbrockOptions
from deepflame_tpu.combustion import Laminar, NoCombustion
from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
from deepflame_tpu.solvers.low_mach import (LowMachConfig, LowMachSolver)

DATA = os.path.join(os.path.dirname(__file__), "data")


def periodic_bcs():
    return ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))


@pytest.fixture(scope="module")
def tgv_air():
    """2D Taylor-Green vortex in periodic box, inert air."""
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th = make_thermo(mech)
    tr = make_transport(mech)
    kin = make_kinetics(mech)
    n = 32
    L = 2.0 * np.pi * 1e-3   # 2 pi mm box
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    bcs = periodic_bcs()
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr,
        combustion=NoCombustion(th, kin),
        bcs_U=(bcs, bcs, bcs), bcs_p=bcs, bcs_h=bcs, bcs_Y=bcs, bcs_rho=bcs,
        config=LowMachConfig(chemistry=False, div_scheme="limitedLinear"))
    X, Ygrid, _ = mesh.cell_centers()
    U0 = 1.0
    k = 2 * np.pi / L
    u = U0 * jnp.sin(k * X) * jnp.cos(k * Ygrid)
    v = -U0 * jnp.cos(k * X) * jnp.sin(k * Ygrid)
    U = jnp.stack([u, v, jnp.zeros_like(u)])
    T = jnp.full(mesh.shape, 300.0)
    p = jnp.full(mesh.shape, 101325.0)
    Y = jnp.ones((1,) + mesh.shape)
    state = solver.initial_state(p, T, Y, U)
    return solver, state, mesh, U0


def test_tgv_inert_flow(tgv_air):
    """Inert TGV: mass conserved, KE decays monotonically (viscous), fields
    stay finite and pressure stays near ambient (low-Mach)."""
    solver, state, mesh, U0 = tgv_air
    dt = 2e-6
    step = jax.jit(lambda s: solver.step(s, dt))
    mass0 = float(jnp.sum(state.rho)) * mesh.volume
    ke = [float(jnp.sum(state.rho * jnp.sum(state.U**2, 0)))]
    s = state
    for _ in range(10):
        s, diag = step(s)
        ke.append(float(jnp.sum(s.rho * jnp.sum(s.U**2, 0))))
    assert np.all(np.isfinite(np.asarray(s.U)))
    assert np.all(np.isfinite(np.asarray(s.p)))
    mass1 = float(jnp.sum(s.rho)) * mesh.volume
    assert abs(mass1 - mass0) / mass0 < 1e-6, "mass not conserved"
    # kinetic energy must decay (viscosity, no forcing)
    assert ke[-1] < ke[0]
    # velocity magnitude cannot grow
    assert float(jnp.max(jnp.abs(s.U))) < 1.2 * U0
    # pressure stays near ambient: low-Mach
    assert abs(float(s.p.mean()) - 101325.0) / 101325.0 < 0.01
    # temperature untouched (no chemistry, weak dissipation)
    np.testing.assert_allclose(np.asarray(s.T), 300.0, rtol=1e-3)


def test_reacting_hot_spot():
    """2D H2/air with a hot ignition kernel: temperature rises toward the
    adiabatic flame temperature, species stay bounded, mass conserved
    (mini version of the reference's twoD_reactingTGV anchor)."""
    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    th = make_thermo(mech)
    tr = make_transport(mech)
    kin = make_kinetics(mech)
    n = 16
    L = 2e-3
    mesh = StructuredMesh.box([L, L, L / n], [n, n, 1])
    bcs = periodic_bcs()
    comb = Laminar(th, kin, ode_opts=RosenbrockOptions(rtol=1e-6, atol=1e-12,
                                                       max_steps=50_000))
    solver = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=comb,
        bcs_U=(bcs, bcs, bcs), bcs_p=bcs, bcs_h=bcs, bcs_Y=bcs, bcs_rho=bcs,
        config=LowMachConfig(chemistry=True,
                             inert_index=int(mech.species_index("N2"))))
    ns = mech.n_species
    Yf = np.zeros(ns)
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yf[iH2], Yf[iO2], Yf[iN2] = 0.0285, 0.2264, 0.7451
    X, Ygrid, _ = mesh.cell_centers()
    r2 = (X - L / 2) ** 2 + (Ygrid - L / 2) ** 2
    # kernel hot enough that ignition delay (<2 us at 2200 K) fits in 5 steps
    T = jnp.where(r2 < (L / 4) ** 2, 2200.0, 800.0)
    p = jnp.full(mesh.shape, 101325.0)
    Y = jnp.asarray(np.tile(Yf[:, None, None, None], (1,) + mesh.shape))
    state = solver.initial_state(p, T, Y)

    dt = 1e-6
    step = jax.jit(lambda s: solver.step(s, dt))
    mass0 = float(jnp.sum(state.rho))
    s = state
    for _ in range(5):
        s, diag = step(s)
    assert np.all(np.isfinite(np.asarray(s.T)))
    # hot kernel burns: T rises above initial max
    assert float(s.T.max()) > 2300.0
    assert float(s.T.max()) < 3500.0
    # fuel consumed in the kernel
    assert float(s.Y[iH2].min()) < Yf[iH2] * 0.9
    # bounded mass fractions, unity sum
    assert float(s.Y.min()) >= -1e-8
    np.testing.assert_allclose(np.asarray(s.Y.sum(0)), 1.0, atol=1e-8)
    # mass conservation within continuity tolerance
    assert abs(float(jnp.sum(s.rho)) - mass0) / mass0 < 5e-2


def test_thermo_tran_nn_hook():
    """useThermoTranNN parity (dfChemistryModel.C:431-491): a user
    NN/surrogate overrides the transport coefficients; the solver consumes
    its mu/alpha and still integrates stably."""
    import dataclasses as _dc
    import jax
    import jax.numpy as jnp
    from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                         make_kinetics, make_transport)
    from deepflame_tpu.combustion import NoCombustion
    from deepflame_tpu.mesh import StructuredMesh, cyclic, empty
    from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th, tr, kin = make_thermo(mech), make_transport(mech), make_kinetics(mech)
    n = 8
    mesh = StructuredMesh.box([0.01, 0.01, 0.01 / n], [n, n, 1])
    b = ((cyclic(), cyclic()), (cyclic(), cyclic()), (empty(), empty()))
    calls = []

    def nn(T, p, Yt):
        calls.append(1)
        return {"mu": jnp.full_like(T, 5e-5),
                "alpha": jnp.full_like(T, 7e-5)}

    base = LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(b, b, b), bcs_p=b, bcs_h=b, bcs_Y=b, bcs_rho=b,
        config=LowMachConfig(chemistry=False))
    solver = _dc.replace(base, thermo_tran_nn=nn)
    mu, alpha, _ = solver._mixture_update(
        jnp.full(mesh.shape, 101325.0), jnp.full(mesh.shape, 300.0),
        jnp.ones((1,) + mesh.shape))
    assert calls, "NN hook not invoked"
    np.testing.assert_allclose(np.asarray(mu), 5e-5)
    np.testing.assert_allclose(np.asarray(alpha), 7e-5)
    # and the fits remain in charge without the hook
    mu0, _, _ = base._mixture_update(
        jnp.full(mesh.shape, 101325.0), jnp.full(mesh.shape, 300.0),
        jnp.ones((1,) + mesh.shape))
    assert abs(float(mu0.mean()) - 5e-5) > 1e-6

    s = solver.initial_state(jnp.full(mesh.shape, 101325.0),
                             jnp.full(mesh.shape, 300.0),
                             jnp.ones((1,) + mesh.shape))
    s, _ = jax.jit(lambda st: solver.step(st, 1e-5))(s)
    assert np.all(np.isfinite(np.asarray(s.T)))
