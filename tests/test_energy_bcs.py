"""Energy BC tests: fixedEnergy/gradientEnergy/mixedEnergy resolution.

The T-space energy BCs (mesh/energy_bcs.py; OpenFOAM fixedEnergy /
gradientEnergy / mixedEnergy FvPatchScalarField parity) resolve to affine
ghost BCs on the enthalpy field. Key invariants: a fixedEnergy(T_b) BC with
uniform composition must reproduce the static fixed_value(h(T_b, Y)) BC
exactly through a full solver step, and mixedEnergy interpolates between
the two pure kinds.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                     make_kinetics, make_transport)
from deepflame_tpu.combustion import NoCombustion
from deepflame_tpu.mesh import (StructuredMesh, empty, fixed_value,
                                zero_gradient, fixed_energy, gradient_energy,
                                mixed_energy, resolve_energy_bcs)
from deepflame_tpu.solvers.low_mach import LowMachSolver, LowMachConfig

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def gas():
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    return mech, make_thermo(mech), make_transport(mech), make_kinetics(mech)


def make_solver(gas, mesh, bh):
    mech, th, tr, kin = gas
    e = (empty(), empty())
    bS = ((zero_gradient(), zero_gradient()), e, e)
    bU = ((fixed_value(0.0), zero_gradient()), e, e)
    return LowMachSolver(
        mesh=mesh, thermo=th, transport=tr, combustion=NoCombustion(th, kin),
        bcs_U=(bU, bU, bU), bcs_p=bS, bcs_h=bh, bcs_Y=bS, bcs_rho=bS,
        config=LowMachConfig(chemistry=False))


def test_resolution_coefficients(gas):
    """fixedEnergy -> (-1, 2 h(T_b, Y_own)); gradientEnergy -> (1, ±cp g h);
    mixedEnergy(f=1) == fixedEnergy, mixedEnergy(f=0) == gradientEnergy."""
    mech, th, tr, kin = gas
    n = 8
    mesh = StructuredMesh.box([1.0, 1.0 / n, 1.0 / n], [n, 1, 1])
    T = jnp.full(mesh.shape, 400.0)
    Y = jnp.ones((1,) + mesh.shape)
    e = (empty(), empty())
    T_b, g_b = 500.0, 1000.0
    bh = ((fixed_energy(T_b), gradient_energy(g_b)), e, e)
    out = resolve_energy_bcs(bh, T, Y, th, mesh)
    a_lo, b_lo = out[0][0].coeffs(mesh.dx, -1)
    a_hi, b_hi = out[0][1].coeffs(mesh.dx, +1)
    h_b = float(th.h_mass(jnp.asarray(500.0), jnp.ones(1)))
    cp = float(th.cp_mass(jnp.asarray(400.0), jnp.ones(1)))
    assert a_lo == -1.0
    np.testing.assert_allclose(np.asarray(b_lo).ravel()[0], 2.0 * h_b,
                               rtol=1e-12)
    assert a_hi == 1.0
    np.testing.assert_allclose(np.asarray(b_hi).ravel()[0],
                               cp * g_b * mesh.dx, rtol=1e-12)
    # mixed at the extremes
    bh_m1 = ((mixed_energy(T_b, g_b, 1.0), mixed_energy(T_b, g_b, 0.0)),
             e, e)
    out_m = resolve_energy_bcs(bh_m1, T, Y, th, mesh)
    a, b = out_m[0][0].coeffs(mesh.dx, -1)
    np.testing.assert_allclose(float(np.asarray(a).ravel()[0]), -1.0)
    np.testing.assert_allclose(np.asarray(b).ravel()[0], 2.0 * h_b,
                               rtol=1e-12)
    a, b = out_m[0][1].coeffs(mesh.dx, +1)
    np.testing.assert_allclose(float(np.asarray(a).ravel()[0]), 1.0)
    np.testing.assert_allclose(np.asarray(b).ravel()[0],
                               cp * g_b * mesh.dx, rtol=1e-12)


def test_fixed_energy_matches_static_h_bc(gas):
    """fixedEnergy(T_b) with uniform composition == fixed_value(h(T_b, Y))
    through a full solver step, to machine precision."""
    mech, th, tr, kin = gas
    n = 16
    mesh = StructuredMesh.box([0.1, 0.1 / n, 0.1 / n], [n, 1, 1])
    e = (empty(), empty())
    T_hot = 600.0
    h_hot = float(th.h_mass(jnp.asarray(T_hot), jnp.ones(1)))
    bh_static = ((fixed_value(h_hot), zero_gradient()), e, e)
    bh_energy = ((fixed_energy(T_hot), zero_gradient()), e, e)
    T0 = jnp.full(mesh.shape, 300.0)
    Y0 = jnp.ones((1,) + mesh.shape)
    p0 = jnp.full(mesh.shape, 101325.0)
    outs = []
    for bh in (bh_static, bh_energy):
        solver = make_solver(gas, mesh, bh)
        s = solver.initial_state(p0, T0, Y0)
        step = jax.jit(lambda st: solver.step(st, 1e-5)[0])
        for _ in range(5):
            s = step(s)
        outs.append(s)
    np.testing.assert_allclose(np.asarray(outs[1].T), np.asarray(outs[0].T),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(outs[1].ha), np.asarray(outs[0].ha),
                               rtol=1e-12)
    # and the wall actually heats the adjacent gas (conduction over 50 us
    # through a 6 mm cell is small but strictly positive)
    assert float(outs[1].T[0, 0, 0]) > 300.0 + 1e-3


def test_gradient_energy_heats_like_heat_flux(gas):
    """gradientEnergy(dT/dn > 0 into the domain) adds energy: domain mean T
    rises; zero gradient leaves it constant."""
    mech, th, tr, kin = gas
    n = 16
    mesh = StructuredMesh.box([0.1, 0.1 / n, 0.1 / n], [n, 1, 1])
    e = (empty(), empty())
    # low side: dT/dx = -5e6 K/m (ghost hotter than owner -> influx)
    bh_flux = ((gradient_energy(-5e6), zero_gradient()), e, e)
    bh_adia = ((zero_gradient(), zero_gradient()), e, e)
    T0 = jnp.full(mesh.shape, 300.0)
    Y0 = jnp.ones((1,) + mesh.shape)
    p0 = jnp.full(mesh.shape, 101325.0)
    means = []
    for bh in (bh_flux, bh_adia):
        solver = make_solver(gas, mesh, bh)
        s = solver.initial_state(p0, T0, Y0)
        step = jax.jit(lambda st: solver.step(st, 1e-5)[0])
        for _ in range(5):
            s = step(s)
        means.append(float(jnp.mean(s.T)))
    assert means[0] > means[1] + 1e-2
    assert abs(means[1] - 300.0) < 0.5
