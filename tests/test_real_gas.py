"""Peng-Robinson real-gas EOS: analytic limits and consistency."""
import jax
import jax.numpy as jnp
import numpy as np

from deepflame_tpu.chemistry import load_mechanism, make_thermo
from deepflame_tpu.chemistry.real_gas import make_real_gas, \
    CRITICAL_PROPERTIES
from deepflame_tpu.constants import GAS_CONSTANT

import os
DATA = os.path.join(os.path.dirname(__file__), "data")


def setup_n2():
    mech = load_mechanism(os.path.join(DATA, "air.yaml"))
    th = make_thermo(mech)
    rg = make_real_gas(mech, th)
    Y = jnp.ones((1,))
    return mech, th, rg, Y


def test_ideal_limit():
    """Low pressure: PR density -> ideal density."""
    mech, th, rg, Y = setup_n2()
    T = jnp.asarray(300.0)
    p = jnp.asarray(1e4)
    rho_pr = float(rg.rho(p, T, Y))
    rho_id = float(th.rho(p, T, Y))
    assert abs(rho_pr - rho_id) / rho_id < 2e-3


def test_critical_point_Z():
    """At (Tc, pc) the PR compressibility is near the universal Z_c = 0.3074.
    (The rounded Omega_a/Omega_b constants split the exactly-triple root, so
    the largest real root lands at ~0.321 — verified against numpy.roots.)"""
    mech, th, rg, Y = setup_n2()
    Tc, pc, _ = CRITICAL_PROPERTIES["N2"]
    Z = float(rg.Z(jnp.asarray(pc), jnp.asarray(Tc), Y))
    assert abs(Z - 0.3074) < 0.02, Z


def test_cubic_root_vs_numpy():
    """Z from our Cardano == largest real root from numpy.roots across a
    sweep of states."""
    mech, th, rg, Y = setup_n2()
    from deepflame_tpu.chemistry.real_gas import _largest_real_cubic_root
    rng = np.random.default_rng(0)
    for _ in range(30):
        T = rng.uniform(130.0, 600.0)
        p = rng.uniform(1e5, 5e7)
        a, b = rg._mix_ab(jnp.asarray(T), Y)
        A = float(a) * p / (GAS_CONSTANT * T) ** 2
        B = float(b) * p / (GAS_CONSTANT * T)
        c2, c1, c0 = -(1 - B), A - 3 * B * B - 2 * B, -(A * B - B * B - B**3)
        ours = float(_largest_real_cubic_root(jnp.asarray(c2), jnp.asarray(c1),
                                              jnp.asarray(c0)))
        roots = np.roots([1.0, c2, c1, c0])
        ref = max(r.real for r in roots if abs(r.imag) < 1e-9)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_high_pressure_nonideal():
    """N2 at 300 K, 200 bar: Z > 1 slightly (repulsive regime), real density
    differs measurably from ideal; psi consistent with finite difference."""
    mech, th, rg, Y = setup_n2()
    T = jnp.asarray(300.0)
    p = jnp.asarray(2e7)
    Z = float(rg.Z(p, T, Y))
    assert 0.9 < Z < 1.2 and abs(Z - 1.0) > 0.01
    psi = float(rg.psi(T, Y, p=p))
    dp = 1e3
    fd = (float(rg.rho(p + dp, T, Y)) - float(rg.rho(p - dp, T, Y))) / (2 * dp)
    np.testing.assert_allclose(psi, fd, rtol=1e-5)


def test_departure_vanishes_at_low_p():
    mech, th, rg, Y = setup_n2()
    T = jnp.asarray(400.0)
    h_dep = float(rg.h_departure(jnp.asarray(1e4), T, Y))
    h_sensible = float(th.cp_mass(T, Y)) * 100.0
    assert abs(h_dep) < 0.01 * h_sensible
    # at high pressure the departure is significant and negative (attraction)
    h_dep_hi = float(rg.h_departure(jnp.asarray(2e7), T, Y))
    assert abs(h_dep_hi) > 50.0 * abs(h_dep)
