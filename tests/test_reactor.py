"""0D reactor validation (df0DFoam equivalent, SURVEY.md §7 stage 2).

Anchor: H2 autoignition — trajectory and ignition delay cross-checked against
an independent float64 scipy BDF integration of the same chemistry (the role
CVODE plays in the reference), plus conservation invariants.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.chemistry import (load_mechanism, make_thermo, make_kinetics)
from deepflame_tpu.chemistry.reactor import (
    ignite, solve_chemistry, constant_pressure_rhs)
from deepflame_tpu.chemistry.integrator import RosenbrockOptions

MECH = "/root/reference/mechanisms/H2/H2_Li.yaml"


@pytest.fixture(scope="module")
def setup():
    mech = load_mechanism(MECH)
    th = make_thermo(mech)
    kin = make_kinetics(mech)
    return mech, th, kin


def h2_air(mech, phi=1.0):
    """Stoichiometric-ish H2/air mass fractions."""
    ns = mech.n_species
    Y = np.zeros(ns)
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    W = mech.molecular_weights
    # phi H2 + 0.5 O2 (+ 0.5*3.76 N2)
    nH2, nO2 = phi * 1.0, 0.5
    nN2 = nO2 * 3.76
    m = nH2 * W[iH2] + nO2 * W[iO2] + nN2 * W[iN2]
    Y[iH2], Y[iO2], Y[iN2] = nH2 * W[iH2] / m, nO2 * W[iO2] / m, nN2 * W[iN2] / m
    return Y


def ignition_delay(times, T):
    """Time of max dT/dt."""
    dT = np.gradient(np.asarray(T), np.asarray(times))
    return float(times[int(np.argmax(dT))])


def test_h2_ignition_vs_scipy(setup):
    """Rosenbrock trajectory matches scipy BDF (rtol 1e-10) on the same RHS."""
    from scipy.integrate import solve_ivp
    mech, th, kin = setup
    Y0 = h2_air(mech)
    T0, p0 = 1200.0, 101325.0
    t_end = 2e-4

    opts = RosenbrockOptions(rtol=1e-8, atol=1e-14, max_steps=200_000)
    times, T, Y = ignite(th, kin, T0, p0, Y0, t_end, n_out=400, opts=opts)
    tau = ignition_delay(times, T)
    assert 1e-6 < tau < t_end, f"implausible ignition delay {tau}"

    rhs = constant_pressure_rhs(th, kin, jnp.asarray(p0))
    rhs_j = jax.jit(rhs)
    f = lambda t, s: np.asarray(rhs_j(jnp.asarray(s)))
    s0 = np.concatenate([[T0], Y0])
    sol = solve_ivp(f, (0.0, t_end), s0, method="BDF", rtol=1e-10, atol=1e-16,
                    t_eval=np.asarray(times))
    assert sol.success
    T_ref = sol.y[0]
    tau_ref = ignition_delay(np.asarray(times), T_ref)
    assert abs(tau - tau_ref) / tau_ref < 0.02, (tau, tau_ref)
    # final equilibrium temperature matches tightly
    np.testing.assert_allclose(float(T[-1]), T_ref[-1], rtol=1e-5)
    # H2/air adiabatic flame temp at 1 atm from 1200 K start: ~2700-2900 K
    assert 2500.0 < float(T[-1]) < 3200.0


def test_constP_conserves_enthalpy_and_elements(setup):
    mech, th, kin = setup
    Y0 = h2_air(mech)
    T0, p0 = 1300.0, 101325.0
    opts = RosenbrockOptions(rtol=1e-9, atol=1e-15, max_steps=200_000)
    times, T, Y = ignite(th, kin, T0, p0, Y0, 1e-4, n_out=50, opts=opts)
    h0 = float(th.h_mass(jnp.asarray(T0), jnp.asarray(Y0)))
    h_traj = np.asarray(th.h_mass(T, Y))
    np.testing.assert_allclose(h_traj, h0, rtol=2e-5)
    # element conservation: E @ (Y/W) constant
    moles = np.asarray(Y) / mech.molecular_weights
    el = moles @ mech.element_matrix.T
    np.testing.assert_allclose(el, np.broadcast_to(el[0], el.shape),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Y).sum(-1), 1.0, rtol=1e-6)


def test_constV_conserves_energy(setup):
    mech, th, kin = setup
    Y0 = h2_air(mech)
    T0, p0 = 1300.0, 101325.0
    opts = RosenbrockOptions(rtol=1e-9, atol=1e-15, max_steps=200_000)
    times, T, Y = ignite(th, kin, T0, p0, Y0, 1e-4, n_out=50, const="volume",
                         opts=opts)
    e0 = float(th.e_mass(jnp.asarray(T0), jnp.asarray(Y0)))
    e_traj = np.asarray(th.e_mass(T, Y))
    np.testing.assert_allclose(e_traj, e0, rtol=2e-5)
    # constant volume ignition: higher final T than const-P
    assert float(T[-1]) > 2500.0


def test_solve_chemistry_batch(setup):
    """Cell-batch API: frozen cells unchanged, RR mass-consistent."""
    mech, th, kin = setup
    ns = mech.n_species
    Yh = h2_air(mech)
    T = jnp.asarray([300.0, 1500.0, 100.0, 1800.0])
    p = jnp.full(4, 101325.0)
    Y = jnp.asarray(np.stack([Yh] * 4))
    dt = 1e-4  # long enough that the 1500/1800 K cells burn through ignition
    res = solve_chemistry(th, kin, T, p, Y, dt,
                          opts=RosenbrockOptions(rtol=1e-8, atol=1e-14))
    # frozen cell (T=100 < threshold 200): unchanged
    np.testing.assert_allclose(res.T[2], 100.0)
    np.testing.assert_allclose(res.Y[2], Yh, atol=1e-14)
    np.testing.assert_allclose(res.RR[2], 0.0, atol=1e-10)
    # hot cells: H2 consumed, H2O produced, RR mass-neutral
    iH2 = mech.species_index("H2")
    assert float(res.RR[3, iH2]) < 0.0
    rr_sum = np.asarray(res.RR).sum(-1)
    rr_scale = np.maximum(np.abs(np.asarray(res.RR)).sum(-1), 1e-3)
    assert np.all(np.abs(rr_sum) < 1e-6 * rr_scale)
    # cells that burn through ignition release net heat and heat up
    assert float(res.T[3]) > 2000.0
    assert float(res.Qdot[3]) > 0.0


def test_solve_chemistry_ros4_matches_ode23s(setup):
    """The order-4 stiff tier (RosenbrockOptions(order=4), the
    reference-grade tolerance pick) reproduces the ode23s trajectory:
    both at rtol 1e-6 must land within the tolerance envelope of a tight
    rtol-1e-9 reference through H2 ignition."""
    mech, th, kin = setup
    Yh = h2_air(mech)
    n = 32
    rng = np.random.default_rng(1)
    T = jnp.asarray(rng.uniform(900.0, 1900.0, n))
    p = jnp.full(n, 101325.0)
    Y = jnp.asarray(np.stack([Yh] * n))
    dt = 2e-5
    # fast_tier off: exercise the stiff integrator on every lane
    ref = solve_chemistry(th, kin, T, p, Y, dt, n_bins=1, fast_tier=False,
                          opts=RosenbrockOptions(rtol=1e-9, atol=1e-15,
                                                 max_steps=200_000))
    r2 = solve_chemistry(th, kin, T, p, Y, dt, n_bins=1, fast_tier=False,
                         opts=RosenbrockOptions(rtol=1e-6, atol=1e-12,
                                                order=2))
    r4 = solve_chemistry(th, kin, T, p, Y, dt, n_bins=1, fast_tier=False,
                         opts=RosenbrockOptions(rtol=1e-6, atol=1e-12,
                                                order=4))
    # trajectory agreement: through ignition the endpoint is tolerance-
    # limited; 1e-3 relative on T is the ode23s tier's own envelope
    np.testing.assert_allclose(np.asarray(r4.T), np.asarray(ref.T),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(r2.T), np.asarray(ref.T),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(r4.Y), np.asarray(ref.Y),
                               rtol=5e-3, atol=1e-6)


def test_solve_chemistry_sort_modes_agree(setup):
    """Binning by warm-start dt (sort='dt') must reproduce the
    temperature-sorted grouping: each lane integrates independently, so
    the grouping choice cannot change the answer."""
    mech, th, kin = setup
    Yh = h2_air(mech)
    rng = np.random.default_rng(0)
    n = 96
    T = jnp.asarray(rng.uniform(300.0, 1900.0, n))
    p = jnp.full(n, 101325.0)
    Y = jnp.asarray(np.stack([Yh] * n))
    dt = 2e-5
    dt0 = jnp.asarray(rng.uniform(1e-9, 1e-6, n))
    opts = RosenbrockOptions(rtol=1e-8, atol=1e-14)
    a = solve_chemistry(th, kin, T, p, Y, dt, opts=opts, n_bins=8,
                        dt_start=dt0, sort="T")
    b = solve_chemistry(th, kin, T, p, Y, dt, opts=opts, n_bins=8,
                        dt_start=dt0, sort="dt")
    np.testing.assert_allclose(np.asarray(a.T), np.asarray(b.T),
                               rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(a.Y), np.asarray(b.Y),
                               rtol=1e-8, atol=1e-12)
