"""Compact-gather chemistry binning == direct integration (round 5).

The top-K compaction in reactor._integrate_binned must be a pure layout
optimization: per-lane results identical to the unbinned single-batch
integration, for (a) the compact path (few rejects), (b) the overflow
path (reject count > capacity -> lax.cond falls back to full sorted
binning), (c) the cross-shard wrapper still composing with it.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.chemistry import (load_mechanism, make_thermo,
                                     make_kinetics)
from deepflame_tpu.chemistry.integrator import RosenbrockOptions
from deepflame_tpu.chemistry.reactor import solve_chemistry

pytestmark = pytest.mark.smoke

MECH = "/root/reference/mechanisms/H2/H2_Li.yaml"


def _mix(n_hot=24, n=4096, seed=0):
    mech = load_mechanism(MECH)
    th, kin = make_thermo(mech), make_kinetics(mech)
    ns = mech.n_species
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    rng = np.random.default_rng(seed)
    T = np.full(n, 700.0)
    hot = rng.choice(n, n_hot, replace=False)
    T[hot] = rng.uniform(1500.0, 2100.0, n_hot)
    Y = np.zeros((n, ns))
    Y[:, iH2], Y[:, iO2], Y[:, iN2] = 0.0285, 0.2264, 0.7451
    p = np.full(n, 101325.0)
    return th, kin, jnp.asarray(T), jnp.asarray(p), jnp.asarray(Y)


def test_compact_equals_unbinned():
    th, kin, T, p, Y = _mix()
    opts = RosenbrockOptions(rtol=1e-4, atol=1e-8, max_steps=2000, grow=10.0)
    dt = 2.5e-7
    r_bin = solve_chemistry(th, kin, T, p, Y, dt, opts=opts, n_bins=16)
    r_one = solve_chemistry(th, kin, T, p, Y, dt, opts=opts, n_bins=1)
    np.testing.assert_allclose(np.asarray(r_bin.T), np.asarray(r_one.T),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r_bin.Y), np.asarray(r_one.Y),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(r_bin.dt_next),
                               np.asarray(r_one.dt_next), rtol=1e-12)


def test_overflow_falls_back_exactly():
    """All lanes hot (reject count > K capacity): the lax.cond overflow
    branch (full sorted binning) must produce the unbinned result too."""
    mech = load_mechanism(MECH)
    th, kin = make_thermo(mech), make_kinetics(mech)
    ns = mech.n_species
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    n = 512
    rng = np.random.default_rng(3)
    T = jnp.asarray(rng.uniform(1400.0, 2200.0, n))
    Y = np.zeros((n, ns))
    Y[:, iH2], Y[:, iO2], Y[:, iN2] = 0.0285, 0.2264, 0.7451
    p = jnp.full((n,), 101325.0)
    opts = RosenbrockOptions(rtol=1e-5, atol=1e-9, max_steps=2000, grow=10.0)
    dt = 1e-7
    r_bin = solve_chemistry(th, kin, T, p, jnp.asarray(Y), dt, opts=opts,
                            n_bins=16)
    r_one = solve_chemistry(th, kin, T, p, jnp.asarray(Y), dt, opts=opts,
                            n_bins=1)
    np.testing.assert_allclose(np.asarray(r_bin.T), np.asarray(r_one.T),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r_bin.Y), np.asarray(r_one.Y),
                               atol=1e-13)


def test_compact_under_jit_and_warm_start():
    """jit + dt_start warm path through the compact branch stays finite and
    matches eager."""
    th, kin, T, p, Y = _mix(seed=7)
    opts = RosenbrockOptions(rtol=1e-4, atol=1e-8, max_steps=2000, grow=10.0)
    dt = 2.5e-7
    d0 = jnp.full(T.shape, 1e-8)
    f = jax.jit(lambda T_, p_, Y_: solve_chemistry(
        th, kin, T_, p_, Y_, dt, opts=opts, n_bins=16, dt_start=d0,
        sort="dt"))
    r_j = f(T, p, Y)
    r_e = solve_chemistry(th, kin, T, p, Y, dt, opts=opts, n_bins=16,
                          dt_start=d0, sort="dt")
    assert bool(jnp.all(jnp.isfinite(r_j.T)))
    np.testing.assert_allclose(np.asarray(r_j.T), np.asarray(r_e.T),
                               rtol=1e-10)
