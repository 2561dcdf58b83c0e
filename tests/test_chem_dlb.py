"""Cross-device chemistry load balancing (reference DLB parity).

The reference migrates expensive cells across MPI ranks by measured cost
(/root/reference/src/dfChemistryModel/loadBalancing/LoadBalancer.C:124-232).
Under SPMD lockstep the analogue is a stratified all_to_all lane exchange
(chemistry/reactor.py::_stratified_cross_shard): each shard deals its
stiffness-sorted lanes round-robin into P groups, one all_to_all hands every
shard an equal slice of every stratum, a second returns the results.

Tests (8 virtual CPU devices, f64):
- exchange round-trip is the identity;
- a front concentrated in ONE shard's slab is spread evenly (per-shard hot
  count == global/P) — the wall-clock mechanism, since each shard's
  while_loop drains to its own stiffest lane;
- solve_chemistry(cross_shard=True) under shard_map == the unsharded global
  solve (per-cell integration is layout-independent).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from deepflame_tpu.chemistry import load_mechanism, make_kinetics, make_thermo
from deepflame_tpu.chemistry.integrator import RosenbrockOptions
from deepflame_tpu.chemistry.reactor import (_stratified_cross_shard,
                                             solve_chemistry)
from deepflame_tpu.parallel.context import shard_axis

pytestmark = pytest.mark.smoke

MECH = "/root/reference/mechanisms/H2/H2_Li.yaml"


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-300))


def _front_state(n_total, ns, mech):
    """Cold everywhere except a hot 'flame front' inside shard 0's slab."""
    rng = np.random.default_rng(7)
    T = np.full(n_total, 320.0)
    n_shard = n_total // 8
    T[: n_shard // 2] = rng.uniform(1400.0, 2200.0, n_shard // 2)
    Yf = np.zeros(ns)
    iH2, iO2, iN2 = (mech.species_index(s) for s in ("H2", "O2", "N2"))
    Yf[iH2], Yf[iO2], Yf[iN2] = 0.0285, 0.2264, 0.7451
    Y = np.tile(Yf, (n_total, 1))
    return jnp.asarray(T), jnp.full((n_total,), 101325.0), jnp.asarray(Y)


def test_exchange_roundtrip_and_balance():
    n = 256
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n,)))
    x2 = jnp.asarray(rng.normal(size=(n, 3)))
    # hot lanes all in shard 0
    key = jnp.asarray(np.where(np.arange(n) < n // 8 // 2, 1000.0, 1.0))
    dev_mesh = Mesh(np.array(jax.devices()[:8]), ("x",))

    def body(xl, x2l, kl):
        def run(a, b, k):
            # per-shard hot count AFTER the forward exchange
            hot = jnp.sum(k > 100.0)
            return a, b, jnp.broadcast_to(hot, k.shape)
        a, b, hot = _stratified_cross_shard(run, kl, (xl, x2l, kl), 3, "x")
        return a, b, hot[:1]

    a, b, hot = jax.jit(jax.shard_map(
        body, mesh=dev_mesh, in_specs=(P("x"), P("x"), P("x")),
        out_specs=(P("x"), P("x"), P("x")), check_vma=False))(x, x2, key)
    # round trip is exact
    np.testing.assert_array_equal(np.asarray(a), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(x2))
    # the 16 hot lanes (all in shard 0's slab) spread to 2 per shard
    hot_per_shard = np.asarray(hot).reshape(8)
    assert hot_per_shard.sum() == 16
    assert hot_per_shard.max() - hot_per_shard.min() <= 1, hot_per_shard


def test_cross_shard_solve_matches_global():
    mech = load_mechanism(MECH)
    th = make_thermo(mech, jnp.float64)
    kin = make_kinetics(mech, jnp.float64)
    ns = mech.n_species
    T, p, Y = _front_state(256, ns, mech)
    opts = RosenbrockOptions(rtol=1e-6, atol=1e-10, max_steps=2000)
    ref = solve_chemistry(th, kin, T, p, Y, 1e-6, opts, n_bins=8)

    dev_mesh = Mesh(np.array(jax.devices()[:8]), ("x",))

    def body(Tl, pl, Yl):
        with shard_axis("x"):
            r = solve_chemistry(th, kin, Tl, pl, Yl, 1e-6, opts, n_bins=4,
                                cross_shard=True)
        return r.T, r.Y, r.RR

    Td, Yd, RRd = jax.jit(jax.shard_map(
        body, mesh=dev_mesh, in_specs=(P("x"), P("x"), P("x")),
        out_specs=(P("x"), P("x"), P("x")), check_vma=False))(T, p, Y)
    assert _rel(Td, ref.T) < 1e-12
    assert _rel(Yd, ref.Y) < 1e-12
    assert _rel(RRd, ref.RR) < 1e-9
