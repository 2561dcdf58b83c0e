"""DF-ODENet surrogate: transform/pipeline parity and torch-checkpoint import.

Anchors: the reference inference.py pipeline (BCT lambda=0.1, normalization,
per-species GELU MLP, inert-preserving renormalization, frozen mask) — checked
against a torch execution of the same weights (the reference's runtime).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepflame_tpu.chemistry import load_mechanism, make_thermo, make_kinetics
from deepflame_tpu.chemistry.dnn import (DFODENet, bct, inv_bct, init_params,
                                         mlp_apply, load_torch_checkpoint)


def test_bct_roundtrip():
    y = jnp.asarray(np.random.default_rng(0).uniform(1e-8, 1.0, 100))
    np.testing.assert_allclose(np.asarray(inv_bct(bct(y))), np.asarray(y),
                               rtol=1e-10)


@pytest.fixture(scope="module")
def small_net():
    mech = load_mechanism("/root/reference/mechanisms/H2/H2_Li.yaml")
    ns = mech.n_species
    key = jax.random.PRNGKey(42)
    nets = init_params(key, ns, hidden=(32, 16))
    net = DFODENet(
        nets=nets,
        x_mean=jnp.zeros(ns + 2), x_std=jnp.ones(ns + 2) * 100.0,
        y_mean=jnp.zeros(ns - 1), y_std=jnp.ones(ns - 1) * 1e-3,
        delta_t=1e-6, frozen_T=700.0)
    return mech, net


def test_dnn_rates_properties(small_net):
    mech, net = small_net
    ns = mech.n_species
    rng = np.random.default_rng(1)
    n = 16
    Y = rng.dirichlet(np.ones(ns), n)
    T = jnp.asarray(np.concatenate([np.full(8, 300.0), np.full(8, 1500.0)]))
    p = jnp.full((n,), 101325.0)
    rho = jnp.ones((n,))
    RR = net.rates(T, p, jnp.asarray(Y), rho)
    RRn = np.asarray(RR)
    assert np.all(np.isfinite(RRn))
    # frozen cells: zero rates
    np.testing.assert_allclose(RRn[:8], 0.0)
    # mass consistency: sum_i RR_i = 0 (renormalization + fixed inert)
    np.testing.assert_allclose(RRn[8:].sum(-1), 0.0, atol=1e-8)
    # inert species rate is exactly zero
    np.testing.assert_allclose(RRn[:, -1], 0.0, atol=1e-12)


def test_torch_checkpoint_parity(tmp_path, small_net):
    """Write a state dict in the published format, load it, and match a torch
    forward pass bit-for-bit (same math as reference inference.py)."""
    torch = pytest.importorskip("torch")
    mech, _ = small_net
    ns = mech.n_species
    layers = [ns + 2, 24, 12, 1]

    sd = {"data_in_mean": np.random.default_rng(2).normal(size=ns + 2),
          "data_in_std": np.abs(np.random.default_rng(3).normal(size=ns + 2)) + 1,
          "data_target_mean": np.zeros(ns - 1),
          "data_target_std": np.ones(ns - 1)}
    torch_nets = []
    for i in range(ns - 1):
        net_t = torch.nn.Sequential()
        for j in range(len(layers) - 2):
            net_t.add_module(f"linear_layer_{j}",
                             torch.nn.Linear(layers[j], layers[j + 1]))
            net_t.add_module(f"gelu_layer_{j}", torch.nn.GELU())
        net_t.add_module(f"linear_layer_{len(layers) - 2}",
                         torch.nn.Linear(layers[-2], layers[-1]))
        net_t = net_t.double()
        torch_nets.append(net_t)
        sd[f"net{i}"] = net_t.state_dict()
    path = str(tmp_path / "model.pt")
    torch.save(sd, path)

    net = load_torch_checkpoint(path, ns, delta_t=1e-6, dtype=jnp.float64)
    x = np.random.default_rng(4).normal(size=(5, ns + 2))
    for i in range(ns - 1):
        ours = np.asarray(mlp_apply(net.nets[i], jnp.asarray(x)))
        with torch.no_grad():
            ref = torch_nets[i](torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


def test_multi_range_dispatch(small_net):
    """Cells route to the model matching their temperature band."""
    from deepflame_tpu.chemistry.dnn import MultiRangeDFODENet
    mech, net = small_net
    ns = mech.n_species
    # second model with scaled outputs so the dispatch is observable
    net_hot = net.__class__(nets=net.nets, x_mean=net.x_mean, x_std=net.x_std,
                            y_mean=net.y_mean, y_std=net.y_std * 2.0,
                            delta_t=net.delta_t, frozen_T=net.frozen_T)
    multi = MultiRangeDFODENet(nets=(net, net_hot), T_bounds=(1500.0,))
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.dirichlet(np.ones(ns), 4))
    T = jnp.asarray([800.0, 1200.0, 1600.0, 2500.0])
    p = jnp.full((4,), 101325.0)
    rho = jnp.ones((4,))
    rr = np.asarray(multi.rates(T, p, Y, rho))
    r_lo = np.asarray(net.rates(T, p, Y, rho))
    r_hi = np.asarray(net_hot.rates(T, p, Y, rho))
    np.testing.assert_allclose(rr[:2], r_lo[:2])
    np.testing.assert_allclose(rr[2:], r_hi[2:])
    assert not np.allclose(r_lo[2:], r_hi[2:])
