"""DeePFGM: neural-network flamelet manifold (NN replaces table lookup).

Role parity: /root/reference/src/dfCombustionModels/FGM/DeePFGM/DeePFGM.C —
replaces flareFGM's multilinear table interpolation with NN inference (the
reference reuses the chemistry DNN submaster/GPU fan-out machinery,
DeePFGM.H:96-116; here inference is a fused batched matmul like everything
else). The network maps normalized control variables (z, c, gz, gc) to the
table outputs (omgc, cOc, ZOc, cp, mwt, hiyi, Tf, nu) and can be distilled
directly from any FlameletTable — replacing the downloadable DeePFGM models
the reference fetches from AIS Square.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...chemistry.dnn import mlp_apply
from .table import BASE_TABLES, FlameletTable, lookup

__all__ = ["DeepFGM", "train_deep_fgm"]

_OUTPUTS = BASE_TABLES  # ("omgc", "cOc", "ZOc", "cp", "mwt", "hiyi", "Tf", "nu")


@dataclasses.dataclass(frozen=True)
class DeepFGM:
    params: Any             # MLP params [(W, b), ...]
    x_mean: jax.Array       # (4,) over [z, c, gz, gc]
    x_std: jax.Array
    y_mean: jax.Array       # (8,)
    y_std: jax.Array

    def query(self, Z, c, gz, gc) -> dict:
        """All manifold outputs at once: dict name -> field."""
        x = jnp.stack([Z, c, gz, gc], axis=-1)
        xn = (x - self.x_mean) / self.x_std
        yn = mlp_apply(self.params, xn)
        y = yn * self.y_std + self.y_mean
        out = {name: y[..., i] for i, name in enumerate(_OUTPUTS)}
        # physical floors: cp, mwt, Tf, nu must stay positive
        for k in ("cp", "mwt", "Tf", "nu"):
            out[k] = jnp.maximum(out[k], {"cp": 100.0, "mwt": 1.0,
                                          "Tf": 200.0, "nu": 1e-7}[k])
        out["omgc"] = jnp.maximum(out["omgc"], 0.0)
        return out


def train_deep_fgm(table: FlameletTable, hidden=(64, 64, 32),
                   n_samples: int = 20000, epochs: int = 200,
                   batch: int = 2048, lr: float = 2e-3, seed: int = 0,
                   dtype=jnp.float32, verbose: bool = False) -> DeepFGM:
    """Distill a FlameletTable into a DeepFGM network."""
    import optax
    rng = np.random.default_rng(seed)
    z_ax, c_ax = np.asarray(table.axes[1]), np.asarray(table.axes[2])
    gz_ax, gc_ax = np.asarray(table.axes[3]), np.asarray(table.axes[4])
    Z = rng.uniform(z_ax.min(), z_ax.max(), n_samples)
    C = rng.uniform(c_ax.min(), c_ax.max(), n_samples)
    GZ = rng.uniform(gz_ax.min(), gz_ax.max(), n_samples)
    GC = rng.uniform(gc_ax.min(), gc_ax.max(), n_samples)
    coords = (None, jnp.asarray(Z), jnp.asarray(C), jnp.asarray(GZ),
              jnp.asarray(GC), None)
    Y = np.stack([np.asarray(lookup(table, name, coords))
                  for name in _OUTPUTS], axis=-1)
    X = np.stack([Z, C, GZ, GC], axis=-1)
    x_mean, x_std = X.mean(0), X.std(0) + 1e-12
    y_mean, y_std = Y.mean(0), Y.std(0) + 1e-12
    Xn = ((X - x_mean) / x_std).astype(np.float32)
    Yn = ((Y - y_mean) / y_std).astype(np.float32)

    sizes = (4,) + tuple(hidden) + (len(_OUTPUTS),)
    key = jax.random.PRNGKey(seed)
    params = []
    for i in range(len(sizes) - 1):
        key, k = jax.random.split(key)
        W = jax.random.normal(k, (sizes[i], sizes[i + 1]), dtype) \
            * (2.0 / sizes[i]) ** 0.5
        params.append((W, jnp.zeros((sizes[i + 1],), dtype)))

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, xb, yb):
        def loss_fn(p):
            return jnp.mean((mlp_apply(p, xb) - yb) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return jax.tree.map(lambda a, u: a + u, params, updates), opt_state, l

    nb = max(n_samples // batch, 1)
    for ep in range(epochs):
        perm = rng.permutation(n_samples)
        tot = 0.0
        for b_ in range(nb):
            idx = perm[b_ * batch:(b_ + 1) * batch]
            params, opt_state, l = train_step(params, opt_state,
                                              jnp.asarray(Xn[idx]),
                                              jnp.asarray(Yn[idx]))
            tot += float(l)
        if verbose and (ep + 1) % max(epochs // 10, 1) == 0:
            print(f"DeepFGM epoch {ep + 1}: mse={tot / nb:.5f}", flush=True)
    return DeepFGM(params=params,
                   x_mean=jnp.asarray(x_mean, dtype),
                   x_std=jnp.asarray(x_std, dtype),
                   y_mean=jnp.asarray(y_mean, dtype),
                   y_std=jnp.asarray(y_std, dtype))
