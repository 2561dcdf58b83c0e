"""DF-ODENet: DNN chemistry surrogate (per-species GELU MLPs + BCT transform).

Role parity: the reference's DNN chemistry path — case-local `inference.py`
(/root/reference/test/Tu500K-Phi1/inference.py:99-167: per-species GELU MLP
[ns+2, 1600, 800, 400, 1], Box-Cox transform lambda=0.1, frozenTemperature
mask, RR=(Ynew-Y) rho/delta_t with the inert species held fixed and the rest
renormalized) plus the libtorch `DNNInferencer` (/root/reference/src/
dfChemistryModel/DNNInferencer/DNNInferencer.cpp) and the in-GPU-loop
`dfChemistrySolver` (/root/reference/src_gpu/dfChemistrySolver.cu:5-70).

TPU-first: the reference needs a hierarchical MPI submaster choreography to
feed one GPU from many CPU ranks (pytorchFunctions.H:5-306); on TPU, inference
is just three batched matmuls fused into the jitted solver step — the entire
fan-out collapses (SURVEY.md §2.11.3). Up to 3 temperature-range models
(DNNid selection, torchFunctions.H:44-147) are supported via stacked params.

Checkpoint compatibility: `load_torch_checkpoint` imports the published
DF-ODENet .pt state_dict format (net{i} submodules + data_in_mean/std,
data_target_mean/std); `init_params` + examples/train_dfodenet.py train the
same architecture from scratch on 0D-reactor data with optax.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


__all__ = ["DFODENet", "MultiRangeDFODENet", "init_params", "mlp_apply",
           "load_torch_checkpoint", "load_npz_checkpoint", "bct", "inv_bct"]

LAYERS = (1600, 800, 400)


def bct(y, lam=0.1):
    """Box-Cox transform (inference.py:143)."""
    return (jnp.maximum(y, 0.0) ** lam - 1.0) / lam


def inv_bct(z, lam=0.1):
    return jnp.maximum(lam * z + 1.0, 0.0) ** (1.0 / lam)


def mlp_apply(params: Sequence[tuple], x):
    """GELU MLP forward: params = [(W, b), ...]; GELU between layers, linear
    output (inference.py NN_MLP)."""
    h = x
    for i, (W, b) in enumerate(params):
        h = h @ W + b
        if i < len(params) - 1:
            # exact (erf) GELU: torch.nn.GELU's default, which the published
            # checkpoints were trained with
            h = jax.nn.gelu(h, approximate=False)
    return h


def init_params(key, n_species: int, hidden=LAYERS, dtype=jnp.float32):
    """Random params for (n_species - 1) per-species MLPs [ns+2, *hidden, 1]."""
    sizes = (n_species + 2,) + tuple(hidden) + (1,)
    nets = []
    for s in range(n_species - 1):
        layers = []
        for i in range(len(sizes) - 1):
            key, k1 = jax.random.split(key)
            scale = (2.0 / sizes[i]) ** 0.5
            W = jax.random.normal(k1, (sizes[i], sizes[i + 1]), dtype) * scale
            layers.append((W, jnp.zeros((sizes[i + 1],), dtype)))
        nets.append(layers)
    return nets


@dataclasses.dataclass(frozen=True)
class DFODENet:
    """DNN chemistry surrogate. `nets` is a list of per-species MLP params
    (species 0..ns-2; the last/inert species is closed by renormalization,
    matching the published checkpoint layout)."""
    nets: Any                 # list[ns-1] of list[(W, b)]
    x_mean: jax.Array         # (ns+2,) over [T, p_Pa, BCT(Y)...]
    x_std: jax.Array
    y_mean: jax.Array         # (ns-1,) target delta-BCT stats
    y_std: jax.Array
    delta_t: float            # inferenceDeltaTime the net was trained for
    frozen_T: float = 700.0
    lam: float = 0.1
    # MXU execution knobs. fuse=True runs the (ns-1) per-species MLPs as
    # ONE batched matmul per layer (weights stacked (S, in, out)) — the
    # reference launches one TorchScript module per species serially
    # (dfChemistrySolver.cu:112-123). compute_dtype=jnp.bfloat16 runs the
    # matmuls in bf16 with f32 accumulation (the reference's device
    # chemistry is fp16, same role); None keeps exact f32 (checkpoint
    # parity tests).
    fuse: bool = True
    compute_dtype: Any = None
    # lanes per fused-MLP chunk: the (S, B, 1600) hidden activations are
    # the memory AND bandwidth cost (at 96^3 f32 they would be 25 GB —
    # over HBM); chunking bounds them, lax.map serializes chunks
    chunk: int = 131072

    def _fused_mlp(self, x):
        """(..., ns+2) -> (..., ns-1): all species through stacked weights;
        one dot_general per layer, S as the matmul batch dimension. With
        compute_dtype set, hidden activations are STORED in that dtype
        (matmul accumulation stays f32 via preferred_element_type) — the
        activation traffic, not the MXU, bounds this workload."""
        L = len(self.nets[0])
        cd = self.compute_dtype
        h = None
        for l in range(L):
            Ws = jnp.stack([net[l][0] for net in self.nets])   # (S, i, o)
            bs = jnp.stack([net[l][1] for net in self.nets])   # (S, o)
            if cd is not None:
                Ws = Ws.astype(cd)
            last = l == L - 1
            if h is None:
                xin = x.astype(cd) if cd is not None else x
                h = jnp.einsum("...i,sio->s...o", xin, Ws,
                               preferred_element_type=x.dtype)
            else:
                h = jnp.einsum("s...i,sio->s...o", h, Ws,
                               preferred_element_type=x.dtype)
            if cd is not None and not last:
                h = h.astype(cd)     # fused into the matmul epilogue
            b_cast = bs.astype(h.dtype)
            h = h + b_cast.reshape((bs.shape[0],) + (1,) * (x.ndim - 1)
                                   + (bs.shape[1],))
            if not last:
                h = jax.nn.gelu(h, approximate=False)
        return jnp.moveaxis(h[..., 0].astype(x.dtype), 0, -1)  # (..., S)

    def _fused_mlp_chunked(self, x):
        """Flatten the batch and run _fused_mlp in `chunk`-lane pieces so
        peak activation memory is bounded (lax.map serializes chunks).
        On TPU the whole thing runs instead as ONE Pallas kernel whose
        hidden activations never leave VMEM (ops/pallas_kernels.
        mlp_fused_lanes) — the chunked XLA path's inter-layer HBM
        round-trips are what capped round 4's first DNN bench at 24% MFU."""
        lead = x.shape[:-1]
        F = x.shape[-1]
        B = 1
        for d in lead:
            B *= d
        xf = x.reshape(B, F)
        import os as _os
        if (jax.devices()[0].platform == "tpu"
                and len(self.nets[0]) == 4 and x.dtype.itemsize <= 4
                and not _os.environ.get("DEEPFLAME_NO_MLP_PALLAS")):
            from ..ops.pallas_kernels import mlp_fused_lanes
            Ws = [jnp.stack([net[l][0] for net in self.nets])
                  for l in range(4)]
            bias = [jnp.stack([net[l][1] for net in self.nets])
                    for l in range(4)]
            cd = self.compute_dtype if self.compute_dtype is not None \
                else x.dtype
            out = mlp_fused_lanes(xf, Ws, bias, compute_dtype=cd)
            return out.reshape(lead + (-1,))
        if self.chunk is None or B <= self.chunk:
            return self._fused_mlp(xf).reshape(lead + (-1,))
        C = self.chunk
        pad = (-B) % C
        if pad:
            xf = jnp.concatenate([xf, jnp.zeros((pad, F), x.dtype)], axis=0)
        xb = xf.reshape(-1, C, F)
        out = jax.lax.map(self._fused_mlp, xb)               # (nc, C, S)
        out = out.reshape(-1, out.shape[-1])[:B]
        return out.reshape(lead + (-1,))

    def rates(self, T, p, Y, rho):
        """RR [kg/m^3/s] for a batch: T,p,rho (...,), Y (..., ns).

        Follows inference.py:121-167 exactly: BCT + normalize -> per-species
        MLP -> delta BCT -> inverse BCT -> inert-preserving renormalization ->
        RR = (Ynew - Y) rho / delta_t, masked by frozenTemperature."""
        ns = Y.shape[-1]
        x_bct = jnp.concatenate(
            [T[..., None], p[..., None], bct(Y, self.lam)], axis=-1)
        x = (x_bct - self.x_mean) / self.x_std
        shapes_ok = len({tuple(W.shape for W, _ in net)
                         for net in self.nets}) == 1
        if self.fuse and shapes_ok:
            out = self._fused_mlp_chunked(x)              # (..., ns-1)
        else:
            outs = [mlp_apply(net, x) for net in self.nets]
            out = jnp.concatenate(outs, axis=-1)          # (..., ns-1)
        new_bct = out * self.y_std + self.y_mean + x_bct[..., 2:-1]
        Y_new_active = inv_bct(new_bct, self.lam)
        Y_inert = Y[..., -1:]
        Y_new_active = Y_new_active / jnp.maximum(
            jnp.sum(Y_new_active, axis=-1, keepdims=True), 1e-30) * (1.0 - Y_inert)
        Y_new = jnp.concatenate([Y_new_active, Y_inert], axis=-1)
        RR = (Y_new - Y) * rho[..., None] / self.delta_t
        mask = (T > self.frozen_T)[..., None]
        return jnp.where(mask, RR, 0.0)


def load_npz_checkpoint(path: str, frozen_T: float = 700.0,
                        dtype=jnp.float32) -> DFODENet:
    """Load a checkpoint trained by examples/train_dfodenet.py."""
    d = np.load(path)
    ns = int(d["n_species"])
    n_layers = int(d["n_layers"])
    nets = []
    for i in range(ns - 1):
        nets.append([(jnp.asarray(d[f"net{i}_W{j}"], dtype),
                      jnp.asarray(d[f"net{i}_b{j}"], dtype))
                     for j in range(n_layers)])
    return DFODENet(nets=nets,
                    x_mean=jnp.asarray(d["x_mean"], dtype),
                    x_std=jnp.asarray(d["x_std"], dtype),
                    y_mean=jnp.asarray(d["y_mean"], dtype),
                    y_std=jnp.asarray(d["y_std"], dtype),
                    delta_t=float(d["delta_t"]), frozen_T=frozen_T)


def load_torch_checkpoint(path: str, n_species: int, delta_t: float,
                          frozen_T: float = 700.0,
                          dtype=jnp.float32) -> DFODENet:
    """Import a published DF-ODENet torch .pt state dict (the AIS-Square
    download format consumed by inference.py:64-107)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    x_mean = jnp.asarray(np.asarray(sd["data_in_mean"]), dtype)
    x_std = jnp.asarray(np.asarray(sd["data_in_std"]), dtype)
    y_mean = jnp.asarray(np.asarray(sd["data_target_mean"]), dtype)
    y_std = jnp.asarray(np.asarray(sd["data_target_std"]), dtype)
    nets = []
    for i in range(n_species - 1):
        net_sd = sd[f"net{i}"]
        keys = sorted(
            {k.rsplit(".", 1)[0] for k in net_sd if k.endswith(".weight")},
            key=lambda s: int(s.rsplit("_", 1)[-1]))
        layers = []
        for kname in keys:
            W = jnp.asarray(np.asarray(net_sd[kname + ".weight"]).T, dtype)
            b = jnp.asarray(np.asarray(net_sd[kname + ".bias"]), dtype)
            layers.append((W, b))
        nets.append(layers)
    # scale-from-atm convention: inference.py:128 multiplies p by 101325
    return DFODENet(nets=nets, x_mean=x_mean, x_std=x_std, y_mean=y_mean,
                    y_std=y_std, delta_t=delta_t, frozen_T=frozen_T)


@dataclasses.dataclass(frozen=True)
class MultiRangeDFODENet:
    """Up to 3 temperature-range models with per-cell DNNid dispatch
    (the reference's getDNNinputs partitioning, torchFunctions.H:44-147:
    cells are routed to model 0/1/2 by temperature band)."""
    nets: tuple               # tuple[DFODENet, ...]
    T_bounds: tuple           # ascending band edges, len = len(nets) - 1

    def rates(self, T, p, Y, rho):
        rr = self.nets[0].rates(T, p, Y, rho)
        for i in range(1, len(self.nets)):
            mask = (T >= self.T_bounds[i - 1])[..., None]
            rr = jnp.where(mask, self.nets[i].rates(T, p, Y, rho), rr)
        return rr
