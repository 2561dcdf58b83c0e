"""Platform/precision selection shared by the example drivers.

TPU has no hardware float64; requesting jax_enable_x64 on the axon TPU
backend has been observed to CRASH the libtpu worker (not just error), so
the f64 accurate tier always runs on CPU unless the caller explicitly pinned
a platform. Role parity: the reference is f64-everywhere on CPU (OpenFOAM)
and f32/f16 on GPU; here f32 is the TPU production tier and f64 the CPU
verification tier (tests/conftest.py).
"""
from __future__ import annotations

__all__ = ["configure"]


def configure(platform: str | None, dtype: str):
    """Apply --platform/--dtype CLI choices safely. Returns the jnp dtype."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if dtype == "f64":
        if not platform:
            # unpinned platform would resolve to the TPU backend -> worker
            # crash under x64; force the CPU verification tier
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    return jnp.float64 if dtype == "f64" else jnp.float32
