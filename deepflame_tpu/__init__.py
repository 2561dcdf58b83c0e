"""DeepFlame-TPU: TPU-native deep-learning-empowered reacting-flow CFD.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of DeepFlame
(reference: show-me-code/deepflame-dev): low-Mach and fully-compressible
reacting-flow solvers, Cantera-class thermochemistry, stiff chemistry
integration, DNN chemistry surrogates, combustion models (laminar/EDC/PaSR/FGM),
LES turbulence, Lagrangian sprays, and SPMD multi-chip scaling via
jax.sharding — designed for TPU (MXU-dense kinetics, static shapes,
shard_map halo exchange) rather than translated from the reference's
OpenFOAM/CUDA architecture.
"""

__version__ = "0.1.0"

import os as _os


def enable_compile_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache for this process.

    The face-list (plan-specialized) solvers compile in ~25-170 s per mesh
    config (BENCH.md); the reference amortizes its build cost via wmake
    binaries + AmgX setup caches. TPU-native equivalent: XLA's persistent
    compilation cache — a second run of the same solver config deserializes
    the executable instead of re-running the Mosaic/XLA pipeline.

    Called automatically on import (opt out with DEEPFLAME_NO_COMPILE_CACHE=1).
    Cache lives in <repo>/.jax_cache by default (override: DEEPFLAME_CACHE_DIR).
    """
    import jax

    if path is None:
        path = _os.environ.get(
            "DEEPFLAME_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes >1 s to compile; the default (extremely
        # conservative) floor skips most of the solver-step programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # very old jax: cache flags absent — run uncached
    return path


if not _os.environ.get("DEEPFLAME_NO_COMPILE_CACHE"):
    enable_compile_cache()
