"""Distributed (multi-chip) execution: SPMD domain decomposition.

Replaces the reference's MPI (Pstream) + NCCL + AmgX-consolidation triple
stack (SURVEY.md §2.11) with one shard_map program over a jax device mesh.
"""
from .context import current_axis, gmax, gmean, gmin, gsize, gsum, shard_axis

__all__ = ["shard_axis", "current_axis", "gsum", "gmax", "gmin", "gmean",
           "gsize", "DistributedLowMach", "DistLowMachState", "localize_bcs",
           "localize_solver"]

_LAZY = {"DistributedLowMach", "DistLowMachState", "localize_bcs",
         "localize_solver"}


def __getattr__(name):
    # distributed.py imports the solver stack, which imports this package's
    # context module — resolve lazily to avoid the cycle
    if name in _LAZY:
        from . import distributed
        return getattr(distributed, name)
    raise AttributeError(name)
