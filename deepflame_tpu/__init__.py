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
