"""Test configuration: run on a virtual 8-device CPU mesh with float64 enabled.

The driver benches on one real TPU chip; tests validate numerics (float64 CPU
reference, the same role as the reference's DEBUG_ CPU-vs-GPU diff harness,
/root/reference/src_gpu/dfMatrixDataBase.H:52-64) and multi-chip sharding on a
virtual CPU mesh.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to the TPU backend before conftest
# runs; override through jax.config (env vars alone are too late).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Build the native C++ components (csrc/ -> deepflame_tpu/_native/) so the
# native parity tests run instead of skipping (round-1 review item 10).
_here = os.path.dirname(os.path.abspath(__file__))
_so = os.path.join(_here, "..", "deepflame_tpu", "_native", "libdfnative.so")
if not os.path.exists(_so):
    import subprocess
    subprocess.run(["make", "-C", os.path.join(_here, "..", "csrc")],
                   check=False, capture_output=True)
