"""Test configuration: CPU backend with 8 virtual devices, 64-bit precision.

Golden-value tests mirror the reference's Float64 CPU test suite
(/root/reference/test/runtests.jl); distributed tests use the 8-device virtual
CPU mesh. The TPU fast path (f32/bf16, Pallas) is exercised by bench.py on
real hardware.
"""

import os
import sys

# force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# sitecustomize registers the axon TPU backend and sets jax_platforms
# programmatically — override back to CPU for the golden-value suite
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
