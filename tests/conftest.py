"""Test configuration: CPU backend with a virtual 8-device mesh.

Mirrors the reference test strategy (SURVEY.md §4): correctness tests run on
CPU; multi-chip sharding is validated on a virtual device mesh
(xla_force_host_platform_device_count) without TPU hardware.
"""

import os

# The deployment environment pins JAX_PLATFORMS=axon (TPU tunnel); tests must
# run on CPU, so force it before jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself from sitecustomize regardless of
# JAX_PLATFORMS; pin the platform via config too so tests really run on CPU.
jax.config.update("jax_platforms", "cpu")
# fp32 matmuls default to fast (bf16-pass) precision even on CPU; parity
# tests against HF need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
