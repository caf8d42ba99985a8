"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (SURVEY.md §4 implication
(c): forced-multi-device CPU meshes)."""

import os

# Force CPU even when the shell env points JAX at a TPU plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) pins jax_platforms, overriding the env
# var — force CPU via config so tests never run over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)
# Parity tests compare f32 against torch: force true-f32 matmuls (JAX's
# default precision uses bf16 passes even for f32 inputs).
jax.config.update("jax_default_matmul_precision", "highest")
