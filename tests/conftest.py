"""Test harness: run everything on CPU with 8 virtual devices.

This is the TPU-native analog of the reference's "multi-node without a
cluster" gap (SURVEY.md §4): sharding/collective tests execute on a virtual
8-device mesh so CI needs no TPU.

Note: the environment's sitecustomize imports jax and pins the axon TPU
platform at interpreter start, so plain env vars are too late — we override
via jax.config before any backend is initialized. Set IGT_TEST_TPU=1 to run
the test suite on the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

if not os.environ.get("IGT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# XLA:CPU compiles these graphs slowly (~10s for even small FK graphs); a
# persistent on-disk cache makes test re-runs and iterating cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
