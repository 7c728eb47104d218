"""Test env: force CPU with 8 virtual devices, so multi-chip sharding paths
are exercised without TPU hardware (the standard JAX fake-mesh trick;
SURVEY.md §4).

Note: this image's sitecustomize registers an 'axon' TPU backend and sets
jax_platforms='axon,cpu' at interpreter start, so the env var alone is not
enough — we must update the jax config before any backend initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
