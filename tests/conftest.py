"""Test configuration: force JAX onto 8 virtual CPU devices.

Multi-chip sharding tests run against this virtual mesh, the TPU answer to
testing multi-node behavior without a real cluster (SURVEY.md §4). The config
override (not env vars) is required because the environment's sitecustomize
imports jax and registers a TPU backend before conftest runs.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
