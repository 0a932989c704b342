"""Test config: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh, shard_map, psum/all_gather collectives) are exercised without
TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
