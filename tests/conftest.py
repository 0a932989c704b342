"""Test config: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh, shard_map, psum/all_gather collectives) are exercised without
TPU hardware.

The axon TPU plugin (/root/.axon_site on PYTHONPATH) hooks compilation and
adds ~3x wall-clock latency even for pure-CPU runs — strip it before jax
imports.  Real-chip verification happens outside pytest (see
.claude/skills/verify/SKILL.md).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    # 8 virtual devices to exercise sharding/collectives without TPUs
    + " --xla_force_host_platform_device_count=8"
    # tests are compile-bound on this 1-core box; skip XLA optimization
    # passes (correctness-neutral, ~3x faster suite)
    + " --xla_backend_optimization_level=0"
)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize force-registers its TPU backend at interpreter
# start and overrides JAX_PLATFORMS; every eager op then pays a ~0.8s remote
# round-trip.  jax.config wins over the plugin — pin CPU here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() == 8, (
    "tests expect 8 virtual CPU devices; got "
    f"{jax.device_count()} ({jax.devices()})"
)

# The suite is compile-bound on this 1-core box; the persistent cache (keyed
# by platform, so CPU test programs never collide with TPU bench programs)
# makes repeat runs — including `pytest -m smoke` in CI — compile-free.
from gigagan_tpu.utils.profiling import enable_compile_cache  # noqa: E402

enable_compile_cache()


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly @pytest.mark.slow is the smoke tier:
    `pytest -m smoke` is the fast high-coverage run (<5 min on one core);
    `pytest -m slow` covers the rest (golden parity vs the executed torch
    reference, multi-minute jitted train-step suites)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
