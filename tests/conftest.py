"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
tests work without TPU hardware (the TPU answer to testing multi-node without
a cluster — SURVEY.md §4).

NOTE: sitecustomize imports jax at interpreter startup (axon plugin), so
JAX_PLATFORMS set here via os.environ is too late — use jax.config.update.
XLA_FLAGS is still honored because the CPU backend initializes lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# XLA's default matmul precision on CPU/TPU runs fp32 contractions through
# bf16 passes (~1e-3 error) — parity tests need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
