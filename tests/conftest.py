"""Test harness: force CPU with 8 virtual devices (fake-pod sharding tests).

Must run before jax is imported anywhere in the test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The TPU plugin in this image ignores the JAX_PLATFORMS env var; the config
# update is what actually forces the CPU backend (with 8 virtual devices).
jax.config.update("jax_platforms", "cpu")

# Numerics tests compare against float64 numpy / torch oracles; this JAX
# build defaults to low-precision (bf16-style) matmuls even on CPU.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from c2dsr_tpu.config import Config, DataSpec  # noqa: E402


@pytest.fixture(scope="session")
def tiny_spec() -> DataSpec:
    return DataSpec(n_item_a=50, n_item_b=70, len_max=15)


@pytest.fixture(scope="session")
def tiny_cfg() -> Config:
    return Config(data="fk", d_latent=32, batch_size=32, batch_size_eval=64,
                  len_rec=5, n_neg_sample=20)


@pytest.fixture(scope="session")
def tiny_sequences(tiny_spec):
    from c2dsr_tpu.data import synthetic
    return synthetic.generate_sequences(tiny_spec, 300, seed=1)
