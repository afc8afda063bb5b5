"""Test fixtures: force CPU JAX with a virtual 8-device mesh.

The sandbox pins JAX_PLATFORMS=axon (remote TPU tunnel); tests run on CPU with
8 virtual devices so sharding paths are exercised without hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from maestro_tpu.conf import (
    DatasetsConfig,
    MaskConfig,
    ModelConfig,
    OptFinetuneConfig,
)


@pytest.fixture(scope="session")
def datasets_treesat() -> DatasetsConfig:
    return DatasetsConfig(name_dataset="treesatai_ts")


@pytest.fixture(scope="session")
def datasets_pastis() -> DatasetsConfig:
    return DatasetsConfig(name_dataset="pastis_hd")


@pytest.fixture(scope="session")
def datasets_flair() -> DatasetsConfig:
    return DatasetsConfig(name_dataset="flair")


@pytest.fixture(scope="session")
def datasets_s2naip() -> DatasetsConfig:
    return DatasetsConfig(name_dataset="s2_naip")


@pytest.fixture()
def mask_cfg() -> MaskConfig:
    return MaskConfig()


@pytest.fixture()
def model_cfg() -> ModelConfig:
    return ModelConfig(model_size="tiny")


@pytest.fixture()
def opt_finetune() -> OptFinetuneConfig:
    return OptFinetuneConfig()


# Persistent XLA compilation cache: the suite is dominated by CPU compiles of
# jitted train steps (micro-arch graphs still take 10-100 s each to compile);
# caching them across runs cuts repeat suite time by an order of magnitude.
jax.config.update("jax_compilation_cache_dir", "/tmp/maestro_tpu_jax_cache")
# persist even sub-second compiles: the e2e/runtime tests dispatch hundreds of
# small jitted graphs (eval steps, metric updates) whose ~40 ms compiles add
# up to ~half a minute per run when excluded from the cache
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
