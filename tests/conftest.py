"""Test harness config: force JAX onto a virtual 8-device CPU mesh BEFORE any
jax import, so sharding/multi-chip paths are exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The image's sitecustomize registers the axon TPU tunnel and pins
# jax_platforms to it; tests must run on the virtual 8-device CPU mesh
# (fast compiles + multi-chip sharding coverage), so re-pin here before
# any backend is used.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big sharded/streaming kernels take
# minutes to compile on this 1-vCPU host; cache them across suite runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np
import pytest

DATA = "/root/reference/data"
SE_K31 = f"{DATA}/unitigs_stitched/salmonella_enterica_k31_ust.fa.gz"
SE_K47 = f"{DATA}/unitigs_stitched/se.ust.k47.fa.gz"
SE_K63 = f"{DATA}/unitigs_stitched/se.ust.k63.fa.gz"
WEIGHTED_K31 = f"{DATA}/unitigs_stitched/with_weights/salmonella_enterica.ust.k31.fa.gz"
QUERIES_FASTQ = f"{DATA}/queries/SRR5833294.10K.fastq.gz"
QUERIES_FASTA_MULTI = f"{DATA}/queries/salmonella_enterica.fasta.gz"


@pytest.fixture(scope="session")
def dict_k31():
    from sshash_tpu import BuildConfig, Dictionary

    return Dictionary.build(SE_K31, BuildConfig(k=31, m=13, verbose=False))


@pytest.fixture(scope="session")
def dict_k31_canonical():
    from sshash_tpu import BuildConfig, Dictionary

    return Dictionary.build(SE_K31, BuildConfig(k=31, m=13, canonical=True, verbose=False))


@pytest.fixture(scope="session")
def dict_weighted():
    from sshash_tpu import BuildConfig, Dictionary

    return Dictionary.build(WEIGHTED_K31, BuildConfig(k=31, m=13, weighted=True, verbose=False))


@pytest.fixture(scope="session")
def parsed_k31():
    from sshash_tpu.builder.parse import parse_input

    return parse_input(SE_K31, 31)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)
