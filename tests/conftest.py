"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(``retargetvid_tpu.parallel``) is exercised without TPU hardware.  These env
vars must be set before JAX initializes its backends, hence before any test
module imports jax.
"""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and its
# sitecustomize imports jax at interpreter startup, so env vars are too late;
# flip the config before the backend initializes instead.  Tests must run on
# the 8-virtual-device CPU platform (tiny ops through the tunnel are
# glacially slow and some linalg primitives hang there).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: repeat test sessions hit disk instead of
# recompiling the big fused programs (minutes saved per run).
from retargetvid_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.is_dir():
        pytest.skip("reference assets not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def annots(reference_dir, tmp_path_factory):
    """All 6 annotators' ground truth, extracted to a writable tmp dir."""
    from retargetvid_tpu.eval.annotations import load_annotations
    extract_dir = tmp_path_factory.mktemp("annots")
    return load_annotations(reference_dir / "annotations",
                            extract_to=extract_dir)
