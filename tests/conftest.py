import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware.  The platform is forced through
# jax.config BEFORE any backend initialization — robust regardless of the
# process's JAX_PLATFORMS/PYTHONPATH environment (the axon TPU plugin
# registers via a sitecustomize dir on PYTHONPATH; see CLAUDE.md).
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# RUN_TPU=1 leaves the platform alone so tests/test_tpu_device.py can run
# the real chip (requires the axon sitecustomize dir on PYTHONPATH, see
# CLAUDE.md); everything else stays CPU-forced.
if os.environ.get("RUN_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the coupled-pipeline plugins (TSEQ, ERBTilt)
# have multi-minute first compiles; cache them across test runs.  The dir
# is keyed by a host fingerprint: XLA:CPU AOT results compiled for another
# machine's feature set SIGILL/segfault when loaded (observed when this
# container migrates hosts between rounds).


from zorak_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference checkout not available")
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def reference_plugins(reference_root):
    return reference_root / "plugins"
