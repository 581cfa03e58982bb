import os

# Tests run on a virtual 8-device CPU mesh: deterministic, no TPU required.
# The real-chip path is exercised by bench.py / __graft_entry__.py instead.
# NOTE: the host env pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize imports jax at interpreter start, so the env var is already
# captured — jax.config.update is the only effective override here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference/src/xmipp"


@pytest.fixture(scope="session")
def reference_resources():
    path = os.path.join(REFERENCE, "resources", "test")
    if not os.path.isdir(path):
        pytest.skip("reference fixtures not available")
    return path
