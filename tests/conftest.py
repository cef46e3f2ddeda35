import os

# Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths
# are exercised without TPU hardware.  NOTE: if the axon TPU tunnel is
# configured (PALLAS_AXON_POOL_IPS set), its PJRT plugin registration slows
# every XLA compile even under JAX_PLATFORMS=cpu; `make test` strips that
# env for a much faster run.  The suite is correct either way.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(3)
