import os

# Force CPU with 8 virtual devices BEFORE jax import: tests exercise the
# multi-chip sharding paths the same way the driver's dryrun does.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import sys  # noqa: E402

if "jax" in sys.modules:
    # the axon sitecustomize imports jax at interpreter startup with
    # JAX_PLATFORMS=axon in the env — the env write above is then too late
    # (config captured the env default), and tests would silently compile
    # over the TPU tunnel. Steer the already-imported config back to CPU.
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # older jax: XLA_FLAGS above still applies at backend init

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
