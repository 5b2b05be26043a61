"""Test configuration: run everything on CPU with 8 virtual devices.

This is the standard way to test TPU pod-slice code without TPU
hardware (SURVEY §4): Pallas kernels run in interpreter mode and the
multi-chip layer runs on a simulated 8-device mesh.
"""

import os

# The axon sitecustomize registers a tunneled TPU backend whenever
# PALLAS_AXON_POOL_IPS is set and forces jax_platforms; drop it so the
# test suite genuinely runs on the virtual-device CPU backend.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _interpret_mode():
    from spmv_tpu import config

    config.set_interpret(True)
    yield
