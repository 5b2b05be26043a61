"""Test configuration: run everything on CPU with 8 virtual devices.

This is the standard way to test TPU pod-slice code without TPU
hardware (SURVEY §4): Pallas kernels run in interpreter mode and the
multi-chip layer runs on a simulated 8-device mesh.
"""

import os

# The axon sitecustomize registers a tunneled TPU backend at
# interpreter start and forces jax_platforms IN-PROCESS, so setting
# JAX_PLATFORMS here is not enough — jax.config must be updated after
# import (verified: env alone leaves jax.default_backend() == 'tpu'
# and every test op becomes a tunnel round-trip that can deadlock).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _interpret_mode():
    from spmv_tpu import config

    config.set_interpret(True)
    yield
