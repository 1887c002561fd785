"""Test harness: force an 8-virtual-device CPU platform so sharding and
collective paths are exercised without TPU hardware (mirrors how the driver
validates `dryrun_multichip`).

Note: this image's sitecustomize registers an `axon` TPU PJRT backend at
interpreter start and pins JAX_PLATFORMS=axon, so env vars alone are not
enough — we must override via jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clean_registry_state():
    """Keep registry `state` isolated between tests (mappings persist, the
    hierarchical state store does not)."""
    from mmf_tpu.common.registry import registry

    saved = dict(registry.mapping["state"])
    yield
    registry.mapping["state"].clear()
    registry.mapping["state"].update(saved)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (CLI subprocesses)"
    )
