"""Test configuration.

Forces an 8-device virtual CPU mesh (SURVEY.md §4: multi-host tests without a
pod) — must happen before jax is imported anywhere.

When the reference implementation is mounted at /root/reference, parity tests
import it (torch-cpu) and compare against it directly; otherwise those tests
skip and the numpy-oracle tests still run standalone.
"""

import os
import sys

# Force CPU regardless of any preset platform (e.g. JAX_PLATFORMS=axon):
# unit tests must run identically with or without TPU hardware attached.
# The site may import jax before conftest runs (sitecustomize), so setting the
# env var alone is not enough — update the live jax config too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

_REFERENCE = "/root/reference"
if os.path.isdir(_REFERENCE) and _REFERENCE not in sys.path:
    sys.path.insert(0, _REFERENCE)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_helpers():
    """The reference run_nerf_helpers module (torch-cpu), or skip."""
    return pytest.importorskip("run_nerf_helpers")


@pytest.fixture(scope="session")
def ref_run_nerf():
    """The reference run_nerf module (torch-cpu), or skip."""
    return pytest.importorskip("run_nerf")
