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
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nerf_tpu.utils.host_mesh import with_collective_timeout_flags  # noqa: E402

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Raised CPU-collective rendezvous timeouts: without them XLA ABORTS the
# whole process when a participant is >40 s late — observed mid-suite on a
# 2-core host as "Fatal Python error: Aborted" in an unrelated test (see
# nerf_tpu/utils/host_mesh.py).
os.environ["XLA_FLAGS"] = with_collective_timeout_flags(_flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Synchronous dispatch on the virtual CPU mesh: with async dispatch, two
# multi-device programs can be in flight at once, and their collective
# participant tasks can interleave on the client's fixed-size Eigen pool so
# that each program waits for a participant queued behind the other's blocked
# ones — a permanent cross-program deadlock (observed mid-suite on a 2-core
# host as 7-of-8 rendezvous arrivals, 0% CPU). One program in flight at a
# time cannot exhaust the pool. CPU-only flag; the TPU path is unaffected.
jax.config.update("jax_cpu_enable_async_dispatch", False)

_REFERENCE = "/root/reference"
if os.path.isdir(_REFERENCE) and _REFERENCE not in sys.path:
    sys.path.insert(0, _REFERENCE)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _drain_device_queue():
    """Block on all live arrays after each test: no test may leave in-flight
    multi-device programs for the next one (part of the same deadlock class
    as above — a leftover parallel program's collective participants share
    the fixed Eigen pool with the next test's)."""
    yield
    for a in jax.live_arrays():
        try:
            a.block_until_ready()
        except Exception:
            continue  # deleted/donated buffers are fine; drain the REST


@pytest.fixture(scope="session")
def ref_helpers():
    """The reference run_nerf_helpers module (torch-cpu), or skip."""
    return pytest.importorskip("run_nerf_helpers")


@pytest.fixture(scope="session")
def ref_run_nerf():
    """The reference run_nerf module (torch-cpu), or skip."""
    return pytest.importorskip("run_nerf")
