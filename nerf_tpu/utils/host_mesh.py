"""Guards for multi-device programs on a virtual CPU mesh.

XLA's in-process CPU collectives run each mesh "device" as a task on the
client's fixed-size Eigen thread pool, and a rendezvous participant that is
more than 40 s late hard-aborts the whole process (rendezvous.cc terminate
timeout). On a small host that happens from thread starvation alone, and
with several multi-device programs in flight the participant tasks can
interleave into a permanent cross-program deadlock. Every place that sets
up a virtual CPU mesh (tests/conftest.py, tests/test_multiprocess.py
worker envs, __graft_entry__.dryrun_multichip) raises the timeouts via this
one helper so the values and the idempotence guard cannot drift apart.

No reference analog (the reference is single-process, single-device —
run_nerf.py:22). Import-light on purpose: used before jax initializes.
"""

COLLECTIVE_TIMEOUT_FLAGS = (
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    " --xla_cpu_collective_timeout_seconds=1200"
)


def with_collective_timeout_flags(flags: str) -> str:
    """Append the raised CPU-collective rendezvous timeouts to an XLA_FLAGS
    string (idempotent): starved participant threads must mean "slow",
    never a process abort."""
    if "collective_call_terminate_timeout" in flags:
        return flags
    return (flags + COLLECTIVE_TIMEOUT_FLAGS).strip()
