"""Multi-host (pod-slice) support.

The reference is single-process/single-device; this is the TPU-native scaling
layer from SURVEY.md §5: ``jax.distributed`` process group + per-host data
feed. The mesh itself comes from parallel/mesh.py — with multiple hosts,
``jax.devices()`` spans the slice and the same NamedSharding code shards rays
globally over ICI/DCN.

Per-host data policy (policy (a), use_batching): every host holds the full
(small, <1 GB) ray buffer but samples only its own global-batch shard —
``host_batch = N_rand // n_hosts`` rays per host per step, placed with
``jax.make_array_from_process_local_data`` so XLA sees one global [N_rand]
array sharded over 'data'. Results (loss/psnr) are identical to single-host
because gradients are psum-reduced over the full batch either way.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

# env markers that indicate a multi-process launch where the jax cluster
# layer can auto-detect everything (explicit coordinator address)
_CLUSTER_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def _multihost_env() -> bool:
    """True only when the environment names MORE THAN ONE worker.

    A bare coordinator address is an explicit multi-process signal; for TPU
    pod metadata require a comma-separated host list — single-worker setups
    (including tunneled single-chip grants) set TPU_WORKER_HOSTNAMES too, and
    auto-initializing there crashes any run that touched the backend first.
    """
    if any(v in os.environ for v in _CLUSTER_ENV_VARS):
        return True
    return "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the jax.distributed process group (no-op single-process).

    Explicit args win; otherwise, when a cluster environment is detected
    (TPU pod metadata or a coordinator address in the env), auto-detect.
    Plain single-process runs skip initialization entirely.
    """
    if (num_processes is not None and num_processes > 1) or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif _multihost_env():
        jax.distributed.initialize()


def host_shard_slice(n_total: int) -> slice:
    """This host's contiguous shard of a length-n_total global batch axis."""
    n = jax.process_count()
    i = jax.process_index()
    if n_total % n != 0:
        # silently dropping the remainder would shrink the global batch and
        # skip rays without any diagnostic — fail loudly instead
        raise ValueError(
            f"global batch axis ({n_total}) must divide evenly over "
            f"{n} processes"
        )
    per = n_total // n
    return slice(i * per, (i + 1) * per)


def global_batch_from_host_shards(mesh, host_arrays, spec=None):
    """Assemble per-host numpy shards into global arrays sharded over 'data'.

    host_arrays: tuple of numpy arrays, each this host's [N_rand/n_hosts, ...]
    shard. Returns jax Arrays with global shape [N_rand, ...]. ``spec``
    overrides the default P('data') partitioning (e.g. P(None, 'data') for
    [k, N_rand, ...] fused-chunk operands whose batch axis is second)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data") if spec is None else spec)
    out = tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a)) for a in host_arrays
    )
    return out if len(out) > 1 else out[0]
