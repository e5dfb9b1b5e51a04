"""Multi-host bring-up (SURVEY.md §2.4, §3.3).

The reference initializes torch.distributed NCCL process groups per rank;
here ``jax.distributed.initialize`` joins the pod slice, the global mesh spans
all hosts' devices, and each host reads its own shard of the corpus (grain
``num_shards=process_count, shard_index=process_index``).  Gradient
all-reduce is implicit in the sharded jit over ICI/DCN.
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> dict:
    """Join a multi-host run.  No-ops on a single host with no coordinator.

    Env fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID
    (and cloud-TPU metadata autodetection inside jax.distributed).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    return topology()


def topology() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_primary() -> bool:
    """True on the host that writes checkpoints/metrics (reference: rank 0)."""
    return jax.process_index() == 0


def host_shard() -> tuple[int, int]:
    """(num_shards, shard_index) for per-host data sharding."""
    return jax.process_count(), jax.process_index()


def sum_across_processes(values) -> "np.ndarray":
    """Element-wise sum of a small numeric vector over all processes.

    The cross-host reduction for eval/decode metrics (WER error/token counts,
    audio seconds): rates don't sum across hosts, counts do.  Single process:
    identity.  Multi-process: ``multihost_utils.process_allgather`` (a
    collective — every process must call this the same number of times).
    """
    import numpy as np

    arr = np.atleast_1d(np.asarray(values))
    # jax (x64 disabled) transports int32/float32; counts MUST go as ints so
    # the reduction is exact — float32 rounding of large counts would make
    # multi-host WER differ from single-host in the last ulps.
    arr = arr.astype(np.int32 if np.issubdtype(arr.dtype, np.integer)
                     else np.float32)
    if jax.process_count() == 1:
        return np.sum(arr[None], axis=0, dtype=np.int64
                      if arr.dtype == np.int32 else np.float64)
    from jax.experimental import multihost_utils

    return np.sum(np.asarray(multihost_utils.process_allgather(arr)), axis=0,
                  dtype=np.int64 if arr.dtype == np.int32 else np.float64)
