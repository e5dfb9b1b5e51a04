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
