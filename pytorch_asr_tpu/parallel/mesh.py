"""Device mesh + sharding layout (SURVEY.md §2.3, §2.4).

The reference scales with ``nn.DataParallel``/DDP over NCCL; here parallelism is
a device mesh with axes ``('data', 'model')``:

  * utterance batches are sharded over ``data`` (length-bucketed shards, §2.3);
  * large encoders shard weights over ``model`` (tensor parallelism);
  * gradients all-reduce implicitly inside the sharded jit over ICI.

All code is mesh-shape-agnostic: the same program runs on 1 chip, an 8-device
virtual CPU mesh (tests), or a multi-host pod slice (``jax.distributed``).
"""

from __future__ import annotations

import contextlib

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_asr_tpu.configs.base import MeshConfig

# The mesh the current program runs under.  Pallas kernels cannot be
# partitioned by GSPMD (they lower to opaque Mosaic custom-calls), so on a
# multi-device mesh every kernel call site wraps itself in
# ``jax.shard_map`` over the 'data' axis -- and needs the concrete Mesh at
# trace time.  The Trainer/driver registers it here; flax modules read it.
_ACTIVE_MESH: Mesh | None = None


def set_active_mesh(mesh: Mesh | None) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None):
    prev = _ACTIVE_MESH
    set_active_mesh(mesh)
    try:
        yield mesh
    finally:
        set_active_mesh(prev)


def maybe_data_shard_map(fn, in_specs, out_specs):
    """Wrap ``fn`` in shard_map over the active mesh (identity on 1 device).

    ``in_specs``/``out_specs`` name the 'data' axis for batch-leading args and
    ``P()`` for replicated ones.  Weight gradients flow through the shard_map
    transpose (replicated inputs psum their cotangents), so custom-VJP Pallas
    kernels train under the mesh.  ``check_vma=False``: pallas_call outputs
    carry no varying-mesh-axes metadata; correctness is covered by the
    mesh-parity tests (tests/test_pallas_mesh.py).
    """
    mesh = active_mesh()
    if mesh is None or mesh.devices.size == 1:
        return fn
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def make_mesh(cfg: MeshConfig | None = None, devices=None,
              batch_size: int | None = None) -> Mesh:
    """Build the ('data', 'model') mesh.

    When ``batch_size`` is given, the data axis is capped at
    gcd(available, batch_size) so batches always divide evenly -- a smaller
    mesh over a device subset beats a crash (useful on the 8-device test CPU).
    """
    import math

    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model_axis)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model axis {model}")
    data = n // model if cfg.data_axis == -1 else cfg.data_axis
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} > {n} devices")
    if batch_size is not None:
        data = math.gcd(data, batch_size)
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Utterance batches shard along the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Host numpy batch -> device arrays sharded over the 'data' axis.

    Single process: a plain device_put.  Multi-host (jax.distributed): each
    host holds only ITS grain shard's batch, so the global array is assembled
    from per-process local data -- the global batch dim is
    process_count * local batch (per-host batch semantics, matching the
    reference's per-GPU batch size).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_batch_global(mesh: Mesh, batch: dict) -> dict:
    """GLOBAL host batch (identical on every process) -> 'data'-sharded arrays.

    The eval/decode drivers iterate the SAME eval dataset on every host (the
    shapes of bucketed batches must agree across processes at each collective
    step); each process contributes its contiguous row block, so every
    utterance enters the global computation exactly once.  Use
    ``fetch_local_rows`` on inputs AND outputs to recover this process's rows
    — the assembled global array may permute rows relative to the host batch,
    but input/output row alignment is preserved because both live on the same
    devices.  Single process: plain sharded device_put.
    """
    if jax.process_count() == 1:
        sh = batch_sharding(mesh)
        return {k: jax.device_put(v, sh) for k, v in batch.items()}
    P_ = jax.process_count()
    p = jax.process_index()
    B = next(iter(batch.values())).shape[0]
    if B % P_ != 0:
        raise ValueError(
            f"eval batch size {B} not divisible by process_count {P_}; "
            f"set data.batch_size to a multiple of the host count")
    lo, hi = p * B // P_, (p + 1) * B // P_
    sh = batch_sharding(mesh)
    return {k: jax.make_array_from_process_local_data(sh, np.asarray(v)[lo:hi])
            for k, v in batch.items()}


def fetch_local_rows(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in global row
    order (deduplicated across model-axis replicas).  Single process: the
    whole array.  Never touches non-addressable shards, so it is safe where
    ``np.asarray(global_arr)`` would raise on a multi-host mesh."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    by_start: dict[int, np.ndarray] = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    return np.concatenate([by_start[k] for k in sorted(by_start)], axis=0)


def shard_params(mesh: Mesh, params):
    """Replicate parameters across the mesh (model-axis sharding is opt-in
    per-module via logical partitioning; the default is replication)."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)
