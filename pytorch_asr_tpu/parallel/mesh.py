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

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_asr_tpu.configs.base import MeshConfig


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
    """Host numpy batch -> device arrays sharded over the 'data' axis."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_params(mesh: Mesh, params):
    """Replicate parameters across the mesh (model-axis sharding is opt-in
    per-module via logical partitioning; the default is replication)."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)
