"""Mesh/sharding runtime (SURVEY.md layer T0)."""

from pytorch_asr_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated, shard_batch, shard_params)

__all__ = ["batch_sharding", "make_mesh", "replicated", "shard_batch", "shard_params"]
