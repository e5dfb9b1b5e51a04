"""Parameter partition rules for tensor (model) parallelism (SURVEY.md §2.3).

The encoder is model-sharded over the 'model' mesh axis when it exceeds one
chip (BASELINE north star).  Rules are by parameter shape/name:

  * LSTM input/hidden projections (D, 4H) and biases (4H,): shard the gate dim
    over 'model' -- each shard computes its slice of the fused gate matmul, and
    GSPMD inserts the collectives.
  * CTC head kernel (D, V): V is tiny (31) -- replicate.
  * conv kernels, norms, embeddings: replicate.

Everything else (optimizer state mirrors params via tree structure).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, value) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if value.ndim == 2 and ("wih" in joined or "whh" in joined or "lstm" in joined):
        return P(None, "model")          # (D, 4H): shard fused gates
    if value.ndim == 1 and ("bias" in joined and "lstm" in joined):
        return P("model")                # (4H,)
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings implementing the TP layout above."""

    def to_sharding(path, value):
        spec = _spec_for(path, value)
        # Only shard dims that divide evenly; fall back to replication.
        for dim, axis in enumerate(spec):
            if axis is not None:
                axis_size = mesh.shape[axis]
                if value.shape[dim] % axis_size != 0:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params_tp(params, mesh: Mesh):
    """Place parameters according to the TP layout."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
