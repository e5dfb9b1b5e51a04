"""Parameter partition rules for tensor (model) parallelism (SURVEY.md §2.3).

The encoder is model-sharded over the 'model' mesh axis when it exceeds one
chip (BASELINE north star).  Rules are explicit regexes over the flax
parameter path (see ``RULES``), not substring guesses; ``describe_shardings``
exposes the resolved layout so tests pin exactly which parameters shard.

Layout choices (GSPMD inserts the collectives for all of them):

  * encoder LSTM ``wih``/``whh`` (D, 4H) and ``bias`` (4H,): shard the fused
    gate dim over 'model'.  The gate layout is contiguous (i|f|g|o), so the
    cell nonlinearity mixes shards and GSPMD all-gathers gate slices inside
    the scan -- correct, and the only layout expressible on the (D, 4H)
    storage the Pallas kernel / torch importer share.  (The comm-optimal
    layout interleaves H/m-slices of all four gates so only h needs gathering;
    it requires (D, 4, H) storage and is noted as future work.)
  * TCN block ``w_conv`` (K, C, 2C): shard the GLU output channels (column
    parallel); ``w_point`` (C, C): shard the input dim (row parallel, psum on
    output) -- the Megatron col->row pair around the GLU.
  * conv subsampler, LAS decoder, CTC head (V=31), norms, embeddings:
    replicated.  The LAS decoder is a small sequential cell where per-step
    collectives cost more than the memory they save; the CTC head is tiny.

Optimizer state: optax state trees embed the parameter path in their own
paths (e.g. ``[1]/[0]/mu/encoder/lstm0_fwd/wih``), so the SAME rules place
Adam moments and MultiSteps accumulators next to their parameters.

Dims that do not divide the model-axis size fall back to replication (never
an error): mesh-shape-agnostic code is the §2.4 contract.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, ndim, spec). First match wins; no match -> replicate.
# Split EXPLICITLY by whether the rule shards a recurrent (LSTM) weight:
# direction-sharded TP excludes exactly the recurrent set, and the split is
# structural rather than a substring filter over the regex source (a rule
# merely mentioning 'lstm' can't sneak in or out — ADVICE r2).
_RECURRENT_RULES: tuple[tuple[str, int, P], ...] = (
    # BiLSTM encoder: fused-gate dim over 'model'.
    (r"encoder/.*lstm\d+_(fwd|bwd)/(wih|whh)$", 2, P(None, "model")),
    (r"encoder/.*lstm\d+_(fwd|bwd)/bias$", 1, P("model")),
)
_NON_RECURRENT_RULES: tuple[tuple[str, int, P], ...] = (
    # TCN blocks: column-parallel GLU conv, row-parallel pointwise.
    (r"encoder/.*block\d+/w_conv$", 3, P(None, None, "model")),
    (r"encoder/.*block\d+/b_conv$", 1, P("model")),
    (r"encoder/.*block\d+/w_point$", 2, P("model", None)),
)
RULES: tuple[tuple[str, int, P], ...] = (
    _RECURRENT_RULES + _NON_RECURRENT_RULES)

# Direction-sharded TP (models/encoder_bilstm.py::_bilstm_tp_directions):
# each model shard runs one direction's FUSED Pallas kernel, so LSTM weight
# tensors stay whole (replicated at rest; the shard_map boundary slices the
# stacked (2, D, 4H) per-direction — a local, free reshard).  Only the
# non-recurrent rules remain.
DIRECTION_TP_RULES: tuple[tuple[str, int, P], ...] = _NON_RECURRENT_RULES


def _compiled(rules):
    return tuple((re.compile(rx), nd, spec) for rx, nd, spec in rules)


_COMPILED = _compiled(RULES)


def _path_str(path: tuple) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def spec_for(path_str: str, ndim: int, rules=None) -> P:
    """PartitionSpec for one parameter (or optimizer-state mirror) path."""
    compiled = _COMPILED if rules is None else _compiled(rules)
    for rx, nd, spec in compiled:
        if nd == ndim and rx.search(path_str):
            return spec
    return P()


def _sharding(path, value, mesh: Mesh, rules=None) -> NamedSharding:
    spec = spec_for(_path_str(path), getattr(value, "ndim", 0), rules)
    # Only shard dims that divide evenly; fall back to replication.
    for dim, axis in enumerate(spec):
        if axis is not None and value.shape[dim] % mesh.shape[axis] != 0:
            return NamedSharding(mesh, P())
    return NamedSharding(mesh, spec)


def param_shardings(tree, mesh: Mesh, rules=None):
    """Pytree of NamedShardings implementing the TP layout above.

    Works on the parameter tree AND on optimizer-state trees (whose leaf
    paths embed the parameter path).
    """
    return jax.tree_util.tree_map_with_path(
        lambda p, v: _sharding(p, v, mesh, rules), tree)


def shard_params_tp(tree, mesh: Mesh, rules=None):
    """Place parameters (or optimizer state) per the TP layout."""
    return jax.tree.map(jax.device_put, tree, param_shardings(tree, mesh, rules))


def describe_shardings(tree, mesh: Mesh, rules=None) -> dict[str, tuple]:
    """{param path: partition spec tuple} for every NON-replicated leaf."""
    out: dict[str, tuple] = {}

    def visit(path, value):
        sh = _sharding(path, value, mesh, rules)
        if tuple(sh.spec) and any(a is not None for a in tuple(sh.spec)):
            out[_path_str(path)] = tuple(sh.spec)
        return value

    jax.tree_util.tree_map_with_path(visit, tree)
    return out
