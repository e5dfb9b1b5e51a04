"""Beam-sharded CTC prefix beam search -- decode-state exchange over ICI.

SURVEY.md §2.3 'Decode-state parallelism' / BASELINE north star: "beam
hypotheses/LM-fusion state are exchanged via ICI collectives during decoding".

Layout (inside ``shard_map`` over the ('data', 'model') mesh):
  * utterances shard over 'data' (independent rows, no collectives);
  * each utterance's K beams shard over 'model': every device expands only its
    K/P beams -- candidate generation and the dense LM gathers are the
    parallel work;
  * per step one ``all_gather`` over 'model' exchanges the candidate
    summaries (scores, hashes, LM state, parent ids -- NOT token buffers);
    the merge + global top-K then runs replicated (identical on all shards),
    and each device keeps its K/P slice of the new beams;
  * token buffers stay replicated and are updated identically everywhere,
    so no cross-device parent-state fetch is ever needed.

Exactness: bit-identical to decoding.prefix_beam.prefix_beam_search (tested
on the 8-virtual-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_asr_tpu.decoding.prefix_beam import (
    BeamState,
    _apply_tokens,
    _build_candidates,
    _init_state,
    _lse,
    _merge_topk,
)


def _local_slice(state: BeamState, p: int, kl: int) -> BeamState:
    sl = lambda x: jax.lax.dynamic_slice_in_dim(x, p * kl, kl, axis=1)  # noqa: E731
    # tokens stay replicated (never read during candidate expansion).
    return BeamState(tokens=state.tokens, length=sl(state.length),
                     pb=sl(state.pb), pnb=sl(state.pnb), lm_s=sl(state.lm_s),
                     hash=sl(state.hash), ctx=sl(state.ctx), last=sl(state.last))


def prefix_beam_search_sharded(
    logits: jax.Array,           # (B, T, V) -- B sharded over 'data'
    logit_len: jax.Array,        # (B,)
    mesh: Mesh,
    beam_size: int = 16,
    blank: int = 0,
    lm_table: jax.Array | None = None,
    lm_alpha: float = 0.0,
    lm_beta: float = 0.0,
    max_len: int = 256,
):
    """Beam-sharded decode.  beam_size must divide the 'model' axis size."""
    n_model = mesh.shape["model"]
    if beam_size % n_model != 0:
        raise ValueError(f"beam_size {beam_size} not divisible by model axis {n_model}")
    K, L = beam_size, max_len
    kl = K // n_model

    def local_fn(logits, logit_len, lm_tab):
        B, T, V = logits.shape
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        p = jax.lax.axis_index("model")
        state = _init_state(B, K, L)     # replicated-view full state

        def scan_fn(state, inp):
            t, logp_t = inp
            local = _local_slice(state, p, kl)
            cand_local = _build_candidates(
                local, logp_t, blank=blank, vocab=V, lm_table=lm_tab,
                lm_alpha=lm_alpha, lm_beta=lm_beta, K=kl, L=L,
                parent_offset=p * kl)
            # ICI exchange: candidate summaries from every beam shard.
            cand = jax.tree.map(
                lambda x: jax.lax.all_gather(
                    x, "model", axis=1, tiled=True), cand_local)
            top_score, f = _merge_topk(cand, K)
            new_tokens, new_len = _apply_tokens(
                state.tokens, state.length, f["parent"], f["append"], L)
            new_state = BeamState(
                tokens=new_tokens, length=new_len, pb=f["pb"], pnb=f["pnb"],
                lm_s=f["lm"], hash=f["hash"], ctx=f["ctx"], last=f["last"])
            keep = (t < logit_len)[:, None]
            merged = jax.tree.map(
                lambda new, old: jnp.where(
                    keep.reshape((B,) + (1,) * (new.ndim - 1)), new, old),
                new_state, state)
            return merged, None

        state, _ = jax.lax.scan(
            scan_fn, state, (jnp.arange(T), jnp.swapaxes(logp, 0, 1)))
        final = _lse(state.pb, state.pnb) + state.lm_s
        best = jnp.argmax(final, axis=1)
        tokens = jnp.take_along_axis(state.tokens, best[:, None, None], axis=1)[:, 0]
        lengths = jnp.take_along_axis(state.length, best[:, None], axis=1)[:, 0]
        scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
        return tokens, lengths, scores

    lm_spec = P() if lm_table is not None else None
    in_specs = (P("data"), P("data"), lm_spec)
    out_specs = (P("data"), P("data"), P("data"))
    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    if lm_table is None:
        fn2 = lambda lg, ll: fn(lg, ll, None)  # noqa: E731
        return jax.jit(fn2)(logits, logit_len)
    return jax.jit(fn)(logits, logit_len, lm_table)
