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
    rnn_lm=None,                 # CharRNNLM module for neural fusion
    rnn_lm_params=None,
    sos_id: int = 29,
    hash_lm=None,                # lm_hashed.HashedNgramLM for large vocabs
    fused_merge: bool | None = None,
):
    """Beam-sharded decode.  beam_size must divide the 'model' axis size.

    Neural-LM fusion shards the LM STEP: each device advances only its K/P
    beams' (h, c) states, and one ``all_gather`` over 'model' reassembles the
    replicated LM carry -- this is the "LM-fusion state exchanged via ICI
    collectives" of the BASELINE north star.

    ``fused_merge`` (round 5): run the replicated per-frame merge + top-K --
    the hot loop of this search (~150 of ~164 us/step on v5e) -- as ONE
    Pallas program (ops/beam_pallas.py::merge_topk_fused) instead of the
    XLA op soup.  The per-frame kernel structure was measured CHEAP (36 vs
    the monolithic kernel's 32 us/frame single-device), so beam sharding no
    longer forfeits the fused-kernel win: the full sharded-search scan
    measured 46.1 vs 106.8 us/step with the XLA merge (2.3x, v5e B=16 K=16
    V=32 T=1000, scripts/bench_beam_compile.py merge=1).  None = auto (on
    TPU).
    """
    n_model = mesh.shape["model"]
    if n_model == 1:
        # No beam axis to shard over: delegate to the single-device search
        # under the mesh, where the round-4/5 fused lane kernels dispatch
        # per data shard (shard_beams=true no longer forfeits the fused win
        # on a pure data mesh -- VERDICT r4 item 3).
        from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
        from pytorch_asr_tpu.parallel.mesh import use_mesh

        with use_mesh(mesh):
            return prefix_beam_search(
                logits, logit_len, beam_size=beam_size, blank=blank,
                lm_table=lm_table, lm_alpha=lm_alpha, lm_beta=lm_beta,
                max_len=max_len, rnn_lm=rnn_lm,
                rnn_lm_params=rnn_lm_params, sos_id=sos_id, hash_lm=hash_lm)
    if beam_size % n_model != 0:
        raise ValueError(f"beam_size {beam_size} not divisible by model axis {n_model}")
    K, L = beam_size, max_len
    kl = K // n_model
    use_rnn = rnn_lm is not None
    if fused_merge is None:
        fused_merge = jax.default_backend() == "tpu"

    def local_fn(logits, logit_len, lm_tab, lm_params, hash_tab):
        B, T, V = logits.shape
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        p = jax.lax.axis_index("model")
        ctx_width = hash_lm.order - 1 if hash_lm is not None else 0
        state = _init_state(B, K, L, ctx_width)  # replicated-view full state
        if use_rnn:
            from pytorch_asr_tpu.models.lm_rnn import LMState, lm_step_logp

            st0 = rnn_lm.apply({"params": lm_params}, B * K,
                               method=rnn_lm.init_state)
            logp0, st1 = lm_step_logp(
                rnn_lm, lm_params, jnp.full((B * K,), sos_id, jnp.int32), st0)
            Lc, _, Hl = st1.h.shape
            lm_carry = (st1.h.reshape(Lc, B, K, Hl),
                        st1.c.reshape(Lc, B, K, Hl),
                        logp0.reshape(B, K, V))
        else:
            lm_carry = None

        def scan_fn(carry, inp):
            state, lm_carry = carry
            t, logp_t = inp
            local = _local_slice(state, p, kl)
            if use_rnn:
                lm_rows = jax.lax.dynamic_slice_in_dim(
                    lm_carry[2], p * kl, kl, axis=1)
            elif hash_tab is not None:
                # hashed-LM rows for THIS shard's beams only: the (B, kl, V)
                # table probes are the parallel work; candidates then gather.
                from pytorch_asr_tpu.decoding.lm_hashed import (
                    hashed_lm_logp_rows)

                lm_rows = hashed_lm_logp_rows(hash_tab, local.ctx)
            else:
                lm_rows = None
            stay_l, ext_l = _build_candidates(
                local, logp_t, blank=blank, vocab=V, lm_table=lm_tab,
                lm_alpha=lm_alpha, lm_beta=lm_beta, K=kl, L=L,
                parent_offset=p * kl, lm_rows=lm_rows,
                ctx_window=hash_tab is not None)
            # ICI exchange: candidate summaries from every beam shard --
            # stays to (B, K), extensions to (B, K, V-1).
            gather = lambda x: jax.lax.all_gather(  # noqa: E731
                x, "model", axis=1, tiled=True)
            stay = jax.tree.map(gather, stay_l)
            ext = jax.tree.map(gather, ext_l)
            if fused_merge:
                from pytorch_asr_tpu.ops.beam_pallas import merge_topk_fused

                top_score, f = merge_topk_fused(stay, ext, K)
            else:
                top_score, f = _merge_topk(stay, ext, K)
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

            new_lm = None
            if use_rnn:
                lm_h, lm_c, lm_logp = lm_carry
                # this shard advances only ITS kl new beams
                par_l = jax.lax.dynamic_slice_in_dim(f["parent"], p * kl, kl, 1)
                app_l = jax.lax.dynamic_slice_in_dim(f["append"], p * kl, kl, 1)
                idx4 = jnp.broadcast_to(par_l[None, :, :, None],
                                        (Lc, B, kl, Hl))
                gh = jnp.take_along_axis(lm_h, idx4, axis=2)
                gc = jnp.take_along_axis(lm_c, idx4, axis=2)
                glogp = jnp.take_along_axis(
                    lm_logp, jnp.broadcast_to(par_l[..., None], (B, kl, V)),
                    axis=1)
                y = jnp.maximum(app_l, 0).reshape(B * kl)
                s_logp, s_st = lm_step_logp(
                    rnn_lm, lm_params, y,
                    LMState(gh.reshape(Lc, B * kl, Hl),
                            gc.reshape(Lc, B * kl, Hl)))
                ext = app_l >= 0
                nh = jnp.where(ext[None, :, :, None],
                               s_st.h.reshape(Lc, B, kl, Hl), gh)
                nc = jnp.where(ext[None, :, :, None],
                               s_st.c.reshape(Lc, B, kl, Hl), gc)
                nlogp = jnp.where(ext[..., None],
                                  s_logp.reshape(B, kl, V), glogp)
                # ICI exchange: reassemble the replicated LM carry.
                nh = jax.lax.all_gather(nh, "model", axis=2, tiled=True)
                nc = jax.lax.all_gather(nc, "model", axis=2, tiled=True)
                nlogp = jax.lax.all_gather(nlogp, "model", axis=1, tiled=True)
                kb = keep.reshape(1, B, 1, 1)
                new_lm = (jnp.where(kb, nh, lm_h), jnp.where(kb, nc, lm_c),
                          jnp.where(keep[..., None], nlogp, lm_logp))
            return (merged, new_lm), None

        (state, _), _ = jax.lax.scan(
            scan_fn, (state, lm_carry),
            (jnp.arange(T), jnp.swapaxes(logp, 0, 1)))
        final = _lse(state.pb, state.pnb) + state.lm_s
        best = jnp.argmax(final, axis=1)
        tokens = jnp.take_along_axis(state.tokens, best[:, None, None], axis=1)[:, 0]
        lengths = jnp.take_along_axis(state.length, best[:, None], axis=1)[:, 0]
        scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
        return tokens, lengths, scores

    lm_spec = P() if lm_table is not None else None
    params_spec = jax.tree.map(lambda _: P(), rnn_lm_params) if use_rnn else None
    hash_spec = (jax.tree.map(lambda _: P(), hash_lm)
                 if hash_lm is not None else None)
    in_specs = (P("data"), P("data"), lm_spec, params_spec, hash_spec)
    out_specs = (P("data"), P("data"), P("data"))
    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    if use_rnn:
        fn2 = lambda lg, ll, pp: fn(lg, ll, None, pp, None)  # noqa: E731
        return jax.jit(fn2)(logits, logit_len, rnn_lm_params)
    if hash_lm is not None:
        fn2 = lambda lg, ll, ht: fn(lg, ll, None, None, ht)  # noqa: E731
        return jax.jit(fn2)(logits, logit_len, hash_lm)
    if lm_table is not None:
        fn2 = lambda lg, ll, tab: fn(lg, ll, tab, None, None)  # noqa: E731
        return jax.jit(fn2)(logits, logit_len, lm_table)
    fn2 = lambda lg, ll: fn(lg, ll, None, None, None)  # noqa: E731
    return jax.jit(fn2)(logits, logit_len)
