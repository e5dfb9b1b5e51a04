"""Batched attention (LAS) beam search + joint CTC/attention decoding.

Replaces the reference's per-utterance host Python beam loop with vectorized
hypothesis tensors over (batch B, beam K) -- the approach of "Vectorization of
hypotheses and speech for faster beam search" (PAPERS.md) -- decoded
synchronously under one ``lax.scan``:

  * decoder states flattened to a (B*K) batch for the single LAS step;
  * scores (B, K, V) = beam score + (1-lam)*logp_att [+ lam*delta_ctc]
    [+ lm_alpha*logp_lm]; finished beams only propagate via a frozen eos slot;
  * top-K over the K*V candidates per utterance, decoder/scorer states
    gathered by parent beam;
  * final ranking with length normalization score / len^gamma.

Joint decoding (BASELINE config 5) adds the vectorized CTC prefix scorer
(decoding/ctc_prefix_scorer.py) as in the hybrid CTC/attention one-pass
algorithm.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.decoding import ctc_prefix_scorer as cps
from pytorch_asr_tpu.models.las_decoder import DecoderState

NEG_INF = -1.0e30


class BeamHyp(NamedTuple):
    tokens: jax.Array      # (B, K, U) int32
    length: jax.Array      # (B, K)
    score: jax.Array       # (B, K) accumulated fused log score
    finished: jax.Array    # (B, K) bool
    last: jax.Array        # (B, K) last emitted char (-1 at start)


def _flatten_state(st: DecoderState) -> DecoderState:
    L, B, K, H = st.h.shape
    return DecoderState(
        h=st.h.reshape(L, B * K, H),
        c=st.c.reshape(L, B * K, H),
        att=st.att.reshape(B * K, -1),
        ctx=st.ctx.reshape(B * K, -1),
    )


def _unflatten_state(st: DecoderState, B: int, K: int) -> DecoderState:
    L, BK, H = st.h.shape
    return DecoderState(
        h=st.h.reshape(L, B, K, H),
        c=st.c.reshape(L, B, K, H),
        att=st.att.reshape(B, K, -1),
        ctx=st.ctx.reshape(B, K, -1),
    )


def _onehot_reorder(parent, K):
    """(B, K, Kp) one-hot for float beam reorders: inside the decode scan XLA
    lowers batched take_along_axis gathers very poorly (measured 13x their
    standalone cost in the prefix beam — see prefix_beam._gather_lm); the
    explicit one-hot contraction is a tiny MXU matmul that fuses cleanly.
    Exact for floats (one 1.0 per row; LM/decoder states are finite).
    Integer/bool leaves keep take_along_axis — f32 transit would corrupt
    values above 2^24 (prefix hashes) and gathers of small int tensors are
    not the bottleneck."""
    return jax.nn.one_hot(parent, K, dtype=jnp.float32)


def _gather_beam(tree, parent):
    """Gather beam-indexed pytree leaves (B, K, ...) by parent (B, K)."""
    onehot = None

    def g(x):
        nonlocal onehot
        if x.ndim < 2:
            return x
        if jnp.issubdtype(x.dtype, jnp.floating):
            if onehot is None:
                onehot = _onehot_reorder(parent, x.shape[1])
            return jnp.einsum("bkj,bj...->bk...", onehot,
                              x.astype(jnp.float32)).astype(x.dtype)
        idx = parent.reshape(parent.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, jnp.broadcast_to(
            idx, parent.shape + x.shape[2:]), axis=1)

    return jax.tree.map(g, tree)


def _gather_dec(st: DecoderState, parent) -> DecoderState:
    """Beam-gather a DecoderState whose h/c carry a leading layer dim."""
    onehot = _onehot_reorder(parent, st.att.shape[1])

    def g2(x):                                   # (B, K, ...) leaves
        return jnp.einsum("bkj,bj...->bk...", onehot, x)

    return DecoderState(
        h=jax.vmap(g2)(st.h),                    # (L, B, K, H)
        c=jax.vmap(g2)(st.c),
        att=g2(st.att),
        ctx=g2(st.ctx),
    )


def attention_beam_search(
    model: Any,
    params: Any,
    enc: jax.Array,              # (B, T, D)
    enc_len: jax.Array,          # (B,)
    sos_id: int,
    eos_id: int,
    beam_size: int = 8,
    max_len: int = 128,
    length_norm: float = 1.0,
    ctc_logits: jax.Array | None = None,
    ctc_weight: float = 0.0,
    lm_table: jax.Array | None = None,
    lm_alpha: float = 0.0,
    lm_order: int = 3,
    rnn_lm: Any = None,          # CharRNNLM for neural shallow fusion
    rnn_lm_params: Any = None,
    hash_lm: Any = None,         # lm_hashed.HashedNgramLM (large vocabs)
    coverage_beta: float = 0.0,
    coverage_tau: float = 0.5,
):
    """Returns (tokens (B, U), lengths (B,), scores (B,)).

    Coverage (Chorowski & Jaitly 2016): final ranking adds
    ``coverage_beta * |{t < enc_len : sum_u a_{u,t} > coverage_tau}|`` — the
    count of encoder frames the hypothesis attended to — discouraging beams
    that stop early or loop on a few frames.
    """
    B, T, D = enc.shape
    K, U = beam_size, max_len
    V = None

    # Tile encoder quantities to (B*K, ...) once.
    enc_k = jnp.repeat(enc, K, axis=0)                           # (B*K, T, D)
    enc_len_k = jnp.repeat(enc_len, K, axis=0)
    enc_projed, enc_mask, dec0 = model.apply(
        {"params": params}, enc_k, enc_len_k, method=model.decoder_begin)
    dec_state = _unflatten_state(dec0, B, K)

    hyp = BeamHyp(
        tokens=jnp.zeros((B, K, U), jnp.int32),
        length=jnp.zeros((B, K), jnp.int32),
        score=jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF)
        * jnp.ones((B, 1)),
        finished=jnp.zeros((B, K), bool),
        last=jnp.full((B, K), -1, jnp.int32),
    )
    y_prev = jnp.full((B, K), sos_id, jnp.int32)

    use_ctc = ctc_logits is not None and ctc_weight > 0.0
    if use_ctc:
        ctc_logp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
        ctc_state = cps.init_state(ctc_logp, enc_len, K)
    else:
        ctc_state = None
    if lm_table is not None:
        lm_ctx = jnp.zeros((B, K), jnp.int32)
        n_ctx = lm_table.shape[0]
    elif hash_lm is not None:
        # hashed backoff LM: carry a token WINDOW per beam (any vocab size)
        lm_ctx = jnp.zeros((B, K, hash_lm.order - 1), jnp.int32)
    else:
        lm_ctx = None
    if rnn_lm is not None:
        from pytorch_asr_tpu.models.lm_rnn import LMState, lm_step_logp

        st0 = rnn_lm.apply({"params": rnn_lm_params}, B * K,
                           method=rnn_lm.init_state)
        logp0, st1 = lm_step_logp(rnn_lm, rnn_lm_params,
                                  jnp.full((B * K,), sos_id, jnp.int32), st0)
        Lc, _, Hl = st1.h.shape
        Vl = logp0.shape[-1]
        lm_rnn = (st1.h.reshape(Lc, B, K, Hl), st1.c.reshape(Lc, B, K, Hl),
                  logp0.reshape(B, K, Vl))
    else:
        lm_rnn = None
    cum_att = jnp.zeros((B, K, T), jnp.float32) if coverage_beta != 0.0 else None

    def scan_step(carry):
        step, hyp, dec_state, y_prev, ctc_state, lm_ctx, lm_rnn, cum_att = carry
        flat = _flatten_state(dec_state)
        logits, new_flat = model.apply(
            {"params": params}, enc_k, enc_projed, enc_mask,
            y_prev.reshape(B * K), flat, method=model.decoder_step)
        new_dec = _unflatten_state(new_flat, B, K)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]
        logp = logp.reshape(B, K, V)

        att_w = 1.0 - ctc_weight if use_ctc else 1.0
        cand = hyp.score[..., None] + att_w * logp               # (B, K, V)
        if use_ctc:
            delta, r_n_all, r_b_all = cps.score_extensions(
                ctc_state, ctc_logp, enc_len, hyp.last, eos_id)
            cand = cand + ctc_weight * delta
        if lm_table is not None:
            cand = cand + lm_alpha * lm_table[lm_ctx]
        elif hash_lm is not None:
            from pytorch_asr_tpu.decoding.lm_hashed import hashed_lm_logp_rows

            cand = cand + lm_alpha * hashed_lm_logp_rows(hash_lm, lm_ctx)
        if lm_rnn is not None:
            cand = cand + lm_alpha * lm_rnn[2]
        # never emit blank or sos
        cand = cand.at[:, :, 0].set(NEG_INF)
        cand = cand.at[:, :, sos_id].set(NEG_INF)
        # finished beams: frozen score, only via the eos slot
        fin = hyp.finished
        cand = jnp.where(fin[..., None],
                         jnp.where(jnp.arange(V)[None, None, :] == eos_id,
                                   hyp.score[..., None], NEG_INF),
                         cand)

        flat_cand = cand.reshape(B, K * V)
        top_score, top_idx = jax.lax.top_k(flat_cand, K)         # (B, K)
        parent = (top_idx // V).astype(jnp.int32)
        char = (top_idx % V).astype(jnp.int32)

        ghyp = _gather_beam(hyp, parent)
        gdec = _gather_dec(new_dec, parent)
        g_y = jnp.take_along_axis(y_prev, parent, axis=1)

        was_fin = ghyp.finished
        now_eos = (char == eos_id) & ~was_fin
        emit = ~was_fin & ~now_eos                               # real char emitted
        pos = jnp.arange(U)[None, None, :] == ghyp.length[..., None]
        new_tokens = jnp.where(pos & emit[..., None], char[..., None], ghyp.tokens)
        new_hyp = BeamHyp(
            tokens=new_tokens,
            length=ghyp.length + emit.astype(jnp.int32),
            score=top_score,
            finished=was_fin | now_eos,
            last=jnp.where(emit, char, ghyp.last),
        )
        new_y = jnp.where(new_hyp.finished, eos_id,
                          jnp.where(emit, char, g_y))

        if use_ctc:
            g_r_n = jnp.moveaxis(r_n_all, 0, 2)                  # (B, K, T, V)
            g_r_b = jnp.moveaxis(r_b_all, 0, 2)
            gathered = _gather_beam(
                (g_r_n, g_r_b, ctc_state.psi, delta), parent)
            g_r_n, g_r_b, g_psi, g_delta = gathered
            safe_char = jnp.where(emit, char, 1)
            idx = safe_char[:, :, None, None]
            sel_rn = jnp.take_along_axis(g_r_n, jnp.broadcast_to(
                idx, g_r_n.shape[:3] + (1,)), axis=3)[..., 0]
            sel_rb = jnp.take_along_axis(g_r_b, jnp.broadcast_to(
                idx, g_r_b.shape[:3] + (1,)), axis=3)[..., 0]
            sel_psi = g_psi + jnp.take_along_axis(
                g_delta, safe_char[..., None], axis=2)[..., 0]
            old = _gather_beam(ctc_state, parent)
            new_ctc = cps.CTCScorerState(
                r_n=jnp.where(emit[..., None], sel_rn, old.r_n),
                r_b=jnp.where(emit[..., None], sel_rb, old.r_b),
                psi=jnp.where(emit, sel_psi, old.psi),
            )
        else:
            new_ctc = None
        if lm_table is not None:
            g_ctx = _gather_beam(lm_ctx, parent)
            new_lm_ctx = jnp.where(emit, (g_ctx * model.vocab_size + char) % n_ctx,
                                   g_ctx)
        elif hash_lm is not None:
            from pytorch_asr_tpu.decoding.lm_hashed import roll_context_window

            g_ctx = _gather_beam(lm_ctx, parent)
            new_lm_ctx = jnp.where(emit[..., None],
                                   roll_context_window(g_ctx, char), g_ctx)
        else:
            new_lm_ctx = None
        if lm_rnn is not None:
            # gather LM state by parent, then advance beams that emitted
            gh = jax.vmap(lambda x: _gather_beam(x, parent))(lm_rnn[0])
            gc = jax.vmap(lambda x: _gather_beam(x, parent))(lm_rnn[1])
            glogp = _gather_beam(lm_rnn[2], parent)
            Lc, _, _, Hl = gh.shape
            Vl = glogp.shape[-1]
            y_lm = jnp.where(emit, char, 1).reshape(B * K)
            s_logp, s_st = lm_step_logp(
                rnn_lm, rnn_lm_params, y_lm,
                LMState(gh.reshape(Lc, B * K, Hl), gc.reshape(Lc, B * K, Hl)))
            new_lm_rnn = (
                jnp.where(emit[None, :, :, None],
                          s_st.h.reshape(Lc, B, K, Hl), gh),
                jnp.where(emit[None, :, :, None],
                          s_st.c.reshape(Lc, B, K, Hl), gc),
                jnp.where(emit[..., None], s_logp.reshape(B, K, Vl), glogp),
            )
        else:
            new_lm_rnn = None
        if cum_att is not None:
            # this step's alignment (already gathered by parent) counts only
            # for beams that emitted a real character
            new_cum = (_gather_beam(cum_att, parent)
                       + jnp.where(emit[..., None], gdec.att, 0.0))
        else:
            new_cum = None

        return (step + 1, new_hyp, gdec, new_y, new_ctc, new_lm_ctx,
                new_lm_rnn, new_cum)

    # lax.while_loop instead of a fixed-length scan: the loop exits as soon as
    # every (B, K) beam has emitted eos, so decode cost tracks actual
    # hypothesis length rather than max_len.  (Decode-only path -- no grads --
    # so while_loop's non-differentiability is irrelevant.)
    def scan_cond(carry):
        step, hyp = carry[0], carry[1]
        return (step < U) & ~jnp.all(hyp.finished)

    (_, hyp, _, _, _, _, _, cum_att) = jax.lax.while_loop(
        scan_cond, scan_step,
        (jnp.int32(0), hyp, dec_state, y_prev, ctc_state, lm_ctx, lm_rnn,
         cum_att))

    # Unfinished beams never produced eos: keep their raw score (they competed
    # fairly); rank with length normalization.
    norm = jnp.maximum(hyp.length.astype(jnp.float32), 1.0) ** length_norm
    final = hyp.score / norm
    if cum_att is not None:
        frame_valid = (jnp.arange(T)[None, None, :] < enc_len[:, None, None])
        covered = jnp.sum(
            ((cum_att > coverage_tau) & frame_valid).astype(jnp.float32), axis=2)
        final = final + coverage_beta * covered
    best = jnp.argmax(final, axis=1)
    tokens = jnp.take_along_axis(hyp.tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(hyp.length, best[:, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    return tokens, lengths, scores
