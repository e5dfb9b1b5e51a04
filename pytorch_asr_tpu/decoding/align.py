"""CTC forced alignment (Viterbi over the blank-interleaved lattice).

The reference genre exposes frame-level alignments (torchaudio
``forced_align`` / attention plots) for analysis and segmentation.  This is
the TPU-native equivalent: a batched Viterbi pass over the same extended
label lattice as the CTC loss (ops/ctc.py), fully on device —
``lax.scan`` forward over time storing per-state backpointers, reverse scan
backtrace.

Outputs per utterance: the per-frame extended-lattice state, the per-frame
emitted label (blank = 0 between/within tokens), and per-token (start, end)
frame spans.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _extend(tokens: jax.Array, blank: int) -> jax.Array:
    """(B, L) labels -> (B, 2L+1) blank-interleaved lattice labels."""
    B, L = tokens.shape
    ext = jnp.full((B, 2 * L + 1), blank, tokens.dtype)
    return ext.at[:, 1::2].set(tokens)


@partial(jax.jit, static_argnames=("blank",))
def ctc_forced_align(
    logits: jax.Array,       # (B, T, V)
    logit_len: jax.Array,    # (B,)
    tokens: jax.Array,       # (B, L) label ids (no blanks), 0-padded
    token_len: jax.Array,    # (B,)
    blank: int = 0,
):
    """Most-likely CTC alignment of ``tokens`` to the frames.

    Returns dict:
      frame_state (B, T) int32 — lattice state per frame (-1 past logit_len)
      frame_label (B, T) int32 — emitted label per frame (blank between
        tokens; -1 past logit_len)
      starts, ends (B, L) int32 — [start, end) frame span of each token
        (0,0 for rows past token_len)
      score (B,) f32 — log-prob of the best alignment path
    """
    B, T, V = logits.shape
    L = tokens.shape[1]
    S = 2 * L + 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ext = _extend(tokens, blank)                         # (B, S)
    s_len = 2 * token_len + 1                            # valid lattice states

    # skip transition s-2 -> s allowed when ext[s] != blank and != ext[s-2]
    can_skip = jnp.zeros((B, S), bool)
    if L > 1:
        skip = (ext[:, 2:] != blank) & (ext[:, 2:] != ext[:, :-2])
        can_skip = can_skip.at[:, 2:].set(skip)

    emit = jnp.take_along_axis(logp, ext[:, None, :], axis=2)  # (B, T, S)

    init = jnp.full((B, S), NEG_INF)
    init = init.at[:, 0].set(emit[:, 0, 0])
    has1 = s_len > 1
    init = init.at[:, 1].set(jnp.where(has1, emit[:, 0, 1], NEG_INF))

    def step(delta, emit_t):
        stay = delta
        diag = jnp.concatenate([jnp.full((B, 1), NEG_INF), delta[:, :-1]], 1)
        skip2 = jnp.concatenate([jnp.full((B, 2), NEG_INF), delta[:, :-2]], 1)
        skip2 = jnp.where(can_skip, skip2, NEG_INF)
        stacked = jnp.stack([stay, diag, skip2], axis=0)   # (3, B, S)
        choice = jnp.argmax(stacked, axis=0)               # (B, S)
        best = jnp.max(stacked, axis=0)
        new = best + emit_t
        return new, choice

    # t = 1..T-1 transitions; choices[t] holds the argmax into frame t.
    # All deltas are kept so the backtrace can start at each utterance's own
    # final frame (logit_len - 1) rather than the padded T-1.
    def step_keep(delta, emit_t):
        new, choice = step(delta, emit_t)
        return new, (new, choice)

    _, (deltas, choices) = jax.lax.scan(
        step_keep, init, jnp.swapaxes(emit, 0, 1)[1:])
    deltas = jnp.concatenate([init[None], deltas], 0)      # (T, B, S)
    choices = jnp.concatenate(
        [jnp.zeros((1, B, S), choices.dtype), choices], 0)  # (T, B, S)

    # final state: best of the last two valid states at t = logit_len - 1
    t_last = jnp.maximum(logit_len - 1, 0)
    d_last = deltas[t_last, jnp.arange(B)]                 # (B, S)
    sN = s_len - 1
    sN1 = jnp.maximum(s_len - 2, 0)
    dN = jnp.take_along_axis(d_last, sN[:, None], 1)[:, 0]
    dN1 = jnp.take_along_axis(d_last, sN1[:, None], 1)[:, 0]
    s_final = jnp.where(dN >= dN1, sN, sN1).astype(jnp.int32)
    score = jnp.maximum(dN, dN1)

    # backtrace: walk t = T-1 .. 0; only frames < logit_len move the cursor.
    def back(carry, t):
        s = carry
        ch = jnp.take_along_axis(choices[t], s[:, None], 1)[:, 0]
        active = (t < logit_len) & (t > 0)
        s_prev = jnp.where(active, s - ch, s)
        state_t = jnp.where(t < logit_len, s, -1)
        return s_prev.astype(jnp.int32), state_t

    _, states_rev = jax.lax.scan(back, s_final, jnp.arange(T - 1, -1, -1))
    frame_state = jnp.flip(jnp.swapaxes(states_rev, 0, 1), axis=1)  # (B, T)

    valid = frame_state >= 0
    frame_label = jnp.where(
        valid,
        jnp.take_along_axis(ext, jnp.maximum(frame_state, 0), axis=1),
        -1)

    # token i occupies lattice state 2i+1: span = frames with that state
    tok_state = 2 * jnp.arange(L, dtype=jnp.int32)[None, :] + 1  # (1, L)
    on = frame_state[:, :, None] == tok_state[:, None, :]        # (B, T, L)
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    starts = jnp.min(jnp.where(on, t_idx, T), axis=1)
    ends = jnp.max(jnp.where(on, t_idx + 1, 0), axis=1)
    tok_valid = jnp.arange(L)[None, :] < token_len[:, None]
    starts = jnp.where(tok_valid, starts, 0).astype(jnp.int32)
    ends = jnp.where(tok_valid, ends, 0).astype(jnp.int32)

    return {"frame_state": frame_state.astype(jnp.int32),
            "frame_label": frame_label.astype(jnp.int32),
            "starts": starts, "ends": ends, "score": score}
