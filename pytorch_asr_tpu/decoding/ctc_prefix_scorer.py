"""Vectorized CTC prefix scorer for one-pass joint CTC/attention decoding.

Implements the Watanabe et al. (hybrid CTC/attention) prefix-probability
recursion, batched over (batch, beam) and ALL vocab extensions at once -- the
reference genre computes this per-hypothesis in host Python.  Used by
joint-score beam decoding (BASELINE config 5).

State per hypothesis g:
  r_n, r_b (B, K, T): log prob of alignments up to frame t collapsing to g
    and ending in non-blank / blank;
  psi (B, K): prefix score log P(output starts with g).

Scoring every extension h = g.c is one lax.scan over T of elementwise
(B, K, V) updates:

    phi_t    = r_b(g)_t  (+)  [c != last(g)] r_n(g)_t
    r_n(h)_t = (r_n(h)_{t-1} (+) phi_{t-1}) + logp_t(c)
    r_b(h)_t = (r_b(h)_{t-1} (+) r_n(h)_{t-1}) + logp_t(blank)
    psi(h)   = (+)_t  phi_{t-1} + logp_t(c)

with the virtual phi_{-1} = 0 for the empty hypothesis (a prefix may start at
frame 0) and NEG_INF otherwise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


class CTCScorerState(NamedTuple):
    r_n: jax.Array     # (B, K, T)
    r_b: jax.Array     # (B, K, T)
    psi: jax.Array     # (B, K)


def init_state(ctc_logp: jax.Array, logit_len: jax.Array, K: int) -> CTCScorerState:
    """State for the empty hypothesis.  ctc_logp (B, T, V) log-softmax."""
    B, T, V = ctc_logp.shape
    blank = ctc_logp[:, :, 0]                                    # (B, T)
    t_mask = jnp.arange(T)[None, :] < logit_len[:, None]
    r_b = jnp.cumsum(jnp.where(t_mask, blank, 0.0), axis=1)
    r_b = jnp.where(t_mask, r_b, NEG_INF)
    r_b = jnp.broadcast_to(r_b[:, None, :], (B, K, T))
    return CTCScorerState(
        r_n=jnp.full((B, K, T), NEG_INF),
        r_b=r_b,
        psi=jnp.zeros((B, K)),
    )


def score_extensions(
    state: CTCScorerState,
    ctc_logp: jax.Array,        # (B, T, V) log-softmax
    logit_len: jax.Array,       # (B,)
    last: jax.Array,            # (B, K) last char of g (-1 if empty)
    eos_id: int,
):
    """Returns (delta (B,K,V), r_n_all (B,K,T,V), r_b_all (B,K,T,V)).

    delta[b,k,c] = psi(g.c) - psi(g); the eos slot holds the accept score
    (r_T(g) - psi(g)); the blank slot is NEG_INF.
    """
    B, K, T = state.r_n.shape
    V = ctc_logp.shape[-1]

    not_repeat = jnp.arange(V)[None, None, :] != last[..., None]   # (B, K, V)
    # phi per frame: (T, B, K, V)
    phi = jnp.where(
        not_repeat[None],
        jnp.logaddexp(state.r_b, state.r_n).transpose(2, 0, 1)[..., None],
        state.r_b.transpose(2, 0, 1)[..., None],
    )
    logp_T = jnp.swapaxes(ctc_logp, 0, 1)                          # (T, B, V)
    mask_T = jnp.arange(T)[:, None] < logit_len[None, :]           # (T, B)

    phi_m1 = jnp.broadcast_to(
        jnp.where((last == -1)[..., None], 0.0, NEG_INF), (B, K, V))

    def step(carry, inp):
        r_n_prev, r_b_prev, psi_acc, phi_prev = carry
        logp_t, phi_t, m_t = inp
        lp_c = logp_t[:, None, :]                                  # (B, 1, V)
        lp_blank = logp_t[:, None, 0:1]
        r_n_new = jnp.maximum(jnp.logaddexp(r_n_prev, phi_prev) + lp_c, NEG_INF)
        r_b_new = jnp.maximum(jnp.logaddexp(r_b_prev, r_n_prev) + lp_blank, NEG_INF)
        psi_new = jnp.logaddexp(psi_acc, phi_prev + lp_c)
        m = m_t[:, None, None]
        r_n = jnp.where(m, r_n_new, r_n_prev)
        r_b = jnp.where(m, r_b_new, r_b_prev)
        psi = jnp.where(m, psi_new, psi_acc)
        phi_next = jnp.where(m, phi_t, phi_prev)
        return (r_n, r_b, psi, phi_next), (r_n, r_b)

    init = (jnp.full((B, K, V), NEG_INF), jnp.full((B, K, V), NEG_INF),
            jnp.full((B, K, V), NEG_INF), phi_m1)
    (_, _, psi_T, _), (r_n_all, r_b_all) = jax.lax.scan(
        step, init, (logp_T, phi, mask_T))

    delta = psi_T - state.psi[..., None]                           # (B, K, V)

    # eos: accept hypothesis as-is -> full CTC prob of g
    kidx = jnp.arange(K)[None, :]
    bidx = jnp.arange(B)[:, None]
    t_last = jnp.maximum(logit_len - 1, 0)[:, None]                # (B, 1)
    r_last = jnp.logaddexp(state.r_n[bidx, kidx, t_last],
                           state.r_b[bidx, kidx, t_last])
    delta = delta.at[:, :, eos_id].set(r_last - state.psi)
    delta = delta.at[:, :, 0].set(NEG_INF)
    return delta, r_n_all, r_b_all


def select_extension(r_n_all, r_b_all, state: CTCScorerState, delta, chosen):
    """Next scorer state after each beam picked char ``chosen`` (B, K).

    r_n_all/r_b_all are the scan outputs, time-leading (T, B, K, V).
    """
    r_n_all = jnp.moveaxis(r_n_all, 0, 2)                          # (B, K, T, V)
    r_b_all = jnp.moveaxis(r_b_all, 0, 2)
    idx = chosen[:, :, None, None]
    r_n = jnp.take_along_axis(r_n_all, jnp.broadcast_to(
        idx, r_n_all.shape[:3] + (1,)), axis=3)[..., 0]
    r_b = jnp.take_along_axis(r_b_all, jnp.broadcast_to(
        idx, r_b_all.shape[:3] + (1,)), axis=3)[..., 0]
    psi = state.psi + jnp.take_along_axis(delta, chosen[..., None], axis=2)[..., 0]
    return CTCScorerState(r_n=r_n, r_b=r_b, psi=psi)
