"""CTC forward-backward loss (SURVEY.md §2.1 'CTC loss', §7.3).

The reference uses ``torch.nn.CTCLoss`` (ATen C++/CUDA).  Here the alpha-beta
recursion over the blank-interleaved label lattice is written in log-space jnp
with a hand-derived custom VJP: the backward pass runs the beta recursion and
forms gradients from the state posteriors instead of differentiating through
the forward scan (which would be both slower and memory-hungry).

A Pallas TPU kernel of the same recursion lives in
``pytorch_asr_tpu.ops.ctc_pallas``; this file is the correctness reference,
parity-tested against torch-CPU ``nn.CTCLoss`` (the stand-in oracle for the
absent reference -- SURVEY.md §4.1).

Shapes: logits (B, T, V) raw scores; labels (B, L) padded with 0 (= blank).
Lattice states s in [0, 2L+1): even s are blanks, odd s are labels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _extended_labels(labels: jax.Array, blank: int) -> jax.Array:
    """(B, L) -> (B, 2L+1) blank-interleaved label sequence."""
    B, L = labels.shape
    S = 2 * L + 1
    ext = jnp.full((B, S), blank, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _skip_allowed(labels: jax.Array, label_len: jax.Array) -> jax.Array:
    """(B, 2L+1) mask: alpha may jump s-2 -> s (odd s, distinct adjacent labels)."""
    B, L = labels.shape
    S = 2 * L + 1
    allowed = jnp.zeros((B, S), dtype=bool)
    if L > 1:
        distinct = labels[:, 1:] != labels[:, :-1]          # (B, L-1) label k vs k-1
        allowed = allowed.at[:, 3::2].set(distinct)
    pos = jnp.arange(S)[None, :]
    return allowed & (pos < 2 * label_len[:, None] + 1)


def _shift1(x: jax.Array) -> jax.Array:
    return jnp.concatenate([jnp.full_like(x[:, :1], NEG_INF), x[:, :-1]], axis=1)


def _shift2(x: jax.Array) -> jax.Array:
    return jnp.concatenate([jnp.full_like(x[:, :2], NEG_INF), x[:, :-2]], axis=1)


def _alpha_step(alpha, logp_ext_t, skip_mask):
    """One time-step of the alpha recursion (all (B, S))."""
    stay = alpha
    s1 = _shift1(alpha)
    s2 = jnp.where(skip_mask, _shift2(alpha), NEG_INF)
    m = jnp.maximum(jnp.maximum(stay, s1), s2)
    m_safe = jnp.maximum(m, NEG_INF)
    tot = m_safe + jnp.log(
        jnp.exp(stay - m_safe) + jnp.exp(s1 - m_safe) + jnp.exp(s2 - m_safe)
    )
    return jnp.maximum(tot, NEG_INF) + logp_ext_t


def _forward_alphas(logp_ext, logit_len, skip_mask):
    """Run the alpha recursion.  logp_ext (T, B, S) -> alphas (T, B, S), logZ (B,)."""
    T, B, S = logp_ext.shape
    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(logp_ext[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(S > 1, logp_ext[0, :, 1], NEG_INF))

    def step(alpha, inp):
        t, logp_t = inp
        new = _alpha_step(alpha, logp_t, skip_mask)
        # Padded frames (t >= logit_len) carry alpha through unchanged so the
        # final scan state is the per-utterance terminal alpha.
        new = jnp.where((t < logit_len)[:, None], new, alpha)
        return new, new

    ts = jnp.arange(1, T)
    alpha_last, alphas_rest = jax.lax.scan(step, alpha0, (ts, logp_ext[1:]))
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)
    return alphas, alpha_last


def _terminal_logz(alpha_last, label_len):
    """-log P from the two terminal lattice states."""
    B = alpha_last.shape[0]
    bidx = jnp.arange(B)
    end_blank = alpha_last[bidx, 2 * label_len]
    end_label = jnp.where(
        label_len > 0,
        alpha_last[bidx, jnp.maximum(2 * label_len - 1, 0)],
        NEG_INF,
    )
    return jnp.logaddexp(end_blank, end_label)


def _prep(logits, logit_len, labels, label_len, blank):
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)            # (B, T, V)
    ext = _extended_labels(labels, blank)                 # (B, S)
    skip = _skip_allowed(labels, label_len)
    logp_tbs = jnp.take_along_axis(
        jnp.swapaxes(logp, 0, 1),                         # (T, B, V)
        ext[None].astype(jnp.int32),
        axis=2,
    )                                                     # (T, B, S)
    # States beyond the valid lattice (s >= 2*label_len+1) never contribute.
    S = ext.shape[1]
    valid_s = jnp.arange(S)[None, :] < 2 * label_len[:, None] + 1
    logp_tbs = jnp.where(valid_s[None], logp_tbs, NEG_INF)
    return logp, logp_tbs, ext, skip, valid_s


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss(logits, logit_len, labels, label_len, blank=0):
    """Per-utterance CTC negative log-likelihood.

    Args:
      logits: (B, T, V) unnormalized scores.
      logit_len: (B,) valid frames.
      labels: (B, L) target ids, 0-padded (0 == blank is safe: label_len masks).
      label_len: (B,) valid labels.
    Returns: (B,) loss; 0 for infeasible/empty rows (torch zero_infinity=True).
    """
    loss, _ = _ctc_forward(logits, logit_len, labels, label_len, blank)
    return loss


def _ctc_forward(logits, logit_len, labels, label_len, blank):
    logp, logp_tbs, ext, skip, valid_s = _prep(logits, logit_len, labels, label_len, blank)
    alphas, alpha_last = _forward_alphas(logp_tbs, logit_len, skip)
    logz = _terminal_logz(alpha_last, label_len)
    feasible = (logz > NEG_INF / 2) & (logit_len > 0)
    loss = jnp.where(feasible, -logz, 0.0)
    residuals = (logp, logp_tbs, alphas, logz, feasible, ext, skip,
                 logit_len, label_len)
    return loss, residuals


def _ctc_fwd(logits, logit_len, labels, label_len, blank):
    loss, residuals = _ctc_forward(logits, logit_len, labels, label_len, blank)
    return loss, residuals


def _beta_step(beta_next, logp_ext_next, skip_from):
    """beta_t from beta_{t+1}: transitions s -> {s, s+1, s+2 (if allowed)}."""
    term = beta_next + logp_ext_next                      # (B, S)
    stay = term
    s1 = jnp.concatenate([term[:, 1:], jnp.full_like(term[:, :1], NEG_INF)], axis=1)
    s2_raw = jnp.concatenate([term[:, 2:], jnp.full_like(term[:, :2], NEG_INF)], axis=1)
    s2 = jnp.where(skip_from, s2_raw, NEG_INF)
    m = jnp.maximum(jnp.maximum(stay, s1), s2)
    m_safe = jnp.maximum(m, NEG_INF)
    tot = m_safe + jnp.log(
        jnp.exp(stay - m_safe) + jnp.exp(s1 - m_safe) + jnp.exp(s2 - m_safe)
    )
    return jnp.maximum(tot, NEG_INF)


def _ctc_bwd(blank, residuals, g):
    (logp, logp_tbs, alphas, logz, feasible, ext, skip,
     logit_len, label_len) = residuals
    T, B, S = logp_tbs.shape
    V = logp.shape[-1]
    bidx = jnp.arange(B)

    # Terminal beta: 0 at the two end states (placed at each row's logit_len-1).
    beta_T = jnp.full((B, S), NEG_INF)
    beta_T = beta_T.at[bidx, 2 * label_len].set(0.0)
    beta_T = jnp.where(
        (label_len > 0)[:, None]
        & (jnp.arange(S)[None, :] == jnp.maximum(2 * label_len - 1, 0)[:, None]),
        0.0,
        beta_T,
    )
    # Skip transitions s -> s+2 are allowed iff arrivals at s+2 may skip.
    skip_from = jnp.concatenate([skip[:, 2:], jnp.zeros_like(skip[:, :2])], axis=1)

    def step(beta_next, inp):
        t, logp_next = inp
        # At t == logit_len-1 install the terminal condition; before it recurse;
        # past the valid range (t >= logit_len) the value is unused junk.
        recursed = _beta_step(beta_next, logp_next, skip_from)
        beta_t = jnp.where((t == logit_len - 1)[:, None], beta_T,
                           jnp.where((t < logit_len - 1)[:, None], recursed, beta_next))
        return beta_t, beta_t

    # Reverse scan over t = T-1 .. 0; logp at t+1 feeds beta_t (dummy for t=T-1).
    logp_next = jnp.concatenate([logp_tbs[1:], jnp.full_like(logp_tbs[:1], NEG_INF)], axis=0)
    ts = jnp.arange(T)
    _, betas = jax.lax.scan(step, jnp.full((B, S), NEG_INF),
                            (ts[::-1], logp_next[::-1]))
    betas = betas[::-1]                                   # (T, B, S)

    # State posteriors gamma, masked to valid (t, s).
    t_valid = (jnp.arange(T)[:, None] < logit_len[None, :])[..., None]  # (T, B, 1)
    gamma = alphas + betas - logz[None, :, None]
    gamma = jnp.where(t_valid, gamma, NEG_INF)
    gamma = jnp.where(feasible[None, :, None], gamma, NEG_INF)
    w = jnp.exp(jnp.maximum(gamma, NEG_INF))              # (T, B, S)

    # Scatter posteriors from lattice states to vocab: one-hot matmul (MXU).
    onehot = jax.nn.one_hot(ext, V, dtype=w.dtype)        # (B, S, V)
    gamma_v = jnp.einsum("tbs,bsv->tbv", w, onehot)       # (T, B, V)

    p = jnp.exp(logp)                                     # (B, T, V)
    grad_logits = jnp.where(
        jnp.swapaxes(t_valid, 0, 1),                      # (B, T, 1)
        p * jnp.sum(gamma_v, axis=-1).transpose(1, 0)[..., None]
        - jnp.swapaxes(gamma_v, 0, 1),
        0.0,
    )
    grad_logits = grad_logits * g[:, None, None]
    return grad_logits, None, None, None


ctc_loss.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_mean(logits, logit_len, labels, label_len, blank=0):
    """Batch-mean CTC loss, normalized per label token (torch 'mean' reduction)."""
    per_utt = ctc_loss(logits, logit_len, labels, label_len, blank)
    denom = jnp.maximum(label_len.astype(jnp.float32), 1.0)
    valid = (logit_len > 0).astype(jnp.float32)
    return jnp.sum(per_utt / denom * valid) / jnp.maximum(jnp.sum(valid), 1.0)
