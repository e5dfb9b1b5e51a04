"""Label-smoothed cross-entropy for the attention decoder (SURVEY.md §2.1).

Reference realization: ``nn.CrossEntropyLoss`` (ATen C++).  Here it is a small
fused jnp expression inside the jitted train step; XLA fuses the log-softmax,
smoothing and masking into the surrounding program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothed_ce_loss(
    logits: jax.Array,       # (B, U, V) fp32
    targets: jax.Array,      # (B, U) int ids (eos-terminated)
    target_len: jax.Array,   # (B,) valid positions INCLUDING the eos slot
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Mean per-token label-smoothed CE over valid positions.  Returns scalar."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]   # (B, U)
    if label_smoothing > 0.0:
        uniform = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * uniform
    mask = jnp.arange(logits.shape[1])[None, :] < target_len[:, None]
    total = jnp.sum(nll * mask)
    return total / jnp.maximum(jnp.sum(mask), 1.0)


def make_decoder_io(tokens: jax.Array, token_len: jax.Array,
                    sos_id: int, eos_id: int):
    """Build teacher-forcing inputs/outputs from (B, L) 0-padded labels.

    Returns:
      dec_in  (B, L+1): [sos, t_0 .. t_{L-1}]
      dec_out (B, L+1): [t_0 .. t_{L-1}, eos@len]   (0-padded past eos)
      dec_len (B,): token_len + 1 (the eos slot is scored)
    """
    B, L = tokens.shape
    sos = jnp.full((B, 1), sos_id, dtype=tokens.dtype)
    dec_in = jnp.concatenate([sos, tokens], axis=1)
    pad = jnp.zeros((B, 1), dtype=tokens.dtype)
    shifted = jnp.concatenate([tokens, pad], axis=1)
    pos = jnp.arange(L + 1)[None, :]
    dec_out = jnp.where(pos == token_len[:, None], eos_id, shifted)
    dec_out = jnp.where(pos > token_len[:, None], 0, dec_out)
    return dec_in, dec_out, token_len + 1
