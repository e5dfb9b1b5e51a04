"""Greedy CTC decoding (SURVEY.md §2.1 'Greedy CTC decoder').

Device side is a pure argmax + collapse (one fused XLA program); only final
token ids cross to host for detokenization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_ctc(logits: jax.Array, logit_len: jax.Array, blank: int = 0):
    """(B, T, V) -> (ids (B, T), lengths (B,)) collapsed on device.

    Output rows are left-packed: ids[b, :n] are the decoded tokens.
    """
    T = logits.shape[1]
    best = jnp.argmax(logits, axis=-1)                         # (B, T)
    valid = jnp.arange(T)[None, :] < logit_len[:, None]
    prev = jnp.concatenate([jnp.full_like(best[:, :1], -1), best[:, :-1]], axis=1)
    keep = (best != blank) & (best != prev) & valid            # (B, T)
    # Left-pack kept tokens: position = cumsum of keep - 1.
    pos = jnp.cumsum(keep, axis=1) - 1
    n = pos[:, -1] + 1
    out = jnp.zeros_like(best)
    bidx = jnp.arange(best.shape[0])[:, None]
    out = out.at[bidx, jnp.where(keep, pos, T - 1)].max(jnp.where(keep, best, 0))
    # The scatter above may collide at T-1 for dropped slots; mask by length.
    out = jnp.where(jnp.arange(T)[None, :] < n[:, None], out, 0)
    return out, n
