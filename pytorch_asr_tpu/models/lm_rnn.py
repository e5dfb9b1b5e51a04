"""Char RNN language model for neural shallow fusion (SURVEY.md §2.1 'CTC
prefix beam search + LM shallow fusion' row; §2.2 'KenLM binding' row).

The reference genre fuses either an n-gram LM (KenLM) or a recurrent char LM
into beam search.  decoding/lm.py covers the n-gram path with a dense device
table; this module is the *neural* LM: an LSTM over characters whose state is
carried per beam hypothesis ON DEVICE during fused decoding (no host
round-trips, matching the BASELINE north star).

Like LASDecoder, all parameters are explicit ``self.param`` arrays so one pure
``step`` serves teacher-forced training under ``lax.scan`` AND per-beam
single-step application inside the beam kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class RNNLMConfig:
    embed_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 2
    dropout: float = 0.0


class LMState(NamedTuple):
    h: jax.Array   # (num_layers, B, H) fp32
    c: jax.Array   # (num_layers, B, H) fp32


class CharRNNLM(nn.Module):
    cfg: RNNLMConfig
    vocab_size: int

    def setup(self):
        c = self.cfg
        V, E, H = self.vocab_size, c.embed_dim, c.hidden_dim
        init = nn.initializers.xavier_uniform()
        ortho = nn.initializers.orthogonal()
        self.embed = self.param("embed", nn.initializers.normal(0.02), (V, E),
                                jnp.float32)
        self.lstm_wx = tuple(
            self.param(f"lstm{l}_wx", init, (E if l == 0 else H, 4 * H), jnp.float32)
            for l in range(c.num_layers))
        self.lstm_wh = tuple(
            self.param(f"lstm{l}_wh", ortho, (H, 4 * H), jnp.float32)
            for l in range(c.num_layers))
        self.lstm_b = tuple(
            self.param(f"lstm{l}_b", nn.initializers.zeros, (4 * H,), jnp.float32)
            for l in range(c.num_layers))
        self.w_out = self.param("w_out", init, (H, V), jnp.float32)
        self.b_out = self.param("b_out", nn.initializers.zeros, (V,), jnp.float32)

    def init_state(self, batch: int) -> LMState:
        L, H = self.cfg.num_layers, self.cfg.hidden_dim
        return LMState(h=jnp.zeros((L, batch, H), jnp.float32),
                       c=jnp.zeros((L, batch, H), jnp.float32))

    def step(self, y_prev: jax.Array, state: LMState):
        """One LM step.  y_prev (B,) -> (logits (B, V), new_state)."""
        x = self.embed[y_prev]
        hs, cs = [], []
        for l in range(self.cfg.num_layers):
            gates = x @ self.lstm_wx[l] + state.h[l] @ self.lstm_wh[l] + self.lstm_b[l]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f + 1.0) * state.c[l] + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            hs.append(h_new)
            cs.append(c_new)
            x = h_new
        logits = hs[-1] @ self.w_out + self.b_out
        return logits, LMState(jnp.stack(hs), jnp.stack(cs))

    def __call__(self, inputs: jax.Array):
        """Teacher-forced forward.  inputs (B, U) -> logits (B, U, V)."""
        B = inputs.shape[0]
        state = self.init_state(B)

        def scan_step(st, y_u):
            logits, new_st = self.step(y_u, st)
            return new_st, logits

        _, logits = jax.lax.scan(scan_step, state, jnp.swapaxes(inputs, 0, 1))
        return jnp.swapaxes(logits, 0, 1)


def lm_step_logp(model: CharRNNLM, params, y_prev, state: LMState):
    """log P(.|prefix) + new state, for fusion loops.  y_prev (B,)."""
    logits, new_state = model.apply({"params": params}, y_prev, state,
                                    method=model.step)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), new_state


class HostRNNLM:
    """Host-side `.score(prefix, c)` adapter matching BackoffLM's interface —
    used by the prefix-beam parity oracle (decoding/prefix_beam_ref.py)."""

    def __init__(self, model: CharRNNLM, params, sos_id: int) -> None:
        self.model, self.params, self.sos_id = model, params, sos_id
        self._cache: dict[tuple, Any] = {}

    def _logp_state(self, prefix: tuple):
        # Iterative walk from the longest cached ancestor (recursion would
        # blow the stack on utterance-length prefixes).
        n = len(prefix)
        while n > 0 and prefix[:n] not in self._cache:
            n -= 1
        if n == 0 and () not in self._cache:
            state = self.model.apply({"params": self.params}, 1,
                                     method=self.model.init_state)
            y = jnp.asarray([self.sos_id], jnp.int32)
            logp, state = lm_step_logp(self.model, self.params, y, state)
            self._cache[()] = (jax.device_get(logp)[0], state)
        for i in range(n, len(prefix)):
            _, state = self._cache[prefix[:i]]
            y = jnp.asarray([prefix[i]], jnp.int32)
            logp, new_state = lm_step_logp(self.model, self.params, y, state)
            self._cache[prefix[: i + 1]] = (jax.device_get(logp)[0], new_state)
        return self._cache[prefix]

    def score(self, ctx, c: int) -> float:
        logp, _ = self._logp_state(tuple(ctx))
        return float(logp[c])
