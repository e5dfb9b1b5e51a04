"""LAS attention decoder (SURVEY.md §2.1 'LAS attention decoder'; BASELINE config 4/5).

Attention-based Recurrent Sequence Generator with *location-sensitive* attention
(content + convolutional features over the previous alignment -- the mechanism
of Chorowski et al. 2015, the lab behind the reference repo):

    s_u     = LSTM(s_{u-1}, [emb(y_{u-1}), ctx_{u-1}])
    e_{u,t} = v . tanh(W_s s_u + W_e h_t + W_f (F * a_{u-1})_t + b)
    a_u     = masked softmax(e_u);  ctx_u = sum_t a_{u,t} h_t
    logits  = W_o [s_u, ctx_u]

All parameters are explicit ``self.param`` arrays (not lazy submodules) so one
pure step function serves both teacher-forced training under ``jax.lax.scan``
and single-step application inside beam search (SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_asr_tpu.configs.base import LASDecoderConfig

NEG = -1.0e9


class DecoderState(NamedTuple):
    h: jax.Array          # (num_layers, B, H) fp32
    c: jax.Array          # (num_layers, B, H) fp32
    att: jax.Array        # (B, T) previous alignment
    ctx: jax.Array        # (B, D_enc) previous context


class LASDecoder(nn.Module):
    cfg: LASDecoderConfig
    vocab_size: int
    enc_dim: int
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        V, E, H, A, D = self.vocab_size, c.embed_dim, c.hidden_dim, c.attention_dim, self.enc_dim
        init = nn.initializers.xavier_uniform()
        ortho = nn.initializers.orthogonal()
        zeros = nn.initializers.zeros
        self.embed = self.param("embed", nn.initializers.normal(0.02), (V, E), jnp.float32)
        self.lstm_wx = tuple(
            self.param(f"lstm{l}_wx", init, ((E + D) if l == 0 else H, 4 * H), jnp.float32)
            for l in range(c.num_layers)
        )
        self.lstm_wh = tuple(
            self.param(f"lstm{l}_wh", ortho, (H, 4 * H), jnp.float32)
            for l in range(c.num_layers)
        )
        self.lstm_b = tuple(
            self.param(f"lstm{l}_b", zeros, (4 * H,), jnp.float32)
            for l in range(c.num_layers)
        )
        self.w_e = self.param("w_e", init, (D, A), jnp.float32)
        self.w_s = self.param("w_s", init, (H, A), jnp.float32)
        self.b_att = self.param("b_att", zeros, (A,), jnp.float32)
        self.w_f = self.param("w_f", init, (c.location_filters, A), jnp.float32)
        self.loc_filter = self.param(
            "loc_filter", init, (c.location_kernel, 1, c.location_filters), jnp.float32)
        self.v_att = self.param("v_att", init, (A, 1), jnp.float32)
        self.w_out = self.param("w_out", init, (H + D, V), jnp.float32)
        self.b_out = self.param("b_out", zeros, (V,), jnp.float32)

    def project_encoder(self, enc: jax.Array) -> jax.Array:
        """W_e h_t for all frames: computed once per utterance, outside the scan."""
        return enc.astype(jnp.float32) @ self.w_e

    def init_state(self, enc: jax.Array, enc_len: jax.Array) -> DecoderState:
        B, T, _ = enc.shape
        L, H = self.cfg.num_layers, self.cfg.hidden_dim
        # Initial alignment: uniform over valid frames (gives step 0 a sane context).
        mask = jnp.arange(T)[None, :] < enc_len[:, None]
        att0 = mask.astype(jnp.float32) / jnp.maximum(enc_len[:, None], 1)
        ctx0 = jnp.einsum("bt,btd->bd", att0, enc.astype(jnp.float32))
        return DecoderState(
            h=jnp.zeros((L, B, H), jnp.float32),
            c=jnp.zeros((L, B, H), jnp.float32),
            att=att0,
            ctx=ctx0,
        )

    def _attend(self, h_top, enc, enc_projed, enc_mask, att_prev):
        """Location-sensitive attention -> (att (B,T), ctx (B,D))."""
        loc = jax.lax.conv_general_dilated(
            att_prev[..., None], self.loc_filter,
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )                                                       # (B, T, F)
        e = jnp.tanh(
            (h_top @ self.w_s)[:, None, :] + enc_projed + loc @ self.w_f + self.b_att
        ) @ self.v_att                                          # (B, T, 1)
        e = jnp.where(enc_mask[..., None], e, NEG)
        att = jax.nn.softmax(e[..., 0], axis=-1)
        ctx = jnp.einsum("bt,btd->bd", att, enc.astype(jnp.float32))
        return att, ctx

    def step(self, enc, enc_projed, enc_mask, y_prev, state: DecoderState):
        """One decoder step.  y_prev: (B,) token ids.  Returns (logits, new_state)."""
        c = self.cfg
        emb = self.embed[y_prev]                                # (B, E)
        x = jnp.concatenate([emb, state.ctx], axis=-1) @ self.lstm_wx[0]
        hs, cs = [], []
        for l in range(c.num_layers):
            if l > 0:
                x = hs[-1] @ self.lstm_wx[l]
            gates = x + state.h[l] @ self.lstm_wh[l] + self.lstm_b[l]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f + 1.0) * state.c[l] + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            hs.append(h_new)
            cs.append(c_new)
        h_top = hs[-1]
        att, ctx = self._attend(h_top, enc, enc_projed, enc_mask, state.att)
        logits = jnp.concatenate([h_top, ctx], axis=-1) @ self.w_out + self.b_out
        new_state = DecoderState(jnp.stack(hs), jnp.stack(cs), att, ctx)
        return logits, new_state

    def __call__(self, enc, enc_len, targets, target_len, train: bool = False,
                 ss_prob: jax.Array | float = 0.0):
        """Teacher-forced decode.  targets (B, U) are decoder INPUTS (sos-prefixed).

        ``ss_prob``: scheduled-sampling probability (traced scalar) — each
        teacher input after step 0 is replaced, per utterance per step, by the
        model's previous argmax prediction with probability ``ss_prob``.  Only
        active when the config enables scheduled sampling AND train=True (the
        no-sampling path stays a plain scan with no RNG cost).

        Returns logits (B, U, V) in fp32.
        """
        T = enc.shape[1]
        B, U = targets.shape
        enc_mask = jnp.arange(T)[None, :] < enc_len[:, None]
        enc_projed = self.project_encoder(enc)
        state = self.init_state(enc, enc_len)
        use_ss = train and self.cfg.scheduled_sampling > 0.0

        if not use_ss:
            def scan_step(st, y_u):
                logits, new_st = self.step(enc, enc_projed, enc_mask, y_u, st)
                return new_st, logits

            # Plain lax.scan is safe here: step() reads only concrete params.
            _, logits = jax.lax.scan(scan_step, state, jnp.swapaxes(targets, 0, 1))
            return jnp.swapaxes(logits, 0, 1)                   # (B, U, V)

        keys = jax.random.split(self.make_rng("dropout"), U)

        def scan_step_ss(carry, xs):
            st, prev_pred = carry
            y_u, key = xs
            replace = jax.random.bernoulli(key, ss_prob, (B,)) & (prev_pred >= 0)
            y_in = jnp.where(replace, jnp.maximum(prev_pred, 0), y_u)
            logits, new_st = self.step(enc, enc_projed, enc_mask, y_in, st)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (new_st, pred), logits

        init = (state, jnp.full((B,), -1, jnp.int32))
        _, logits = jax.lax.scan(scan_step_ss, init,
                                 (jnp.swapaxes(targets, 0, 1), keys))
        return jnp.swapaxes(logits, 0, 1)                       # (B, U, V)
