"""Streaming (online) recognition: chunked encoder with carried state.

The reference genre decodes whole utterances offline.  This module adds a
latency-bounded online path on top of the SAME trained parameters, provided
the model was built streaming-capable:

  * ``BiLSTMEncoderConfig(bidirectional=False, causal_conv=True)`` — output
    frame t depends only on input frames <= t, and
  * ``FrontendConfig(normalize=False)`` — per-utterance CMVN is non-causal.

TPU-native design: ONE jitted step per fixed-size frame block (static shapes,
no recompiles), with ALL sequential state carried as device arrays in a
``StreamState`` pytree:

  * per-conv-layer left-context buffers of kernel-1 input frames — exactly
    the frames the causal left padding would cover, so chunked conv outputs
    are bit-compatible with the offline encoder;
  * per-LSTM-layer (h, c) carries;
  * the previous argmax token, so greedy CTC collapse works across chunk
    boundaries — or, in ``mode="beam"``, the full prefix-beam ``BeamState``
    (token buffers, (p_blank, p_nonblank), hashes), making chunked beam
    decoding BITWISE equal to the offline ``prefix_beam_search``; beam mode
    emits the current full best prefix per block (hypotheses may revise).

Raw samples buffer on host (a numpy ring buffer, cheap); everything from
framing onward runs on device.  The step emits left-packed new token ids per
chunk — the only device->host transfer.

Parity contract (tests/test_streaming.py): feeding an utterance chunk-by-
chunk through ``StreamingRecognizer`` produces the same transcript as the
offline ``ASRModel.apply`` + ``greedy_ctc`` on the full waveform.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.configs.base import (BiLSTMEncoderConfig,
                                          ExperimentConfig)
from pytorch_asr_tpu.frontend import features
from pytorch_asr_tpu.models.encoder_bilstm import conv_out_len_causal


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StreamState:
    """Device-resident carried state for one batch of live streams."""

    conv_ctx: tuple          # per conv layer: (B, kt-1, F_l, C_l) f32
    lstm_h: tuple            # per lstm layer: (B, H) f32
    lstm_c: tuple            # per lstm layer: (B, H) f32
    prev_tok: jax.Array      # (B,) int32 — last argmax frame (incl. blank)
    beam: Any = None         # decoding.prefix_beam.BeamState (beam mode)
    lm_carry: Any = None     # decoding.prefix_beam.LMCarry (RNN-LM fusion)

    def tree_flatten(self):
        return ((self.conv_ctx, self.lstm_h, self.lstm_c, self.prev_tok,
                 self.beam, self.lm_carry), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _check_streamable(cfg: ExperimentConfig) -> BiLSTMEncoderConfig:
    enc = cfg.model.encoder
    if getattr(enc, "kind", "") != "bilstm":
        raise ValueError("streaming supports the conv+LSTM encoder only")
    if getattr(enc, "bidirectional", True):
        raise ValueError("streaming needs encoder.bidirectional=false "
                         "(a backward LSTM reads the future)")
    if not getattr(enc, "causal_conv", False):
        raise ValueError("streaming needs encoder.causal_conv=true "
                         "(symmetric conv padding reads the future)")
    if cfg.frontend.normalize:
        raise ValueError("streaming needs frontend.normalize=false "
                         "(per-utterance CMVN is non-causal)")
    return enc


def init_stream_state(cfg: ExperimentConfig, batch_size: int,
                      beam: bool = False, hash_lm=None, rnn_lm=None,
                      rnn_lm_params=None, sos_id: int | None = None,
                      ) -> StreamState:
    """Zero state == the causal left padding / zero-initial LSTM offline.

    Beam mode carries LM-fusion state across chunks too: the hashed-LM
    context window widens ``BeamState.ctx`` to (order - 1) token ids, and an
    RNN LM primes a per-beam ``LMCarry`` with <sos> — both device-resident
    (BASELINE 'LM-fusion state exchanged ... device-resident' applies to the
    online path as well).
    """
    enc = _check_streamable(cfg)
    kt, kf = enc.conv_kernel
    st, sf = enc.conv_stride
    pf = (kf - 1) // 2
    conv_ctx = []
    freq, chans = cfg.frontend.n_mels, 1
    for ch in enc.conv_channels:
        conv_ctx.append(jnp.zeros((batch_size, kt - 1, freq, chans),
                                  jnp.float32))
        freq = (freq + 2 * pf - kf) // sf + 1
        chans = ch
    H = enc.hidden_dim
    zeros = lambda: jnp.zeros((batch_size, H), jnp.float32)
    beam_state = None
    lm_carry = None
    if beam:
        from pytorch_asr_tpu.decoding.prefix_beam import (
            prefix_beam_init, rnn_lm_carry_init)

        ctx_width = hash_lm.order - 1 if hash_lm is not None else 0
        beam_state = prefix_beam_init(batch_size, cfg.decode.beam_size,
                                      cfg.decode.max_decode_len,
                                      ctx_width=ctx_width)
        if rnn_lm is not None:
            if sos_id is None:
                raise ValueError("rnn_lm streaming fusion needs sos_id")
            lm_carry = rnn_lm_carry_init(
                rnn_lm, rnn_lm_params, batch_size, cfg.decode.beam_size,
                rnn_lm.vocab_size, sos_id)
    return StreamState(
        conv_ctx=tuple(conv_ctx),
        lstm_h=tuple(zeros() for _ in range(enc.num_layers)),
        lstm_c=tuple(zeros() for _ in range(enc.num_layers)),
        prev_tok=jnp.full((batch_size,), -1, jnp.int32),
        beam=beam_state,
        lm_carry=lm_carry,
    )


def _conv_chunk(x, ctx, kernel, bias, stride, pf):
    """Causal conv over [carried ctx | new frames]; returns (y, new ctx).

    Time padding is VALID — the ctx buffer IS the left padding, so chunked
    outputs equal the offline left-padded conv's outputs at the same global
    positions.
    """
    inp = jnp.concatenate([ctx, x], axis=1)            # (B, kt-1+n, F, C)
    y = jax.lax.conv_general_dilated(
        inp, kernel, window_strides=stride,
        padding=((0, 0), (pf, pf)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(y + bias)
    kt = kernel.shape[0]
    return y, inp[:, inp.shape[1] - (kt - 1):]


def _lstm_chunk(xproj, whh, h0, c0, valid):
    """(T, B, 4H) projected inputs -> (T, B, H) states; carries (h, c).

    Same cell math and scan order as the offline encoder, with an initial
    carry; invalid steps pass state through unchanged.
    """
    def cell(carry, inp):
        h, c = carry
        x_t, valid_t = inp
        gates = x_t + h @ whh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = valid_t[:, None]
        h_new = jnp.where(m, h_new, h)
        c_new = jnp.where(m, c_new, c)
        return (h_new, c_new), h_new

    (h, c), hs = jax.lax.scan(cell, (h0, c0), (xproj, valid))
    return hs, h, c


@functools.partial(jax.jit, static_argnums=(0,))
def _stream_step(static, params, state: StreamState, samples, n_frames,
                 lm_table=None, hash_lm=None, rnn_lm_params=None):
    """One block: samples -> log-mel -> causal conv -> LSTM -> greedy emit.

    Args:
      static: (cfg, block_frames, rnn_lm, lm_alpha, lm_beta, lm_top_k,
      ext_top_a) — hashable.
      samples: (B, (block_frames-1)*hop + win) f32.
      n_frames: (B,) int32 valid frame count in this block (<= block_frames).
      lm_table / hash_lm / rnn_lm_params: beam-mode LM fusion sources
        (device pytrees; traced so swapping LMs never recompiles the step).
    Returns: (new_state, ids (B, out_T) left-packed, n_ids (B,)).
    """
    cfg, block_frames, rnn_lm, lm_alpha, lm_beta, lm_top_k, ext_top_a = static
    enc = cfg.model.encoder
    fe = cfg.frontend
    kt, kf = enc.conv_kernel
    st, sf = enc.conv_stride
    pf = (kf - 1) // 2

    # --- frontend: frame/window/rFFT/mel/log, same math as features.log_mel
    starts = np.arange(block_frames) * fe.hop_length
    idx = starts[:, None] + np.arange(fe.win_length)[None, :]
    frames = samples[:, idx] * features.hann_window(fe.win_length)
    spec = jnp.fft.rfft(frames, n=fe.n_fft, axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(jnp.float32)
    mel = jnp.maximum(power @ jnp.asarray(features.mel_filterbank(fe)),
                      fe.log_floor)
    feats = jnp.log(mel)                                   # (B, T, n_mels)
    fmask = jnp.arange(block_frames)[None, :] < n_frames[:, None]
    feats = jnp.where(fmask[..., None], feats, 0.0)

    # --- causal conv stack with carried left context
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        cfg.model.compute_dtype]
    x = feats[..., None].astype(dtype)
    conv_params = params["encoder"]["ConvSubsampler_0"]
    new_ctx = []
    lengths = n_frames
    for i in range(len(enc.conv_channels)):
        p = conv_params[f"Conv_{i}"]
        x, ctx = _conv_chunk(x, state.conv_ctx[i].astype(dtype),
                             p["kernel"].astype(dtype),
                             p["bias"].astype(dtype), (st, sf), pf)
        new_ctx.append(ctx.astype(jnp.float32))
        lengths = conv_out_len_causal(lengths, kt, st)
        # re-mask: conv bias + relu make padded frames nonzero (matches the
        # offline ConvSubsampler)
        mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        x = jnp.where(mask[..., None, None], x, 0.0)
    B, T, F, C = x.shape
    x = x.reshape(B, T, F * C)

    # --- unidirectional LSTM stack with carried (h, c)
    valid = (jnp.arange(T)[None, :] < lengths[:, None]).T     # (T, B)
    new_h, new_c = [], []
    for layer in range(enc.num_layers):
        p = params["encoder"][f"lstm{layer}_fwd"]
        xproj = ((x.astype(dtype) @ p["wih"].astype(dtype))
                 .astype(jnp.float32) + p["bias"])
        hs, h, c = _lstm_chunk(jnp.swapaxes(xproj, 0, 1),
                               p["whh"].astype(jnp.float32),
                               state.lstm_h[layer], state.lstm_c[layer],
                               valid)
        new_h.append(h)
        new_c.append(c)
        x = jnp.swapaxes(hs, 0, 1)
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        x = jnp.where(mask[..., None], x, 0.0).astype(dtype)

    # --- CTC head
    head = params["ctc_head"]
    logits = (x @ head["kernel"].astype(dtype) + head["bias"].astype(dtype)
              ).astype(jnp.float32)                       # (B, T, V)

    if state.beam is not None:
        # --- cross-chunk PREFIX BEAM: the carried BeamState (+ LMCarry for
        # RNN fusion) makes chunked decoding bitwise equal to the offline
        # beam over the full utterance, INCLUDING every LM fusion source.
        from pytorch_asr_tpu.decoding.prefix_beam import (
            beam_best, prefix_beam_continue)

        logp = jax.nn.log_softmax(logits, axis=-1)
        new_beam, new_lm_carry = prefix_beam_continue(
            state.beam, logp, lengths,
            lm_table=lm_table, lm_alpha=lm_alpha, lm_beta=lm_beta,
            hash_lm=hash_lm, rnn_lm=rnn_lm, rnn_lm_params=rnn_lm_params,
            lm_carry=state.lm_carry, lm_top_k=lm_top_k,
            ext_top_a=ext_top_a)
        toks, n_ids, _ = beam_best(new_beam)
        new_state = StreamState(conv_ctx=tuple(new_ctx), lstm_h=tuple(new_h),
                                lstm_c=tuple(new_c), prev_tok=state.prev_tok,
                                beam=new_beam, lm_carry=new_lm_carry)
        return new_state, toks, n_ids

    # --- cross-chunk greedy collapse
    best = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    vmask = jnp.arange(T)[None, :] < lengths[:, None]
    prev = jnp.concatenate([state.prev_tok[:, None], best[:, :-1]], axis=1)
    keep = (best != 0) & (best != prev) & vmask
    pos = jnp.cumsum(keep, axis=1) - 1
    n_ids = pos[:, -1] + 1
    out = jnp.zeros_like(best)
    bidx = jnp.arange(B)[:, None]
    out = out.at[bidx, jnp.where(keep, pos, T - 1)].max(
        jnp.where(keep, best, 0))
    out = jnp.where(jnp.arange(T)[None, :] < n_ids[:, None], out, 0)
    # prev carry: the LAST VALID frame's argmax (blank included); unchanged
    # if this block had no valid frames.
    last = jnp.maximum(lengths - 1, 0)
    new_prev = jnp.where(lengths > 0, best[bidx[:, 0], last], state.prev_tok)

    new_state = StreamState(conv_ctx=tuple(new_ctx), lstm_h=tuple(new_h),
                            lstm_c=tuple(new_c), prev_tok=new_prev)
    return new_state, out, n_ids


class StreamingRecognizer:
    """Batched online recognizer over a streaming-capable CTC model.

    Usage:
        rec = StreamingRecognizer(params, cfg, batch_size=B)
        for chunk in audio_chunks:          # (B, any_samples) float32
            new = rec.accept(chunk)         # list[B] of new token-id lists
        new = rec.finish()                  # drain buffered frames

    ``block_frames`` sets the jit granularity/latency: each device step
    consumes exactly that many 10 ms frames (must be a multiple of the conv
    time subsampling, default 16 frames = 160 ms).
    """

    def __init__(self, params: Any, cfg: ExperimentConfig,
                 batch_size: int, block_frames: int = 16,
                 mode: str = "greedy", lm_table=None, hash_lm=None,
                 rnn_lm=None, rnn_lm_params=None,
                 lm_alpha: float = 0.0, lm_beta: float = 0.0,
                 sos_id: int | None = None, lm_top_k: int = 0,
                 ext_top_a: int = 0):
        if mode not in ("greedy", "beam"):
            raise ValueError(f"unknown streaming mode {mode!r}")
        if mode != "beam" and (lm_table is not None or hash_lm is not None
                               or rnn_lm is not None):
            raise ValueError("LM fusion requires mode='beam'")
        self.mode = mode
        self.lm_table = lm_table
        self.hash_lm = hash_lm
        self.rnn_lm = rnn_lm
        self.rnn_lm_params = rnn_lm_params
        self.lm_alpha = float(lm_alpha)
        self.lm_beta = float(lm_beta)
        self.sos_id = sos_id
        self.lm_top_k = int(lm_top_k)
        self.ext_top_a = int(ext_top_a)
        enc = _check_streamable(cfg)
        total_stride = 1
        for _ in enc.conv_channels:
            total_stride *= enc.conv_stride[0]
        if block_frames % total_stride:
            raise ValueError(f"block_frames must be a multiple of the conv "
                             f"time subsampling ({total_stride})")
        self.params = params
        self.cfg = cfg
        self.block_frames = block_frames
        self.batch_size = batch_size
        fe = cfg.frontend
        self._need = (block_frames - 1) * fe.hop_length + fe.win_length
        self._advance = block_frames * fe.hop_length
        self.reset()

    def reset(self) -> None:
        self.state = init_stream_state(self.cfg, self.batch_size,
                                       beam=self.mode == "beam",
                                       hash_lm=self.hash_lm,
                                       rnn_lm=self.rnn_lm,
                                       rnn_lm_params=self.rnn_lm_params,
                                       sos_id=self.sos_id)
        self._buf = np.zeros((self.batch_size, 0), np.float32)
        self._finished = False
        self._best: list[list[int]] = [[] for _ in range(self.batch_size)]

    def _run_block(self, samples: np.ndarray, n_frames: int) -> list[list[int]]:
        state, ids, n = _stream_step(
            (self.cfg, self.block_frames, self.rnn_lm,
             self.lm_alpha, self.lm_beta, self.lm_top_k, self.ext_top_a),
            self.params, self.state,
            jnp.asarray(samples),
            jnp.full((self.batch_size,), n_frames, jnp.int32),
            self.lm_table, self.hash_lm, self.rnn_lm_params)
        self.state = state
        ids, n = np.asarray(ids), np.asarray(n)
        return [ids[b, :n[b]].tolist() for b in range(self.batch_size)]

    def accept(self, chunk: np.ndarray) -> list[list[int]]:
        """Feed (B, S) new samples; returns newly decoded ids per stream."""
        if self._finished:
            raise RuntimeError("stream finished; call reset()")
        chunk = np.asarray(chunk, np.float32)
        if chunk.ndim != 2 or chunk.shape[0] != self.batch_size:
            raise ValueError(f"expected ({self.batch_size}, S) chunk")
        self._buf = np.concatenate([self._buf, chunk], axis=1)
        out = [[] for b in range(self.batch_size)]
        while self._buf.shape[1] >= self._need:
            got = self._run_block(self._buf[:, :self._need],
                                  self.block_frames)
            self._buf = self._buf[:, self._advance:]
            if self.mode == "beam":
                # beam hypotheses may revise earlier output: each block
                # yields the CURRENT FULL best prefix per stream.
                self._best = got
                out = got
            else:
                for b in range(self.batch_size):
                    out[b].extend(got[b])
        return out

    def finish(self) -> list[list[int]]:
        """Drain whole frames still in the buffer (offline framing drops any
        tail shorter than one window, so we do too)."""
        if self._finished:
            return ([[] for _ in range(self.batch_size)]
                    if self.mode == "greedy" else self._best)
        self._finished = True
        fe = self.cfg.frontend
        n_samples = self._buf.shape[1]
        n_frames = max(0, (n_samples - fe.win_length) // fe.hop_length + 1)
        if n_frames == 0:
            return ([[] for _ in range(self.batch_size)]
                    if self.mode == "greedy" else self._best)
        samples = np.zeros((self.batch_size, self._need), np.float32)
        samples[:, :n_samples] = self._buf
        got = self._run_block(samples, n_frames)
        if self.mode == "beam":
            self._best = got
        return got
