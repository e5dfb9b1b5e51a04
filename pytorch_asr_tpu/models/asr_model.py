"""Top-level ASR model: frontend + encoder + CTC head (+ LAS decoder when configured).

The whole forward -- raw waveform to logits/losses -- is one XLA program
(SURVEY.md §3.1): raw audio is the only host->device transfer per step, unlike
the reference's host-side feature extraction.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_asr_tpu.configs.base import (
    BiLSTMEncoderConfig,
    FrontendConfig,
    ModelConfig,
    TCNEncoderConfig,
)
from pytorch_asr_tpu.frontend import features


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def build_encoder(model_cfg: ModelConfig, remat: bool = False):
    from pytorch_asr_tpu.models.encoder_bilstm import BiLSTMEncoder
    from pytorch_asr_tpu.models.encoder_tcn import TCNEncoder

    enc_cfg = model_cfg.encoder
    dtype = _dtype(model_cfg.compute_dtype)
    if isinstance(enc_cfg, BiLSTMEncoderConfig) or getattr(enc_cfg, "kind", "") == "bilstm":
        cls = BiLSTMEncoder
    elif isinstance(enc_cfg, TCNEncoderConfig) or getattr(enc_cfg, "kind", "") == "tcn":
        cls = TCNEncoder
    else:
        raise ValueError(f"unknown encoder config {type(enc_cfg)}")
    if remat:
        # Rematerialize encoder activations in the backward pass (trade FLOPs
        # for HBM); `train` stays a static Python bool (flax counts the module
        # itself as arg 0, so train is positional index 3).
        cls = nn.remat(cls, static_argnums=(3,))
    return cls(enc_cfg, dtype=dtype)


def encoder_output_dim(model_cfg: ModelConfig) -> int:
    enc_cfg = model_cfg.encoder
    if getattr(enc_cfg, "kind", "") == "bilstm":
        ndir = 2 if getattr(enc_cfg, "bidirectional", True) else 1
        return ndir * enc_cfg.hidden_dim
    if getattr(enc_cfg, "kind", "") == "tcn":
        return enc_cfg.channels
    raise ValueError(f"unknown encoder config {type(enc_cfg)}")


class ASRModel(nn.Module):
    """Frontend + encoder + CTC projection head (+ optional LAS decoder).

    ``__call__`` returns a dict:
      ctc_logits (B, T', V), enc (B, T', D), enc_len (B,)
      dec_logits (B, U, V) when a decoder is configured and ``targets`` given.
    """

    frontend_cfg: FrontendConfig
    model_cfg: ModelConfig
    vocab_size: int
    remat_encoder: bool = False    # cfg.train.remat_encoder (SURVEY: jax.checkpoint)

    def setup(self):
        self.encoder = build_encoder(self.model_cfg, remat=self.remat_encoder)
        dtype = _dtype(self.model_cfg.compute_dtype)
        self.ctc_head = nn.Dense(self.vocab_size, dtype=dtype, name="ctc_head")
        if self.model_cfg.decoder is not None:
            from pytorch_asr_tpu.models.las_decoder import LASDecoder

            self.las = LASDecoder(self.model_cfg.decoder, self.vocab_size,
                                  enc_dim=encoder_output_dim(self.model_cfg),
                                  dtype=dtype)

    def compute_features(self, audio: jax.Array, audio_len: jax.Array):
        from pytorch_asr_tpu.ops.runtime import pallas_active, pallas_interpret

        if self.frontend_cfg.use_pallas and pallas_active():
            from jax.sharding import PartitionSpec as P

            from pytorch_asr_tpu.ops.stft_pallas import log_mel_pallas
            from pytorch_asr_tpu.parallel.mesh import maybe_data_shard_map

            cfg, interp = self.frontend_cfg, pallas_interpret()
            fn = lambda a, n: log_mel_pallas(a, n, cfg, interpret=interp)  # noqa: E731
            fn = maybe_data_shard_map(fn, in_specs=(P("data"), P("data")),
                                      out_specs=(P("data"), P("data")))
            return fn(audio, audio_len)
        return features.log_mel(audio, audio_len, self.frontend_cfg)

    def encode(self, audio: jax.Array, audio_len: jax.Array, train: bool = False):
        if train and self.frontend_cfg.waveform_augment:
            from pytorch_asr_tpu.frontend.augment import (
                WaveformAugmentConfig, augment_waveform)

            wa_cfg = WaveformAugmentConfig(
                speed_range=self.frontend_cfg.wa_speed_range,
                gain_db_range=self.frontend_cfg.wa_gain_db,
                noise_snr_db_range=self.frontend_cfg.wa_noise_snr_db)
            audio, audio_len = augment_waveform(
                self.make_rng("dropout"), audio, audio_len, wa_cfg)
        feats, feat_len = self.compute_features(audio, audio_len)
        if train and self.frontend_cfg.specaugment:
            from pytorch_asr_tpu.frontend.specaugment import (
                SpecAugmentConfig, spec_augment)

            sa_cfg = SpecAugmentConfig(
                num_freq_masks=self.frontend_cfg.sa_freq_masks,
                freq_mask_width=self.frontend_cfg.sa_freq_width,
                num_time_masks=self.frontend_cfg.sa_time_masks,
                time_mask_fraction=self.frontend_cfg.sa_time_fraction,
                time_warp=getattr(self.frontend_cfg, "sa_time_warp", 0))
            feats = spec_augment(self.make_rng("dropout"), feats, feat_len, sa_cfg)
        enc, enc_len = self.encoder(feats, feat_len, train)
        return enc, enc_len

    def __call__(self, audio, audio_len, targets=None, target_len=None,
                 train: bool = False,
                 ss_prob: jax.Array | float = 0.0) -> dict[str, Any]:
        enc, enc_len = self.encode(audio, audio_len, train=train)
        out = {
            "enc": enc,
            "enc_len": enc_len,
            "ctc_logits": self.ctc_head(enc).astype(jnp.float32),
        }
        if self.model_cfg.decoder is not None and targets is not None:
            out["dec_logits"] = self.las(enc, enc_len, targets, target_len,
                                         train=train,
                                         ss_prob=ss_prob).astype(jnp.float32)
        return out

    def decoder_step(self, enc, enc_projed, enc_mask, y_prev, state):
        """Single autoregressive decoder step for beam search (LAS path)."""
        return self.las.step(enc, enc_projed, enc_mask, y_prev, state)

    def decoder_begin(self, enc, enc_len):
        """Precompute per-utterance decoder quantities for beam search."""
        T = enc.shape[1]
        enc_mask = jnp.arange(T)[None, :] < enc_len[:, None]
        return self.las.project_encoder(enc), enc_mask, self.las.init_state(enc, enc_len)
