"""TCN encoder: dilated temporal convolutions (SURVEY.md §2.1; BASELINE config 3).

Wav2Letter/TCN-like: an initial strided conv subsamples time, then residual
blocks of non-causal dilated 1-D convs with layer norm.  XLA maps the convs to
the MXU directly; a Pallas fused dilated-conv kernel for the hot path lives in
``pytorch_asr_tpu.ops.dilated_conv_pallas`` (enabled via cfg.use_pallas when
running on TPU).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_asr_tpu.configs.base import TCNEncoderConfig


def _mask_time(x: jax.Array, lengths: jax.Array) -> jax.Array:
    mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])[..., None]
    return jnp.where(mask, x, 0.0)


class TCNBlock(nn.Module):
    """Residual block: LN -> dilated conv -> GLU -> pointwise -> dropout -> +res."""

    channels: int
    kernel_size: int
    dilation: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool) -> jax.Array:
        res = x
        y = nn.LayerNorm(dtype=self.dtype)(x)
        # GLU: double-width conv, gate half modulates the linear half.
        y = nn.Conv(2 * self.channels, kernel_size=(self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    dtype=self.dtype)(y)
        lin, gate = jnp.split(y, 2, axis=-1)
        y = lin * jax.nn.sigmoid(gate)
        y = nn.Conv(self.channels, kernel_size=(1,), dtype=self.dtype)(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return _mask_time(res + y, lengths)


class TCNEncoder(nn.Module):
    """(B, T, n_mels) -> (B, T/subsample, channels) frame encodings."""

    cfg: TCNEncoderConfig
    dtype: Any = jnp.float32

    def subsampled_len(self, feat_len: jax.Array) -> jax.Array:
        from pytorch_asr_tpu.models.encoder_bilstm import conv_out_len

        return conv_out_len(feat_len, 2 * self.cfg.subsample, self.cfg.subsample)

    @nn.compact
    def __call__(self, feats: jax.Array, feat_len: jax.Array,
                 train: bool = False):
        c = self.cfg
        k = 2 * c.subsample
        p = (k - 1) // 2
        x = feats.astype(self.dtype)
        # Fixed symmetric padding: length-invariant valid outputs (see conv_out_len).
        x = nn.Conv(c.channels, kernel_size=(k,),
                    strides=(c.subsample,), padding=((p, p),), dtype=self.dtype)(x)
        x = nn.relu(x)
        lengths = self.subsampled_len(feat_len)
        x = _mask_time(x, lengths)
        for i in range(c.num_blocks):
            dilation = c.dilation_cycle[i % len(c.dilation_cycle)]
            x = TCNBlock(c.channels, c.kernel_size, dilation, c.dropout,
                         self.dtype, name=f"block{i}")(x, lengths, train)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return _mask_time(x, lengths), lengths
