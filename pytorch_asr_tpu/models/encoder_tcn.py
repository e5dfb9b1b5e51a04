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
    """Residual block: LN -> dilated conv -> GLU -> pointwise -> dropout -> +res.

    Parameters are explicit arrays so the XLA path (training, autodiff) and the
    fused Pallas kernel (inference hot path, ops/dilated_conv_pallas.py) share
    identical weights.
    """

    channels: int
    kernel_size: int
    dilation: int
    dropout: float
    dtype: Any = jnp.float32
    use_pallas: bool = False

    def setup(self):
        C, K = self.channels, self.kernel_size
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        self.ln_scale = self.param("ln_scale", nn.initializers.ones, (C,), jnp.float32)
        self.ln_bias = self.param("ln_bias", zeros, (C,), jnp.float32)
        self.w_conv = self.param("w_conv", init, (K, C, 2 * C), jnp.float32)
        self.b_conv = self.param("b_conv", zeros, (2 * C,), jnp.float32)
        self.w_point = self.param("w_point", init, (C, C), jnp.float32)
        self.b_point = self.param("b_point", zeros, (C,), jnp.float32)
        # Submodules must be created in setup() for setup-style modules;
        # constructing Dropout inside _xla_path raised AssignSubModuleError
        # the moment dropout > 0 (i.e. config-3 training was broken).
        self.drop = nn.Dropout(self.dropout)

    def _xla_path(self, x: jax.Array, train: bool) -> jax.Array:
        dt = self.dtype
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + 1e-6) * self.ln_scale + self.ln_bias
        y = jax.lax.conv_general_dilated(
            y.astype(dt), self.w_conv.astype(dt), window_strides=(1,),
            padding="SAME", rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + self.b_conv.astype(dt)
        lin, gate = jnp.split(y, 2, axis=-1)
        y = lin * jax.nn.sigmoid(gate)
        y = y @ self.w_point.astype(dt) + self.b_point.astype(dt)
        if self.dropout > 0:
            y = self.drop(y, deterministic=not train)
        return y

    def _tp_pallas(self, x: jax.Array, lengths: jax.Array, train: bool,
                   mesh, m: int) -> jax.Array:
        """Tensor-parallel fused-Pallas block (VERDICT r2 item 7).

        The conv pair has no per-step recurrence, so the fast path survives
        ANY model-axis size that divides C: each model shard runs the fused
        body kernel on a GLU-PAIR-AWARE weight slice — (K, C, 2C/m) dilated
        channels paired as [lin_k | gate_k] plus the matching (C/m, C)
        pointwise rows — and partial outputs psum over 'model' (one
        (B_local, T, C) collective per block, outside the kernel).  Weights
        stay replicated at rest (DIRECTION_TP_RULES precedent); the slice is
        a local, free reshard inside shard_map.  Inference reuses the
        body-only train kernel (the fused-residual inference kernel can't
        psum: each shard would re-add x).
        """
        from jax.sharding import PartitionSpec as P

        from pytorch_asr_tpu.ops.dilated_conv_pallas import tcn_block_train

        C = self.channels
        cm = C // m
        dilation = self.dilation

        def fn(x_, s, b, wc, bc, wp, bp):
            k = jax.lax.axis_index("model")
            wc_l = jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(wc, k * cm, cm, axis=2),
                jax.lax.dynamic_slice_in_dim(wc, C + k * cm, cm, axis=2),
            ], axis=2)
            bc_l = jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(bc, k * cm, cm, axis=0),
                jax.lax.dynamic_slice_in_dim(bc, C + k * cm, cm, axis=0),
            ], axis=0)
            wp_l = jax.lax.dynamic_slice_in_dim(wp, k * cm, cm, axis=0)
            # b_point enters once per shard -> scale by 1/m so the psum
            # restores it exactly.
            y = tcn_block_train(x_, s, b, wc_l, bc_l, wp_l, bp / m, dilation)
            return jax.lax.psum(y, "model")

        fn = jax.shard_map(fn, mesh=mesh,
                           in_specs=(P("data"),) + (P(),) * 6,
                           out_specs=P("data"), check_vma=False)
        y = fn(x.astype(jnp.float32), self.ln_scale, self.ln_bias,
               self.w_conv, self.b_conv, self.w_point, self.b_point)
        if train and self.dropout > 0:
            y = self.drop(y, deterministic=False)
        return _mask_time(x + y.astype(x.dtype), lengths)

    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool) -> jax.Array:
        from pytorch_asr_tpu.ops.runtime import pallas_active, pallas_interpret

        if self.use_pallas and pallas_active():
            from pytorch_asr_tpu.parallel.mesh import active_mesh

            mesh = active_mesh()
            m = int(mesh.shape.get("model", 1)) if mesh is not None else 1
            if m > 1 and self.channels % m == 0:
                return self._tp_pallas(x, lengths, train, mesh, m)
        if self.use_pallas and train and pallas_active():
            # Fused train-path kernel with custom VJP (ops/dilated_conv_pallas
            # .py::tcn_block_train): computes the pre-residual block body so
            # dropout + residual + masking compose outside, exactly like
            # _xla_path.
            from jax.sharding import PartitionSpec as P

            from pytorch_asr_tpu.ops.dilated_conv_pallas import tcn_block_train
            from pytorch_asr_tpu.parallel.mesh import maybe_data_shard_map

            dilation = self.dilation
            fn = lambda x_, *w: tcn_block_train(x_, *w, dilation)  # noqa: E731
            fn = maybe_data_shard_map(fn, in_specs=(P("data"),) + (P(),) * 6,
                                      out_specs=P("data"))
            y = fn(x.astype(jnp.float32), self.ln_scale, self.ln_bias,
                   self.w_conv, self.b_conv, self.w_point, self.b_point)
            if self.dropout > 0:
                y = self.drop(y, deterministic=False)
            return _mask_time(x + y.astype(x.dtype), lengths)
        if self.use_pallas and not train and pallas_active():
            from jax.sharding import PartitionSpec as P

            from pytorch_asr_tpu.ops.dilated_conv_pallas import tcn_block_pallas
            from pytorch_asr_tpu.parallel.mesh import maybe_data_shard_map

            dilation, interp = self.dilation, pallas_interpret()
            fn = lambda x_, *w: tcn_block_pallas(  # noqa: E731
                x_, *w, dilation=dilation, interpret=interp)
            fn = maybe_data_shard_map(fn, in_specs=(P("data"),) + (P(),) * 6,
                                      out_specs=P("data"))
            out = fn(x.astype(jnp.float32), self.ln_scale, self.ln_bias,
                     self.w_conv, self.b_conv, self.w_point,
                     self.b_point).astype(x.dtype)
            return _mask_time(out, lengths)
        y = self._xla_path(x.astype(jnp.float32), train)
        return _mask_time(x + y.astype(x.dtype), lengths)


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
                         self.dtype, use_pallas=c.use_pallas,
                         name=f"block{i}")(x, lengths, train)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return _mask_time(x, lengths), lengths
