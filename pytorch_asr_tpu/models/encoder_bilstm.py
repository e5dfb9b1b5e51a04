"""conv+BiLSTM encoder (SURVEY.md §2.1; BASELINE config 1, DeepSpeech2-like).

The reference realization is cuDNN ``nn.Conv2d`` + ``nn.LSTM``; the TPU-native
design instead:

  * 2-D conv subsampling (time x freq stride) -> time/4, mapped to the MXU by XLA.
  * LSTM layers where the input projection for ALL timesteps is one large matmul
    (B*T, D) @ (D, 4H) -- MXU-friendly -- and only the (B, H) @ (H, 4H) hidden
    recurrence runs inside ``jax.lax.scan`` (SURVEY.md §7.3 'BiLSTM throughput').
  * Bidirectionality via a flipped scan with start-masked carries, so padded
    positions never contaminate state.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_asr_tpu.configs.base import BiLSTMEncoderConfig


def _lstm_scan(xproj: jax.Array, whh: jax.Array, valid: jax.Array,
               carry_dtype=jnp.float32, reverse: bool = False) -> jax.Array:
    """Run an LSTM over time.

    Args:
      xproj: (T, B, 4H) precomputed input projection (+bias).
      whh:   (H, 4H) hidden-to-hidden weights.
      valid: (T, B) bool; where False the carry passes through unchanged.
      reverse: walk t = T-1..0 via lax.scan(reverse=True).  Deliberately
        flip-free: jnp.flip on the projected inputs lets XLA fuse the flip
        into the projection matmul, changing its bf16 accumulation order by
        ulps -- which 100+ recurrence steps amplify to O(1) output changes
        (measured on v5e; the Pallas kernel is bit-exact vs THIS formulation
        in both directions).
    Returns: (T, B, H) hidden states in natural time order.
    """
    T, B, H4 = xproj.shape
    H = H4 // 4
    h0 = jnp.zeros((B, H), dtype=carry_dtype)
    c0 = jnp.zeros((B, H), dtype=carry_dtype)

    def cell(carry, inp):
        h, c = carry
        x_t, valid_t = inp
        gates = x_t.astype(carry_dtype) + h @ whh.astype(carry_dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = valid_t[:, None]
        h_new = jnp.where(m, h_new, h)
        c_new = jnp.where(m, c_new, c)
        return (h_new, c_new), h_new

    _, hs = jax.lax.scan(cell, (h0, c0), (xproj, valid), reverse=reverse)
    return hs


class LSTMDirection(nn.Module):
    """One direction of a BiLSTM layer.

    On TPU the recurrence runs in the fused Pallas sequence kernel
    (ops/lstm_pallas.py, custom VJP); elsewhere a lax.scan cell.  Both share
    the same weights and the big (B*T, D)@(D, 4H) input projection.
    """

    hidden_dim: int
    reverse: bool
    dtype: Any = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array,
                 return_params: bool = False):
        B, T, D = x.shape
        H = self.hidden_dim
        wih = self.param("wih", nn.initializers.xavier_uniform(), (D, 4 * H), jnp.float32)
        whh = self.param("whh", nn.initializers.orthogonal(), (H, 4 * H), jnp.float32)
        # Forget-gate bias 1.0 (standard LSTM training stabilizer).
        b = self.param("bias", _lstm_bias_init, (4 * H,), jnp.float32)
        if return_params:
            # Direction-sharded TP (see _bilstm_tp_directions) computes both
            # directions in ONE shard_map; this call only materializes the
            # parameters under their canonical paths (checkpoint/torch-import
            # layout is unchanged).
            return wih, whh, b

        from pytorch_asr_tpu.ops.runtime import pallas_active

        if self.use_pallas and pallas_active():
            # Fully-fused kernel: input projection + recurrence in one Pallas
            # program, in-kernel direction reversal AND window masking, output
            # already in compute dtype (ops/lstm_pallas.py).  On a multi-device
            # mesh the call runs per-data-shard under shard_map (pallas_call
            # is opaque to GSPMD); weight grads psum through the transpose.
            from jax.sharding import PartitionSpec as P

            from pytorch_asr_tpu.ops.lstm_pallas import lstm_seq
            from pytorch_asr_tpu.parallel.mesh import maybe_data_shard_map

            reverse, dt = self.reverse, jnp.dtype(self.dtype)
            fn = lambda x_, wih_, whh_, b_, len_: lstm_seq(  # noqa: E731
                x_, wih_, whh_, b_, len_, reverse, dt)
            fn = maybe_data_shard_map(
                fn, in_specs=(P("data"), P(), P(), P(), P("data")),
                out_specs=P("data"))
            return fn(x.astype(self.dtype), wih.astype(self.dtype),
                      whh, b, lengths)                         # (B, T, H)
        else:
            xproj = (x.astype(self.dtype) @ wih.astype(self.dtype)
                     ).astype(jnp.float32) + b
            xproj = jnp.swapaxes(xproj, 0, 1)                  # (T, B, 4H)
            # Both directions share the [0, len) window; the reverse
            # direction runs the scan itself backwards (no flips -- see
            # _lstm_scan's docstring for why flips are numerically unsafe).
            valid = jnp.arange(T)[:, None] < lengths[None, :]
            hs = _lstm_scan(xproj, whh, valid, reverse=self.reverse)
            out = jnp.swapaxes(hs, 0, 1)                       # (B, T, H)
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        return jnp.where(mask, out, 0.0).astype(self.dtype)


def _bilstm_tp_directions(x, params_fwd, params_bwd, lengths, mesh, dt):
    """Direction-sharded tensor parallelism for one BiLSTM layer.

    The gate-dim TP layout (parallel/sharding.py RULES) cannot host the fused
    Pallas kernel: the recurrence needs the full (H, 4H) weights each step, so
    sharding 4H forces per-step collectives.  A BiLSTM has a better axis — the
    two DIRECTIONS are fully independent over the whole sequence.  With mesh
    model axis == 2, model shard 0 runs the forward kernel and shard 1 the
    reverse kernel, each over its local 'data' batch shard; the outputs
    concatenate over the hidden dim sharded on 'model' (fwd = columns [0, H),
    matching ``concatenate([fwd, bwd], -1)``).  Communication: GSPMD
    all-gathers the (B, T, 2H) layer output once at the next layer's input —
    zero exchanges inside the recurrence.  Weight tensors stay replicated at
    rest (they are small; activations and compute are what shard).

    Gradients flow through the shard_map transpose: dx psums over 'model'
    (dx_fwd + dx_bwd), weight cotangents land per-direction.
    """
    from jax.sharding import PartitionSpec as P

    from pytorch_asr_tpu.ops.lstm_pallas import lstm_seq

    wih = jnp.stack([params_fwd[0].astype(dt), params_bwd[0].astype(dt)])
    whh = jnp.stack([params_fwd[1], params_bwd[1]])
    bias = jnp.stack([params_fwd[2], params_bwd[2]])

    def body(xb, W, U, bv, lenb):
        run = lambda rev: lstm_seq(xb, W[0], U[0], bv[0], lenb, rev, dt)  # noqa: E731
        return jax.lax.cond(jax.lax.axis_index("model") == 0,
                            lambda: run(False), lambda: run(True))

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data"), P("model"), P("model"), P("model"), P("data")),
        out_specs=P("data", None, "model"), check_vma=False)
    return fn(x.astype(dt), wih, whh, bias, lengths)


def _lstm_bias_init(key, shape, dtype=jnp.float32):
    H = shape[0] // 4
    b = jnp.zeros(shape, dtype)
    return b.at[H : 2 * H].set(1.0)


def conv_out_len(length, kernel: int, stride: int):
    """Valid output length for a strided conv with fixed symmetric padding.

    flax's "SAME" splits padding based on the padded input length, which makes
    outputs depend on how much trailing padding a batch carries.  We instead pad
    a fixed p = (kernel-1)//2 on both sides, so valid positions are invariant to
    padding (tested by test_encoder_padding_invariance).
    """
    p = (kernel - 1) // 2
    return jnp.maximum((length + 2 * p - kernel) // stride + 1, 0)


def conv_out_len_causal(length, kernel: int, stride: int):
    """Output length for left-only (causal) padding of kernel-1 frames.

    Padded length = length + (kernel-1); out = (length-1)//stride + 1, i.e.
    ceil(length/stride) -- output t consumes inputs <= t*stride only, which is
    what lets decoding/streaming.py carry exact conv state across chunks.
    """
    return jnp.maximum(jnp.where(length > 0, (length - 1) // stride + 1, 0), 0)


class ConvSubsampler(nn.Module):
    """Strided 2-D conv stack over (time, freq); reduces time by prod(strides).

    Stays on XLA's native conv: an im2col+matmul rewrite was measured 10x
    SLOWER on v5e (strided-slice patch extraction dominates; 16 ms vs 1.6 ms
    fwd at B=64), so nn.Conv it is.
    """

    cfg: BiLSTMEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, feat_len: jax.Array):
        x = feats[..., None].astype(self.dtype)                # (B, T, F, 1)
        lengths = feat_len
        kt, kf = self.cfg.conv_kernel
        pt, pf = (kt - 1) // 2, (kf - 1) // 2
        causal = getattr(self.cfg, "causal_conv", False)
        tpad = (kt - 1, 0) if causal else (pt, pt)
        for i, ch in enumerate(self.cfg.conv_channels):
            x = nn.Conv(ch, kernel_size=self.cfg.conv_kernel,
                        strides=self.cfg.conv_stride,
                        padding=(tpad, (pf, pf)),
                        dtype=self.dtype, name=f"Conv_{i}")(x)
            x = nn.relu(x)
            if causal:
                lengths = conv_out_len_causal(lengths, kt,
                                              self.cfg.conv_stride[0])
            else:
                lengths = conv_out_len(lengths, kt, self.cfg.conv_stride[0])
            # Re-mask every layer: conv bias + relu make padded frames nonzero,
            # and the next strided conv would read them.
            mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])
            x = jnp.where(mask[..., None, None], x, 0.0)
        B, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        return x, lengths


class BiLSTMEncoder(nn.Module):
    """conv subsampling + stacked BiLSTM; returns (B, T', 2H) states + lengths."""

    cfg: BiLSTMEncoderConfig
    dtype: Any = jnp.float32

    def subsampled_len(self, feat_len: jax.Array) -> jax.Array:
        lengths = feat_len
        out_len = (conv_out_len_causal
                   if getattr(self.cfg, "causal_conv", False) else conv_out_len)
        for _ in self.cfg.conv_channels:
            lengths = out_len(lengths, self.cfg.conv_kernel[0],
                              self.cfg.conv_stride[0])
        return lengths

    @nn.compact
    def __call__(self, feats: jax.Array, feat_len: jax.Array,
                 train: bool = False):
        x, lengths = ConvSubsampler(self.cfg, self.dtype)(feats, feat_len)
        H = self.cfg.hidden_dim
        use_pallas = getattr(self.cfg, "use_pallas", True)
        bidi = getattr(self.cfg, "bidirectional", True)
        from pytorch_asr_tpu.ops.runtime import pallas_active
        from pytorch_asr_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        pallas_on = use_pallas and pallas_active()
        tp_dirs = (getattr(self.cfg, "tp_directions", False) and bidi
                   and pallas_on and mesh is not None
                   and mesh.shape.get("model", 1) == 2)
        for layer in range(self.cfg.num_layers):
            fwd_mod = LSTMDirection(H, reverse=False, dtype=self.dtype,
                                    use_pallas=use_pallas,
                                    name=f"lstm{layer}_fwd")
            if tp_dirs:
                pf = fwd_mod(x, lengths, return_params=True)
                pb = LSTMDirection(H, reverse=True, dtype=self.dtype,
                                   use_pallas=use_pallas,
                                   name=f"lstm{layer}_bwd")(
                                       x, lengths, return_params=True)
                x = _bilstm_tp_directions(x, pf, pb, lengths, mesh,
                                          jnp.dtype(self.dtype))
            elif bidi:
                fwd = fwd_mod(x, lengths)
                bwd = LSTMDirection(H, reverse=True, dtype=self.dtype,
                                    use_pallas=use_pallas,
                                    name=f"lstm{layer}_bwd")(x, lengths)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd_mod(x, lengths)
            if self.cfg.dropout > 0:
                x = nn.Dropout(self.cfg.dropout, deterministic=not train)(x)
        return x, lengths
