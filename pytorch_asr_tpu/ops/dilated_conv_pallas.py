"""Pallas fused dilated-conv TCN block (SURVEY.md §2.1 'TCN encoder' row).

Fuses a whole TCN residual block -- LayerNorm -> dilated conv (K taps) -> GLU
-> pointwise conv -> residual -- into ONE kernel pass, so the intermediate
(T, 2C) activations never round-trip HBM.  The dilated conv is expressed as K
shifted MXU matmuls over time blocks:

  * grid (B, T/Tb); each invocation DMAs its (Tb + 2*halo, C) slice of the
    flattened (B*(Tp+2*halo), C) input from HBM (flattening keeps the DMA a
    plain sublane-aligned 2-D slice);
  * LayerNorm in fp32, rows outside the real utterance zeroed (matching XLA
    conv's zero padding semantics);
  * tap k = sublane roll by halo+(k-K//2)*d then an aligned (Tb, C) slice,
    accumulated into the (Tb, 2C) GLU pre-activation on the MXU.

Used on the inference/decode hot path (BASELINE: beam-decode RTF); training
uses the XLA conv path (autodiff).  Parity: tests vs models.encoder_tcn.TCNBlock.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 32          # supports dilation*(K//2) <= 32 (K=5, d<=16)
T_BLOCK = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tcn_block_kernel(x_ref, ln_scale_ref, ln_bias_ref, w_conv_ref, b_conv_ref,
                      w_point_ref, b_point_ref, out_ref,
                      xblk_ref, sem,
                      *, ksize: int, dilation: int, t_real: int, t_pad: int,
                      tb: int, eps: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    C = xblk_ref.shape[1]
    span = tb + 2 * HALO
    row_base = b * (t_pad + 2 * HALO) + i * tb
    dma = pltpu.make_async_copy(
        x_ref.at[pl.ds(row_base, span), :], xblk_ref, sem)
    dma.start()
    dma.wait()

    x = xblk_ref[:]                                     # (span, C)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale_ref[0][None, :] + ln_bias_ref[0][None, :]
    # Zero rows outside the real utterance so conv taps see zero padding
    # (LayerNorm turns zero-padded rows into ln_bias otherwise).
    row = jax.lax.broadcasted_iota(jnp.int32, (span, 1), 0)
    abs_t = i * tb + row - HALO
    xn = jnp.where((abs_t >= 0) & (abs_t < t_real), xn, 0.0)

    acc = jnp.zeros((tb, w_conv_ref.shape[2]), jnp.float32)
    half = ksize // 2
    for k in range(ksize):
        shift = (k - half) * dilation                   # tap at x[t + shift]
        # rows [HALO+shift : HALO+shift+tb] -- realized as a roll so the final
        # static slice offset stays sublane-tile aligned.
        xs = pltpu.roll(xn, (span - shift) % span, 0)[HALO : HALO + tb]
        acc += jnp.dot(xs, w_conv_ref[k], preferred_element_type=jnp.float32)
    acc = acc + b_conv_ref[0][None, :]
    lin, gate = jnp.split(acc, 2, axis=1)
    y = lin * jax.nn.sigmoid(gate)
    y = jnp.dot(y, w_point_ref[:], preferred_element_type=jnp.float32)
    y = y + b_point_ref[0][None, :]
    out_ref[0] = x[HALO : HALO + tb] + y


def tcn_block_pallas(
    x: jax.Array,             # (B, T, C)
    ln_scale: jax.Array,      # (C,)
    ln_bias: jax.Array,       # (C,)
    w_conv: jax.Array,        # (K, C, 2C)
    b_conv: jax.Array,        # (2C,)
    w_point: jax.Array,       # (C, C)
    b_point: jax.Array,       # (C,)
    dilation: int,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """Fused TCN residual block forward.  Caller masks padded frames."""
    B, T, C = x.shape
    K = w_conv.shape[0]
    if dilation * (K // 2) > HALO:
        raise ValueError(f"dilation {dilation} x half-kernel {K//2} exceeds halo {HALO}")
    tb = T_BLOCK
    t_pad = _round_up(T, tb)
    # Pad every row with HALO zeros both sides, flatten to 2-D for clean DMAs.
    x_p = jnp.pad(x.astype(jnp.float32),
                  ((0, 0), (HALO, t_pad - T + HALO), (0, 0)))
    x_flat = x_p.reshape(B * (t_pad + 2 * HALO), C)

    kern = functools.partial(_tcn_block_kernel, ksize=K, dilation=dilation,
                             t_real=T, t_pad=t_pad, tb=tb, eps=eps)
    out = pl.pallas_call(
        kern,
        grid=(B, t_pad // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),      # x_flat stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # ln_scale (1, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # ln_bias (1, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w_conv (K, C, 2C)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b_conv (1, 2C)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w_point (C, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b_point (1, C)
        ],
        out_specs=pl.BlockSpec((1, tb, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tb + 2 * HALO, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_flat, ln_scale[None], ln_bias[None], w_conv, b_conv[None],
      w_point, b_point[None])
    return out[:, :T]
