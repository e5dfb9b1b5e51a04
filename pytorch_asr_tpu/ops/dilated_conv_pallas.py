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

``tcn_block_pallas`` serves the inference/decode hot path (BASELINE:
beam-decode RTF); ``tcn_block_train`` (below) serves TRAINING with a fused
custom-VJP Pallas backward — both parity-tested vs models.encoder_tcn.TCNBlock
(values and grads, incl. block-boundary halos).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_asr_tpu.ops.runtime import pallas_interpret

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


# --------------------------------------------------------------- train path
# The inference kernel fuses the residual add; training needs dropout between
# the pointwise conv and the residual, so the TRAIN primitive computes only
# the block body y = P(GLU(conv(LN(x)))) and the model composes
# out = x + dropout(y).  Custom VJP (VERDICT r1 item 6 / SURVEY.md:121):
#
#   * forward: the fused kernel, additionally streaming the normalized xn
#     rows to HBM -- the only residual the backward needs besides x
#     (XLA autodiff of the unfused path saves the (T, 2C) GLU
#     pre-activations AND the (T, C) pointwise input);
#   * backward: one Pallas pass re-deriving the GLU tensors from xn (two
#     extra MXU matmuls instead of 3x HBM residual traffic), producing
#     dW/db exactly and per-block d(xn) slabs; the halo overlap-add and the
#     (cheap, fusable) LayerNorm backward run in XLA.


def _tcn_fwd_train_kernel(x_ref, ln_scale_ref, ln_bias_ref, w_conv_ref,
                          b_conv_ref, w_point_ref, b_point_ref,
                          y_ref, xn_ref, xblk_ref, sem,
                          *, ksize: int, dilation: int, t_real: int,
                          t_pad: int, tb: int, eps: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    C = xblk_ref.shape[1]
    span = tb + 2 * HALO
    row_base = b * (t_pad + 2 * HALO) + i * tb
    dma = pltpu.make_async_copy(
        x_ref.at[pl.ds(row_base, span), :], xblk_ref, sem)
    dma.start()
    dma.wait()

    x = xblk_ref[:]
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale_ref[0][None, :] + ln_bias_ref[0][None, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (span, 1), 0)
    abs_t = i * tb + row - HALO
    xn = jnp.where((abs_t >= 0) & (abs_t < t_real), xn, 0.0)
    xn_ref[0] = xn[HALO : HALO + tb]

    acc = jnp.zeros((tb, w_conv_ref.shape[2]), jnp.float32)
    half = ksize // 2
    for k in range(ksize):
        shift = (k - half) * dilation
        xs = pltpu.roll(xn, (span - shift) % span, 0)[HALO : HALO + tb]
        acc += jnp.dot(xs, w_conv_ref[k], preferred_element_type=jnp.float32)
    acc = acc + b_conv_ref[0][None, :]
    lin, gate = jnp.split(acc, 2, axis=1)
    y = lin * jax.nn.sigmoid(gate)
    y = jnp.dot(y, w_point_ref[:], preferred_element_type=jnp.float32)
    y_ref[0] = y + b_point_ref[0][None, :]


def _tcn_bwd_kernel(xn_ref, dy_ref, w_conv_ref, b_conv_ref, w_point_t_ref,
                    dxn_ref, dwc_ref, dbc_ref, dwp_ref, dbp_ref,
                    xnblk_ref, slab_sc, dwc_sc, dbc_sc, dwp_sc, dbp_sc, sem,
                    *, ksize: int, dilation: int, t_real: int, t_pad: int,
                    tb: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb_t = pl.num_programs(1)
    C = xnblk_ref.shape[1]
    span = tb + 2 * HALO
    first = (b == 0) & (i == 0)
    last = (b == pl.num_programs(0) - 1) & (i == nb_t - 1)

    @pl.when(first)
    def _():
        dwc_sc[:] = jnp.zeros(dwc_sc.shape, jnp.float32)
        dbc_sc[:] = jnp.zeros(dbc_sc.shape, jnp.float32)
        dwp_sc[:] = jnp.zeros(dwp_sc.shape, jnp.float32)
        dbp_sc[:] = jnp.zeros(dbp_sc.shape, jnp.float32)

    row_base = b * (t_pad + 2 * HALO) + i * tb
    dma = pltpu.make_async_copy(
        xn_ref.at[pl.ds(row_base, span), :], xnblk_ref, sem)
    dma.start()
    dma.wait()
    xn = xnblk_ref[:]                                   # (span, C), halo'd

    # Recompute the GLU tensors for this block's tb rows (MXU, no residuals).
    acc = jnp.zeros((tb, w_conv_ref.shape[2]), jnp.float32)
    half = ksize // 2
    xs_list = []
    for k in range(ksize):
        shift = (k - half) * dilation
        xs = pltpu.roll(xn, (span - shift) % span, 0)[HALO : HALO + tb]
        xs_list.append(xs)
        acc += jnp.dot(xs, w_conv_ref[k], preferred_element_type=jnp.float32)
    acc = acc + b_conv_ref[0][None, :]
    lin, gate = jnp.split(acc, 2, axis=1)
    sg = jax.nn.sigmoid(gate)
    glu = lin * sg

    dy = dy_ref[0].astype(jnp.float32)                  # (tb, C)
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0)
    dy = jnp.where(i * tb + row < t_real, dy, 0.0)

    dwp_sc[:] += jnp.dot(glu.T, dy, preferred_element_type=jnp.float32)
    dbp_sc[:] += dy.sum(axis=0)[None, :]
    dglu = jnp.dot(dy, w_point_t_ref[:], preferred_element_type=jnp.float32)
    dlin = dglu * sg
    dgate = dglu * lin * sg * (1.0 - sg)
    dacc = jnp.concatenate([dlin, dgate], axis=1)       # (tb, 2C)

    dbc_sc[:] += dacc.sum(axis=0)[None, :]
    slab_sc[:] = jnp.zeros((span, C), jnp.float32)
    for k in range(ksize):
        shift = (k - half) * dilation
        dwc_sc[k] += jnp.dot(xs_list[k].T, dacc,
                             preferred_element_type=jnp.float32)
        # conv transpose: dacc at row t contributes to xn row t + shift
        slab_sc[HALO + shift : HALO + shift + tb] += jnp.dot(
            dacc, w_conv_ref[k].T, preferred_element_type=jnp.float32)
    dxn_ref[0, 0] = slab_sc[:]

    @pl.when(last)
    def _():
        dwc_ref[:] = dwc_sc[:]
        dbc_ref[:] = dbc_sc[:]
        dwp_ref[:] = dwp_sc[:]
        dbp_ref[:] = dbp_sc[:]


def _train_fwd_impl(x, ln_scale, ln_bias, w_conv, b_conv, w_point, b_point,
                    dilation, eps, interpret):
    B, T, C = x.shape
    K = w_conv.shape[0]
    if dilation * (K // 2) > HALO:
        raise ValueError(f"dilation {dilation} x half-kernel {K//2} exceeds halo {HALO}")
    tb = T_BLOCK
    t_pad = _round_up(T, tb)
    x_p = jnp.pad(x.astype(jnp.float32),
                  ((0, 0), (HALO, t_pad - T + HALO), (0, 0)))
    x_flat = x_p.reshape(B * (t_pad + 2 * HALO), C)
    kern = functools.partial(_tcn_fwd_train_kernel, ksize=K, dilation=dilation,
                             t_real=T, t_pad=t_pad, tb=tb, eps=eps)
    y, xn = pl.pallas_call(
        kern,
        grid=(B, t_pad // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tb, C), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, t_pad, C), jnp.float32),
            jax.ShapeDtypeStruct((B, t_pad, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb + 2 * HALO, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_flat, ln_scale[None], ln_bias[None], w_conv, b_conv[None],
      w_point, b_point[None])
    return y[:, :T], xn


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def tcn_block_train(x, ln_scale, ln_bias, w_conv, b_conv, w_point, b_point,
                    dilation: int, eps: float = 1e-6):
    """Training-path fused TCN block body: y = P(GLU(conv(LN(x)))).

    Returns the PRE-residual output (the model adds dropout + x + masking).
    Differentiable in all 7 array inputs via the fused Pallas backward.
    """
    y, _ = _train_fwd_impl(x, ln_scale, ln_bias, w_conv, b_conv, w_point,
                           b_point, dilation, eps, pallas_interpret())
    return y


def _train_vjp_fwd(x, ln_scale, ln_bias, w_conv, b_conv, w_point, b_point,
                   dilation, eps):
    y, xn = _train_fwd_impl(x, ln_scale, ln_bias, w_conv, b_conv, w_point,
                            b_point, dilation, eps, pallas_interpret())
    return y, (x, xn, ln_scale, w_conv, b_conv, w_point)


def _train_vjp_bwd(dilation, eps, res, dy):
    x, xn, ln_scale, w_conv, b_conv, w_point = res
    B, T, C = x.shape
    K = w_conv.shape[0]
    # Conv-out / pointwise-in channel counts come from the WEIGHTS, not 2*C:
    # under tensor parallelism each model shard holds a GLU-pair-aware slice
    # (K, C, 2C/m) + (C/m, C) of the block weights (encoder_tcn.py TP path).
    CO = w_conv.shape[2]
    CP = w_point.shape[0]
    tb = T_BLOCK
    t_pad = _round_up(T, tb)
    nblk = t_pad // tb
    span = tb + 2 * HALO
    xn_p = jnp.pad(xn, ((0, 0), (HALO, HALO), (0, 0)))
    xn_flat = xn_p.reshape(B * (t_pad + 2 * HALO), C)
    dy_p = jnp.pad(dy.astype(jnp.float32), ((0, 0), (0, t_pad - T), (0, 0)))

    kern = functools.partial(_tcn_bwd_kernel, ksize=K, dilation=dilation,
                             t_real=T, t_pad=t_pad, tb=tb)
    dxn_slabs, dwc, dbc, dwp, dbp = pl.pallas_call(
        kern,
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),              # xn_flat
            pl.BlockSpec((1, tb, C), lambda b, i: (b, i, 0)),  # dy
            pl.BlockSpec(memory_space=pltpu.VMEM),             # w_conv
            pl.BlockSpec(memory_space=pltpu.VMEM),             # b_conv
            pl.BlockSpec(memory_space=pltpu.VMEM),             # w_point^T
        ],
        out_specs=[
            pl.BlockSpec((1, 1, span, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((K, C, CO), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, CO), lambda b, i: (0, 0)),
            pl.BlockSpec((CP, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nblk, span, C), jnp.float32),
            jax.ShapeDtypeStruct((K, C, CO), jnp.float32),
            jax.ShapeDtypeStruct((1, CO), jnp.float32),
            jax.ShapeDtypeStruct((CP, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((span, C), jnp.float32),                # xn slab
            pltpu.VMEM((span, C), jnp.float32),                # dxn slab
            pltpu.VMEM((K, C, CO), jnp.float32),               # dWc accum
            pltpu.VMEM((1, CO), jnp.float32),                  # dbc accum
            pltpu.VMEM((CP, C), jnp.float32),                  # dWp accum
            pltpu.VMEM((1, C), jnp.float32),                   # dbp accum
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=pallas_interpret(),
    )(xn_flat, dy_p, w_conv, b_conv[None], w_point.T)

    # Overlap-add the halo'd per-block d(xn) slabs (adjacent blocks only).
    dxn_full = jnp.zeros((B, t_pad + 2 * HALO, C), jnp.float32)
    for i in range(nblk):
        dxn_full = jax.lax.dynamic_update_slice(
            dxn_full,
            jax.lax.dynamic_slice(
                dxn_full, (0, i * tb, 0), (B, span, C)) + dxn_slabs[:, i],
            (0, i * tb, 0))
    dxn = dxn_full[:, HALO : HALO + T]

    # LayerNorm backward in XLA (row reductions over C fuse into one pass).
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    dln_scale = jnp.sum(dxn * xhat, axis=(0, 1))
    dln_bias = jnp.sum(dxn, axis=(0, 1))
    dxhat = dxn * ln_scale.astype(jnp.float32)
    dx = rstd * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return (dx.astype(x.dtype), dln_scale, dln_bias, dwc,
            dbc.reshape(b_conv.shape), dwp, dbp.reshape(-1))


tcn_block_train.defvjp(_train_vjp_fwd, _train_vjp_bwd)
