"""Fused Pallas TCN block parity vs the flax TCNBlock (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.models.encoder_tcn import TCNBlock
from pytorch_asr_tpu.ops.dilated_conv_pallas import tcn_block_pallas


@pytest.mark.parametrize("dilation", [1, 2, 4, 8])
def test_tcn_block_pallas_parity(dilation):
    B, T, C, K = 2, 50, 128, 5
    rng = np.random.default_rng(dilation)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    lengths = jnp.asarray([T, T])

    block = TCNBlock(channels=C, kernel_size=K, dilation=dilation, dropout=0.0)
    params = block.init(jax.random.PRNGKey(0), x, lengths, False)["params"]
    ref = block.apply({"params": params}, x, lengths, False)

    p = params
    out = tcn_block_pallas(
        x,
        p["ln_scale"], p["ln_bias"], p["w_conv"], p["b_conv"],
        p["w_point"], p["b_point"],
        dilation=dilation, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tcn_block_pallas_respects_masking_contract():
    """Pallas path + external mask == flax path with shorter lengths."""
    B, T, C = 1, 40, 128
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((B, T, C)).astype(np.float32)
    n = 24
    x_np[:, n:] = 0.0
    x = jnp.asarray(x_np)
    lengths = jnp.asarray([n])

    block = TCNBlock(channels=C, kernel_size=5, dilation=2, dropout=0.0)
    params = block.init(jax.random.PRNGKey(0), x, lengths, False)["params"]
    ref = block.apply({"params": params}, x, lengths, False)

    p = params
    out = tcn_block_pallas(
        x, p["ln_scale"], p["ln_bias"], p["w_conv"], p["b_conv"],
        p["w_point"], p["b_point"],
        dilation=2, interpret=True)
    mask = (jnp.arange(T)[None, :] < n)[..., None]
    out = jnp.where(mask, out, 0.0)
    np.testing.assert_allclose(np.asarray(out[:, :n]), np.asarray(ref[:, :n]),
                               rtol=2e-4, atol=2e-4)


# ------------------------------------------------------- train path (VJP)
def _ref_block_body(x, ln_s, ln_b, w_conv, b_conv, w_point, b_point,
                    dilation):
    """jnp reference of the PRE-residual block body (matches _xla_path)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
    y = jax.lax.conv_general_dilated(
        y, w_conv, window_strides=(1,), padding="SAME",
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST) + b_conv
    lin, gate = jnp.split(y, 2, axis=-1)
    y = lin * jax.nn.sigmoid(gate)
    return y @ w_point + b_point


@pytest.mark.parametrize("dilation", [1, 4])
@pytest.mark.parametrize("T", [50, 300])   # 300 spans two T_BLOCKs (halo add)
def test_tcn_train_forward_parity(dilation, T):
    from pytorch_asr_tpu.ops.dilated_conv_pallas import tcn_block_train
    from pytorch_asr_tpu.ops import runtime

    B, C, K = 2, 128, 5
    rng = np.random.default_rng(dilation + T)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.5)
    args = (
        jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32)),
        jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32)),
        jnp.asarray(rng.standard_normal((K, C, 2 * C)).astype(np.float32) * 0.05),
        jnp.asarray(0.1 * rng.standard_normal(2 * C).astype(np.float32)),
        jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.05),
        jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32)),
    )
    runtime.force_interpret(True)
    try:
        out = tcn_block_train(x, *args, dilation)
    finally:
        runtime.force_interpret(None)
    ref = _ref_block_body(x, *args, dilation)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dilation", [1, 4])
@pytest.mark.parametrize("T", [50, 300])
def test_tcn_train_grad_parity(dilation, T):
    """Custom-VJP grads == jax.grad of the jnp reference, all 7 inputs."""
    from pytorch_asr_tpu.ops.dilated_conv_pallas import tcn_block_train
    from pytorch_asr_tpu.ops import runtime

    B, C, K = 2, 128, 5
    rng = np.random.default_rng(100 + dilation + T)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.5)
    args = (
        jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32)),
        jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32)),
        jnp.asarray(rng.standard_normal((K, C, 2 * C)).astype(np.float32) * 0.05),
        jnp.asarray(0.1 * rng.standard_normal(2 * C).astype(np.float32)),
        jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.05),
        jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32)),
    )
    # weight the loss so cotangents vary by position
    w = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))

    def loss_kernel(x, *a):
        return jnp.sum(tcn_block_train(x, *a, dilation) * w)

    def loss_ref(x, *a):
        return jnp.sum(_ref_block_body(x, *a, dilation) * w)

    runtime.force_interpret(True)
    try:
        g_k = jax.grad(loss_kernel, argnums=tuple(range(7)))(x, *args)
    finally:
        runtime.force_interpret(None)
    g_r = jax.grad(loss_ref, argnums=tuple(range(7)))(x, *args)
    names = ["x", "ln_scale", "ln_bias", "w_conv", "b_conv", "w_point",
             "b_point"]
    for n, a, b in zip(names, g_k, g_r):
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4 * scale,
                                   err_msg=f"grad mismatch for {n}")


def test_tcn_encoder_trains_with_pallas_kernel():
    """config-3 style: TCNBlock train step runs the fused kernel + VJP."""
    from pytorch_asr_tpu.ops import runtime

    B, T, C = 2, 64, 128
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    lengths = jnp.asarray([T, T - 10])
    block_k = TCNBlock(channels=C, kernel_size=5, dilation=2, dropout=0.0,
                       use_pallas=True)
    block_r = TCNBlock(channels=C, kernel_size=5, dilation=2, dropout=0.0,
                       use_pallas=False)
    params = block_r.init(jax.random.PRNGKey(0), x, lengths, True)["params"]

    def loss(block, p):
        return jnp.sum(block.apply({"params": p}, x, lengths, True) ** 2)

    runtime.force_interpret(True)
    try:
        lk, gk = jax.value_and_grad(lambda p: loss(block_k, p))(params)
    finally:
        runtime.force_interpret(None)
    lr, gr = jax.value_and_grad(lambda p: loss(block_r, p))(params)
    np.testing.assert_allclose(float(lk), float(lr), rtol=1e-4)
    for k in gr:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gr[k]),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"grad mismatch for {k}")