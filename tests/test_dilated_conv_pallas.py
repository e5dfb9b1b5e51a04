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