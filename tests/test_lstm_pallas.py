"""Fused Pallas LSTM parity vs the lax.scan reference (values + grads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pytorch_asr_tpu.models.encoder_bilstm import _lstm_scan
from pytorch_asr_tpu.ops.lstm_pallas import lstm_seq


def _case(seed, B=4, T=40, H=16, varied=True):
    rng = np.random.default_rng(seed)
    xproj = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32) * 0.5)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    lengths = jnp.asarray(
        rng.integers(T // 2, T + 1, size=B).astype(np.int32) if varied
        else np.full(B, T, np.int32))
    return xproj, whh, lengths


def _ref(xproj, whh, lengths, reverse):
    T = xproj.shape[1]
    xp = jnp.swapaxes(xproj, 0, 1)
    tidx = jnp.arange(T)[:, None]
    valid = (tidx >= (T - lengths)[None, :]) if reverse else (tidx < lengths[None, :])
    hs = _lstm_scan(xp.astype(jnp.float32), whh, valid)
    return jnp.swapaxes(hs, 0, 1)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_lstm_pallas_forward_parity(seed, reverse):
    xproj, whh, lengths = _case(seed)
    with pltpu.force_tpu_interpret_mode():
        ours = lstm_seq(xproj, whh, lengths, reverse)
    ref = _ref(xproj, whh, lengths, reverse)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_pallas_grad_parity(reverse):
    xproj, whh, lengths = _case(3, B=2, T=24, H=8)

    def loss_pallas(xp, w):
        return jnp.sum(jnp.tanh(lstm_seq(xp, w, lengths, reverse)))

    def loss_ref(xp, w):
        return jnp.sum(jnp.tanh(_ref(xp, w, lengths, reverse)))

    with pltpu.force_tpu_interpret_mode():
        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(xproj, whh)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(xproj, whh)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_lstm_pallas_zero_length_rows():
    xproj, whh, lengths = _case(5)
    lengths = lengths.at[0].set(0)
    with pltpu.force_tpu_interpret_mode():
        out = lstm_seq(xproj, whh, lengths, False)
    assert np.all(np.asarray(out)[0] == 0)
