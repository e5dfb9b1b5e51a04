"""Pallas framed-STFT kernel parity vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_asr_tpu.configs.base import FrontendConfig
from pytorch_asr_tpu.frontend import features
from pytorch_asr_tpu.ops.stft_pallas import log_mel_pallas, stft_log_mel


@pytest.mark.parametrize("A", [16000, 48000, 20735])
def test_stft_pallas_matches_jnp(A):
    cfg = FrontendConfig(normalize=False)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, A)).astype(np.float32)
    ours = np.asarray(stft_log_mel(jnp.asarray(audio), cfg, interpret=True))

    power = features.power_spectrum(jnp.asarray(audio), cfg)
    ref = np.asarray(jnp.log(jnp.maximum(power @ jnp.asarray(
        features.mel_filterbank(cfg)), cfg.log_floor)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_log_mel_pallas_full_parity():
    cfg = FrontendConfig(normalize=True)
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 32000)).astype(np.float32)
    audio[1, 20000:] = 0.0
    lens = jnp.asarray([32000, 20000])

    ours, n1 = log_mel_pallas(jnp.asarray(audio), lens, cfg, interpret=True)
    ref, n2 = features.log_mel(jnp.asarray(audio), lens, cfg)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
