"""Frontend parity: jnp STFT/log-mel vs torch.stft (the stand-in oracle, SURVEY.md §4.1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_asr_tpu.configs.base import FrontendConfig
from pytorch_asr_tpu.frontend import features


@pytest.fixture(scope="module")
def cfg():
    return FrontendConfig(normalize=False)


def test_power_spectrum_matches_numpy(cfg):
    """Independent numpy framing+rFFT oracle with identical conventions."""
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16000)).astype(np.float32)

    ours = np.asarray(features.power_spectrum(jnp.asarray(audio), cfg))

    win = features.hann_window(cfg.win_length)
    T = (16000 - cfg.win_length) // cfg.hop_length + 1
    ref = np.zeros((2, T, cfg.n_fft // 2 + 1), np.float64)
    for b in range(2):
        for t in range(T):
            fr = audio[b, t * cfg.hop_length : t * cfg.hop_length + cfg.win_length] * win
            spec = np.fft.rfft(fr, n=cfg.n_fft)
            ref[b, t] = np.abs(spec) ** 2

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_power_spectrum_matches_torch_when_conventions_align():
    """torch.stft frames by n_fft; with win_length == n_fft the two agree exactly."""
    import torch

    cfg = FrontendConfig(win_length=512, n_fft=512, normalize=False)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16000)).astype(np.float32)

    ours = features.power_spectrum(jnp.asarray(audio), cfg)

    win = torch.hann_window(cfg.win_length, periodic=True)
    spec = torch.stft(
        torch.from_numpy(audio), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, window=win, center=False, return_complex=True,
    )
    theirs = spec.abs().pow(2).transpose(1, 2).numpy()  # (B, T, F)

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-3)


def test_num_frames(cfg):
    lens = jnp.asarray([0, 399, 400, 560, 16000])
    nf = features.num_frames(lens, cfg)
    np.testing.assert_array_equal(np.asarray(nf), [0, 0, 1, 2, 98])


def test_log_mel_shapes_and_masking(cfg):
    cfg_n = FrontendConfig(normalize=True)
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((3, 32000)).astype(np.float32)
    audio[1, 16000:] = 0.0
    audio_len = jnp.asarray([32000, 16000, 32000])
    feats, feat_len = features.log_mel(jnp.asarray(audio), audio_len, cfg_n)
    assert feats.shape[0] == 3 and feats.shape[2] == cfg_n.n_mels
    nf = np.asarray(feat_len)
    f = np.asarray(feats)
    # frames past feat_len are zeroed
    assert np.all(f[1, nf[1]:] == 0)
    # valid frames are normalized: mean ~0 per utterance
    m = f[0, : nf[0]].mean()
    assert abs(m) < 1e-3


def test_mel_filterbank_properties(cfg):
    fb = features.mel_filterbank(cfg)
    assert fb.shape == (cfg.n_fft // 2 + 1, cfg.n_mels)
    assert fb.min() >= 0
    # every filter has some support
    assert (fb.sum(axis=0) > 0).all()
