"""Waveform augmentation (frontend/augment.py) and SortaGrad ordering."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.frontend.augment import (
    WaveformAugmentConfig,
    augment_waveform,
    gain_perturb,
    noise_inject,
    speed_perturb,
)

SR = 16000


def _sine(freq: float, n: int) -> np.ndarray:
    return np.sin(2 * np.pi * freq * np.arange(n) / SR).astype(np.float32)


def test_speed_perturb_shifts_frequency():
    """Resampling a sine by factor f multiplies its frequency by f."""
    n = SR  # 1 s
    audio = jnp.asarray(_sine(440.0, n))[None, :]
    lens = jnp.asarray([n], jnp.int32)
    rng = jax.random.PRNGKey(0)
    # speed-up on a full buffer: frequency scales by f, length by 1/f
    f = 1.1
    out, new_len = speed_perturb(rng, audio, lens, f, f)
    assert out.shape == audio.shape
    assert abs(int(new_len[0]) - int(n / f)) <= 1
    seg = np.asarray(out[0, : int(new_len[0])])
    peak_hz = np.argmax(np.abs(np.fft.rfft(seg))) * SR / len(seg)
    assert abs(peak_hz - 440.0 * f) < 5.0, peak_hz
    # beyond the new length the buffer is zeroed
    assert np.all(np.asarray(out[0, int(new_len[0]):]) == 0.0)

    # slow-down on a FULL buffer is clamped to a no-op: stretching past the
    # static buffer would truncate audio against full-length CTC targets
    out, nl = speed_perturb(rng, audio, lens, 0.9, 0.9)
    assert int(nl[0]) == n
    peak_hz = np.argmax(np.abs(np.fft.rfft(np.asarray(out[0])))) * SR / n
    assert abs(peak_hz - 440.0) < 5.0

    # an utterance with buffer slack gets the true slow-down extension
    short = jnp.asarray([n // 2], jnp.int32)
    out, nl = speed_perturb(rng, audio, short, 0.9, 0.9)
    assert abs(int(nl[0]) - int(n // 2 / 0.9)) <= 1
    seg = np.asarray(out[0, : int(nl[0])])
    peak_hz = np.argmax(np.abs(np.fft.rfft(seg))) * SR / len(seg)
    assert abs(peak_hz - 440.0 * 0.9) < 5.0


def test_gain_perturb_scales():
    audio = jnp.ones((2, 100), jnp.float32)
    out = gain_perturb(jax.random.PRNGKey(1), audio, 6.0, 6.0)
    np.testing.assert_allclose(np.asarray(out), 10 ** (6 / 20), rtol=1e-5)


def test_noise_inject_hits_target_snr():
    n = 4 * SR
    audio = jnp.asarray(_sine(300.0, n))[None, :]
    lens = jnp.asarray([n], jnp.int32)
    out = noise_inject(jax.random.PRNGKey(2), audio, lens, 10.0, 10.0)
    noise = np.asarray(out - audio)[0]
    p_sig = float(np.mean(np.asarray(audio)[0] ** 2))
    p_noise = float(np.mean(noise ** 2))
    snr_db = 10 * np.log10(p_sig / p_noise)
    assert abs(snr_db - 10.0) < 1.0, snr_db
    # padded region untouched (mask): shorten length and check
    lens2 = jnp.asarray([n // 2], jnp.int32)
    out2 = noise_inject(jax.random.PRNGKey(2), audio, lens2, 10.0, 10.0)
    assert np.array_equal(np.asarray(out2[0, n // 2:]),
                          np.asarray(audio[0, n // 2:]))


def test_augment_waveform_jits_with_static_shapes():
    cfg = WaveformAugmentConfig()
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 8000)).astype(np.float32))
    lens = jnp.asarray([8000, 6000, 4000, 2000], jnp.int32)
    fn = jax.jit(lambda r, a, n: augment_waveform(r, a, n, cfg))
    out, new_len = fn(jax.random.PRNGKey(3), audio, lens)
    assert out.shape == audio.shape and new_len.shape == lens.shape
    assert np.all(np.asarray(new_len) >= 1)


def test_model_augment_path_trains():
    """waveform_augment=True runs inside the jitted train step."""
    import dataclasses

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import (
        BiLSTMEncoderConfig, DataConfig, FrontendConfig, ModelConfig)
    from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
    from pytorch_asr_tpu.training.trainer import Trainer

    cfg = dataclasses.replace(
        get_config("ctc_bilstm_dev1h"),
        frontend=FrontendConfig(use_pallas=False, specaugment=False,
                                waveform_augment=True),
        data=DataConfig(batch_size=2, bucket_audio_lens=(40000,),
                        bucket_label_lens=(48,), synthetic_num_utts=4),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(4,), hidden_dim=16,
                                        num_layers=1, dropout=0.0,
                                        use_pallas=False),
            compute_dtype="float32"),
    )
    corpus = synthetic_corpus(4, SR, seed=0, min_words=1, max_words=2)
    ds = BucketedDataset(corpus, 2, cfg.data.bucket_audio_lens,
                         cfg.data.bucket_label_lens)
    tr = Trainer(cfg, dataset=ds, enable_checkpoints=False)
    res = tr.train(num_steps=2)
    assert np.isfinite(res["loss"])


# ------------------------------------------------------------------ SortaGrad

def test_sortagrad_epoch_ordering():
    from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus

    corpus = synthetic_corpus(24, SR, seed=0, min_words=1, max_words=6)
    ds = BucketedDataset(corpus, batch_size=2,
                         bucket_audio_lens=(16000, 32000, 64000),
                         bucket_label_lens=(16, 32, 64))
    sorted_maxes = [int(b["audio_len"].max())
                    for b in ds.epoch_batches(seed=0, sort_by_length=True)]
    assert sorted_maxes == sorted(sorted_maxes)
    shuffled_maxes = [int(b["audio_len"].max())
                      for b in ds.epoch_batches(seed=0)]
    assert shuffled_maxes != sorted_maxes
    assert len(shuffled_maxes) == len(sorted_maxes)  # every utt once/epoch

    # repeat_batches: epoch 0 sorted, epoch 1 not
    it = ds.repeat_batches(seed=0, sortagrad=True)
    n_per_epoch = len(sorted_maxes)
    e0 = [int(next(it)["audio_len"].max()) for _ in range(n_per_epoch)]
    e1 = [int(next(it)["audio_len"].max()) for _ in range(n_per_epoch)]
    assert e0 == sorted_maxes
    assert e1 != e0


def test_grain_sortagrad_first_pass_sorted():
    from pytorch_asr_tpu.data.grain_pipeline import GrainBucketedIterator
    from pytorch_asr_tpu.data.synthetic import synthetic_corpus

    corpus = synthetic_corpus(16, SR, seed=1, min_words=1, max_words=6)
    kw = dict(batch_size=2, bucket_audio_lens=(16000, 32000, 64000),
              bucket_label_lens=(16, 32, 64), seed=0)
    it = GrainBucketedIterator(corpus, sortagrad=True, **kw)
    # first examples arrive in ascending length order -> the first batch
    # completes in the SMALLEST bucket that has >= batch_size examples
    lens = sorted(len(a) for a, _ in corpus)
    first = next(it)
    assert int(first["audio_len"].max()) <= lens[2]

    # mid-sorted-phase checkpoint round-trip is deterministic
    state = it.get_state()
    a = [next(it)["audio_len"].tolist() for _ in range(4)]
    it2 = GrainBucketedIterator(corpus, sortagrad=True, **kw)
    it2.set_state(state)
    b = [next(it2)["audio_len"].tolist() for _ in range(4)]
    assert a == b
