"""Bucket-ladder optimization (SURVEY §7.3: padding waste vs recompiles)."""

import numpy as np
import pytest

from pytorch_asr_tpu.data.bucket_opt import optimize_buckets, padding_efficiency


def _lens(rng, n=400):
    # bimodal LibriSpeech-ish mix: many short, a long tail
    short = rng.normal(5.0, 1.5, int(n * 0.7))
    long = rng.normal(12.0, 2.0, n - int(n * 0.7))
    sec = np.clip(np.concatenate([short, long]), 1.0, 16.0)
    return (sec * 16000).astype(np.int64)


def test_every_utterance_fits_its_ladder():
    rng = np.random.default_rng(0)
    audio = _lens(rng)
    labels = (audio / 1600).astype(np.int64)       # ~10 tokens/s
    for K in (1, 3, 5):
        ab, lb = optimize_buckets(audio, labels, K)
        assert len(ab) == len(lb) == K
        assert all(a1 < a2 for a1, a2 in zip(ab, ab[1:]))
        assert max(audio) <= ab[-1]
        # labels fit with headroom per bucket
        bounds = np.asarray(ab)
        idx = np.searchsorted(bounds, audio, side="left")
        for b in range(K):
            sel = idx == b
            if sel.any():
                assert labels[sel].max() <= lb[b]


def test_dp_beats_naive_even_split():
    rng = np.random.default_rng(1)
    audio = _lens(rng)
    labels = (audio / 1600).astype(np.int64)
    K = 4
    ab, _ = optimize_buckets(audio, labels, K)
    eff_opt = padding_efficiency(audio, ab)
    naive = tuple(int(audio.max() * (i + 1) / K) for i in range(K))
    eff_naive = padding_efficiency(audio, naive)
    assert eff_opt >= eff_naive - 1e-9
    assert eff_opt > 0.8, eff_opt                  # DP ladders waste little


def test_more_buckets_never_hurt():
    rng = np.random.default_rng(2)
    audio = _lens(rng, 300)
    labels = (audio / 1600).astype(np.int64)
    effs = []
    for K in (1, 2, 4, 8):
        ab, _ = optimize_buckets(audio, labels, K)
        effs.append(padding_efficiency(audio, ab))
    assert all(b >= a - 1e-9 for a, b in zip(effs, effs[1:])), effs


def test_auto_buckets_config_path():
    """data.auto_buckets drives the ladder through build_dataset."""
    import dataclasses

    from pytorch_asr_tpu.configs.base import DataConfig
    from pytorch_asr_tpu.data import build_dataset

    cfg = DataConfig(batch_size=4, synthetic_num_utts=32,
                     synthetic_min_sec=2.0, synthetic_max_sec=9.0,
                     auto_buckets=3)
    ds = build_dataset(cfg, 16000)
    assert len(ds.buckets) == 3
    # the ladder adapts to the 2-9 s corpus instead of the 3-20 s default
    assert ds.buckets[-1].audio_len <= 10 * 16000
    batches = list(ds.epoch_batches(seed=0))
    assert sum(int((b["audio_len"] > 0).sum()) for b in batches) == 32
