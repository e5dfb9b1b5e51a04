"""Data pipeline: tokenizer, LibriSpeech reader, synthetic fixture, bucketed batching."""

from __future__ import annotations

from pytorch_asr_tpu.configs.base import DataConfig
from pytorch_asr_tpu.data.batching import Bucket, BucketedDataset
from pytorch_asr_tpu.data.librispeech import load_corpus, scan_manifest
from pytorch_asr_tpu.data.synthetic import synthetic_corpus
from pytorch_asr_tpu.data.tokenizer import CharTokenizer

__all__ = [
    "Bucket",
    "BucketedDataset",
    "CharTokenizer",
    "build_dataset",
    "load_corpus",
    "scan_manifest",
    "synthetic_corpus",
]


def build_dataset(cfg: DataConfig, sample_rate: int, max_utts: int | None = None) -> BucketedDataset:
    """Build the bucketed dataset named by ``cfg`` (synthetic when no data root)."""
    if cfg.librispeech_root:
        corpus = load_corpus(cfg.librispeech_root, cfg.split, max_utts=max_utts)
    else:
        corpus = synthetic_corpus(
            max_utts or cfg.synthetic_num_utts, sample_rate, seed=cfg.shuffle_seed
        )
    return BucketedDataset(
        corpus,
        batch_size=cfg.batch_size,
        bucket_audio_lens=cfg.bucket_audio_lens,
        bucket_label_lens=cfg.bucket_label_lens,
    )
