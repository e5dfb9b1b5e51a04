"""Data pipeline: tokenizer, LibriSpeech reader, synthetic fixture, bucketed batching."""

from __future__ import annotations

from pytorch_asr_tpu.configs.base import DataConfig
from pytorch_asr_tpu.data.batching import Bucket, BucketedDataset
from pytorch_asr_tpu.data.librispeech import load_corpus, scan_manifest
from pytorch_asr_tpu.data.synthetic import synthetic_corpus
from pytorch_asr_tpu.data.tokenizer import CharTokenizer, get_tokenizer

__all__ = [
    "Bucket",
    "BucketedDataset",
    "CharTokenizer",
    "get_tokenizer",
    "build_dataset",
    "load_corpus",
    "scan_manifest",
    "synthetic_corpus",
]


def load_corpus_for(cfg: DataConfig, sample_rate: int,
                    max_utts: int | None = None):
    """(audio, transcript) pairs for the configured source (synthetic when no root)."""
    if cfg.librispeech_root:
        return load_corpus(cfg.librispeech_root, cfg.split, max_utts=max_utts)
    return synthetic_corpus(
        max_utts or cfg.synthetic_num_utts, sample_rate, seed=cfg.shuffle_seed,
        min_sec=cfg.synthetic_min_sec or None,
        max_sec=cfg.synthetic_max_sec or None)


def build_dataset(cfg: DataConfig, sample_rate: int, max_utts: int | None = None) -> BucketedDataset:
    """Build the bucketed dataset named by ``cfg`` (synthetic when no data root)."""
    corpus = load_corpus_for(cfg, sample_rate, max_utts)
    return BucketedDataset(
        corpus,
        batch_size=cfg.batch_size,
        bucket_audio_lens=cfg.bucket_audio_lens,
        bucket_label_lens=cfg.bucket_label_lens,
        tokenizer=get_tokenizer(cfg.vocab),
    )


def build_grain_iterator(cfg: DataConfig, sample_rate: int,
                         num_shards: int = 1, shard_index: int = 0):
    """Checkpointable per-host-sharded infinite training iterator (grain)."""
    from pytorch_asr_tpu.data.grain_pipeline import GrainBucketedIterator

    corpus = load_corpus_for(cfg, sample_rate)
    return GrainBucketedIterator(
        corpus, tokenizer=get_tokenizer(cfg.vocab), batch_size=cfg.batch_size,
        bucket_audio_lens=cfg.bucket_audio_lens,
        bucket_label_lens=cfg.bucket_label_lens,
        seed=cfg.shuffle_seed, num_shards=num_shards, shard_index=shard_index,
        sortagrad=cfg.sortagrad)
