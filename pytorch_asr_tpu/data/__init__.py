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
    """(audio, transcript) pairs for the configured source (synthetic when no
    root).  Real LibriSpeech comes back as a LazyCorpus: manifest-only
    startup, one FLAC decoded per access (RAM bounded at any corpus size)."""
    if cfg.librispeech_root:
        return load_corpus(cfg.librispeech_root, cfg.split, max_utts=max_utts,
                           subset_seed=getattr(cfg, "subset_seed", 1))
    return synthetic_corpus(
        max_utts or cfg.synthetic_num_utts, sample_rate, seed=cfg.shuffle_seed,
        min_sec=cfg.synthetic_min_sec or None,
        max_sec=cfg.synthetic_max_sec or None)


def corpus_audio_lengths(corpus) -> list[int]:
    """Per-utterance sample counts WITHOUT decoding when the corpus supports
    it (LazyCorpus reads headers only); in-memory corpora just measure."""
    if hasattr(corpus, "audio_lengths"):
        return [int(n) for n in corpus.audio_lengths()]
    return [len(a) for a, _ in corpus]


def corpus_transcripts(corpus) -> list[str]:
    """Per-utterance transcripts WITHOUT decoding audio."""
    if hasattr(corpus, "transcript"):
        return [corpus.transcript(i) for i in range(len(corpus))]
    return [t for _, t in corpus]


def resolve_buckets(cfg: DataConfig, corpus, tokenizer):
    """Bucket ladders from the config, or OPTIMIZED from the corpus length
    profile when cfg.auto_buckets > 0 (data/bucket_opt.py: DP-minimal
    padding; each bucket is one XLA compilation).  Length profiling never
    decodes audio on lazy corpora (headers only)."""
    if getattr(cfg, "auto_buckets", 0) <= 0:
        return cfg.bucket_audio_lens, cfg.bucket_label_lens
    from pytorch_asr_tpu.data.bucket_opt import optimize_buckets

    audio_lens = corpus_audio_lengths(corpus)
    label_lens = [len(tokenizer.encode(t)) for t in corpus_transcripts(corpus)]
    return optimize_buckets(audio_lens, label_lens, cfg.auto_buckets)


def build_dataset(cfg: DataConfig, sample_rate: int, max_utts: int | None = None) -> BucketedDataset:
    """Build the bucketed dataset named by ``cfg`` (synthetic when no data root)."""
    corpus = load_corpus_for(cfg, sample_rate, max_utts)
    tok = get_tokenizer(cfg.vocab)
    audio_b, label_b = resolve_buckets(cfg, corpus, tok)
    return BucketedDataset(
        corpus,
        batch_size=cfg.batch_size,
        bucket_audio_lens=audio_b,
        bucket_label_lens=label_b,
        tokenizer=tok,
    )


def build_grain_iterator(cfg: DataConfig, sample_rate: int,
                         num_shards: int = 1, shard_index: int = 0):
    """Checkpointable per-host-sharded infinite training iterator (grain)."""
    from pytorch_asr_tpu.data.grain_pipeline import GrainBucketedIterator

    corpus = load_corpus_for(cfg, sample_rate)
    tok = get_tokenizer(cfg.vocab)
    audio_b, label_b = resolve_buckets(cfg, corpus, tok)
    return GrainBucketedIterator(
        corpus, tokenizer=tok, batch_size=cfg.batch_size,
        bucket_audio_lens=audio_b,
        bucket_label_lens=label_b,
        seed=cfg.shuffle_seed, num_shards=num_shards, shard_index=shard_index,
        sortagrad=cfg.sortagrad, prefetch=getattr(cfg, "prefetch", 3),
        decode_workers=getattr(cfg, "decode_workers", 0))
