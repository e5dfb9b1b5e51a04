"""Tokenizer, synthetic fixture, and bucketed batching tests."""

import numpy as np

from pytorch_asr_tpu.data import BucketedDataset, CharTokenizer, synthetic_corpus
from pytorch_asr_tpu.data.batching import Bucket, assign_bucket


def test_tokenizer_roundtrip():
    tok = CharTokenizer()
    text = "hello world's end"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    assert ids.min() >= 1  # never emits blank
    assert tok.vocab_size == 31


def test_tokenizer_ctc_collapse():
    tok = CharTokenizer()
    a = tok.encode("ab")[0], tok.encode("ab")[1]
    seq = [0, a[0], a[0], 0, a[1], 0, 0]
    assert tok.decode_ctc(seq) == "ab"


def test_assign_bucket():
    buckets = [Bucket(100, 10), Bucket(200, 20)]
    assert assign_bucket(buckets, 50, 5) == 0
    assert assign_bucket(buckets, 150, 5) == 1
    assert assign_bucket(buckets, 150, 15) == 1
    assert assign_bucket(buckets, 250, 5) is None


def test_bucketed_dataset_shapes_and_coverage():
    corpus = synthetic_corpus(num_utts=37, sample_rate=16000, seed=1)
    ds = BucketedDataset(
        corpus, batch_size=4,
        bucket_audio_lens=(48000, 96000, 160000),
        bucket_label_lens=(96, 192, 320),
    )
    seen = 0
    shapes = set()
    for batch in ds.epoch_batches(seed=0):
        B = batch["audio"].shape[0]
        assert B == 4
        assert batch["audio"].dtype == np.float32
        assert batch["tokens"].dtype == np.int32
        shapes.add((batch["audio"].shape[1], batch["tokens"].shape[1]))
        valid = batch["audio_len"] > 0
        seen += int(valid.sum())
        # padding rows are all-zero
        assert np.all(batch["audio"][~valid] == 0)
        for i in np.where(valid)[0]:
            n = batch["audio_len"][i]
            assert np.any(batch["audio"][i, :n] != 0)
            assert np.all(batch["audio"][i, n:] == 0)
    assert seen + ds.num_dropped == 37
    # static shape count bounded by bucket count
    assert len(shapes) <= 3


def test_epoch_determinism():
    corpus = synthetic_corpus(num_utts=16, sample_rate=16000, seed=2)
    ds = BucketedDataset(corpus, batch_size=4,
                         bucket_audio_lens=(160000,), bucket_label_lens=(320,))
    b1 = list(ds.epoch_batches(seed=5))
    b2 = list(ds.epoch_batches(seed=5))
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x["audio"], y["audio"])
