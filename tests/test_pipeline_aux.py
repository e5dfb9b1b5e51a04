"""grain pipeline checkpointing, distributed helpers, profiling utils."""

import numpy as np

from pytorch_asr_tpu.data.grain_pipeline import GrainBucketedIterator
from pytorch_asr_tpu.data.synthetic import synthetic_corpus


def _make_it(seed=0, **kw):
    corpus = synthetic_corpus(24, 16000, seed=3)
    return GrainBucketedIterator(
        corpus, batch_size=4, bucket_audio_lens=(48000, 96000),
        bucket_label_lens=(64, 128), seed=seed, **kw)


def test_grain_iterator_yields_static_shapes():
    it = _make_it()
    shapes = set()
    for _ in range(6):
        b = next(it)
        assert b["audio"].shape[0] == 4
        shapes.add(b["audio"].shape[1])
    assert shapes <= {48000, 96000}


def test_grain_iterator_checkpoint_roundtrip():
    it = _make_it(seed=5)
    for _ in range(3):
        next(it)
    state = it.get_state()
    want = [next(it) for _ in range(4)]

    it2 = _make_it(seed=5)
    it2.set_state(state)
    got = [next(it2) for _ in range(4)]
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a["audio"], b["audio"])
        np.testing.assert_array_equal(a["tokens"], b["tokens"])


def test_grain_sharding_partitions_data():
    it0 = _make_it(num_shards=2, shard_index=0)
    it1 = _make_it(num_shards=2, shard_index=1)
    b0 = next(it0)
    b1 = next(it1)
    # different shards -> different utterances (first batches can't be equal)
    assert not np.array_equal(b0["audio"], b1["audio"])


def test_distributed_helpers_single_host():
    from pytorch_asr_tpu.parallel import distributed

    topo = distributed.initialize()
    assert topo["process_count"] == 1
    assert distributed.is_primary()
    assert distributed.host_shard() == (1, 0)


def test_roofline():
    from pytorch_asr_tpu.utils.profiling import roofline

    r = roofline(flops=1e12, bytes_accessed=1e9, seconds=0.01)
    assert r["bound"] == "compute"
    assert 0 < r["sol_fraction"] < 1.1


def test_debug_contexts():
    import jax.numpy as jnp

    from pytorch_asr_tpu.utils.debug import nan_debug, no_jit

    with no_jit():
        assert float(jnp.ones(()) + 1) == 2.0
    with nan_debug():
        assert float(jnp.ones(()) * 2) == 2.0


def test_metrics_logger_tensorboard(tmp_path):
    """SURVEY §2.1 logging row: JSONL events mirrored to TensorBoard scalars."""
    import os

    from pytorch_asr_tpu.training.metrics import MetricsLogger

    tb_dir = str(tmp_path / "tb")
    jsonl = str(tmp_path / "m.jsonl")
    m = MetricsLogger(jsonl, stdout=False, tensorboard_dir=tb_dir)
    m.log("train", step=1, loss=2.5, lr=1e-3)
    m.log("eval", step=1, wer=0.4, note="strings are skipped")
    m.close()
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, "no tensorboard event file written"
    with open(jsonl) as fh:
        lines = [line for line in fh if line.strip()]
    assert len(lines) == 2


def test_checkpoint_dir_mismatch_guard(tmp_path):
    """Reusing a checkpoint dir across experiments / rng impls must raise a
    clear error, not an opaque orbax shape failure (training/checkpoint.py)."""
    import dataclasses

    import pytest

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.training.checkpoint import CheckpointManager

    cfg = get_config("ctc_bilstm_dev1h")
    d = str(tmp_path / "ckpt")
    CheckpointManager(cfg, directory=d).close()

    other = get_config("tcn_ctc_devclean")
    with pytest.raises(ValueError, match="belongs to experiment"):
        CheckpointManager(other, directory=d)

    flipped = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, rng_impl="threefry2x32"))
    with pytest.raises(ValueError, match="rng_impl"):
        CheckpointManager(flipped, directory=d)

    # Same config is fine.
    CheckpointManager(cfg, directory=d).close()


def test_decode_side_bucket_ladder():
    """decode.auto_buckets (round 5): the decode loop re-buckets the eval
    corpus with a finer DP-optimal ladder -- padding efficiency >= 0.9 on a
    varied-length corpus whose single train bucket is far coarser, with
    identical corpus WER (bucketing must not change decode results)."""
    import dataclasses

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import (
        BiLSTMEncoderConfig, DataConfig, DecodeConfig, FrontendConfig,
        ModelConfig, OptimConfig, TrainConfig)
    from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
    from pytorch_asr_tpu.decoding.driver import decode_dataset
    from pytorch_asr_tpu.training.trainer import Trainer

    cfg = get_config("ctc_bilstm_dev1h")
    cfg = dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(batch_size=2, bucket_audio_lens=(160000,),
                        bucket_label_lens=(64,)),
        model=ModelConfig(encoder=BiLSTMEncoderConfig(
            conv_channels=(4,), hidden_dim=16, num_layers=1, dropout=0.0,
            use_pallas=False), compute_dtype="float32"),
        train=TrainConfig(optim=OptimConfig(warmup_steps=5, total_steps=20)),
        decode=DecodeConfig(method="prefix_beam", beam_size=2,
                            max_decode_len=64, auto_buckets=10),
    )
    corpus = synthetic_corpus(12, 16000, seed=1, min_words=1, max_words=9)
    data = BucketedDataset(corpus, batch_size=2,
                           bucket_audio_lens=cfg.data.bucket_audio_lens,
                           bucket_label_lens=cfg.data.bucket_label_lens)
    tr = Trainer(cfg, dataset=data, enable_checkpoints=False)
    res = decode_dataset(tr)
    assert res["padding_efficiency_decode"] >= 0.9, res
    assert res["num_utts"] == 12
    tr.cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, auto_buckets=0))
    res0 = decode_dataset(tr)
    assert "padding_efficiency_decode" not in res0
    assert res0["wer"] == res["wer"], (res0, res)


def test_decode_dataset_greedy_direct():
    """decode_dataset with method='greedy' works when called directly
    (regression: make_decode_fn only knew the beam methods; the greedy
    branch lived solely in Trainer.decode_eval)."""
    import dataclasses

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import (
        BiLSTMEncoderConfig, DataConfig, DecodeConfig, FrontendConfig,
        ModelConfig, OptimConfig, TrainConfig)
    from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
    from pytorch_asr_tpu.decoding.driver import decode_dataset
    from pytorch_asr_tpu.training.trainer import Trainer

    cfg = get_config("ctc_bilstm_dev1h")
    cfg = dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(batch_size=4, bucket_audio_lens=(24000,),
                        bucket_label_lens=(24,)),
        model=ModelConfig(encoder=BiLSTMEncoderConfig(
            conv_channels=(4,), hidden_dim=16, num_layers=1, dropout=0.0,
            use_pallas=False), compute_dtype="float32"),
        train=TrainConfig(optim=OptimConfig(warmup_steps=5, total_steps=20)),
        decode=DecodeConfig(method="greedy"),
    )
    corpus = synthetic_corpus(4, 16000, seed=0, min_words=1, max_words=1)
    data = BucketedDataset(corpus, batch_size=4,
                           bucket_audio_lens=cfg.data.bucket_audio_lens,
                           bucket_label_lens=cfg.data.bucket_label_lens)
    tr = Trainer(cfg, dataset=data, enable_checkpoints=False)
    res = decode_dataset(tr)
    assert res["method"] == "greedy"
    assert res["num_utts"] == 4 and res["wer"] >= 0.0
