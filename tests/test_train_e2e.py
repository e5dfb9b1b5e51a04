"""End-to-end integration: BASELINE config 1 slice on the synthetic corpus
(SURVEY.md §4.4) -- loss must drop and greedy WER must reach a real threshold.

CPU-runnable by design (BASELINE.json config 1 is 'CPU-runnable').
"""

import dataclasses

import numpy as np
import pytest

from pytorch_asr_tpu.configs import get_config
from pytorch_asr_tpu.configs.base import (
    BiLSTMEncoderConfig,
    DataConfig,
    FrontendConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
from pytorch_asr_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_config("ctc_bilstm_dev1h")
    return dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(
            batch_size=4,
            bucket_audio_lens=(40000,),
            bucket_label_lens=(48,),
            synthetic_num_utts=24,
        ),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(8, 8), hidden_dim=96,
                                        num_layers=2, dropout=0.0),
            compute_dtype="float32",
        ),
        train=TrainConfig(
            optim=OptimConfig(peak_lr=3e-3, warmup_steps=30, total_steps=400,
                              grad_clip_norm=5.0),
            log_every=50,
        ),
    )


@pytest.fixture(scope="module")
def tiny_data(tiny_cfg):
    corpus = synthetic_corpus(
        tiny_cfg.data.synthetic_num_utts, tiny_cfg.frontend.sample_rate,
        seed=0, min_words=1, max_words=3)
    return BucketedDataset(
        corpus, batch_size=tiny_cfg.data.batch_size,
        bucket_audio_lens=tiny_cfg.data.bucket_audio_lens,
        bucket_label_lens=tiny_cfg.data.bucket_label_lens)


@pytest.fixture(scope="module")
def trained(tiny_cfg, tiny_data, tmp_path_factory):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    trainer = Trainer(tiny_cfg, dataset=tiny_data, checkpoint_dir=ckpt_dir)
    first = trainer.train(num_steps=10)
    rest = trainer.train(num_steps=290)
    return trainer, first, rest, ckpt_dir


def test_loss_decreases(trained):
    _, first, rest, _ = trained
    assert rest["ctc_loss"] < first["ctc_loss"] * 0.5, (first, rest)


def test_wer_low_after_training(trained):
    trainer, _, _, _ = trained
    result = trainer.evaluate()
    # the synthetic tone task is fully learnable; trained model should be
    # far below chance (untrained WER is ~1.0)
    assert result["wer"] < 0.3, result
    assert result["num_utts"] == 24


def test_checkpoint_resume(trained, tiny_cfg, tiny_data):
    trainer, _, _, ckpt_dir = trained
    step = int(trainer.state.step)
    resumed = Trainer(tiny_cfg, dataset=tiny_data, checkpoint_dir=ckpt_dir)
    assert int(resumed.state.step) == step
    # params actually restored (not re-initialized)
    import jax

    a = jax.tree.leaves(trainer.state.params)[0]
    b = jax.tree.leaves(resumed.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_throughput_metric_emitted(trained):
    _, _, rest, _ = trained
    assert "audio_seconds_per_sec_per_chip" in rest
    assert rest["audio_seconds_per_sec_per_chip"] > 0


def test_prefix_beam_decode_on_trained_model(trained, tiny_cfg):
    """BASELINE config 2 path: beam decode of the trained CTC model."""
    trainer, _, _, _ = trained
    cfg = dataclasses.replace(
        tiny_cfg,
        decode=dataclasses.replace(tiny_cfg.decode, method="prefix_beam",
                                   beam_size=4, max_decode_len=48),
    )
    trainer.cfg = cfg
    result = trainer.decode_eval(max_batches=2)
    assert result["method"] == "prefix_beam"
    assert result["wer"] < 0.5, result
    assert result["decode_rtf"] > 0


def test_joint_model_trains_and_beam_decodes(tmp_path_factory):
    """BASELINE configs 4/5 slice: joint CTC/attention training + both beam
    decoders on the synthetic corpus."""
    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import LASDecoderConfig

    cfg = get_config("joint_ctc_attention_960h")
    cfg = dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(batch_size=8, bucket_audio_lens=(32000,),
                        bucket_label_lens=(32,), synthetic_num_utts=16),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(8, 8), hidden_dim=64,
                                        num_layers=2, dropout=0.0),
            decoder=LASDecoderConfig(embed_dim=24, hidden_dim=48,
                                     attention_dim=32, location_kernel=7,
                                     location_filters=4, label_smoothing=0.0),
            ctc_weight=0.3,
            compute_dtype="float32",
        ),
        train=TrainConfig(
            optim=OptimConfig(peak_lr=3e-3, warmup_steps=30, total_steps=300),
            log_every=100),
        decode=dataclasses.replace(cfg.decode, method="joint_beam", beam_size=4,
                                   max_decode_len=40, joint_ctc_weight=0.3),
    )
    corpus = synthetic_corpus(16, cfg.frontend.sample_rate, seed=1,
                              min_words=1, max_words=2)
    ds = BucketedDataset(corpus, batch_size=8,
                         bucket_audio_lens=cfg.data.bucket_audio_lens,
                         bucket_label_lens=cfg.data.bucket_label_lens)
    trainer = Trainer(cfg, dataset=ds, enable_checkpoints=False)
    first = trainer.train(num_steps=10)
    rest = trainer.train(num_steps=240)
    assert rest["loss"] < first["loss"], (first, rest)
    assert "ce_loss" in rest and "ctc_loss" in rest

    joint = trainer.decode_eval(max_batches=2)
    assert np.isfinite(joint["wer"])

    trainer.cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, method="attention_beam"))
    att = trainer.decode_eval(max_batches=2)
    assert np.isfinite(att["wer"])
