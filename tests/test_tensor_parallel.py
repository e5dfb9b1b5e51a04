"""Production tensor parallelism (SURVEY.md §2.3; BASELINE north star:
'encoder model-sharded when it exceeds one chip').

On the 8-virtual-device CPU mesh:
  * mesh.model_axis=2 reaches `shard_params_tp` from the production Trainer —
    LSTM gate parameters (and their Adam moments) are actually laid out over
    'model' (checked via `.sharding`), not silently replicated;
  * a TP train run matches the replicated run step for step;
  * the `mesh.model_axis=2` CLI override trains end to end.
"""

import dataclasses

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from pytorch_asr_tpu.configs import get_config
from pytorch_asr_tpu.configs.base import (
    BiLSTMEncoderConfig,
    DataConfig,
    FrontendConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    TCNEncoderConfig,
    TrainConfig,
)
from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
from pytorch_asr_tpu.parallel.mesh import make_mesh
from pytorch_asr_tpu.parallel.sharding import describe_shardings
from pytorch_asr_tpu.training.trainer import Trainer


def _cfg(model_axis: int, ema: float = 0.0):
    cfg = get_config("ctc_bilstm_dev1h")
    return dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(batch_size=8, bucket_audio_lens=(24000,),
                        bucket_label_lens=(32,), synthetic_num_utts=16),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(4, 4), hidden_dim=64,
                                        num_layers=2, dropout=0.0,
                                        use_pallas=False),
            compute_dtype="float32",
        ),
        train=TrainConfig(
            optim=OptimConfig(peak_lr=1e-3, warmup_steps=10, total_steps=100),
            log_every=1, ema_decay=ema,
            # threefry: bit-identical dropout/augment streams regardless of
            # topology, so TP-vs-replicated comparisons are exact.
            rng_impl="threefry2x32",
        ),
        mesh=MeshConfig(model_axis=model_axis),
    )


def _data(cfg):
    corpus = synthetic_corpus(cfg.data.synthetic_num_utts,
                              cfg.frontend.sample_rate, seed=0,
                              min_words=1, max_words=2)
    return BucketedDataset(corpus, batch_size=cfg.data.batch_size,
                           bucket_audio_lens=cfg.data.bucket_audio_lens,
                           bucket_label_lens=cfg.data.bucket_label_lens)


def _losses(trainer, steps):
    out = []
    it = trainer.dataset.repeat_batches(seed=1)
    for _ in range(steps):
        res = trainer.train(num_steps=1, batches=it)
        out.append(res["loss"])
    return np.asarray(out)


def _spec_of(x):
    return tuple(x.sharding.spec)


def test_trainer_tp_params_sharded_over_model():
    cfg = _cfg(model_axis=2, ema=0.5)
    tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
    assert dict(tr.mesh.shape) == {"data": 4, "model": 2}
    assert tr.tensor_parallel
    p = tr.state.params["encoder"]["lstm0_fwd"]
    assert _spec_of(p["wih"]) == (None, "model")
    assert _spec_of(p["whh"]) == (None, "model")
    assert _spec_of(p["bias"]) == ("model",)
    # replicated leaves stay replicated
    assert _spec_of(tr.state.params["ctc_head"]["kernel"]) == ()
    # optimizer moments and EMA mirror the parameter layout
    mu = tr.state.opt_state[1][0].mu["encoder"]["lstm0_fwd"]
    assert _spec_of(mu["wih"]) == (None, "model")
    assert _spec_of(mu["bias"]) == ("model",)
    ema = tr.state.ema_params["encoder"]["lstm0_fwd"]
    assert _spec_of(ema["whh"]) == (None, "model")


def test_tp_matches_replicated_training():
    cfg_tp = _cfg(model_axis=2)
    cfg_rep = _cfg(model_axis=1)
    l_tp = _losses(Trainer(cfg_tp, dataset=_data(cfg_tp),
                           enable_checkpoints=False), 4)
    l_rep = _losses(Trainer(cfg_rep, dataset=_data(cfg_rep),
                            enable_checkpoints=False), 4)
    # fp32 end to end; GSPMD collectives only reorder reductions.
    np.testing.assert_allclose(l_tp, l_rep, rtol=2e-4)
    assert np.all(np.isfinite(l_tp))


def test_tp_cli_override_trains(tmp_path):
    from pytorch_asr_tpu import train as train_cli

    train_cli.main([
        "ctc_bilstm_dev1h",
        "mesh.model_axis=2",
        "frontend.use_pallas=false", "frontend.specaugment=false",
        "data.batch_size=8", "data.bucket_audio_lens=16000",
        "data.bucket_label_lens=24", "data.synthetic_num_utts=8",
        "model.encoder.hidden_dim=64", "model.encoder.num_layers=1",
        "model.encoder.conv_channels=4,4", "model.encoder.use_pallas=false",
        "model.compute_dtype=float32",
        "train.eval_every=3", "train.checkpoint_every=3",
        f"train.checkpoint_dir={tmp_path}",
        "steps=3",
        f"metrics_path={tmp_path}/metrics.jsonl",
    ])
    text = (tmp_path / "metrics.jsonl").read_text()
    assert '"mesh"' in text and "'model'" not in text  # layout logged as JSON


def test_describe_shardings_pins_the_tp_surface():
    """Exactly these parameters shard; anything new must be a deliberate
    RULES change (guards against silent replication AND accidental spread)."""
    cfg = _cfg(model_axis=2)
    tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
    got = describe_shardings(tr.state.params, tr.mesh)
    want = {}
    for layer in range(2):
        for d in ("fwd", "bwd"):
            base = f"encoder/lstm{layer}_{d}"
            want[f"{base}/wih"] = (None, "model")
            want[f"{base}/whh"] = (None, "model")
            want[f"{base}/bias"] = ("model",)
    assert got == want


def test_tcn_tp_rules_apply():
    cfg = _cfg(model_axis=2)
    cfg = dataclasses.replace(cfg, model=ModelConfig(
        encoder=TCNEncoderConfig(channels=32, num_blocks=2, dropout=0.1,
                                 use_pallas=False),
        decoder=None, ctc_weight=1.0, compute_dtype="float32"))
    tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
    enc = tr.state.params["encoder"]
    block = [k for k in enc if k.startswith("block")][0]
    assert _spec_of(enc[block]["w_conv"]) == (None, None, "model")
    assert _spec_of(enc[block]["w_point"]) == ("model", None)
    # dropout>0 trains (regression: Dropout used to be constructed outside
    # setup() and crashed config-3 training)
    res = tr.train(num_steps=2)
    assert np.isfinite(res["loss"])


def test_indivisible_dims_fall_back_to_replication():
    cfg = _cfg(model_axis=2)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, encoder=dataclasses.replace(
            cfg.model.encoder, hidden_dim=33)))  # 4H=132, not % 2... but 132%2==0
    # use a mesh the gate dim does NOT divide: model_axis=8 -> 4H=132 % 8 != 0
    cfg = dataclasses.replace(cfg, mesh=MeshConfig(model_axis=8))
    mesh = make_mesh(cfg.mesh)
    from pytorch_asr_tpu.training.state import build_model, init_train_state

    data = _data(cfg)
    sample = next(iter(data.epoch_batches(seed=0)))
    state = init_train_state(cfg, build_model(cfg), sample)
    got = describe_shardings(state.params, mesh)
    assert got == {}, got  # nothing divides by 8 -> all replicated, no crash
