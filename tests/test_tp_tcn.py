"""TCN fused-Pallas kernels under tensor parallelism (VERDICT r2 item 7).

The conv pair has no per-step recurrence, so the fast path survives ANY
model-axis size dividing C: each model shard runs the fused block body on a
GLU-pair-aware channel slice + psum (encoder_tcn.py::TCNBlock._tp_pallas).
These tests pin value + grad parity vs the replicated Pallas path, and that
the Trainer keeps use_pallas=True for TCN under a model axis (previously it
silently fell back to the XLA conv path — VERDICT r2 weak #2).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.configs import get_config
from pytorch_asr_tpu.configs.base import (
    DataConfig,
    FrontendConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    TCNEncoderConfig,
    TrainConfig,
)
from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
from pytorch_asr_tpu.models.encoder_tcn import TCNEncoder
from pytorch_asr_tpu.ops import runtime
from pytorch_asr_tpu.parallel.mesh import make_mesh, use_mesh
from pytorch_asr_tpu.training.trainer import Trainer


@pytest.fixture(autouse=True)
def _interpret_kernels():
    runtime.force_interpret(True)
    yield
    runtime.force_interpret(None)


C = 16


def _encoder():
    return TCNEncoder(
        TCNEncoderConfig(channels=C, kernel_size=3, num_blocks=2,
                         dilation_cycle=(1, 2), subsample=2, dropout=0.0,
                         use_pallas=True),
        dtype=jnp.float32)


def _inputs(B=8, T=64, F=20, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)).astype(np.int32))
    return feats, lens


@pytest.mark.parametrize("model_axis", [2, 4])
def test_tcn_tp_encoder_matches_single_device_values_and_grads(model_axis):
    feats, lens = _inputs()
    enc = _encoder()
    params = enc.init(jax.random.PRNGKey(0), feats, lens)["params"]

    def loss(p, train):
        out, _ = enc.apply({"params": p}, feats, lens, train=train)
        return jnp.sum(out * out)

    # no mesh -> plain fused Pallas (train kernel); reference
    l_ref, g_ref = jax.value_and_grad(loss)(params, True)
    mesh = make_mesh(MeshConfig(model_axis=model_axis))
    assert dict(mesh.shape)["model"] == model_axis
    with use_mesh(mesh):
        l_tp, g_tp = jax.value_and_grad(loss)(params, True)
        out_tp, _ = enc.apply({"params": params}, feats, lens, train=False)
    out_ref, _ = enc.apply({"params": params}, feats, lens, train=False)
    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
    # fp32 end to end; the pointwise contraction splits (C -> m partial
    # sums + psum), so values differ by reorder ulps that the backward
    # amplifies modestly.  Bound per leaf: additive floor + relative term.
    def close(a, b):
        diff = float(jnp.max(jnp.abs(a - b)))
        bound = 2e-4 + 1e-3 * float(jnp.max(jnp.abs(a)))
        assert diff < bound, (diff, bound)

    jax.tree.map(close, g_ref, g_tp)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def _cfg(model_axis: int):
    cfg = get_config("tcn_ctc_devclean")
    return dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=True, specaugment=False),
        data=DataConfig(batch_size=8, bucket_audio_lens=(8000,),
                        bucket_label_lens=(12,), synthetic_num_utts=8),
        model=ModelConfig(
            encoder=TCNEncoderConfig(channels=C, kernel_size=3, num_blocks=2,
                                     dilation_cycle=(1, 2), subsample=2,
                                     dropout=0.0, use_pallas=True),
            compute_dtype="float32",
        ),
        train=TrainConfig(
            optim=OptimConfig(peak_lr=1e-3, warmup_steps=10, total_steps=100),
            log_every=1, rng_impl="threefry2x32",
        ),
        mesh=MeshConfig(model_axis=model_axis),
    )


def _data(cfg):
    corpus = synthetic_corpus(cfg.data.synthetic_num_utts,
                              cfg.frontend.sample_rate, seed=0,
                              min_words=1, max_words=1)
    return BucketedDataset(corpus, batch_size=cfg.data.batch_size,
                           bucket_audio_lens=cfg.data.bucket_audio_lens,
                           bucket_label_lens=cfg.data.bucket_label_lens)


def test_trainer_keeps_pallas_for_tcn_tp():
    cfg = _cfg(model_axis=2)
    tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
    assert tr.tensor_parallel and tr.tp_tcn_pallas
    assert tr.cfg.model.encoder.use_pallas is True
    # Block weights replicated at rest (shard_map slices them locally).
    p = tr.state.params["encoder"]["block0"]
    assert tuple(p["w_conv"].sharding.spec) == ()


def test_tcn_tp_training_matches_replicated_pallas():
    def losses(model_axis, steps=3):
        cfg = _cfg(model_axis)
        tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
        it = tr.dataset.repeat_batches(seed=1)
        return np.asarray([tr.train(num_steps=1, batches=it)["loss"]
                           for _ in range(steps)]), tr

    l_tp, tr = losses(2)
    assert tr.tp_tcn_pallas
    l_rep, _ = losses(1)
    np.testing.assert_allclose(l_tp, l_rep, rtol=1e-5)


def test_tcn_tp_indivisible_channels_falls_back():
    """C not divisible by the model axis -> the scan/GSPMD path (no crash)."""
    cfg = _cfg(model_axis=2)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, encoder=dataclasses.replace(cfg.model.encoder,
                                               channels=15)))
    tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
    assert not tr.tp_tcn_pallas
    assert tr.cfg.model.encoder.use_pallas is False
