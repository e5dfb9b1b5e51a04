"""Direction-sharded tensor parallelism: the Pallas fast path under the
model axis (VERDICT round 1, missing #2 / next-round item 2 stretch goal).

The gate-dim TP layout cannot host the fused Pallas LSTM kernel (the
recurrence needs the full (H, 4H) weights each step).  With mesh model
axis == 2 the BiLSTM shards over its natural axis instead: model shard 0
runs the forward-direction fused kernel, shard 1 the reverse, outputs
concatenated over the hidden dim sharded on 'model'
(models/encoder_bilstm.py::_bilstm_tp_directions).  These tests pin:

  * encoder forward AND grads match the single-device Pallas path;
  * the production Trainer selects direction TP for mesh.model_axis=2 and
    keeps use_pallas=True (no more fast-path-vs-TP exclusivity);
  * direction-TP training matches replicated-mesh Pallas training
    step for step;
  * model_axis > 2 still falls back to gate-dim TP with the scan path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.configs import get_config
from pytorch_asr_tpu.configs.base import (
    BiLSTMEncoderConfig,
    DataConfig,
    FrontendConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
from pytorch_asr_tpu.models.encoder_bilstm import BiLSTMEncoder
from pytorch_asr_tpu.ops import runtime
from pytorch_asr_tpu.parallel.mesh import make_mesh, use_mesh
from pytorch_asr_tpu.training.trainer import Trainer


@pytest.fixture(autouse=True)
def _interpret_kernels():
    runtime.force_interpret(True)
    yield
    runtime.force_interpret(None)


def _encoder(tp_directions: bool):
    return BiLSTMEncoder(
        BiLSTMEncoderConfig(conv_channels=(2, 2), hidden_dim=16, num_layers=2,
                            dropout=0.0, use_pallas=True,
                            tp_directions=tp_directions),
        dtype=jnp.float32)


def _inputs(B=8, T=64, F=20, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)).astype(np.int32))
    return feats, lens


def test_direction_tp_encoder_matches_single_device_values_and_grads():
    feats, lens = _inputs()
    enc = _encoder(tp_directions=True)
    params = enc.init(jax.random.PRNGKey(0), feats, lens)["params"]

    def loss(p):
        out, _ = enc.apply({"params": p}, feats, lens)
        return jnp.sum(out * out)

    l_ref, g_ref = jax.value_and_grad(loss)(params)  # no mesh -> plain Pallas
    mesh = make_mesh(MeshConfig(model_axis=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with use_mesh(mesh):
        l_tp, g_tp = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
    err = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                       g_ref, g_tp)
    assert max(jax.tree.leaves(err)) < 1e-4, err


def test_direction_tp_param_layout_unchanged():
    """Direction TP must not change the parameter tree (checkpoint/torch
    import layout): both paths create identical shapes under the same names."""
    feats, lens = _inputs()
    p_tp = _encoder(True).init(jax.random.PRNGKey(0), feats, lens)["params"]
    p_ref = _encoder(False).init(jax.random.PRNGKey(0), feats, lens)["params"]
    assert jax.tree.map(jnp.shape, p_tp) == jax.tree.map(jnp.shape, p_ref)


def _cfg(model_axis: int, tp_directions: bool = False):
    cfg = get_config("ctc_bilstm_dev1h")
    return dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=True, specaugment=False),
        data=DataConfig(batch_size=8, bucket_audio_lens=(8000,),
                        bucket_label_lens=(12,), synthetic_num_utts=8),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(2, 2), hidden_dim=16,
                                        num_layers=1, dropout=0.0,
                                        use_pallas=True,
                                        tp_directions=tp_directions),
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


def _losses(cfg, steps=2):
    tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
    it = tr.dataset.repeat_batches(seed=1)
    return np.asarray([tr.train(num_steps=1, batches=it)["loss"]
                       for _ in range(steps)]), tr


def test_trainer_selects_direction_tp_and_keeps_pallas():
    cfg = _cfg(model_axis=2)
    tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
    assert tr.tensor_parallel and tr.tp_directions
    assert tr.cfg.model.encoder.use_pallas is True
    assert tr.cfg.model.encoder.tp_directions is True
    # LSTM weights replicated at rest (the shard_map boundary slices them).
    p = tr.state.params["encoder"]["lstm0_fwd"]
    assert tuple(p["wih"].sharding.spec) == ()


def test_direction_tp_training_matches_replicated_pallas():
    l_tp, tr = _losses(_cfg(model_axis=2), steps=3)
    assert tr.tp_directions
    l_rep, _ = _losses(_cfg(model_axis=1), steps=3)
    # Identical kernels on identical data; only collective/reduction order
    # differs across layouts (fp32 end to end).
    np.testing.assert_allclose(l_tp, l_rep, rtol=1e-5)
    assert np.all(np.isfinite(l_tp))


def test_model_axis_4_falls_back_to_gate_dim_scan():
    cfg = _cfg(model_axis=4)
    tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
    assert tr.tensor_parallel and not tr.tp_directions
    assert tr.cfg.model.encoder.use_pallas is False  # scan path under GSPMD
    res = tr.train(num_steps=1)
    assert np.isfinite(res["loss"])
