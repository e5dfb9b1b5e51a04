"""Training-driver widening: gradient accumulation, EMA/Polyak averaging,
optimizer/schedule selection (SURVEY.md §2.1 'Training driver').

The reference genre trains DS2-style models with SGD+momentum and evaluates
with Polyak-averaged weights; these tests pin the TPU-native equivalents.
"""

import dataclasses

import jax
import jax.numpy as jnp
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
from pytorch_asr_tpu.training import state as tstate


def _tiny_cfg(**optim_kw):
    train_kw = {k: optim_kw.pop(k) for k in list(optim_kw)
                if k in ("ema_decay",)}
    cfg = get_config("ctc_bilstm_dev1h")
    return dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(batch_size=4, bucket_audio_lens=(16000,),
                        bucket_label_lens=(24,), synthetic_num_utts=8),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(4,), hidden_dim=32,
                                        num_layers=1, dropout=0.0),
            compute_dtype="float32",
        ),
        train=TrainConfig(
            optim=OptimConfig(peak_lr=1e-3, warmup_steps=5, total_steps=100,
                              **optim_kw),
            **train_kw,
        ),
    )


def _state_and_batch(cfg):
    corpus = synthetic_corpus(cfg.data.synthetic_num_utts,
                              cfg.frontend.sample_rate, seed=0,
                              min_words=1, max_words=2)
    ds = BucketedDataset(corpus, batch_size=cfg.data.batch_size,
                         bucket_audio_lens=cfg.data.bucket_audio_lens,
                         bucket_label_lens=cfg.data.bucket_label_lens)
    batch = next(iter(ds.epoch_batches(seed=0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = tstate.build_model(cfg)
    st = tstate.init_train_state(cfg, model, batch)
    return model, st, batch


def _first_leaf(tree):
    return np.asarray(jax.tree.leaves(tree)[0])


def test_grad_accumulation_matches_single_step():
    """accum_steps=2 over two identical micro-batches == one plain step."""
    cfg1 = _tiny_cfg(accum_steps=1)
    cfg2 = _tiny_cfg(accum_steps=2)
    model, st1, batch = _state_and_batch(cfg1)
    _, st2, _ = _state_and_batch(cfg2)

    step1 = jax.jit(tstate.make_train_step(cfg1, model))
    step2 = jax.jit(tstate.make_train_step(cfg2, model))

    st1, _ = step1(st1, batch)

    st2a, _ = step2(st2, batch)
    # No optimizer update until the accumulation window closes.
    np.testing.assert_array_equal(_first_leaf(st2.params), _first_leaf(st2a.params))
    st2b, _ = step2(st2a, batch)
    # Mean grad over 2 identical micro-batches == the single-batch grad.
    np.testing.assert_allclose(_first_leaf(st1.params), _first_leaf(st2b.params),
                               rtol=0, atol=1e-6)


def test_ema_params_track_and_eval_uses_them():
    cfg = _tiny_cfg(ema_decay=0.5)
    model, st, batch = _state_and_batch(cfg)
    assert st.ema_params is not None
    step = jax.jit(tstate.make_train_step(cfg, model))
    st1, _ = step(st, batch)
    p0 = _first_leaf(st.params)
    p1 = _first_leaf(st1.params)
    ema1 = _first_leaf(st1.ema_params)
    np.testing.assert_allclose(ema1, 0.5 * p0 + 0.5 * p1, rtol=0, atol=1e-6)
    # eval_params prefers the EMA copy
    assert _first_leaf(tstate.eval_params(st1)) is not None
    np.testing.assert_array_equal(_first_leaf(tstate.eval_params(st1)), ema1)

    cfg_off = _tiny_cfg()
    _, st_off, _ = _state_and_batch(cfg_off)
    assert st_off.ema_params is None
    np.testing.assert_array_equal(_first_leaf(tstate.eval_params(st_off)),
                                  _first_leaf(st_off.params))


@pytest.mark.parametrize("sched,check", [
    ("constant", lambda lr, peak: np.allclose(lr[50:], peak)),
    ("cosine", lambda lr, peak: lr[-1] < 0.05 * peak and lr[20] > lr[80]),
    ("exponential", lambda lr, peak: np.isclose(lr[-1], 0.01 * peak, rtol=0.05)),
    ("noam", lambda lr, peak: lr[20] > lr[80] > 0),
])
def test_lr_schedules(sched, check):
    cfg = OptimConfig(peak_lr=1e-3, warmup_steps=10, total_steps=100,
                      schedule=sched)
    fn = tstate.lr_schedule(cfg)
    lr = np.asarray([fn(jnp.asarray(s)) for s in range(1, 101)])
    # warmup is linear for every schedule
    assert lr[0] < lr[5] < lr[9]
    assert np.isclose(lr[9], 1e-3, rtol=0.01) or sched == "noam"
    assert check(lr, 1e-3), lr[[0, 20, 50, 80, 99]]


@pytest.mark.parametrize("opt", ["sgd", "adam"])
def test_optimizer_variants_update_params(opt):
    cfg = _tiny_cfg(optimizer=opt)
    model, st, batch = _state_and_batch(cfg)
    step = jax.jit(tstate.make_train_step(cfg, model))
    st1, aux = step(st, batch)
    assert np.isfinite(float(aux["loss"]))
    assert not np.array_equal(_first_leaf(st.params), _first_leaf(st1.params))


def test_unknown_optimizer_and_schedule_raise():
    with pytest.raises(ValueError):
        tstate.make_optimizer(OptimConfig(optimizer="adagrad"))
    with pytest.raises(ValueError):
        tstate.lr_schedule(OptimConfig(schedule="nope"))(jnp.asarray(1))


def test_scheduled_sampling_train_step_smoke():
    """Joint model with scheduled sampling ramps and trains under jit."""
    from pytorch_asr_tpu.configs.base import LASDecoderConfig

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            decoder=LASDecoderConfig(embed_dim=16, hidden_dim=32,
                                     attention_dim=16, location_kernel=7,
                                     location_filters=4,
                                     scheduled_sampling=0.3, ss_ramp_steps=10),
            ctc_weight=0.5,
        ),
    )
    model, st, batch = _state_and_batch(cfg)
    step = jax.jit(tstate.make_train_step(cfg, model))
    for _ in range(3):
        st, aux = step(st, batch)
    assert np.isfinite(float(aux["loss"]))
    assert "ce_loss" in aux and "ctc_loss" in aux


def test_ema_blends_only_on_optimizer_updates():
    """With accumulation, EMA must not re-blend inside the window (the
    effective horizon would shrink by accum_steps)."""
    cfg = _tiny_cfg(accum_steps=2, ema_decay=0.5)
    model, st, batch = _state_and_batch(cfg)
    step = jax.jit(tstate.make_train_step(cfg, model))
    st1, aux1 = step(st, batch)       # micro-step: no update
    np.testing.assert_array_equal(_first_leaf(st.ema_params),
                                  _first_leaf(st1.ema_params))
    st2, aux2 = step(st1, batch)      # window closes: update + blend
    p2 = _first_leaf(st2.params)
    np.testing.assert_allclose(
        _first_leaf(st2.ema_params),
        0.5 * _first_leaf(st.ema_params) + 0.5 * p2, rtol=0, atol=1e-6)
    # logged LR reflects optimizer updates, not micro-batches
    assert float(aux1["lr"]) <= float(aux2["lr"])


def test_remat_encoder_matches_plain():
    """cfg.train.remat_encoder must not change values — only recompute
    activations in the backward pass."""
    cfg = _tiny_cfg()
    cfg_r = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat_encoder=True))
    model, st, batch = _state_and_batch(cfg)
    model_r, st_r, _ = _state_and_batch(cfg_r)
    np.testing.assert_array_equal(_first_leaf(st.params), _first_leaf(st_r.params))

    s1, a1 = jax.jit(tstate.make_train_step(cfg, model))(st, batch)
    s2, a2 = jax.jit(tstate.make_train_step(cfg_r, model_r))(st_r, batch)
    np.testing.assert_allclose(float(a1["loss"]), float(a2["loss"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(_first_leaf(s1.params), _first_leaf(s2.params),
                               rtol=1e-5, atol=1e-6)
