"""The Pallas fast path under a multi-device mesh (VERDICT round 1, item 2).

pallas_call is opaque to GSPMD, so on a mesh every kernel call site wraps
itself in shard_map over 'data' (parallel/mesh.py::maybe_data_shard_map).
These tests run the SHIPPED configuration — use_pallas=True end to end
(STFT + fused LSTM + CTC kernels, interpreter mode on the CPU mesh) — and
check it against (a) the same kernels on one device and (b) the jnp path.

Training through two steps covers the custom-VJP backward under shard_map:
step-2 loss only matches if step-1 gradients (incl. the psum'd replicated
weight cotangents of the shard_map transpose) were right.
"""

import dataclasses

import numpy as np
import pytest

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
from pytorch_asr_tpu.ops import runtime
from pytorch_asr_tpu.training.trainer import Trainer


@pytest.fixture(autouse=True)
def _interpret_kernels():
    runtime.force_interpret(True)
    yield
    runtime.force_interpret(None)


def _cfg(use_pallas: bool, data_axis: int = -1):
    cfg = get_config("ctc_bilstm_dev1h")
    return dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=use_pallas, specaugment=False),
        data=DataConfig(batch_size=8, bucket_audio_lens=(8000,),
                        bucket_label_lens=(12,), synthetic_num_utts=8),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(2, 2), hidden_dim=16,
                                        num_layers=1, dropout=0.0,
                                        use_pallas=use_pallas),
            compute_dtype="float32",
        ),
        train=TrainConfig(
            optim=OptimConfig(peak_lr=1e-3, warmup_steps=10, total_steps=100),
            log_every=1, rng_impl="threefry2x32",
        ),
        mesh=MeshConfig(data_axis=data_axis, model_axis=1),
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


def test_pallas_train_step_on_8_device_mesh_matches_single_device():
    l_mesh, tr = _losses(_cfg(use_pallas=True, data_axis=-1))
    assert dict(tr.mesh.shape) == {"data": 8, "model": 1}
    l_one, _ = _losses(_cfg(use_pallas=True, data_axis=1))
    # Same kernels; only the grad psum order differs across layouts.
    np.testing.assert_allclose(l_mesh, l_one, rtol=1e-5)
    assert np.all(np.isfinite(l_mesh))


def test_pallas_mesh_matches_jnp_path():
    l_pallas, _ = _losses(_cfg(use_pallas=True, data_axis=-1))
    l_jnp, _ = _losses(_cfg(use_pallas=False, data_axis=-1))
    # STFT kernel uses the bf16x3 MXU DFT -> small fp diffs vs the fp32 FFT.
    np.testing.assert_allclose(l_pallas, l_jnp, rtol=2e-3)


def test_pallas_greedy_eval_on_mesh():
    cfg = _cfg(use_pallas=True, data_axis=-1)
    tr = Trainer(cfg, dataset=_data(cfg), enable_checkpoints=False)
    res = tr.evaluate()
    assert res["num_utts"] == 8
    assert 0.0 <= res["wer"]


def test_fused_beam_dense_lm_on_mesh_matches_single_device():
    """The fused lane kernel (incl. in-kernel dense-LM fusion) under the
    data mesh: use_fused=True wraps in maybe_data_shard_map, so each data
    shard runs its own whole-utterance Pallas program.  Tokens must match
    the unsharded scan path."""
    import jax
    import jax.numpy as jnp

    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
    from pytorch_asr_tpu.parallel.mesh import make_mesh, use_mesh

    rng = np.random.default_rng(5)
    B, T, V, K, L = 8, 12, 16, 4, 16
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=B).astype(np.int32))
    tab = rng.normal(size=(V, V)).astype(np.float32)
    tab = jnp.asarray(tab - np.log(np.exp(tab).sum(axis=1, keepdims=True)))
    mesh = make_mesh(MeshConfig(data_axis=-1, model_axis=1), batch_size=B)
    assert mesh.devices.size == 8
    with use_mesh(mesh):
        tk, lk, sk = prefix_beam_search(
            logits, lens, beam_size=K, max_len=L, lm_table=tab,
            lm_alpha=0.4, lm_beta=0.7, use_fused=True)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    lm_table=tab, lm_alpha=0.4, lm_beta=0.7,
                                    use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-5,
                               atol=1e-5)
