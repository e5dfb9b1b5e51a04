"""Beam-sharded decode (ICI collectives) must match the single-device decode
bit-for-bit on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.configs.base import MeshConfig
from pytorch_asr_tpu.data.tokenizer import CharTokenizer
from pytorch_asr_tpu.decoding.lm import tensorize, train_char_ngram
from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
from pytorch_asr_tpu.decoding.prefix_beam_sharded import prefix_beam_search_sharded
from pytorch_asr_tpu.parallel.mesh import make_mesh


def _logp(rng, B, T, V):
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    path = rng.integers(0, V, size=(B, T))
    for b in range(B):
        logits[b, np.arange(T), path[b]] += 3.0
    return jnp.asarray(logits)


@pytest.mark.parametrize("model_axis", [2, 4])
def test_sharded_matches_unsharded(model_axis):
    if len(jax.devices()) < 2 * model_axis:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(data_axis=2, model_axis=model_axis),
                     devices=jax.devices()[: 2 * model_axis])
    rng = np.random.default_rng(0)
    B, T, V, K = 4, 15, 6, 8
    logits = _logp(rng, B, T, V)
    lens = jnp.asarray([T, T - 3, T - 5, 4])

    t_ref, l_ref, s_ref = prefix_beam_search(logits, lens, beam_size=K,
                                             max_len=T + 1)
    t_sh, l_sh, s_sh = prefix_beam_search_sharded(
        logits, lens, mesh, beam_size=K, max_len=T + 1)
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_sh))
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_sh))
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_sh), rtol=1e-6)


def test_sharded_fused_merge_matches(monkeypatch):
    """Round 5: the Pallas merge+top-K kernel inside the beam-sharded scan
    (fused_merge=True, interpret mode) must stay bit-identical to the XLA
    merge -- no-LM, dense-table, and RNN fusion sources."""
    from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig
    from pytorch_asr_tpu.ops import runtime

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    runtime.force_interpret(True)
    try:
        mesh = make_mesh(MeshConfig(data_axis=2, model_axis=2),
                         devices=jax.devices()[:4])
        rng = np.random.default_rng(4)
        B, T, V, K = 2, 10, 6, 4
        logits = _logp(rng, B, T, V)
        lens = jnp.asarray([T, T - 3])
        tab = rng.normal(size=(V, V)).astype(np.float32)
        tab = jnp.asarray(
            tab - np.log(np.exp(tab).sum(axis=1, keepdims=True)))
        rnn = CharRNNLM(RNNLMConfig(embed_dim=4, hidden_dim=8, num_layers=1),
                        vocab_size=V)
        rp = rnn.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4), jnp.int32))["params"]
        for kw in ({}, {"lm_table": tab, "lm_alpha": 0.4, "lm_beta": 0.8},
                   {"rnn_lm": rnn, "rnn_lm_params": rp, "lm_alpha": 0.3,
                    "sos_id": V - 1}):
            t_f, l_f, s_f = prefix_beam_search_sharded(
                logits, lens, mesh, beam_size=K, max_len=T + 1,
                fused_merge=True, **kw)
            t_x, l_x, s_x = prefix_beam_search_sharded(
                logits, lens, mesh, beam_size=K, max_len=T + 1,
                fused_merge=False, **kw)
            np.testing.assert_array_equal(np.asarray(l_f), np.asarray(l_x))
            np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_x))
            np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x),
                                       rtol=1e-5, atol=1e-5)
    finally:
        runtime.force_interpret(None)


def test_sharded_model_axis_1_delegates_and_matches():
    """model_axis=1 (pure data mesh): prefix_beam_search_sharded must
    delegate to the single-device search under the mesh (the route that
    reaches the fused lane kernels on TPU) and stay token-identical."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(MeshConfig(data_axis=4, model_axis=1),
                     devices=jax.devices()[:4])
    rng = np.random.default_rng(2)
    B, T, V, K = 4, 15, 6, 8
    logits = _logp(rng, B, T, V)
    lens = jnp.asarray([T, T - 3, T - 5, 4])
    t_ref, l_ref, s_ref = prefix_beam_search(logits, lens, beam_size=K,
                                             max_len=T + 1)
    t_sh, l_sh, s_sh = prefix_beam_search_sharded(
        logits, lens, mesh, beam_size=K, max_len=T + 1)
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_sh))
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_sh))
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_sh), rtol=1e-6)


def test_sharded_with_lm_matches():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(MeshConfig(data_axis=2, model_axis=2),
                     devices=jax.devices()[:4])
    tok = CharTokenizer()
    lm = train_char_ngram(["the cat sat", "a dog ran"], order=3, tokenizer=tok)
    table = jnp.asarray(tensorize(lm, tok))
    rng = np.random.default_rng(1)
    B, T, V, K = 2, 12, tok.vocab_size, 8
    logits = _logp(rng, B, T, V)
    lens = jnp.asarray([T, T])

    t_ref, l_ref, s_ref = prefix_beam_search(
        logits, lens, beam_size=K, lm_table=table, lm_alpha=0.4, lm_beta=0.5,
        max_len=T + 1)
    t_sh, l_sh, s_sh = prefix_beam_search_sharded(
        logits, lens, mesh, beam_size=K, lm_table=table, lm_alpha=0.4,
        lm_beta=0.5, max_len=T + 1)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_sh))
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_sh), rtol=1e-6)


def test_sharded_with_rnn_lm_matches():
    """Neural-LM fusion with per-shard LM stepping + all_gather of (h, c)
    state (the north star's 'LM-fusion state exchanged via ICI collectives')
    must match the single-device RNN-fused decode."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from pytorch_asr_tpu.models.lm_rnn import RNNLMConfig
    from pytorch_asr_tpu.training.lm import train_rnn_lm

    mesh = make_mesh(MeshConfig(data_axis=2, model_axis=2),
                     devices=jax.devices()[:4])
    tok = CharTokenizer()
    rnn_lm, lm_params, _ = train_rnn_lm(
        ["the cat sat", "a dog ran"] * 4,
        RNNLMConfig(embed_dim=8, hidden_dim=16, num_layers=1),
        steps=20, batch_size=4, max_len=16, tokenizer=tok)
    rng = np.random.default_rng(2)
    B, T, V, K = 2, 10, tok.vocab_size, 8
    logits = _logp(rng, B, T, V)
    lens = jnp.asarray([T, T - 4])

    t_ref, l_ref, s_ref = prefix_beam_search(
        logits, lens, beam_size=K, lm_alpha=0.4, lm_beta=0.2, max_len=T + 1,
        rnn_lm=rnn_lm, rnn_lm_params=lm_params, sos_id=tok.sos_id)
    t_sh, l_sh, s_sh = prefix_beam_search_sharded(
        logits, lens, mesh, beam_size=K, lm_alpha=0.4, lm_beta=0.2,
        max_len=T + 1, rnn_lm=rnn_lm, rnn_lm_params=lm_params,
        sos_id=tok.sos_id)
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_sh))
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_sh))
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_sh), rtol=1e-5)


def test_decode_driver_shard_beams_path():
    """decode.shard_beams=true routes the decode driver through the
    beam-sharded search and produces the same WER as the unsharded path."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import dataclasses

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import (BiLSTMEncoderConfig, DataConfig,
                                              FrontendConfig, ModelConfig,
                                              TrainConfig, OptimConfig)
    from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
    from pytorch_asr_tpu.training.trainer import Trainer

    cfg = get_config("ctc_bilstm_dev1h")
    cfg = dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=False, specaugment=False),
        data=DataConfig(batch_size=4, bucket_audio_lens=(24000,),
                        bucket_label_lens=(24,), synthetic_num_utts=8),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=(4,), hidden_dim=32,
                                        num_layers=1, dropout=0.0),
            compute_dtype="float32"),
        train=TrainConfig(optim=OptimConfig(peak_lr=1e-3, warmup_steps=5,
                                            total_steps=50)),
        mesh=dataclasses.replace(cfg.mesh, data_axis=4, model_axis=2),
        decode=dataclasses.replace(cfg.decode, method="prefix_beam",
                                   beam_size=4, max_decode_len=24,
                                   shard_beams=True),
    )
    corpus = synthetic_corpus(8, 16000, seed=3, min_words=1, max_words=2)
    ds = BucketedDataset(corpus, batch_size=4,
                         bucket_audio_lens=cfg.data.bucket_audio_lens,
                         bucket_label_lens=cfg.data.bucket_label_lens)
    trainer = Trainer(cfg, dataset=ds, enable_checkpoints=False)
    assert trainer.mesh.shape["model"] == 2
    sharded = trainer.decode_eval(max_batches=2)

    trainer.cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, shard_beams=False))
    plain = trainer.decode_eval(max_batches=2)
    assert sharded["wer"] == plain["wer"], (sharded, plain)
