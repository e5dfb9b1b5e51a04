"""Streaming recognition parity: chunked online == offline (SURVEY.md §2.1
'Greedy CTC decoder' extended with an online path; decoding/streaming.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.configs.base import (BiLSTMEncoderConfig, DataConfig,
                                          DecodeConfig, ExperimentConfig,
                                          FrontendConfig, ModelConfig)
from pytorch_asr_tpu.decoding.greedy import greedy_ctc
from pytorch_asr_tpu.decoding.streaming import (StreamingRecognizer,
                                                init_stream_state)
from pytorch_asr_tpu.models.asr_model import ASRModel
from pytorch_asr_tpu.models.encoder_bilstm import (conv_out_len,
                                                   conv_out_len_causal)

VOCAB = 12


def _streaming_cfg(**enc_kw) -> ExperimentConfig:
    enc = BiLSTMEncoderConfig(conv_channels=(8, 8), conv_kernel=(3, 3),
                              conv_stride=(2, 2), hidden_dim=32, num_layers=2,
                              dropout=0.0, use_pallas=False,
                              bidirectional=False, causal_conv=True, **enc_kw)
    return ExperimentConfig(
        name="streaming_test",
        frontend=FrontendConfig(normalize=False, specaugment=False),
        data=DataConfig(),
        model=ModelConfig(encoder=enc, ctc_weight=1.0,
                          compute_dtype="float32"),
        decode=DecodeConfig(method="greedy"),
    )


def _init_model(cfg, key=0):
    model = ASRModel(cfg.frontend, cfg.model, vocab_size=VOCAB)
    variables = model.init(jax.random.PRNGKey(key),
                           jnp.zeros((1, 16000), jnp.float32),
                           jnp.array([16000]))
    return model, variables["params"]


def test_conv_out_len_causal():
    # ceil(length / stride), independent of trailing padding
    for L, k, s, want in [(1, 3, 2, 1), (2, 3, 2, 1), (3, 3, 2, 2),
                          (8, 3, 2, 4), (9, 3, 2, 5), (0, 3, 2, 0)]:
        got = int(conv_out_len_causal(jnp.array(L), k, s))
        assert got == want, (L, k, s, got, want)


def test_unidirectional_encoder_output_dim():
    from pytorch_asr_tpu.models.asr_model import encoder_output_dim

    cfg = _streaming_cfg()
    assert encoder_output_dim(cfg.model) == 32
    model, params = _init_model(cfg)
    audio = np.random.default_rng(0).normal(size=(2, 16000)).astype(np.float32)
    out = model.apply({"params": params}, jnp.asarray(audio),
                      jnp.array([16000, 12000]))
    assert out["enc"].shape[-1] == 32
    # causal length: 100 frames -> 25 encoder frames (ceil/2 twice)
    assert int(out["enc_len"][0]) == 25


def test_causal_conv_is_causal():
    """Changing the future must not change past encoder frames."""
    cfg = _streaming_cfg()
    model, params = _init_model(cfg)
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 32000)).astype(np.float32)
    b = a.copy()
    b[:, 24000:] += rng.normal(size=(1, 8000)).astype(np.float32)
    lens = jnp.array([32000])
    ea = model.apply({"params": params}, jnp.asarray(a), lens)["enc"]
    eb = model.apply({"params": params}, jnp.asarray(b), lens)["enc"]
    # 24000 samples -> 148 frames -> 37 encoder frames untouched; allow the
    # boundary frame to straddle the edit.
    np.testing.assert_allclose(np.asarray(ea)[:, :36], np.asarray(eb)[:, :36],
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(ea), np.asarray(eb))


def _offline_decode(model, params, audio):
    B, N = audio.shape
    out = model.apply({"params": params}, jnp.asarray(audio),
                      jnp.full((B,), N, jnp.int32))
    ids, n = greedy_ctc(out["ctc_logits"], out["enc_len"])
    ids, n = np.asarray(ids), np.asarray(n)
    return [ids[b, :n[b]].tolist() for b in range(B)]


@pytest.mark.parametrize("chunk_samples", [1600, 4000, 7040])
def test_streaming_matches_offline(chunk_samples):
    cfg = _streaming_cfg()
    model, params = _init_model(cfg)
    B = 2
    # 16 frames/block * 4 blocks: N = (64-1)*160 + 400 = 10480 -> exactly 64
    # frames, so offline and streaming consume identical frame sets.
    N = (64 - 1) * 160 + 400
    rng = np.random.default_rng(2)
    # Structured audio so the greedy path emits non-trivial token sequences.
    t = np.arange(N, dtype=np.float32) / 16000.0
    audio = np.stack([np.sin(2 * np.pi * (300 + 70 * b) * t) *
                      (1.0 + 0.5 * np.sin(2 * np.pi * 3.0 * t))
                      for b in range(B)]).astype(np.float32)
    audio += rng.normal(size=audio.shape).astype(np.float32) * 0.1

    want = _offline_decode(model, params, audio)

    rec = StreamingRecognizer(params, cfg, batch_size=B, block_frames=16)
    got = [[] for _ in range(B)]
    for off in range(0, N, chunk_samples):
        new = rec.accept(audio[:, off:off + chunk_samples])
        for b in range(B):
            got[b].extend(new[b])
    new = rec.finish()
    for b in range(B):
        got[b].extend(new[b])

    assert got == want
    assert any(len(g) > 0 for g in got), "degenerate test: nothing decoded"


def test_streaming_state_shapes_and_reset():
    cfg = _streaming_cfg()
    state = init_stream_state(cfg, batch_size=3)
    assert state.conv_ctx[0].shape == (3, 2, 80, 1)
    # freq after layer0: (80+2-3)//2+1 = 40
    assert state.conv_ctx[1].shape == (3, 2, 40, 8)
    assert state.lstm_h[0].shape == (3, 32)
    assert int(state.prev_tok[0]) == -1


def test_streaming_rejects_non_streamable():
    cfg = _streaming_cfg()
    bidi = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, encoder=dataclasses.replace(
                cfg.model.encoder, bidirectional=True)))
    with pytest.raises(ValueError, match="bidirectional"):
        init_stream_state(bidi, 1)
    norm = dataclasses.replace(
        cfg, frontend=dataclasses.replace(cfg.frontend, normalize=True))
    with pytest.raises(ValueError, match="normalize"):
        init_stream_state(norm, 1)
    _, params = _init_model(cfg)
    with pytest.raises(ValueError, match="multiple"):
        StreamingRecognizer(params, cfg, batch_size=1, block_frames=6)


# --------------------------------------------------------------- beam mode
@pytest.mark.parametrize("chunk_samples", [3200, 7680])
def test_streaming_beam_matches_offline_beam(chunk_samples):
    """Chunked prefix-beam decoding == offline prefix_beam_search, bitwise:
    the carried BeamState makes the chunked scan the same computation."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search

    cfg = _streaming_cfg()
    cfg = dataclasses.replace(
        cfg, decode=DecodeConfig(method="prefix_beam", beam_size=4,
                                 max_decode_len=48))
    model, params = _init_model(cfg, key=3)
    rng = np.random.default_rng(5)
    B, S = 2, 3 * 16000
    audio = (rng.standard_normal((B, S)) * 0.3).astype(np.float32)
    lens = jnp.asarray([S, S], jnp.int32)

    # offline reference: full-utterance logits -> offline beam
    out = model.apply({"params": params}, jnp.asarray(audio), lens)
    t_ref, n_ref, s_ref = prefix_beam_search(
        out["ctc_logits"], out["enc_len"], beam_size=4, max_len=48,
        use_fused=False)

    rec = StreamingRecognizer(params, cfg, batch_size=B, mode="beam")
    best = [[] for _ in range(B)]
    for off in range(0, S, chunk_samples):
        got = rec.accept(audio[:, off:off + chunk_samples])
        if any(got):
            best = got
    final = rec.finish()
    if any(final):
        best = final

    for b in range(B):
        want = np.asarray(t_ref)[b, : int(n_ref[b])].tolist()
        assert best[b] == want, (b, best[b], want)


def test_streaming_beam_mode_validates():
    cfg = _streaming_cfg()
    _, params = _init_model(cfg)
    with pytest.raises(ValueError, match="mode"):
        StreamingRecognizer(params, cfg, batch_size=1, mode="joint")
    with pytest.raises(ValueError, match="beam"):
        StreamingRecognizer(params, cfg, batch_size=1, mode="greedy",
                            lm_table=jnp.zeros((2, 2)))


# ------------------------------------------------- beam mode with LM fusion
def _beam_lm_case(key=3):
    """Model + audio + offline logits shared by the LM-fusion parity tests."""
    cfg = _streaming_cfg()
    cfg = dataclasses.replace(
        cfg, decode=DecodeConfig(method="prefix_beam", beam_size=4,
                                 max_decode_len=48))
    model, params = _init_model(cfg, key=key)
    rng = np.random.default_rng(7)
    B, S = 2, 2 * 16000
    audio = (rng.standard_normal((B, S)) * 0.3).astype(np.float32)
    lens = jnp.asarray([S, S], jnp.int32)
    out = model.apply({"params": params}, jnp.asarray(audio), lens)
    return cfg, model, params, audio, out


def _stream_best(rec, audio, chunk_samples):
    B, S = audio.shape
    best = [[] for _ in range(B)]
    for off in range(0, S, chunk_samples):
        got = rec.accept(audio[:, off:off + chunk_samples])
        if any(got):
            best = got
    final = rec.finish()
    return final if any(final) else best


@pytest.mark.parametrize("chunk_samples", [3200, 9600])
@pytest.mark.parametrize("fusion", ["dense", "hashed", "rnn"])
def test_streaming_beam_lm_fusion_matches_offline(fusion, chunk_samples):
    """Chunked beam WITH LM fusion == offline beam with the same fusion
    source, bitwise (VERDICT r2 item 3): the dense context id / hashed
    context window ride BeamState.ctx; the RNN-LM (h, c) rides the
    LMCarry threaded through StreamState."""
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer
    from pytorch_asr_tpu.decoding.lm import tensorize, train_char_ngram
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search

    cfg, model, params, audio, out = _beam_lm_case()
    alpha, beta = 0.4, 0.2
    kw = dict(lm_table=None, hash_lm=None, rnn_lm=None, rnn_lm_params=None)
    sos_id = None
    if fusion in ("dense", "hashed"):
        tok = CharTokenizer()
        lm = train_char_ngram(
            ["the cat sat on the mat", "a dog and a cat"], order=3,
            tokenizer=tok)
        # Project the char-LM onto this test's tiny vocab (V=12): both the
        # offline call and the streaming call see the SAME tables.
        if fusion == "dense":
            table = jnp.asarray(tensorize(lm, tok))
            kw["lm_table"] = table[:, :VOCAB]
        else:
            from pytorch_asr_tpu.decoding.lm_hashed import build_hashed_lm

            hl = build_hashed_lm(lm, tok.vocab_size)
            hl = hl._replace(
                uni=hl.uni[:VOCAB], uni_backoff=hl.uni_backoff[:VOCAB],
                bi_dense=(hl.bi_dense[:VOCAB, :VOCAB]
                          if hl.bi_dense is not None else None))
            kw["hash_lm"] = hl
    else:
        from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig

        rnn = CharRNNLM(RNNLMConfig(embed_dim=8, hidden_dim=16, num_layers=1),
                        vocab_size=VOCAB)
        rnn_params = rnn.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 4), jnp.int32))["params"]
        kw["rnn_lm"] = rnn
        kw["rnn_lm_params"] = rnn_params
        sos_id = VOCAB - 1

    t_ref, n_ref, _ = prefix_beam_search(
        out["ctc_logits"], out["enc_len"], beam_size=4, max_len=48,
        lm_alpha=alpha, lm_beta=beta, use_fused=False,
        sos_id=sos_id if sos_id is not None else 29, **kw)

    rec = StreamingRecognizer(params, cfg, batch_size=audio.shape[0],
                              mode="beam", lm_alpha=alpha, lm_beta=beta,
                              sos_id=sos_id, **kw)
    best = _stream_best(rec, audio, chunk_samples)
    for b in range(audio.shape[0]):
        want = np.asarray(t_ref)[b, : int(n_ref[b])].tolist()
        assert best[b] == want, (fusion, b, best[b], want)
    assert any(len(b_) > 0 for b_ in best), "degenerate: nothing decoded"
