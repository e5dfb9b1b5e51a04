"""Model forward shapes, masking invariance, and fixed-seed goldens (SURVEY.md §4.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.configs.base import (
    BiLSTMEncoderConfig,
    FrontendConfig,
    LASDecoderConfig,
    ModelConfig,
    TCNEncoderConfig,
)
from pytorch_asr_tpu.models.asr_model import ASRModel, encoder_output_dim
from pytorch_asr_tpu.ops.ce import make_decoder_io

FRONTEND = FrontendConfig()
VOCAB = 31


def _audio_batch(B=2, A=16000, seed=0):
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((B, A)).astype(np.float32) * 0.1
    audio_len = np.full((B,), A, np.int32)
    audio_len[-1] = A // 2
    audio[-1, A // 2:] = 0.0
    return jnp.asarray(audio), jnp.asarray(audio_len)


def _small_bilstm():
    return ModelConfig(
        encoder=BiLSTMEncoderConfig(conv_channels=(8, 8), hidden_dim=32,
                                    num_layers=2, dropout=0.0),
        compute_dtype="float32",
    )


def _small_tcn():
    return ModelConfig(
        encoder=TCNEncoderConfig(channels=32, kernel_size=3, num_blocks=2,
                                 dilation_cycle=(1, 2), dropout=0.0),
        compute_dtype="float32",
    )


@pytest.mark.parametrize("mk", [_small_bilstm, _small_tcn], ids=["bilstm", "tcn"])
def test_encoder_forward_shapes(mk):
    cfg = mk()
    model = ASRModel(FRONTEND, cfg, VOCAB)
    audio, audio_len = _audio_batch()
    params = model.init(jax.random.PRNGKey(0), audio, audio_len)["params"]
    out = model.apply({"params": params}, audio, audio_len)
    B = audio.shape[0]
    assert out["ctc_logits"].shape[0] == B
    assert out["ctc_logits"].shape[2] == VOCAB
    assert out["ctc_logits"].dtype == jnp.float32
    assert out["enc_len"].shape == (B,)
    # shorter utterance -> shorter encoding
    assert int(out["enc_len"][1]) < int(out["enc_len"][0])


@pytest.mark.parametrize("mk", [_small_bilstm, _small_tcn], ids=["bilstm", "tcn"])
def test_encoder_padding_invariance(mk):
    """Valid-frame encodings must not change when trailing padding grows."""
    cfg = mk()
    model = ASRModel(FRONTEND, cfg, VOCAB)
    rng = np.random.default_rng(3)
    A = 16000
    wav = rng.standard_normal(A).astype(np.float32) * 0.1

    a1 = jnp.asarray(wav[None])
    a2 = jnp.concatenate([a1, jnp.zeros((1, 8000))], axis=1)
    lens = jnp.asarray([A])
    params = model.init(jax.random.PRNGKey(0), a1, lens)["params"]
    o1 = model.apply({"params": params}, a1, lens)
    o2 = model.apply({"params": params}, a2, lens)
    n = int(o1["enc_len"][0])
    assert int(o2["enc_len"][0]) == n
    np.testing.assert_allclose(
        np.asarray(o1["ctc_logits"])[0, :n], np.asarray(o2["ctc_logits"])[0, :n],
        rtol=2e-4, atol=2e-4,
    )


def test_bilstm_reverse_direction_sees_future():
    """The backward LSTM must propagate information right-to-left."""
    from pytorch_asr_tpu.models.encoder_bilstm import LSTMDirection

    B, T, D, H = 1, 10, 4, 8
    x = jnp.zeros((B, T, D)).at[0, 7, :].set(1.0)
    lengths = jnp.asarray([T])
    mod = LSTMDirection(H, reverse=True)
    params = mod.init(jax.random.PRNGKey(0), x, lengths)["params"]
    out = np.asarray(mod.apply({"params": params}, x, lengths))
    # reverse direction: positions t <= 7 see the impulse, t > 7 do not
    assert np.abs(out[0, 7]).max() > 0
    assert np.abs(out[0, 0]).max() > 0
    assert np.abs(out[0, 8]).max() == 0


def test_las_decoder_teacher_forcing_shapes():
    cfg = ModelConfig(
        encoder=BiLSTMEncoderConfig(conv_channels=(8,), hidden_dim=32,
                                    num_layers=1, dropout=0.0),
        decoder=LASDecoderConfig(embed_dim=16, hidden_dim=32, attention_dim=16,
                                 location_kernel=7, location_filters=4),
        ctc_weight=0.3,
        compute_dtype="float32",
    )
    model = ASRModel(FRONTEND, cfg, VOCAB)
    audio, audio_len = _audio_batch()
    tokens = jnp.asarray(np.array([[1, 2, 3, 0], [4, 5, 0, 0]], np.int32))
    token_len = jnp.asarray(np.array([3, 2], np.int32))
    dec_in, dec_out, dec_len = make_decoder_io(tokens, token_len, 29, 30)
    assert dec_in.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(dec_in[0]), [29, 1, 2, 3, 0])
    np.testing.assert_array_equal(np.asarray(dec_out[0]), [1, 2, 3, 30, 0])
    np.testing.assert_array_equal(np.asarray(dec_out[1]), [4, 5, 30, 0, 0])

    params = model.init(jax.random.PRNGKey(0), audio, audio_len,
                        targets=dec_in, target_len=dec_len)["params"]
    out = model.apply({"params": params}, audio, audio_len,
                      targets=dec_in, target_len=dec_len)
    assert out["dec_logits"].shape == (2, 5, VOCAB)
    assert np.isfinite(np.asarray(out["dec_logits"])).all()


def test_las_step_matches_scan():
    """Single-step (beam) path must equal the teacher-forced scan path."""
    cfg = ModelConfig(
        encoder=BiLSTMEncoderConfig(conv_channels=(8,), hidden_dim=32,
                                    num_layers=1, dropout=0.0),
        decoder=LASDecoderConfig(embed_dim=16, hidden_dim=32, attention_dim=16,
                                 location_kernel=7, location_filters=4),
        ctc_weight=0.3,
        compute_dtype="float32",
    )
    model = ASRModel(FRONTEND, cfg, VOCAB)
    audio, audio_len = _audio_batch()
    tokens = jnp.asarray(np.array([[1, 2, 3], [4, 5, 6]], np.int32))
    dec_in, _, dec_len = make_decoder_io(tokens, jnp.asarray([3, 3]), 29, 30)
    params = model.init(jax.random.PRNGKey(0), audio, audio_len,
                        targets=dec_in, target_len=dec_len)["params"]
    scan_logits = model.apply({"params": params}, audio, audio_len,
                              targets=dec_in, target_len=dec_len)["dec_logits"]

    def stepwise(params, audio, audio_len, dec_in):
        out = model.apply({"params": params}, audio, audio_len)
        enc, enc_len = out["enc"], out["enc_len"]
        enc_projed, enc_mask, state = model.apply(
            {"params": params}, enc, enc_len, method=model.decoder_begin)
        logits = []
        for u in range(dec_in.shape[1]):
            lg, state = model.apply(
                {"params": params}, enc, enc_projed, enc_mask, dec_in[:, u], state,
                method=model.decoder_step)
            logits.append(lg)
        return jnp.stack(logits, axis=1)

    step_logits = stepwise(params, audio, audio_len, dec_in)
    np.testing.assert_allclose(np.asarray(scan_logits), np.asarray(step_logits),
                               rtol=1e-5, atol=1e-5)


def test_greedy_ctc_collapse():
    from pytorch_asr_tpu.decoding.greedy import greedy_ctc

    # build logits that argmax to [bl, 2, 2, bl, 3, 3, bl, bl]
    path = [0, 2, 2, 0, 3, 3, 0, 0]
    V = 5
    logits = np.full((1, len(path), V), -5.0, np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 5.0
    ids, n = greedy_ctc(jnp.asarray(logits), jnp.asarray([len(path)]))
    assert int(n[0]) == 2
    np.testing.assert_array_equal(np.asarray(ids)[0, :2], [2, 3])


def test_wer():
    from pytorch_asr_tpu.decoding.wer import corpus_cer, corpus_wer

    assert corpus_wer(["a b c"], ["a b c"]) == 0.0
    assert corpus_wer(["a b c"], ["a x c"]) == pytest.approx(1 / 3)
    assert corpus_wer(["a b"], ["a"]) == pytest.approx(1 / 2)
    assert corpus_cer(["abc"], ["abd"]) == pytest.approx(1 / 3)


def test_encoder_output_dim():
    assert encoder_output_dim(_small_bilstm()) == 64
    assert encoder_output_dim(_small_tcn()) == 32


def test_scheduled_sampling_paths():
    """ss_prob=0 matches plain teacher forcing; ss_prob=1 equals a
    free-running argmax oracle (step 0 always uses the teacher sos)."""
    cfg = ModelConfig(
        encoder=BiLSTMEncoderConfig(conv_channels=(8,), hidden_dim=32,
                                    num_layers=1, dropout=0.0),
        decoder=LASDecoderConfig(embed_dim=16, hidden_dim=32, attention_dim=16,
                                 location_kernel=7, location_filters=4,
                                 scheduled_sampling=0.5),
        ctc_weight=0.3,
        compute_dtype="float32",
    )
    # train=True must not perturb the encoder for this equivalence check
    frontend = FrontendConfig(specaugment=False, waveform_augment=False)
    model = ASRModel(frontend, cfg, VOCAB)
    audio, audio_len = _audio_batch()
    tokens = jnp.asarray(np.array([[1, 2, 3], [4, 5, 6]], np.int32))
    dec_in, _, dec_len = make_decoder_io(tokens, jnp.asarray([3, 3]), 29, 30)
    params = model.init(jax.random.PRNGKey(0), audio, audio_len,
                        targets=dec_in, target_len=dec_len)["params"]
    rngs = {"dropout": jax.random.PRNGKey(7)}

    teacher = model.apply({"params": params}, audio, audio_len,
                          targets=dec_in, target_len=dec_len)["dec_logits"]
    ss0 = model.apply({"params": params}, audio, audio_len, targets=dec_in,
                      target_len=dec_len, train=True, ss_prob=0.0,
                      rngs=rngs)["dec_logits"]
    np.testing.assert_allclose(np.asarray(teacher), np.asarray(ss0),
                               rtol=1e-5, atol=1e-5)

    ss1 = model.apply({"params": params}, audio, audio_len, targets=dec_in,
                      target_len=dec_len, train=True, ss_prob=1.0,
                      rngs=rngs)["dec_logits"]

    # Free-running oracle: feed back argmax predictions after step 0.
    out = model.apply({"params": params}, audio, audio_len)
    enc, enc_len = out["enc"], out["enc_len"]
    enc_projed, enc_mask, state = model.apply(
        {"params": params}, enc, enc_len, method=model.decoder_begin)
    y = dec_in[:, 0]
    logits = []
    for u in range(dec_in.shape[1]):
        lg, state = model.apply(
            {"params": params}, enc, enc_projed, enc_mask, y, state,
            method=model.decoder_step)
        logits.append(lg)
        y = jnp.argmax(lg, axis=-1).astype(jnp.int32)
    oracle = jnp.stack(logits, axis=1)
    np.testing.assert_allclose(np.asarray(ss1), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)


def test_error_breakdown():
    from pytorch_asr_tpu.decoding.wer import corpus_breakdown, error_breakdown

    # ref: a b c d ; hyp: a x c  ->  1 sub (b->x), 1 del (d), 2 hits
    b = error_breakdown(list("abcd"), list("axc"))
    assert (b["sub"], b["ins"], b["del"], b["hits"]) == (1, 0, 1, 2)
    # pure insertion
    b = error_breakdown(list("ab"), list("aXb"))
    assert (b["sub"], b["ins"], b["del"], b["hits"]) == (0, 1, 0, 2)
    # S+I+D must equal edit distance on random pairs
    import numpy as np

    from pytorch_asr_tpu.decoding.wer import edit_distance
    rng = np.random.default_rng(0)
    for _ in range(25):
        r = list(rng.integers(0, 4, rng.integers(0, 9)))
        h = list(rng.integers(0, 4, rng.integers(0, 9)))
        b = error_breakdown(r, h)
        assert b["sub"] + b["ins"] + b["del"] == edit_distance(r, h)
        assert b["hits"] + b["sub"] + b["del"] == len(r)
        assert b["hits"] + b["sub"] + b["ins"] == len(h)

    c = corpus_breakdown(["a b c d", "x y"], ["a b d", "x y"])
    assert c["ref_tokens"] == 6 and c["del"] == 1 and c["wer"] == 1 / 6
    assert c["per_utt"] == [0.25, 0.0]


def test_eval_wer_detail_cli(tmp_path, capsys):
    from pytorch_asr_tpu.eval_wer import main

    (tmp_path / "ref.tsv").write_text("u1\tthe cat sat\nu2\tdogs run\n")
    (tmp_path / "hyp.tsv").write_text("u1\tthe cat sat\nu2\tdog run\n")
    main([str(tmp_path / "ref.tsv"), str(tmp_path / "hyp.tsv"), "detail=1"])
    import json

    out = json.loads(capsys.readouterr().out)
    assert out["sub"] == 1 and out["ins"] == 0 and out["del"] == 0
    assert out["wer"] == 1 / 5
