"""Neural (RNN) LM + shallow fusion tests (SURVEY.md §2.1 LM-fusion row,
§4.1 parity-vs-oracle strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.data.tokenizer import CharTokenizer
from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
from pytorch_asr_tpu.decoding.prefix_beam_ref import prefix_beam_search_ref
from pytorch_asr_tpu.models.lm_rnn import (
    CharRNNLM,
    HostRNNLM,
    RNNLMConfig,
    lm_step_logp,
)
from pytorch_asr_tpu.training.lm import load_rnn_lm, save_rnn_lm, train_rnn_lm

TOK = CharTokenizer()
TEXTS = ["the cat sat on the mat", "the dog ate the bone",
         "a cat and a dog", "the cat and the dog sat"] * 4


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = RNNLMConfig(embed_dim=16, hidden_dim=32, num_layers=1)
    model, params, nll = train_rnn_lm(TEXTS, cfg, steps=150, batch_size=8,
                                      max_len=32, lr=3e-3, seed=0)
    return model, params, nll


def test_lm_learns(tiny_lm):
    _, _, nll = tiny_lm
    # uniform char NLL is log(31) ~ 3.43; the toy corpus is highly predictable
    assert nll < 1.5, nll


def test_lm_step_matches_scan(tiny_lm):
    model, params, _ = tiny_lm
    ids = jnp.asarray([[TOK.sos_id] + list(TOK.encode("the cat"))], jnp.int32)
    scan_logits = model.apply({"params": params}, ids)

    state = model.apply({"params": params}, 1, method=model.init_state)
    outs = []
    for u in range(ids.shape[1]):
        logits, state = model.apply({"params": params}, ids[:, u], state,
                                    method=model.step)
        outs.append(logits)
    step_logits = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(scan_logits), np.asarray(step_logits),
                               rtol=1e-5, atol=1e-5)


def test_lm_save_load_roundtrip(tiny_lm, tmp_path):
    model, params, _ = tiny_lm
    path = str(tmp_path / "lm.npz")
    save_rnn_lm(path, model.cfg, params)
    model2, params2 = load_rnn_lm(path)
    assert model2.cfg == model.cfg
    ids = jnp.asarray([[TOK.sos_id, 2, 3]], jnp.int32)
    a = model.apply({"params": params}, ids)
    b = model2.apply({"params": params2}, ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lm_predicts_corpus_continuation(tiny_lm):
    """After 'the ca' the LM must put high probability on 't'."""
    model, params, _ = tiny_lm
    host = HostRNNLM(model, params, TOK.sos_id)
    prefix = tuple(int(i) for i in TOK.encode("the ca"))
    t_id = int(TOK.encode("t")[0])
    scores = np.asarray([host.score(prefix, c) for c in range(TOK.vocab_size)])
    assert np.argmax(scores) == t_id


def _rand_logp(T, V, seed, peaked=None):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((T, V)).astype(np.float32)
    if peaked is not None:
        for t, c in enumerate(peaked):
            logits[t, c] += 3.0
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def test_prefix_beam_rnn_fusion_matches_oracle(tiny_lm):
    """Batched on-device prefix beam with carried RNN-LM state must equal the
    host oracle scoring the same LM prefix-by-prefix."""
    model, params, _ = tiny_lm
    V = TOK.vocab_size
    T, K = 6, 4
    host_lm = HostRNNLM(model, params, TOK.sos_id)
    for seed in range(3):
        logp = _rand_logp(T, V, seed)
        ref = prefix_beam_search_ref(logp, T, beam_size=K, lm=host_lm,
                                     lm_alpha=0.4, lm_beta=0.3)
        toks, lens, _ = prefix_beam_search(
            jnp.asarray(logp[None]), jnp.asarray([T]), beam_size=K,
            lm_alpha=0.4, lm_beta=0.3, max_len=16,
            rnn_lm=model, rnn_lm_params=params, sos_id=TOK.sos_id)
        got = list(np.asarray(toks)[0, : int(lens[0])])
        assert got == ref, (seed, got, ref)


def test_prefix_beam_rnn_fusion_improves_lm_likely_string(tiny_lm):
    """Fusion must pull a near-tie toward the LM-likely transcription."""
    model, params, _ = tiny_lm
    V = TOK.vocab_size
    ids = [int(i) for i in TOK.encode("the cat")]
    # peaked acoustic evidence for 'the cat' but weak; LM should keep it
    T = len(ids)
    logp = _rand_logp(T, V, 42, peaked=ids)
    toks, lens, _ = prefix_beam_search(
        jnp.asarray(logp[None]), jnp.asarray([T]), beam_size=8,
        lm_alpha=0.5, lm_beta=0.0, max_len=16,
        rnn_lm=model, rnn_lm_params=params, sos_id=TOK.sos_id)
    no_lm_toks, no_lm_lens, _ = prefix_beam_search(
        jnp.asarray(logp[None]), jnp.asarray([T]), beam_size=8, max_len=16)
    fused = TOK.decode(np.asarray(toks)[0, : int(lens[0])])
    plain = TOK.decode(np.asarray(no_lm_toks)[0, : int(no_lm_lens[0])])
    # the fused output must be at least as close to corpus text
    def dist(s):
        import difflib

        return 1.0 - difflib.SequenceMatcher(None, s, "the cat").ratio()

    assert dist(fused) <= dist(plain), (fused, plain)


def test_attention_beam_rnn_fusion_runs(tiny_lm):
    """Attention beam with RNN fusion: alpha=0 == no-LM path; alpha>0 runs."""
    from pytorch_asr_tpu.configs.base import (
        BiLSTMEncoderConfig,
        FrontendConfig,
        LASDecoderConfig,
        ModelConfig,
    )
    from pytorch_asr_tpu.decoding.attention_beam import attention_beam_search
    from pytorch_asr_tpu.models.asr_model import ASRModel

    lm_model, lm_params, _ = tiny_lm
    cfg = ModelConfig(
        encoder=BiLSTMEncoderConfig(conv_channels=(8,), hidden_dim=32,
                                    num_layers=1, dropout=0.0),
        decoder=LASDecoderConfig(embed_dim=16, hidden_dim=32, attention_dim=16,
                                 location_kernel=7, location_filters=4),
        ctc_weight=0.3, compute_dtype="float32",
    )
    model = ASRModel(FrontendConfig(specaugment=False), cfg, TOK.vocab_size)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    audio_len = jnp.asarray([16000, 8000], jnp.int32)
    from pytorch_asr_tpu.ops import make_decoder_io

    dec_in, _, dec_len = make_decoder_io(
        jnp.asarray([[1, 2], [3, 4]], jnp.int32), jnp.asarray([2, 2]),
        TOK.sos_id, TOK.eos_id)
    params = model.init(jax.random.PRNGKey(0), audio, audio_len,
                        targets=dec_in, target_len=dec_len)["params"]
    out = model.apply({"params": params}, audio, audio_len)

    base = attention_beam_search(model, params, out["enc"], out["enc_len"],
                                 TOK.sos_id, TOK.eos_id, beam_size=3, max_len=8)
    zero = attention_beam_search(model, params, out["enc"], out["enc_len"],
                                 TOK.sos_id, TOK.eos_id, beam_size=3, max_len=8,
                                 rnn_lm=lm_model, rnn_lm_params=lm_params,
                                 lm_alpha=0.0)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(zero[0]))

    fused = attention_beam_search(model, params, out["enc"], out["enc_len"],
                                  TOK.sos_id, TOK.eos_id, beam_size=3, max_len=8,
                                  rnn_lm=lm_model, rnn_lm_params=lm_params,
                                  lm_alpha=0.7)
    assert np.all(np.asarray(fused[1]) >= 0)
    assert np.all(np.isfinite(np.asarray(fused[2])))
