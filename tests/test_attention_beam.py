"""Attention beam search + CTC prefix scorer tests (brute-force oracles)."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.configs.base import (
    BiLSTMEncoderConfig, FrontendConfig, LASDecoderConfig, ModelConfig)
from pytorch_asr_tpu.data.tokenizer import CharTokenizer
from pytorch_asr_tpu.decoding import ctc_prefix_scorer as cps
from pytorch_asr_tpu.decoding.attention_beam import attention_beam_search
from pytorch_asr_tpu.models.asr_model import ASRModel

TOK = CharTokenizer()
VOCAB = TOK.vocab_size


def _model_and_params(seed=0):
    cfg = ModelConfig(
        encoder=BiLSTMEncoderConfig(conv_channels=(8,), hidden_dim=24,
                                    num_layers=1, dropout=0.0),
        decoder=LASDecoderConfig(embed_dim=12, hidden_dim=24, attention_dim=16,
                                 location_kernel=5, location_filters=4),
        ctc_weight=0.3,
        compute_dtype="float32",
    )
    model = ASRModel(FrontendConfig(use_pallas=False), cfg, VOCAB)
    rng = np.random.default_rng(seed)
    audio = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    audio_len = jnp.asarray([8000, 6000])
    from pytorch_asr_tpu.ops.ce import make_decoder_io

    dec_in, _, dec_len = make_decoder_io(
        jnp.asarray([[1, 2], [3, 4]], jnp.int32), jnp.asarray([2, 2]),
        TOK.sos_id, TOK.eos_id)
    params = model.init(jax.random.PRNGKey(seed), audio, audio_len,
                        targets=dec_in, target_len=dec_len)["params"]
    out = model.apply({"params": params}, audio, audio_len)
    return model, params, out["enc"], out["enc_len"], out["ctc_logits"]


def _greedy_stepwise(model, params, enc, enc_len, max_len):
    """Host-side greedy autoregressive decode (oracle for beam_size=1)."""
    B = enc.shape[0]
    enc_projed, enc_mask, state = model.apply(
        {"params": params}, enc, enc_len, method=model.decoder_begin)
    y = np.full((B,), TOK.sos_id, np.int32)
    done = np.zeros(B, bool)
    outs = [[] for _ in range(B)]
    for _ in range(max_len):
        logits, state = model.apply(
            {"params": params}, enc, enc_projed, enc_mask, jnp.asarray(y), state,
            method=model.decoder_step)
        lp = np.array(jax.nn.log_softmax(logits, axis=-1))
        lp[:, 0] = -1e30
        lp[:, TOK.sos_id] = -1e30
        nxt = lp.argmax(-1).astype(np.int32)
        for b in range(B):
            if not done[b]:
                if nxt[b] == TOK.eos_id:
                    done[b] = True
                else:
                    outs[b].append(int(nxt[b]))
        y = np.where(done, TOK.eos_id, nxt)
        if done.all():
            break
    return outs


def test_beam1_equals_greedy():
    model, params, enc, enc_len, _ = _model_and_params(0)
    greedy = _greedy_stepwise(model, params, enc, enc_len, max_len=12)
    toks, lens, _ = attention_beam_search(
        model, params, enc, enc_len, TOK.sos_id, TOK.eos_id,
        beam_size=1, max_len=12, length_norm=0.0)
    for b in range(enc.shape[0]):
        assert list(np.asarray(toks)[b][: int(lens[b])]) == greedy[b]


def test_larger_beam_not_worse():
    model, params, enc, enc_len, _ = _model_and_params(1)
    _, _, s1 = attention_beam_search(model, params, enc, enc_len,
                                     TOK.sos_id, TOK.eos_id,
                                     beam_size=1, max_len=10, length_norm=0.0)
    _, _, s4 = attention_beam_search(model, params, enc, enc_len,
                                     TOK.sos_id, TOK.eos_id,
                                     beam_size=4, max_len=10, length_norm=0.0)
    assert np.all(np.asarray(s4) >= np.asarray(s1) - 1e-4)


def test_joint_weight_zero_matches_attention():
    model, params, enc, enc_len, ctc_logits = _model_and_params(2)
    t0, l0, _ = attention_beam_search(model, params, enc, enc_len,
                                      TOK.sos_id, TOK.eos_id,
                                      beam_size=4, max_len=10)
    t1, l1, _ = attention_beam_search(model, params, enc, enc_len,
                                      TOK.sos_id, TOK.eos_id,
                                      beam_size=4, max_len=10,
                                      ctc_logits=ctc_logits, ctc_weight=0.0)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_joint_beam_runs_and_is_finite():
    model, params, enc, enc_len, ctc_logits = _model_and_params(3)
    toks, lens, scores = attention_beam_search(
        model, params, enc, enc_len, TOK.sos_id, TOK.eos_id,
        beam_size=4, max_len=10, ctc_logits=ctc_logits, ctc_weight=0.3)
    assert np.isfinite(np.asarray(scores)).all()
    assert (np.asarray(lens) <= 10).all()


# ---------------------------------------------------------------- CTC scorer

def _brute_prefix_prob(logp, prefix):
    """P(collapse(pi) starts with prefix) by path enumeration (tiny T, V)."""
    T, V = logp.shape
    p = np.exp(logp)
    total = 0.0
    for path in itertools.product(range(V), repeat=T):
        prob = np.prod([p[t, c] for t, c in enumerate(path)])
        col = []
        prev = -1
        for c in path:
            if c != prev and c != 0:
                col.append(c)
            prev = c
        if tuple(col[: len(prefix)]) == tuple(prefix):
            total += prob
    return np.log(total) if total > 0 else -np.inf


def _brute_exact_prob(logp, seq):
    T, V = logp.shape
    p = np.exp(logp)
    total = 0.0
    for path in itertools.product(range(V), repeat=T):
        prob = np.prod([p[t, c] for t, c in enumerate(path)])
        col = []
        prev = -1
        for c in path:
            if c != prev and c != 0:
                col.append(c)
            prev = c
        if tuple(col) == tuple(seq):
            total += prob
    return np.log(total) if total > 0 else -np.inf


@pytest.mark.parametrize("seed", [0, 1])
def test_ctc_prefix_scorer_vs_brute_force(seed):
    rng = np.random.default_rng(seed)
    T, V = 5, 4                       # blank, chars {1, 2}, eos=3; 4^5 paths
    eos = 3
    logits = rng.standard_normal((1, T, V)).astype(np.float32)
    logits[:, :, eos] = -15.0         # eos never appears acoustically
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0]
    K = 2
    state = cps.init_state(jnp.asarray(logp[None]), jnp.asarray([T]), K)
    last = jnp.full((1, K), -1, jnp.int32)

    delta, r_n_all, r_b_all = cps.score_extensions(
        state, jnp.asarray(logp[None]), jnp.asarray([T]), last, eos_id=eos)
    # psi(c) for single chars (beam 0; empty hyp)
    for c in [1, 2]:
        want = _brute_prefix_prob(logp, (c,))
        got = float(delta[0, 0, c])   # psi(empty)=0 so delta = psi((c,))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # extend beam 0 with char 1, then score second chars
    chosen = jnp.asarray([[1, 1]], jnp.int32)
    state1 = cps.select_extension(r_n_all, r_b_all, state, delta, chosen)
    last1 = chosen
    delta1, _, _ = cps.score_extensions(
        state1, jnp.asarray(logp[None]), jnp.asarray([T]), last1, eos_id=eos)
    for c in [1, 2]:
        want = _brute_prefix_prob(logp, (1, c)) - _brute_prefix_prob(logp, (1,))
        got = float(delta1[0, 0, c])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # eos slot: exact-sequence probability
    want_eos = _brute_exact_prob(logp, (1,)) - _brute_prefix_prob(logp, (1,))
    np.testing.assert_allclose(float(delta1[0, 0, eos]), want_eos,
                               rtol=1e-4, atol=1e-4)


def test_coverage_bonus():
    """coverage_beta=0 is bit-identical to the baseline; beta>0 adds an
    integer multiple of beta (the covered-frame count) to each final score."""
    model, params, enc, enc_len, _ = _model_and_params(0)
    kw = dict(sos_id=TOK.sos_id, eos_id=TOK.eos_id, beam_size=3, max_len=8)
    base_t, base_l, base_s = attention_beam_search(model, params, enc, enc_len,
                                                   **kw)
    z_t, z_l, z_s = attention_beam_search(model, params, enc, enc_len,
                                          coverage_beta=0.0, **kw)
    np.testing.assert_array_equal(np.asarray(base_t), np.asarray(z_t))
    np.testing.assert_array_equal(np.asarray(base_s), np.asarray(z_s))

    # beta small enough not to flip beam selection: score must equal the
    # baseline score plus beta * k for an integer covered-frame count k.
    beta = 1e-4
    c_t, c_l, c_s = attention_beam_search(model, params, enc, enc_len,
                                          coverage_beta=beta, coverage_tau=0.01,
                                          **kw)
    np.testing.assert_array_equal(np.asarray(base_t), np.asarray(c_t))
    T = enc.shape[1]
    for b in range(enc.shape[0]):
        k = (float(c_s[b]) - float(z_s[b])) / beta
        assert 0 <= k <= T and np.isclose(k, round(k), atol=1e-2), (b, k)
        # a trained-enough hypothesis attends at least one frame per char
        assert k >= float(c_l[b]) * 0 and np.isfinite(float(c_s[b]))


class _EosAfterKModel:
    """Fake model: deterministic decoder that strongly prefers token 2 for the
    first ``k_emit`` steps and eos afterwards (step counter carried in c[0,:,0]).
    Exercises the early-exit while_loop: once all beams emit eos, extra
    ``max_len`` budget must not change anything."""

    vocab_size = 8

    def __init__(self, k_emit, eos_id):
        self.k_emit, self.eos_id = k_emit, eos_id

    def decoder_begin(self):
        pass

    def decoder_step(self):
        pass

    def apply(self, variables, *args, method=None):
        from pytorch_asr_tpu.models.las_decoder import DecoderState

        if method.__name__ == "decoder_begin":
            enc, enc_len = args
            BK, T, D = enc.shape
            st = DecoderState(h=jnp.zeros((1, BK, 4)), c=jnp.zeros((1, BK, 4)),
                              att=jnp.zeros((BK, T)), ctx=jnp.zeros((BK, D)))
            mask = jnp.arange(T)[None, :] < enc_len[:, None]
            return enc, mask, st
        enc, enc_projed, enc_mask, y, st = args
        count = st.c[0, :, 0]                                  # steps so far
        want_eos = count >= self.k_emit
        logits = jnp.where(
            want_eos[:, None],
            jax.nn.one_hot(jnp.full(count.shape, self.eos_id), self.vocab_size),
            jax.nn.one_hot(jnp.full(count.shape, 2), self.vocab_size)) * 50.0
        new_c = st.c.at[0, :, 0].add(1.0)
        att = jax.nn.one_hot(jnp.minimum(count.astype(jnp.int32),
                                         st.att.shape[1] - 1), st.att.shape[1])
        return logits, st._replace(c=new_c, att=att)


def test_early_exit_invariant_to_max_len():
    """All beams finish after k_emit+1 steps; a 16x larger max_len budget must
    return identical tokens/lengths/scores (the while_loop exits early)."""
    sos, eos = 1, 3                       # must be < the fake model's vocab (8)
    model = _EosAfterKModel(k_emit=3, eos_id=eos)
    B, T, D = 2, 12, 6
    enc = jnp.ones((B, T, D))
    enc_len = jnp.asarray([12, 9])
    kw = dict(sos_id=sos, eos_id=eos, beam_size=4, length_norm=1.0,
              coverage_beta=1e-3, coverage_tau=0.5)
    t1, l1, s1 = attention_beam_search(model, None, enc, enc_len,
                                       max_len=8, **kw)
    t2, l2, s2 = attention_beam_search(model, None, enc, enc_len,
                                       max_len=128, **kw)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(t1)[:, :8], np.asarray(t2)[:, :8])
    assert np.all(np.asarray(t2)[:, 8:] == 0)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(l1), [3, 3])
