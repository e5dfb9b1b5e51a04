"""Batched TPU prefix beam search parity vs the host reference oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_asr_tpu.data.tokenizer import CharTokenizer
from pytorch_asr_tpu.decoding.lm import (
    BackoffLM, roll_context, tensorize, train_char_ngram)
from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
from pytorch_asr_tpu.decoding.prefix_beam_ref import prefix_beam_search_ref


def _random_logp(rng, T, V, peaked=True):
    logits = rng.standard_normal((T, V)).astype(np.float32)
    if peaked:
        # bias towards a random sparse path so beams differ meaningfully
        path = rng.integers(0, V, size=T)
        logits[np.arange(T), path] += 3.0
    e = np.exp(logits - logits.max(1, keepdims=True))
    p = e / e.sum(1, keepdims=True)
    return np.log(p)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_beam_matches_reference_no_lm(seed):
    rng = np.random.default_rng(seed)
    T, V, K = 20, 6, 8
    logp = _random_logp(rng, T, V)
    ref = prefix_beam_search_ref(logp, T, beam_size=K)
    toks, lens, scores = prefix_beam_search(
        jnp.asarray(logp[None]), jnp.asarray([T]), beam_size=K, max_len=T + 1)
    got = list(np.asarray(toks)[0][: int(lens[0])])
    assert got == ref, (got, ref)


def test_beam_batched_consistency():
    """Each row of a batch must decode identically to a singleton run."""
    rng = np.random.default_rng(7)
    B, T, V, K = 4, 15, 5, 8
    logps = [_random_logp(rng, T, V) for _ in range(B)]
    lens = [T, T - 3, T - 7, 5]
    batch_logp = np.stack(logps)
    toks, out_lens, _ = prefix_beam_search(
        jnp.asarray(batch_logp), jnp.asarray(lens), beam_size=K, max_len=T + 1)
    for b in range(B):
        t1, l1, _ = prefix_beam_search(
            jnp.asarray(logps[b][None]), jnp.asarray([lens[b]]),
            beam_size=K, max_len=T + 1)
        assert list(np.asarray(toks)[b][: int(out_lens[b])]) == \
            list(np.asarray(t1)[0][: int(l1[0])])


def test_beam_beats_or_equals_greedy():
    """Beam-1 equals best-path collapse family; larger beams never score worse."""
    rng = np.random.default_rng(3)
    T, V = 25, 6
    logp = _random_logp(rng, T, V, peaked=False)
    _, _, s1 = prefix_beam_search(jnp.asarray(logp[None]), jnp.asarray([T]),
                                  beam_size=1, max_len=T + 1)
    _, _, s8 = prefix_beam_search(jnp.asarray(logp[None]), jnp.asarray([T]),
                                  beam_size=8, max_len=T + 1)
    assert float(s8[0]) >= float(s1[0]) - 1e-4


@pytest.mark.parametrize("seed", [0, 1])
def test_beam_matches_reference_with_lm(seed):
    tok = CharTokenizer()
    lm = train_char_ngram(
        ["the cat sat on the mat", "the dog ate the cat", "a cat and a dog"],
        order=3, tokenizer=tok)
    table = tensorize(lm, tok)
    rng = np.random.default_rng(seed)
    T, V, K = 18, tok.vocab_size, 8
    logp = _random_logp(rng, T, V)
    alpha, beta = 0.4, 0.6
    ref = prefix_beam_search_ref(logp, T, beam_size=K, lm=lm,
                                 lm_alpha=alpha, lm_beta=beta)
    toks, lens, _ = prefix_beam_search(
        jnp.asarray(logp[None]), jnp.asarray([T]), beam_size=K,
        lm_table=jnp.asarray(table), lm_alpha=alpha, lm_beta=beta,
        lm_order=3, max_len=T + 1)
    got = list(np.asarray(toks)[0][: int(lens[0])])
    assert got == ref, (got, ref)


def test_lm_backoff_score_and_tensorize_agree():
    tok = CharTokenizer()
    lm = train_char_ngram(["abba cabba", "banana bandana"], order=3, tokenizer=tok)
    table = tensorize(lm, tok)
    V = tok.vocab_size
    rng = np.random.default_rng(0)
    ctx_ids = [(), (1,), (2, 3), (5, 1)]
    for ctx in ctx_ids:
        row = 0
        for c in ctx:
            row = roll_context(row, c, V, 3)
        for c in rng.integers(1, V, size=5):
            np.testing.assert_allclose(table[row, c], lm.score(ctx, int(c)),
                                       rtol=1e-5)


def test_lm_fusion_changes_output_towards_lm():
    """With a strongly peaked LM, fusion should steer ties toward LM text."""
    tok = CharTokenizer()
    lm = train_char_ngram(["aaaa aaaa aaaa"], order=2, tokenizer=tok)
    table = tensorize(lm, tok)
    a = int(tok.encode("a")[0])
    b = int(tok.encode("b")[0])
    V = tok.vocab_size
    T = 6
    # acoustically ambiguous between 'a' and 'b'
    logp = np.full((T, V), -10.0, np.float32)
    logp[:, a] = np.log(0.45)
    logp[:, b] = np.log(0.45)
    logp[:, 0] = np.log(0.1 / 28)
    toks, lens, _ = prefix_beam_search(
        jnp.asarray(logp[None]), jnp.asarray([T]), beam_size=8,
        lm_table=jnp.asarray(table), lm_alpha=1.0, lm_beta=0.0,
        lm_order=2, max_len=T + 1)
    out = list(np.asarray(toks)[0][: int(lens[0])])
    assert all(t == a for t in out), out
