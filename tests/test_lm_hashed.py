"""Hashed n-gram LM fusion for large vocabularies (SURVEY.md:145; VERDICT r1
item 5).

The dense V^(n-1) x V table cannot exist for BPE vocabs; these tests pin the
hashed-backoff replacement:
  * device ``hashed_lm_logp_rows`` == host ``BackoffLM.score`` exactly
    (f32), including short-history contexts and unseen n-grams;
  * prefix beam fusion with ``hash_lm`` == fusion with the dense table on
    the char vocab (identical LM -> identical outputs);
  * prefix beam fusion with a BPE vocab matches the host oracle;
  * the beam-sharded variant matches the unsharded one with hash_lm.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.data.bpe import train_bpe
from pytorch_asr_tpu.data.tokenizer import CharTokenizer
from pytorch_asr_tpu.decoding.lm import (
    read_arpa,
    tensorize,
    train_char_ngram,
    train_char_ngram_kn,
    write_arpa,
)
from pytorch_asr_tpu.decoding.lm_hashed import (
    build_hashed_lm,
    hashed_lm_logp_rows,
)
from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
from pytorch_asr_tpu.decoding.prefix_beam_ref import prefix_beam_search_ref

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "speech models learn tones and beams decode them",
    "hello world the model trains and the beam searches",
    "kernels run on device and the search stays on device",
] * 4


@pytest.fixture(scope="module")
def bpe_tok():
    return train_bpe(TEXTS, num_merges=80)


def _ctx_batch(rng, vocab, order, n):
    """(n, order-1) contexts incl. empty/short histories (leading zeros)."""
    C = order - 1
    ctx = rng.integers(1, vocab, size=(n, C)).astype(np.int32)
    hist = rng.integers(0, C + 1, size=n)  # true history length
    for i in range(n):
        ctx[i, : C - hist[i]] = 0
    return ctx


@pytest.mark.parametrize("order", [2, 3, 4])
def test_rows_match_host_scores_char(order):
    lm = train_char_ngram_kn(TEXTS, order=order)
    tok = CharTokenizer()
    hl = build_hashed_lm(lm, tok.vocab_size)
    rng = np.random.default_rng(0)
    ctx = _ctx_batch(rng, tok.vocab_size, order, 64)
    rows = np.asarray(hashed_lm_logp_rows(hl, jnp.asarray(ctx)))
    for i in range(ctx.shape[0]):
        true_ctx = tuple(int(x) for x in ctx[i] if x != 0)
        for c in range(tok.vocab_size):
            want = lm.score(true_ctx, c)
            np.testing.assert_allclose(rows[i, c], want, rtol=1e-5,
                                       err_msg=f"ctx={true_ctx} c={c}")


def test_rows_match_host_scores_bpe(bpe_tok):
    lm = train_char_ngram(TEXTS, order=3, tokenizer=bpe_tok)
    hl = build_hashed_lm(lm, bpe_tok.vocab_size)
    rng = np.random.default_rng(1)
    ctx = _ctx_batch(rng, bpe_tok.vocab_size, 3, 48)
    rows = np.asarray(hashed_lm_logp_rows(hl, jnp.asarray(ctx)))
    for i in range(ctx.shape[0]):
        true_ctx = tuple(int(x) for x in ctx[i] if x != 0)
        for c in range(bpe_tok.vocab_size):
            np.testing.assert_allclose(rows[i, c], lm.score(true_ctx, c),
                                       rtol=1e-5)


def test_hashed_matches_dense_beam_char():
    tok = CharTokenizer()
    lm = train_char_ngram_kn(TEXTS, order=3)
    table = jnp.asarray(tensorize(lm, tok))
    hl = build_hashed_lm(lm, tok.vocab_size)
    rng = np.random.default_rng(2)
    B, T, V = 3, 30, tok.vocab_size
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 5, T - 9], np.int32)
    td, ld, sd = prefix_beam_search(logits, lens, beam_size=8, lm_table=table,
                                    lm_alpha=0.5, lm_beta=0.4, max_len=T + 1)
    th, lh, sh = prefix_beam_search(logits, lens, beam_size=8, hash_lm=hl,
                                    lm_alpha=0.5, lm_beta=0.4, max_len=T + 1)
    np.testing.assert_array_equal(np.asarray(ld), np.asarray(lh))
    for b in range(B):
        n = int(ld[b])
        np.testing.assert_array_equal(np.asarray(td)[b, :n],
                                      np.asarray(th)[b, :n])
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sh), rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_bpe_beam_matches_host_oracle(bpe_tok, seed):
    lm = train_char_ngram(TEXTS, order=3, tokenizer=bpe_tok)
    hl = build_hashed_lm(lm, bpe_tok.vocab_size)
    rng = np.random.default_rng(seed)
    T, V = 20, bpe_tok.vocab_size
    logp = np.log(rng.dirichlet(np.ones(V) * 0.5, size=T).astype(np.float32))
    ref = prefix_beam_search_ref(logp, T, beam_size=8, lm=lm,
                                 lm_alpha=0.6, lm_beta=0.3)
    toks, lens, _ = prefix_beam_search(
        jnp.asarray(logp[None]), jnp.asarray([T]), beam_size=8, hash_lm=hl,
        lm_alpha=0.6, lm_beta=0.3, max_len=T + 1)
    got = list(np.asarray(toks)[0, : int(lens[0])])
    assert got == ref


def test_sharded_hash_lm_matches_unsharded(bpe_tok):
    from pytorch_asr_tpu.configs.base import MeshConfig
    from pytorch_asr_tpu.decoding.prefix_beam_sharded import (
        prefix_beam_search_sharded)
    from pytorch_asr_tpu.parallel.mesh import make_mesh

    lm = train_char_ngram(TEXTS, order=3, tokenizer=bpe_tok)
    hl = build_hashed_lm(lm, bpe_tok.vocab_size)
    rng = np.random.default_rng(3)
    B, T, V = 4, 16, bpe_tok.vocab_size
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.full((B,), T, np.int32)
    mesh = make_mesh(MeshConfig(model_axis=2))
    t1, l1, s1 = prefix_beam_search(logits, lens, beam_size=8, hash_lm=hl,
                                    lm_alpha=0.5, lm_beta=0.2, max_len=T + 1)
    t2, l2, s2 = prefix_beam_search_sharded(
        logits, lens, mesh, beam_size=8, hash_lm=hl,
        lm_alpha=0.5, lm_beta=0.2, max_len=T + 1)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    for b in range(B):
        n = int(l1[b])
        np.testing.assert_array_equal(np.asarray(t1)[b, :n],
                                      np.asarray(t2)[b, :n])


def test_arpa_roundtrip_bpe(bpe_tok, tmp_path):
    """write_arpa/read_arpa preserve BPE-piece n-grams (driver wiring)."""
    lm = train_char_ngram(TEXTS, order=2, tokenizer=bpe_tok)
    path = str(tmp_path / "bpe.arpa")
    write_arpa(lm, path, bpe_tok)
    lm2 = read_arpa(path, bpe_tok)
    for ng, lp in list(lm.logprobs.items())[:200]:
        if any(i in (bpe_tok.sos_id, bpe_tok.eos_id) for i in ng):
            continue
        assert ng in lm2.logprobs, ng
        np.testing.assert_allclose(lm2.logprobs[ng], lp, atol=2e-5)


def test_attention_beam_hashed_matches_dense():
    """Attention beam fusion: hash_lm == lm_table on the char vocab."""
    import importlib.util

    from pytorch_asr_tpu.decoding.attention_beam import attention_beam_search

    spec = importlib.util.spec_from_file_location(
        "tab", os.path.join(os.path.dirname(__file__),
                            "test_attention_beam.py"))
    tab = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tab)

    model, params, enc, enc_len, _ = tab._model_and_params(seed=3)
    tok = CharTokenizer()
    lm = train_char_ngram_kn(TEXTS, order=3, include_eos=True)
    table = jnp.asarray(tensorize(lm, tok))
    hl = build_hashed_lm(lm, tok.vocab_size)
    kw = dict(sos_id=tok.sos_id, eos_id=tok.eos_id, beam_size=4, max_len=10,
              lm_alpha=0.4)
    td, ld, sd = attention_beam_search(model, params, enc, enc_len,
                                       lm_table=table, **kw)
    th, lh, sh = attention_beam_search(model, params, enc, enc_len,
                                       hash_lm=hl, **kw)
    np.testing.assert_array_equal(np.asarray(ld), np.asarray(lh))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sh), rtol=1e-5)
    for b in range(enc.shape[0]):
        n = int(ld[b])
        np.testing.assert_array_equal(np.asarray(td)[b, :n],
                                      np.asarray(th)[b, :n])


def test_candidate_subset_rows_match_full():
    """hashed_lm_logp_rows(cands=subset) == full rows gathered at the subset
    (the acoustic-pruned fusion's exact path)."""
    lm = train_char_ngram_kn(TEXTS, order=3)
    tok = CharTokenizer()
    hl = build_hashed_lm(lm, tok.vocab_size)
    rng = np.random.default_rng(3)
    ctx = jnp.asarray(_ctx_batch(rng, tok.vocab_size, 3, 16))
    full = hashed_lm_logp_rows(hl, ctx)
    cands = jnp.asarray(rng.integers(0, tok.vocab_size, size=(16, 7)),
                        jnp.int32)
    sub = hashed_lm_logp_rows(hl, ctx, cands=cands)
    want = jnp.take_along_axis(full, cands, axis=-1)
    np.testing.assert_array_equal(np.asarray(sub), np.asarray(want))


def test_allmiss_rows_are_exact_for_unseen():
    """The stacked-backoff approximation equals the exact score whenever the
    candidate hits no higher-order table."""
    from pytorch_asr_tpu.decoding.lm_hashed import hashed_lm_allmiss_rows

    lm = train_char_ngram_kn(TEXTS, order=3)
    tok = CharTokenizer()
    hl = build_hashed_lm(lm, tok.vocab_size)
    rng = np.random.default_rng(4)
    ctx = jnp.asarray(_ctx_batch(rng, tok.vocab_size, 3, 32))
    full = np.asarray(hashed_lm_logp_rows(hl, ctx))
    approx = np.asarray(hashed_lm_allmiss_rows(hl, ctx))
    for i in range(ctx.shape[0]):
        true_ctx = tuple(int(x) for x in np.asarray(ctx)[i] if x != 0)
        for c in range(tok.vocab_size):
            seen = any((true_ctx[len(true_ctx) - m:] + (c,)) in lm.logprobs
                       for m in range(1, len(true_ctx) + 1))
            if not seen:
                np.testing.assert_allclose(approx[i, c], full[i, c],
                                           rtol=1e-5, atol=1e-6)


def test_beam_lm_top_k_full_width_is_exact():
    """lm_top_k >= V falls back to the exact path (identical outputs); a
    small A exercises the pruned scatter path and still decodes."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search

    tok = CharTokenizer()
    lm = train_char_ngram_kn(TEXTS, order=3)
    hl = build_hashed_lm(lm, tok.vocab_size)
    rng = np.random.default_rng(5)
    B, T, V = 2, 20, tok.vocab_size
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32)) * 2
    lens = jnp.full((B,), T, jnp.int32)
    kw = dict(beam_size=4, hash_lm=hl, lm_alpha=0.5, lm_beta=0.4,
              max_len=T + 1, use_fused=False)
    t0, n0, s0 = prefix_beam_search(logits, lens, **kw)
    t1, n1, s1 = prefix_beam_search(logits, lens, lm_top_k=V, **kw)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    t2, n2, _ = prefix_beam_search(logits, lens, lm_top_k=8, **kw)
    assert np.asarray(n2).min() >= 0  # decodes without error


def test_ext_top_a_full_width_matches_unrestricted():
    """ext_top_a = V admits every candidate with its exact LM score, so the
    restricted search must reproduce the unrestricted one exactly (modulo
    tie order, which continuous random logits never hit)."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search

    tok = CharTokenizer()
    lm = train_char_ngram_kn(TEXTS, order=3)
    hl = build_hashed_lm(lm, tok.vocab_size)
    rng = np.random.default_rng(9)
    B, T, V = 2, 20, tok.vocab_size
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32)) * 2
    lens = jnp.asarray([T, T - 4], jnp.int32)
    kw = dict(beam_size=4, hash_lm=hl, lm_alpha=0.5, lm_beta=0.4,
              max_len=T + 1, use_fused=False)
    t0, n0, s0 = prefix_beam_search(logits, lens, **kw)
    t1, n1, s1 = prefix_beam_search(logits, lens, ext_top_a=V - 1, **kw)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)


def test_ext_top_a_small_matches_on_peaked_logits(bpe_tok):
    """With mass concentrated on few chars per frame, a small A reproduces
    the unrestricted BPE search token-for-token (the WER-parity property:
    the pruned char never survives the merge anyway)."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search

    lm = train_char_ngram_kn(TEXTS, order=3, tokenizer=bpe_tok)
    V = bpe_tok.vocab_size
    hl = build_hashed_lm(lm, V)
    rng = np.random.default_rng(11)
    B, T, K = 2, 18, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    path = rng.integers(0, V, size=(B, T))
    for b in range(B):
        logits[b, np.arange(T), path[b]] += 6.0
    logits = jnp.asarray(logits)
    lens = jnp.full((B,), T, jnp.int32)
    kw = dict(beam_size=K, hash_lm=hl, lm_alpha=0.4, lm_beta=0.3,
              max_len=T + 1, use_fused=False)
    t0, n0, _ = prefix_beam_search(logits, lens, **kw)
    t1, n1, _ = prefix_beam_search(logits, lens, ext_top_a=16, **kw)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_ext_top_a_rnn_fusion_matches():
    """Restricted search under RNN-LM fusion: full-width A equals the
    unrestricted RNN-fusion search (carry gathers ride parent/append)."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
    from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig

    import jax

    tok = CharTokenizer()
    V = tok.vocab_size
    rnn = CharRNNLM(RNNLMConfig(embed_dim=8, hidden_dim=16, num_layers=1),
                    vocab_size=V)
    params = rnn.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4), jnp.int32))["params"]
    rng = np.random.default_rng(13)
    B, T = 2, 14
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32)) * 2
    lens = jnp.full((B,), T, jnp.int32)
    kw = dict(beam_size=4, rnn_lm=rnn, rnn_lm_params=params, lm_alpha=0.4,
              sos_id=tok.sos_id, max_len=T + 1, use_fused=False)
    t0, n0, s0 = prefix_beam_search(logits, lens, **kw)
    t1, n1, s1 = prefix_beam_search(logits, lens, ext_top_a=V - 1, **kw)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)
