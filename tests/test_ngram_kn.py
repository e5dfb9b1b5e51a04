"""Modified Kneser-Ney n-gram trainer tests (KenLM-equivalent estimator)."""

import math

import numpy as np
import pytest

from pytorch_asr_tpu.data.synthetic import synthetic_texts
from pytorch_asr_tpu.data.tokenizer import CharTokenizer
from pytorch_asr_tpu.decoding import lm as lm_mod

TOK = CharTokenizer()
V = TOK.vocab_size


@pytest.fixture(scope="module")
def kn_lm():
    return lm_mod.train_char_ngram_kn(synthetic_texts(256, seed=0), order=4)


def _sum_prob(lm, ctx):
    return sum(math.exp(lm.score(ctx, c)) for c in range(V))


def test_kn_normalized(kn_lm):
    """sum_c P(c | ctx) == 1 for empty, seen, and unseen contexts -- the
    invariant that separates a real backoff estimator from an ad-hoc one."""
    ids = [int(i) for i in TOK.encode("the quick")]
    contexts = [
        (),                       # unigram
        tuple(ids[:1]),           # seen short context
        tuple(ids[:3]),           # seen full context
        (ids[0], ids[0], ids[0]), # almost surely unseen ('ttt')
    ]
    for ctx in contexts:
        s = _sum_prob(kn_lm, ctx)
        assert abs(s - 1.0) < 5e-3, (ctx, s)


def test_kn_beats_addk_on_heldout():
    train = synthetic_texts(256, seed=0)
    held = synthetic_texts(64, seed=99)
    kn = lm_mod.train_char_ngram_kn(train, order=3)
    addk = lm_mod.train_char_ngram(train, order=3)
    ppl_kn = lm_mod.perplexity(kn, held)
    ppl_addk = lm_mod.perplexity(addk, held)
    assert ppl_kn < ppl_addk, (ppl_kn, ppl_addk)
    assert ppl_kn < 10.0  # char LM on a 20-word vocab corpus


def test_arpa_roundtrip(tmp_path, kn_lm):
    path = str(tmp_path / "kn.arpa")
    lm_mod.write_arpa(kn_lm, path)
    back = lm_mod.read_arpa(path)
    assert back.order == kn_lm.order
    rng = np.random.default_rng(0)
    ids = [int(i) for i in TOK.encode("the quick brown fox jumps")]
    for _ in range(50):
        i = int(rng.integers(0, len(ids) - 1))
        n_ctx = int(rng.integers(0, 4))
        ctx = tuple(ids[max(0, i - n_ctx) : i])
        c = ids[i]
        np.testing.assert_allclose(back.score(ctx, c), kn_lm.score(ctx, c),
                                   rtol=0, atol=2e-5)


def test_tensorize_matches_score(kn_lm):
    table = lm_mod.tensorize(kn_lm, order=3)
    ids = [int(i) for i in TOK.encode("fox")]
    ctx = tuple(ids[:2])
    row = ctx[0] * V + ctx[1]
    for c in [ids[2], 5, 20]:
        np.testing.assert_allclose(table[row, c], kn_lm.score(ctx, c),
                                   rtol=1e-5, atol=1e-5)


def test_include_eos_trains_eos_slot():
    texts = synthetic_texts(128, seed=3)
    with_eos = lm_mod.train_char_ngram_kn(texts, order=3, include_eos=True)
    without = lm_mod.train_char_ngram_kn(texts, order=3)
    ids = [int(i) for i in TOK.encode(texts[0])]
    ctx = tuple(ids[-2:])
    assert with_eos.score(ctx, TOK.eos_id) > without.score(ctx, TOK.eos_id)


def test_cli_smoke(tmp_path):
    from pytorch_asr_tpu.train_ngram import main

    out = str(tmp_path / "lm.arpa")
    held = tmp_path / "held.txt"
    held.write_text("\n".join(synthetic_texts(8, seed=7)))
    main([out, "order=3", "num_synthetic=64", f"heldout={held}"])
    lm = lm_mod.read_arpa(out)
    assert lm.order == 3
    assert _sum_prob(lm, ()) == pytest.approx(1.0, abs=5e-3)
