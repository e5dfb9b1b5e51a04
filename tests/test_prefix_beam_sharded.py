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
