"""Fully-fused Pallas prefix beam search vs the XLA beam (interpret mode).

The XLA beam is itself parity-tested against the host oracle
(tests/test_prefix_beam.py), so token equality here chains to the oracle.
Shapes stay tiny: interpreter mode executes the unrolled per-frame body in
Python.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
from pytorch_asr_tpu.ops import runtime
from pytorch_asr_tpu.ops.beam_pallas import (prefix_beam_fused,
                                             prefix_beam_fused_lanes,
                                             prefix_beam_fused_lanes_topa)


@pytest.fixture(autouse=True)
def _interpret():
    runtime.force_interpret(True)
    yield
    runtime.force_interpret(None)


def _compare(logits, lens, K, L, fused=prefix_beam_fused):
    tk, lk, sk = fused(logits, lens, beam_size=K, max_len=L)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(logits.shape[0]):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_beam_matches_xla_beam(seed):
    rng = np.random.default_rng(seed)
    B, T, V, K, L = 2, 16, 32, 8, 20
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 5], np.int32)
    _compare(logits, lens, K, L)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lanes_beam_matches_xla_beam(seed):
    rng = np.random.default_rng(seed)
    B, T, V, K, L = 2, 16, 32, 8, 20
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 5], np.int32)
    _compare(logits, lens, K, L, fused=prefix_beam_fused_lanes)


@pytest.mark.parametrize("seed,A", [(0, 8), (1, 16), (5, 8)])
def test_lanes_topa_matches_restricted_scan(seed, A):
    """Restricted-candidate lane kernel vs the scan's ext_top_a search:
    identical search (shared per-row top-A ext candidates, sparse
    hash-equality absorption), token + length equality and score parity."""
    rng = np.random.default_rng(seed)
    B, T, V, K, L = 3, 20, 64, 8, 24
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 6, T // 2], np.int32)
    tk, lk, sk = prefix_beam_fused_lanes_topa(logits, lens, beam_size=K,
                                              max_len=L, top_a=A)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    ext_top_a=A, use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("seed,n_ctx_pow", [(0, 2), (1, 1), (4, 2)])
def test_lanes_beam_dense_lm_matches_xla_beam(seed, n_ctx_pow):
    """In-kernel dense shallow fusion: token parity + fused-score parity
    against the scan path with the same (n_ctx, V) table (bigram and
    trigram-style context widths)."""
    rng = np.random.default_rng(seed)
    B, T, V, K, L = 2, 16, 16, 8, 20
    n_ctx = V ** n_ctx_pow
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 5], np.int32)
    tab = rng.normal(size=(n_ctx, V)).astype(np.float32)
    tab = jnp.asarray(tab - np.log(np.exp(tab).sum(axis=1, keepdims=True)))
    tk, lk, sk = prefix_beam_fused_lanes(logits, lens, beam_size=K, max_len=L,
                                         lm_table=tab, lm_alpha=0.4,
                                         lm_beta=1.2)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    lm_table=tab, lm_alpha=0.4, lm_beta=1.2,
                                    use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("seed,A,n_ctx_pow", [(0, 8, 2), (1, 16, 1), (4, 8, 2)])
def test_lanes_topa_dense_lm_matches_restricted_scan(seed, A, n_ctx_pow):
    """Dense+top-A fused route (round 5): the restricted lane kernel with a
    VMEM-resident dense table vs the scan's lm_table + ext_top_a search."""
    rng = np.random.default_rng(seed)
    B, T, V, K, L = 2, 16, 32, 8, 20
    n_ctx = V ** n_ctx_pow
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 5], np.int32)
    tab = rng.normal(size=(n_ctx, V)).astype(np.float32)
    tab = jnp.asarray(tab - np.log(np.exp(tab).sum(axis=1, keepdims=True)))
    tk, lk, sk = prefix_beam_fused_lanes_topa(
        logits, lens, beam_size=K, max_len=L, top_a=A, lm_table=tab,
        lm_alpha=0.4, lm_beta=1.2)
    tx, lx, sx = prefix_beam_search(
        logits, lens, beam_size=K, max_len=L, ext_top_a=A, lm_table=tab,
        lm_alpha=0.4, lm_beta=1.2, use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("seed,A,nl", [(0, 8, 1), (1, 8, 2), (3, 16, 2)])
def test_lanes_topa_rnn_matches_restricted_scan(seed, A, nl):
    """In-kernel RNN-LM fusion (round 5): the restricted lane kernel with
    the neural LM advanced INSIDE the kernel vs the scan's ext_top_a +
    rnn_lm search -- token + length equality, score parity."""
    from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig
    from pytorch_asr_tpu.ops.beam_pallas import (
        prefix_beam_fused_lanes_topa_rnn)

    rng = np.random.default_rng(seed)
    B, T, V, K, L = 2, 14, 32, 8, 20
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 5], np.int32)
    rnn = CharRNNLM(RNNLMConfig(embed_dim=8, hidden_dim=16, num_layers=nl),
                    vocab_size=V)
    params = rnn.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 4), jnp.int32))["params"]
    tk, lk, sk = prefix_beam_fused_lanes_topa_rnn(
        logits, lens, rnn, params, beam_size=K, max_len=L, top_a=A,
        lm_alpha=0.4, lm_beta=0.7, sos_id=29)
    tx, lx, sx = prefix_beam_search(
        logits, lens, beam_size=K, max_len=L, ext_top_a=A, rnn_lm=rnn,
        rnn_lm_params=params, lm_alpha=0.4, lm_beta=0.7, sos_id=29,
        use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-5,
                               atol=1e-5)


def test_lanes_beam_blank_dominated_gives_empty():
    B, T, V = 1, 12, 32
    logits = np.full((B, T, V), -8.0, np.float32)
    logits[..., 0] = 6.0                     # blank wins everywhere
    tk, lk, sk = prefix_beam_fused_lanes(jnp.asarray(logits),
                                         jnp.asarray([T], np.int32),
                                         beam_size=4, max_len=16)
    assert int(lk[0]) == 0
    assert np.isfinite(float(sk[0]))


def test_fused_beam_blank_dominated_gives_empty():
    B, T, V = 1, 12, 32
    logits = np.full((B, T, V), -8.0, np.float32)
    logits[..., 0] = 6.0                     # blank wins everywhere
    tk, lk, sk = prefix_beam_fused(jnp.asarray(logits),
                                   jnp.asarray([T], np.int32),
                                   beam_size=4, max_len=16)
    assert int(lk[0]) == 0
    assert np.isfinite(float(sk[0]))


def test_fused_beam_peaky_decodes_argmax_sequence():
    """A peaky distribution has one dominant path: beam == greedy collapse."""
    from pytorch_asr_tpu.decoding.greedy import greedy_ctc

    rng = np.random.default_rng(3)
    B, T, V = 1, 14, 32
    path = rng.integers(0, 6, T)             # mix of blanks + chars
    logits = np.full((B, T, V), -10.0, np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 8.0
    lens = jnp.asarray([T], np.int32)
    tk, lk, _ = prefix_beam_fused(jnp.asarray(logits), lens, beam_size=4,
                                  max_len=16)
    g_ids, g_n = greedy_ctc(jnp.asarray(logits), lens)
    np.testing.assert_array_equal(np.asarray(tk)[0, : int(lk[0])],
                                  np.asarray(g_ids)[0, : int(g_n[0])])


def test_ext_top_a_geq_vocab_is_unrestricted_not_kernel():
    """ext_top_a >= V means 'unrestricted' in the scan; the auto/forced
    fused dispatch must not hand it to the restricted kernel (which requires
    A < V)."""
    rng = np.random.default_rng(2)
    B, T, V, K, L = 2, 10, 16, 4, 12
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 3], np.int32)
    tk, lk, _ = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                   ext_top_a=V, use_fused=True)
    tx, lx, _ = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                   use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    np.testing.assert_array_equal(np.asarray(tk), np.asarray(tx))


def test_lanes_rnn_fullvocab_matches_unrestricted_scan():
    """top_a == V (round 5): the RNN-fused lane kernel runs the
    UNRESTRICTED search -- parity vs the plain rnn_lm scan, including via
    the use_fused=True dispatch with ext_top_a=0."""
    from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig
    from pytorch_asr_tpu.ops.beam_pallas import (
        prefix_beam_fused_lanes_topa_rnn)

    rng = np.random.default_rng(21)
    B, T, V, K, L = 2, 12, 16, 4, 16
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 4], np.int32)
    rnn = CharRNNLM(RNNLMConfig(embed_dim=8, hidden_dim=16, num_layers=1),
                    vocab_size=V)
    params = rnn.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 4), jnp.int32))["params"]
    tk, lk, sk = prefix_beam_fused_lanes_topa_rnn(
        logits, lens, rnn, params, beam_size=K, max_len=L, top_a=V,
        lm_alpha=0.3, lm_beta=0.6, sos_id=V - 1)
    tx, lx, sx = prefix_beam_search(
        logits, lens, beam_size=K, max_len=L, rnn_lm=rnn,
        rnn_lm_params=params, lm_alpha=0.3, lm_beta=0.6, sos_id=V - 1,
        use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-5,
                               atol=1e-5)
    td, ld, _ = prefix_beam_search(
        logits, lens, beam_size=K, max_len=L, rnn_lm=rnn,
        rnn_lm_params=params, lm_alpha=0.3, lm_beta=0.6, sos_id=V - 1,
        use_fused=True)
    np.testing.assert_array_equal(np.asarray(ld), np.asarray(lx))
    np.testing.assert_array_equal(np.asarray(td), np.asarray(tx))


def test_stepwise_lanes_matches_scan():
    """The per-frame pallas_call study variant (sharded-fused stand-in)
    must still be token-identical to the scan."""
    from pytorch_asr_tpu.ops.beam_pallas import prefix_beam_lanes_stepwise

    rng = np.random.default_rng(5)
    B, T, V, K, L = 2, 12, 16, 4, 16
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 3], np.int32)
    tk, lk, sk = prefix_beam_lanes_stepwise(logits, lens, beam_size=K,
                                            max_len=L)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-5)


def test_rolled_inner_loops_match_scan():
    """ROLLED_INNER=True (fori_loop top-K rounds + absorb, the round-5
    compile-time study) must select identically to the unrolled body."""
    from pytorch_asr_tpu.ops import beam_pallas as bp

    rng = np.random.default_rng(11)
    B, T, V, K, L = 2, 14, 32, 8, 20
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 4], np.int32)
    old = bp.ROLLED_INNER
    bp.ROLLED_INNER = True
    try:
        tk, lk, sk = prefix_beam_fused_lanes(logits, lens, beam_size=K,
                                             max_len=L)
        ta, la, sa = prefix_beam_fused_lanes_topa(logits, lens, beam_size=K,
                                                  max_len=L, top_a=8)
    finally:
        bp.ROLLED_INNER = old
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-5)
    ty, ly, sy = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    ext_top_a=8, use_fused=False)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(ly))
    for b in range(B):
        n = int(la[b])
        np.testing.assert_array_equal(np.asarray(ta)[b, :n],
                                      np.asarray(ty)[b, :n])


def test_forced_fused_dispatch_rnn_and_dense_topa():
    """prefix_beam_search(use_fused=True) must route the new round-5
    combinations (rnn_lm + ext_top_a, lm_table + ext_top_a) through the
    lane kernels and match the scan token-for-token."""
    from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig

    rng = np.random.default_rng(7)
    B, T, V, K, L, A = 2, 12, 32, 4, 16, 8
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 4], np.int32)
    rnn = CharRNNLM(RNNLMConfig(embed_dim=8, hidden_dim=16, num_layers=1),
                    vocab_size=V)
    params = rnn.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4), jnp.int32))["params"]
    tab = rng.normal(size=(V, V)).astype(np.float32)
    tab = jnp.asarray(tab - np.log(np.exp(tab).sum(axis=1, keepdims=True)))
    for kw in ({"rnn_lm": rnn, "rnn_lm_params": params},
               {"lm_table": tab}):
        tk, lk, _ = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                       ext_top_a=A, lm_alpha=0.3, lm_beta=0.5,
                                       use_fused=True, **kw)
        tx, lx, _ = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                       ext_top_a=A, lm_alpha=0.3, lm_beta=0.5,
                                       use_fused=False, **kw)
        np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
        np.testing.assert_array_equal(np.asarray(tk), np.asarray(tx))


def test_fused_falls_back_when_batch_indivisible_by_data_axis():
    """Under an active data mesh, a batch not divisible by the data axis
    must fall back to the scan (GSPMD partitions it freely) instead of
    erroring inside shard_map."""
    from pytorch_asr_tpu.configs.base import MeshConfig
    from pytorch_asr_tpu.parallel.mesh import make_mesh, use_mesh

    rng = np.random.default_rng(3)
    B, T, V, K, L = 4, 10, 16, 4, 12        # B=4 vs 8 devices: indivisible
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = jnp.asarray([T, T - 1, T - 2, T], np.int32)
    mesh = make_mesh(MeshConfig(data_axis=8, model_axis=1))
    assert mesh.shape["data"] == 8
    with use_mesh(mesh):
        tk, lk, _ = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                       use_fused=True)
    tx, lx, _ = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                   use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    np.testing.assert_array_equal(np.asarray(tk), np.asarray(tx))
