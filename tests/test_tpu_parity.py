"""On-hardware kernel parity checks (opt-in; skipped on the CPU test mesh).

Run alone against a real chip:

    ASR_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py -q

Why this exists: interpreter-mode tests execute the same arithmetic as the
reference, so they cannot see TPU-compile-specific numerics.  Investigating a
suspected reverse-direction LSTM bug showed the real hazard class: XLA fusing
a jnp.flip into a bf16 matmul changes its accumulation order by ulps, and a
250-step recurrence amplifies that to O(1) output changes.  The kernels are
bit-exact against flip-free references on hardware; these tests pin that.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("ASR_TPU_TESTS", "") != "1"
    or jax.default_backend() not in ("tpu",),
    reason="needs ASR_TPU_TESTS=1 and a real TPU backend",
)


def _lstm_case(B=32, T=96, D=64, H=64):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.3, jnp.float32)
    wih = jax.nn.initializers.xavier_uniform()(
        jax.random.PRNGKey(0), (D, 4 * H), jnp.float32)
    whh = jax.nn.initializers.orthogonal()(
        jax.random.PRNGKey(1), (H, 4 * H), jnp.float32)
    b = jnp.zeros((4 * H,), jnp.float32).at[H:2 * H].set(1.0)
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=B), jnp.int32)
    return x, wih, whh, b, lens


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_kernel_bitexact_vs_flipfree_scan_on_tpu(reverse):
    from pytorch_asr_tpu.models.encoder_bilstm import _lstm_scan
    from pytorch_asr_tpu.ops.lstm_pallas import lstm_seq

    x, wih, whh, b, lens = _lstm_case()
    T = x.shape[1]

    def ref(x, wih, whh, b):
        xp = jnp.swapaxes((x @ wih + b).astype(jnp.float32), 0, 1)
        valid = jnp.arange(T)[:, None] < lens[None, :]
        hs = _lstm_scan(xp, whh, valid, reverse=reverse)
        hs = jnp.where(valid[..., None], hs, 0.0)
        return jnp.swapaxes(hs, 0, 1)

    ours = jax.jit(lstm_seq, static_argnums=(5, 6, 7))(
        x, wih, whh, b, lens, reverse, None, jnp.float32)
    want = jax.jit(ref)(x, wih, whh, b)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(want))


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_kernel_grads_close_on_tpu(reverse):
    from pytorch_asr_tpu.models.encoder_bilstm import _lstm_scan
    from pytorch_asr_tpu.ops.lstm_pallas import lstm_seq

    x, wih, whh, b, lens = _lstm_case()
    T = x.shape[1]

    def loss_k(x, wih, whh, b):
        return jnp.sum(jnp.tanh(lstm_seq(x, wih, whh, b, lens, reverse)))

    def loss_r(x, wih, whh, b):
        xp = jnp.swapaxes((x @ wih + b).astype(jnp.float32), 0, 1)
        valid = jnp.arange(T)[:, None] < lens[None, :]
        hs = _lstm_scan(xp, whh, valid, reverse=reverse)
        hs = jnp.where(valid[..., None], hs, 0.0)
        return jnp.sum(jnp.tanh(hs))

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))(x, wih, whh, b)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(x, wih, whh, b)
    for nm, a, c in zip(("dx", "dwih", "dwhh", "db"), gk, gr):
        scale = np.abs(np.asarray(c)).max() + 1e-6
        rel = np.abs(np.asarray(a) - np.asarray(c)).max() / scale
        assert rel < 0.02, f"{nm}: rel {rel:.3e}"


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_kernel_grads_partial_block_on_tpu(reverse):
    """Partial-last-block backward on real hardware, where OOB block-load
    bits are genuinely undefined (interpret mode gives defined padding, so
    CPU tests cannot reproduce this hazard).  T=100 with tc=32 leaves a
    4-row partial block; one sequence is full-length so the reverse chain's
    first processed step sits at t_total-1."""
    from pytorch_asr_tpu.models.encoder_bilstm import _lstm_scan
    from pytorch_asr_tpu.ops.lstm_pallas import _pick_tc, lstm_seq

    B, T = 32, 100
    assert T >= _pick_tc(B) and T % _pick_tc(B) != 0
    x, wih, whh, b, lens = _lstm_case(B=B, T=T)
    lens = lens.at[0].set(T)

    def loss_k(x, wih, whh, b):
        return jnp.sum(jnp.tanh(lstm_seq(x, wih, whh, b, lens, reverse)))

    def loss_r(x, wih, whh, b):
        xp = jnp.swapaxes((x @ wih + b).astype(jnp.float32), 0, 1)
        valid = jnp.arange(T)[:, None] < lens[None, :]
        hs = _lstm_scan(xp, whh, valid, reverse=reverse)
        hs = jnp.where(valid[..., None], hs, 0.0)
        return jnp.sum(jnp.tanh(hs))

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))(x, wih, whh, b)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(x, wih, whh, b)
    for nm, a, c in zip(("dx", "dwih", "dwhh", "db"), gk, gr):
        assert np.all(np.isfinite(np.asarray(a))), f"{nm}: non-finite"
        scale = np.abs(np.asarray(c)).max() + 1e-6
        rel = np.abs(np.asarray(a) - np.asarray(c)).max() / scale
        assert rel < 0.02, f"{nm}: rel {rel:.3e}"


def test_stft_kernel_parity_on_tpu():
    from pytorch_asr_tpu.configs.base import FrontendConfig
    from pytorch_asr_tpu.frontend import features
    from pytorch_asr_tpu.ops.stft_pallas import log_mel_pallas

    cfg = FrontendConfig()
    rng = np.random.default_rng(1)
    B, A = 8, 16000 * 2
    audio = jnp.asarray(rng.standard_normal((B, A)) * 0.1, jnp.float32)
    alen = jnp.asarray(rng.integers(A // 2, A + 1, size=B), jnp.int32)
    ref_feats, ref_len = jax.jit(
        lambda a, l: features.log_mel(a, l, cfg))(audio, alen)
    pl_feats, pl_len = jax.jit(
        lambda a, l: log_mel_pallas(a, l, cfg))(audio, alen)
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(pl_len))
    # bf16x3 DFT/mel matmul path: tolerance = the kernel's documented parity
    # bound on normalized log-mels (IMPLEMENTATION.md: 3.3e-2 max-abs).
    np.testing.assert_allclose(np.asarray(pl_feats), np.asarray(ref_feats),
                               atol=6e-2)


def test_tcn_train_kernel_sliced_weights_on_tpu():
    """Mosaic-compiles and matches XLA with GLU-pair-SLICED weights — the
    per-shard shapes of TCN tensor parallelism ((K, C, 2C/m) + (C/m, C) at
    m=2, C=384: non-128-multiple GLU split at 192 lanes).  A real multi-chip
    mesh is unavailable here (1 chip), so this pins the kernel-shape half of
    the TP path on hardware; the shard_map half is covered on the CPU mesh."""
    import numpy as np

    from pytorch_asr_tpu.ops.dilated_conv_pallas import tcn_block_train

    C, K, m = 384, 5, 2
    cm = C // m
    rng = np.random.default_rng(3)
    B, T = 4, 100
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.3)
    s = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1 + 1.0)
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.standard_normal((K, C, 2 * C)).astype(np.float32) * 0.05)
    bc = jnp.asarray(rng.standard_normal(2 * C).astype(np.float32) * 0.05)
    wp = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.05)
    bp = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.05)

    def shard_slice(k):
        wc_l = jnp.concatenate([wc[:, :, k * cm:(k + 1) * cm],
                                wc[:, :, C + k * cm:C + (k + 1) * cm]], axis=2)
        bc_l = jnp.concatenate([bc[k * cm:(k + 1) * cm],
                                bc[C + k * cm:C + (k + 1) * cm]])
        wp_l = wp[k * cm:(k + 1) * cm]
        return wc_l, bc_l, wp_l

    full = jax.jit(lambda: tcn_block_train(x, s, b, wc, bc, wp, bp, 2))()
    partial_sum = None
    for k in range(m):
        wc_l, bc_l, wp_l = shard_slice(k)
        y = jax.jit(lambda wcl, bcl, wpl: tcn_block_train(
            x, s, b, wcl, bcl, wpl, bp / m, 2))(wc_l, bc_l, wp_l)
        partial_sum = y if partial_sum is None else partial_sum + y
    np.testing.assert_allclose(np.asarray(partial_sum), np.asarray(full),
                               rtol=1e-4, atol=1e-4)
    # gradient path with sliced shapes compiles and is finite
    wc_l, bc_l, wp_l = shard_slice(0)
    g = jax.jit(jax.grad(lambda xx: jnp.sum(
        tcn_block_train(xx, s, b, wc_l, bc_l, wp_l, bp / m, 2) ** 2)))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_hashed_lm_rows_on_tpu():
    """Bucketized (bitcast-packed) hashed-LM lookup on hardware: rows match
    the host BackoffLM exactly (the CPU tests cover interpret-free XLA, but
    the bitcast + row-gather path deserves an on-chip pin)."""
    import numpy as np

    from pytorch_asr_tpu.data.tokenizer import CharTokenizer
    from pytorch_asr_tpu.decoding.lm import train_char_ngram_kn
    from pytorch_asr_tpu.decoding.lm_hashed import (
        build_hashed_lm, hashed_lm_logp_rows)

    texts = ["the cat sat on the mat", "a dog ate the cat food",
             "beams decode tones on device"] * 3
    lm = train_char_ngram_kn(texts, order=3)
    tok = CharTokenizer()
    hl = build_hashed_lm(lm, tok.vocab_size)
    rng = np.random.default_rng(4)
    ctx = rng.integers(0, tok.vocab_size, size=(32, 2)).astype(np.int32)
    rows = np.asarray(jax.jit(hashed_lm_logp_rows)(hl, jnp.asarray(ctx)))
    for i in range(8):
        true_ctx = tuple(int(x) for x in ctx[i] if x != 0)
        for c in range(0, tok.vocab_size, 5):
            np.testing.assert_allclose(rows[i, c], lm.score(true_ctx, c),
                                       rtol=1e-5, atol=1e-6)


def test_ctc_kernel_parity_on_tpu():
    from pytorch_asr_tpu.ops.ctc import ctc_loss as ctc_loss_jnp
    from pytorch_asr_tpu.ops.ctc_pallas import ctc_loss_auto

    rng = np.random.default_rng(2)
    B, T, V, S = 8, 64, 31, 20
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    llen = jnp.asarray(rng.integers(T // 2, T + 1, size=B), jnp.int32)
    tokens = jnp.asarray(rng.integers(1, V, size=(B, S)), jnp.int32)
    tlen = jnp.asarray(rng.integers(1, S + 1, size=B), jnp.int32)
    ours = jax.jit(ctc_loss_auto)(logits, llen, tokens, tlen)
    want = jax.jit(ctc_loss_jnp)(logits, llen, tokens, tlen)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                               rtol=1e-4, atol=1e-3)


def test_lanes_beam_parity_on_tpu():
    """Lane-parallel fused beam kernel vs the XLA scan ON HARDWARE: token
    bit-equality (the interpret-mode test covers arithmetic; this pins the
    Mosaic compile -- lane broadcasts, masked reductions, i32 wraparound
    hash math -- on the real chip)."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
    from pytorch_asr_tpu.ops.beam_pallas import prefix_beam_fused_lanes

    rng = np.random.default_rng(7)
    B, T, V, K, L = 4, 64, 32, 16, 48
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    lens = jnp.asarray([T, T - 7, T // 2, T - 1], np.int32)
    tk, lk, sk = jax.jit(
        prefix_beam_fused_lanes, static_argnums=(2, 3, 4))(
        logits, lens, K, 0, L)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx),
                               rtol=1e-4, atol=1e-3)


def test_lanes_topa_parity_on_tpu():
    """Restricted-candidate (top-A) lane kernel vs the scan's ext_top_a
    search ON HARDWARE at a BPE-scale vocab: pins the streamed top-A
    value/index chunks and data-driven candidate lanes in the Mosaic
    compile (bit-equal scores measured on v5e, round 4)."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
    from pytorch_asr_tpu.ops.beam_pallas import prefix_beam_fused_lanes_topa

    rng = np.random.default_rng(13)
    B, T, V, K, L, A = 4, 48, 256, 16, 40, 32
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    lens = jnp.asarray([T, T - 7, T // 2, T - 1], np.int32)
    tk, lk, sk = jax.jit(
        prefix_beam_fused_lanes_topa, static_argnums=(2, 3, 4, 5))(
        logits, lens, K, 0, L, A)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    ext_top_a=A, use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx),
                               rtol=1e-4, atol=1e-3)


def test_lanes_topa_dense_lm_parity_on_tpu():
    """Dense+top-A fused route (round 5) vs the scan's lm_table + ext_top_a
    search ON HARDWARE at a BPE-scale vocab: pins the b-major one-hot ctx
    row gather and the candidate-lane gather in the Mosaic compile."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
    from pytorch_asr_tpu.ops.beam_pallas import prefix_beam_fused_lanes_topa

    rng = np.random.default_rng(17)
    B, T, V, K, L, A = 4, 48, 256, 16, 40, 32
    n_ctx = 1024
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    lens = jnp.asarray([T, T - 7, T // 2, T - 1], np.int32)
    tab = rng.normal(size=(n_ctx, V)).astype(np.float32)
    tab = jnp.asarray(tab - np.log(np.exp(tab).sum(axis=1, keepdims=True)))
    tk, lk, sk = jax.jit(
        prefix_beam_fused_lanes_topa, static_argnums=(2, 3, 4, 5, 7, 8))(
        logits, lens, K, 0, L, A, tab, 0.5, 1.0)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    ext_top_a=A, lm_table=tab, lm_alpha=0.5,
                                    lm_beta=1.0, use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx),
                               rtol=1e-4, atol=1e-3)


def test_lanes_topa_rnn_parity_on_tpu():
    """In-kernel RNN-LM fusion (round 5) vs the scan's rnn_lm + ext_top_a
    search ON HARDWARE: pins the b-major LM state layout, the one-hot
    parent-permutation matmul, the in-kernel LSTM step and log-softmax in
    the Mosaic compile."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
    from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig
    from pytorch_asr_tpu.ops.beam_pallas import (
        prefix_beam_fused_lanes_topa_rnn)

    rng = np.random.default_rng(19)
    B, T, V, K, L, A = 4, 48, 256, 16, 40, 32
    # Random logits PLUS a planted path: the search stays non-trivial but
    # decisive.  The kernel computes the LM step with a different matmul
    # algorithm than the scan (MXU HIGHEST vs XLA), so purely random
    # scores have ~1e-5 cross-impl drift and rank-K near-ties can flip on
    # noise (measured ~2e-4 of decisions at B=64) -- the CPU interpret
    # test pins exact arithmetic; this test pins the Mosaic compile.
    raw = rng.standard_normal((B, T, V)).astype(np.float32)
    path = rng.integers(0, V, size=(B, T))
    for b in range(B):
        raw[b, np.arange(T), path[b]] += 4.0
    logits = jnp.asarray(raw)
    lens = jnp.asarray([T, T - 7, T // 2, T - 1], np.int32)
    rnn = CharRNNLM(RNNLMConfig(embed_dim=32, hidden_dim=64, num_layers=2),
                    vocab_size=V)
    params = rnn.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4), jnp.int32))["params"]
    tk, lk, sk = jax.jit(
        prefix_beam_fused_lanes_topa_rnn,
        static_argnums=(2, 4, 5, 6, 7, 8, 9, 10))(
        logits, lens, rnn, params, K, 0, L, A, 0.4, 0.7, V - 1)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    ext_top_a=A, rnn_lm=rnn,
                                    rnn_lm_params=params, lm_alpha=0.4,
                                    lm_beta=0.7, sos_id=V - 1,
                                    use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    # Tokens/lengths above are EXACT; the fused score accumulates T LSTM
    # logp outputs computed by a different matmul algorithm (Pallas MXU
    # HIGHEST vs XLA's lowering of the scan's lm_step), so per-frame ulp
    # drift compounds to ~4e-4 relative at |score| ~ 200 (measured v5e) --
    # wider rtol than the acoustic-only kernels, whose float ops are
    # order-identical.
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx),
                               rtol=2e-3, atol=1e-3)


def test_lanes_beam_dense_lm_parity_on_tpu():
    """In-kernel dense-LM fusion vs the scan-dense path ON HARDWARE: pins
    the one-hot MXU row gathers, lax.rem context roll, and fused-score
    ranking in the Mosaic compile (2.6x the scan on v5e, round 4)."""
    from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search
    from pytorch_asr_tpu.ops.beam_pallas import prefix_beam_fused_lanes

    rng = np.random.default_rng(11)
    B, T, V, K, L = 4, 64, 32, 16, 48
    n_ctx = V * V
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    lens = jnp.asarray([T, T - 7, T // 2, T - 1], np.int32)
    tab = rng.normal(size=(n_ctx, V)).astype(np.float32)
    tab = jnp.asarray(tab - np.log(np.exp(tab).sum(axis=1, keepdims=True)))
    tk, lk, sk = jax.jit(
        prefix_beam_fused_lanes, static_argnums=(2, 3, 4, 6, 7))(
        logits, lens, K, 0, L, tab, 0.5, 1.0)
    tx, lx, sx = prefix_beam_search(logits, lens, beam_size=K, max_len=L,
                                    lm_table=tab, lm_alpha=0.5, lm_beta=1.0,
                                    use_fused=False)
    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lx))
    for b in range(B):
        n = int(lk[b])
        np.testing.assert_array_equal(np.asarray(tk)[b, :n],
                                      np.asarray(tx)[b, :n])
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx),
                               rtol=1e-4, atol=1e-3)
