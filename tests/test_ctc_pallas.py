"""Pallas CTC kernel parity vs the jnp scan reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pytorch_asr_tpu.ops.ctc import ctc_loss
from pytorch_asr_tpu.ops.ctc_pallas import ctc_loss_pallas


def _case(seed, B=4, T=50, V=8, Lmax=10, varied=True):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    if varied:
        logit_len = rng.integers(2 * Lmax + 2, T + 1, size=B).astype(np.int32)
        label_len = rng.integers(1, Lmax + 1, size=B).astype(np.int32)
    else:
        logit_len = np.full(B, T, np.int32)
        label_len = np.full(B, Lmax, np.int32)
    labels = np.zeros((B, Lmax), dtype=np.int32)
    for b in range(B):
        labels[b, : label_len[b]] = rng.integers(1, V, size=label_len[b])
    return (jnp.asarray(logits), jnp.asarray(logit_len),
            jnp.asarray(labels), jnp.asarray(label_len))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_ctc_loss_parity(seed):
    args = _case(seed)
    with pltpu.force_tpu_interpret_mode():
        ours = ctc_loss_pallas(*args)
    ref = ctc_loss(*args)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_ctc_grad_parity():
    args = _case(7, B=3, T=40, V=6, Lmax=8)
    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.grad(lambda lg: jnp.sum(ctc_loss_pallas(lg, *args[1:])))(args[0])
    g_ref = jax.grad(lambda lg: jnp.sum(ctc_loss(lg, *args[1:])))(args[0])
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_ctc_padded_rows():
    logits, logit_len, labels, label_len = _case(3)
    logit_len = logit_len.at[0].set(0)
    label_len = label_len.at[0].set(0)
    with pltpu.force_tpu_interpret_mode():
        loss = ctc_loss_pallas(logits, logit_len, labels, label_len)
        g = jax.grad(lambda lg: jnp.sum(ctc_loss_pallas(
            lg, logit_len, labels, label_len)))(logits)
    assert float(loss[0]) == 0.0
    assert np.all(np.asarray(g)[0] == 0)


def test_pallas_ctc_repeats():
    labels = jnp.asarray(np.array([[1, 1, 2, 2, 2, 3]], np.int32))
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((1, 40, 6)).astype(np.float32))
    args = (logits, jnp.asarray([40]), labels, jnp.asarray([6]))
    with pltpu.force_tpu_interpret_mode():
        ours = ctc_loss_pallas(*args)
        g_ours = jax.grad(lambda lg: jnp.sum(ctc_loss_pallas(lg, *args[1:])))(logits)
    ref = ctc_loss(*args)
    g_ref = jax.grad(lambda lg: jnp.sum(ctc_loss(lg, *args[1:])))(logits)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_paired_fwd_kernel_parity():
    """The round-4 study kernel (_fwd_kernel_paired, composed 2-frame
    transition) must stay exact -- loss AND grads -- incl. odd lens that
    freeze mid-pair and the t == 0 pair.  Kept as the measured-refutation
    record (see the module docstring study)."""
    from pytorch_asr_tpu.ops import ctc_pallas as cp

    rng = np.random.default_rng(7)
    B, T, V, S = 6, 70, 12, 9
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    llen = jnp.asarray([T, T - 1, T - 2, 37, 1, 5], jnp.int32)
    toks = jnp.asarray(rng.integers(1, V, size=(B, S)), jnp.int32)
    tlen = jnp.asarray([S, S - 1, 3, 5, 1, 2], jnp.int32)
    args = (logits, llen, toks, tlen)
    try:
        with pltpu.force_tpu_interpret_mode():
            cp.PAIRED_FWD = True
            ours = ctc_loss_pallas(*args)
            g_ours = jax.grad(
                lambda lg: jnp.sum(ctc_loss_pallas(lg, *args[1:])))(logits)
    finally:
        cp.PAIRED_FWD = False
    ref = ctc_loss(*args)
    g_ref = jax.grad(lambda lg: jnp.sum(ctc_loss(lg, *args[1:])))(logits)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)
