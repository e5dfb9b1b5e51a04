"""CTC loss parity vs torch.nn.CTCLoss (stand-in oracle) + custom-VJP grad checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.ops.ctc import ctc_loss, ctc_loss_mean


def _random_case(rng, B=3, T=20, V=8, Lmax=5, min_label=1):
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    logit_len = rng.integers(Lmax * 2 + 2, T + 1, size=B).astype(np.int32)
    label_len = rng.integers(min_label, Lmax + 1, size=B).astype(np.int32)
    labels = np.zeros((B, Lmax), dtype=np.int32)
    for b in range(B):
        labels[b, : label_len[b]] = rng.integers(1, V, size=label_len[b])
    return logits, logit_len, labels, label_len


def _torch_ctc(logits, logit_len, labels, label_len):
    import torch

    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)  # (T,B,V)
    loss = torch.nn.functional.ctc_loss(
        lp, torch.from_numpy(labels), torch.from_numpy(logit_len),
        torch.from_numpy(label_len), blank=0, reduction="none", zero_infinity=True,
    )
    return loss.numpy()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ctc_loss_matches_torch(seed):
    rng = np.random.default_rng(seed)
    logits, logit_len, labels, label_len = _random_case(rng)
    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_len),
                    jnp.asarray(labels), jnp.asarray(label_len))
    theirs = _torch_ctc(logits, logit_len, labels, label_len)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


def test_ctc_repeated_labels():
    # repeats exercise the skip-transition mask
    rng = np.random.default_rng(7)
    B, T, V, L = 2, 30, 6, 6
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    labels = np.array([[1, 1, 2, 2, 2, 3], [4, 4, 4, 4, 4, 4]], dtype=np.int32)
    logit_len = np.array([30, 30], dtype=np.int32)
    label_len = np.array([6, 6], dtype=np.int32)
    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_len),
                    jnp.asarray(labels), jnp.asarray(label_len))
    theirs = _torch_ctc(logits, logit_len, labels, label_len)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


def test_ctc_grad_matches_torch():
    import torch

    rng = np.random.default_rng(11)
    logits, logit_len, labels, label_len = _random_case(rng, B=2, T=15, V=6, Lmax=4)

    grad_ours = jax.grad(
        lambda lg: jnp.sum(ctc_loss(lg, jnp.asarray(logit_len),
                                    jnp.asarray(labels), jnp.asarray(label_len)))
    )(jnp.asarray(logits))

    tl = torch.from_numpy(logits).requires_grad_(True)
    lp = torch.log_softmax(tl, dim=-1).transpose(0, 1)
    loss = torch.nn.functional.ctc_loss(
        lp, torch.from_numpy(labels), torch.from_numpy(logit_len),
        torch.from_numpy(label_len), blank=0, reduction="sum", zero_infinity=True,
    )
    loss.backward()
    np.testing.assert_allclose(np.asarray(grad_ours), tl.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_ctc_grad_matches_autodiff_of_forward():
    """Custom VJP vs jax.grad through a plain (non-custom-vjp) scan version."""
    from pytorch_asr_tpu.ops.ctc import _ctc_forward

    rng = np.random.default_rng(3)
    logits, logit_len, labels, label_len = _random_case(rng, B=2, T=12, V=5, Lmax=3)
    args = (jnp.asarray(logit_len), jnp.asarray(labels), jnp.asarray(label_len))

    g_custom = jax.grad(lambda lg: jnp.sum(ctc_loss(lg, *args)))(jnp.asarray(logits))
    g_auto = jax.grad(lambda lg: jnp.sum(_ctc_forward(lg, *args, 0)[0]))(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-3, atol=1e-4)


def test_ctc_padded_rows_are_zero():
    rng = np.random.default_rng(5)
    logits, logit_len, labels, label_len = _random_case(rng)
    logit_len[0] = 0
    label_len[0] = 0
    labels[0] = 0
    loss = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_len),
                    jnp.asarray(labels), jnp.asarray(label_len))
    assert float(loss[0]) == 0.0
    g = jax.grad(lambda lg: jnp.sum(ctc_loss(lg, jnp.asarray(logit_len),
                                             jnp.asarray(labels),
                                             jnp.asarray(label_len))))(jnp.asarray(logits))
    assert np.all(np.asarray(g)[0] == 0)


def test_ctc_infeasible_is_zero():
    # more labels than frames -> infeasible -> zero loss (zero_infinity)
    logits = np.random.default_rng(0).standard_normal((1, 3, 5)).astype(np.float32)
    labels = np.array([[1, 2, 3, 4]], dtype=np.int32)
    loss = ctc_loss(jnp.asarray(logits), jnp.asarray([3]),
                    jnp.asarray(labels), jnp.asarray([4]))
    assert float(loss[0]) == 0.0


def test_ctc_loss_mean_finite():
    rng = np.random.default_rng(9)
    logits, logit_len, labels, label_len = _random_case(rng)
    val = ctc_loss_mean(jnp.asarray(logits), jnp.asarray(logit_len),
                        jnp.asarray(labels), jnp.asarray(label_len))
    assert np.isfinite(float(val))
