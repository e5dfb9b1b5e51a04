"""Fused Pallas LSTM parity vs the lax.scan reference (values + grads).

The kernel fuses the input projection (x @ wih + bias) and the recurrence,
and reverses in-kernel; the reference composes the same pieces from jnp ops
and the _lstm_scan cell.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pytorch_asr_tpu.models.encoder_bilstm import _lstm_scan
from pytorch_asr_tpu.ops.lstm_pallas import lstm_seq


def _case(seed, B=4, T=40, D=24, H=16, varied=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32) * 0.5)
    wih = jnp.asarray(rng.standard_normal((D, 4 * H)).astype(np.float32) * 0.3)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(4 * H).astype(np.float32) * 0.1)
    lengths = jnp.asarray(
        rng.integers(T // 2, T + 1, size=B).astype(np.int32) if varied
        else np.full(B, T, np.int32))
    return x, wih, whh, bias, lengths


def _ref(x, wih, whh, bias, lengths, reverse):
    """Flip-free scan reference: lax.scan(reverse=...) over the SAME
    projected inputs both directions.  A jnp.flip-based reference is
    numerically unsafe on TPU: XLA fuses the flip into the projection
    matmul, perturbing its bf16 accumulation by ulps, which long
    recurrences amplify to O(1) differences (measured on v5e)."""
    T = x.shape[1]
    xproj = x @ wih + bias
    xp = jnp.swapaxes(xproj, 0, 1)
    valid = jnp.arange(T)[:, None] < lengths[None, :]
    hs = _lstm_scan(xp.astype(jnp.float32), whh, valid, reverse=reverse)
    # The kernel folds the window mask in: zero outside [0, len).
    hs = jnp.where(valid[..., None], hs, 0.0)
    return jnp.swapaxes(hs, 0, 1)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_lstm_pallas_forward_parity(seed, reverse):
    x, wih, whh, bias, lengths = _case(seed)
    with pltpu.force_tpu_interpret_mode():
        ours = lstm_seq(x, wih, whh, bias, lengths, reverse)
    ref = _ref(x, wih, whh, bias, lengths, reverse)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_pallas_grad_parity(reverse):
    x, wih, whh, bias, lengths = _case(3, B=2, T=24, D=12, H=8)

    def loss_pallas(x_, wih_, whh_, b_):
        # f32 residuals for exact parity (bf16 is the training default).
        return jnp.sum(jnp.tanh(lstm_seq(x_, wih_, whh_, b_, lengths, reverse,
                                         None, jnp.float32)))

    def loss_ref(x_, wih_, whh_, b_):
        return jnp.sum(jnp.tanh(_ref(x_, wih_, whh_, b_, lengths, reverse)))

    with pltpu.force_tpu_interpret_mode():
        gs_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, wih, whh, bias)
    gs_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wih, whh, bias)
    for name, p, r in zip(("dx", "dwih", "dwhh", "dbias"), gs_p, gs_r):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_pallas_grad_parity_partial_last_block(reverse):
    """Backward over an UNPADDED partial last block (T >= tc, T % tc != 0).

    At B=4 _pick_tc gives tc=32, so T=40 exercises the partial-block OOB
    sanitization in _bwd_kernel (t_total path).  One sequence has length == T:
    for the reverse direction that makes natural step T-1 a VALID first
    processed step whose entering state must be the initial zeros — the exact
    row the pre-shift ct/o_all sanitize exists for."""
    from pytorch_asr_tpu.ops.lstm_pallas import _pick_tc

    B, T = 4, 40
    assert T >= _pick_tc(B) and T % _pick_tc(B) != 0
    x, wih, whh, bias, lengths = _case(13, B=B, T=T, D=12, H=8)
    lengths = lengths.at[0].set(T)      # full-length row hits t_total - 1

    def loss_pallas(x_, wih_, whh_, b_):
        return jnp.sum(jnp.tanh(lstm_seq(x_, wih_, whh_, b_, lengths, reverse,
                                         None, jnp.float32)))

    def loss_ref(x_, wih_, whh_, b_):
        return jnp.sum(jnp.tanh(_ref(x_, wih_, whh_, b_, lengths, reverse)))

    with pltpu.force_tpu_interpret_mode():
        gs_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, wih, whh, bias)
    gs_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wih, whh, bias)
    for name, p, r in zip(("dx", "dwih", "dwhh", "dbias"), gs_p, gs_r):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_lstm_pallas_zero_length_rows():
    x, wih, whh, bias, lengths = _case(5)
    lengths = lengths.at[0].set(0)
    with pltpu.force_tpu_interpret_mode():
        out = lstm_seq(x, wih, whh, bias, lengths, False)
    assert np.all(np.asarray(out)[0] == 0)


def test_lstm_pallas_chunk_boundary_lengths():
    """Lengths exactly at / around the TIME_CHUNK boundary."""
    from pytorch_asr_tpu.ops.lstm_pallas import TIME_CHUNK

    T = 2 * TIME_CHUNK
    x, wih, whh, bias, _ = _case(7, B=4, T=T)
    lengths = jnp.asarray([TIME_CHUNK - 1, TIME_CHUNK, TIME_CHUNK + 1, T],
                          jnp.int32)
    for reverse in (False, True):
        with pltpu.force_tpu_interpret_mode():
            ours = lstm_seq(x, wih, whh, bias, lengths, reverse)
        ref = _ref(x, wih, whh, bias, lengths, reverse)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,want_tc", [(4, 32), (136, 16), (300, 8)])
def test_adaptive_time_chunk(B, want_tc):
    """Large batches shrink the in-kernel time chunk (VMEM scales with tc*B);
    values must stay identical to the scan reference at every chunk size."""
    from pytorch_asr_tpu.ops.lstm_pallas import _pick_tc

    assert _pick_tc(B) == want_tc
    if B > 150:                       # parity run only for the mid size
        return
    x, wih, whh, bias, lengths = _case(3, B=B, T=20, D=8, H=8)
    with pltpu.force_tpu_interpret_mode():
        ours = lstm_seq(x, wih, whh, bias, lengths, False)
    ref = _ref(x, wih, whh, bias, lengths, False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_lstm_pallas_bf16_output():
    """out_dtype=bfloat16: same values as f32 up to bf16 rounding; masked
    region stays exactly zero."""
    x, wih, whh, bias, lengths = _case(9)
    with pltpu.force_tpu_interpret_mode():
        f32 = lstm_seq(x, wih, whh, bias, lengths, False)
        b16 = lstm_seq(x, wih, whh, bias, lengths, False, jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(b16, np.float32), np.asarray(f32),
                               rtol=0.02, atol=0.01)
    T = x.shape[1]
    mask = np.arange(T)[None, :] >= np.asarray(lengths)[:, None]
    assert np.all(np.asarray(b16, np.float32)[mask] == 0)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_pallas_grad_bf16_residuals(reverse):
    """Default bf16 residuals: grads match the f32-residual grads to ~bf16
    rounding (gates live in [-1, 1])."""
    x, wih, whh, bias, lengths = _case(11, B=2, T=24, D=12, H=8)

    def loss(rdt):
        def fn(x_, wih_, whh_, b_):
            return jnp.sum(jnp.tanh(
                lstm_seq(x_, wih_, whh_, b_, lengths, reverse, None, rdt)))
        return fn

    with pltpu.force_tpu_interpret_mode():
        g16 = jax.grad(loss(jnp.bfloat16), argnums=(0, 1, 2, 3))(x, wih, whh, bias)
        g32 = jax.grad(loss(jnp.float32), argnums=(0, 1, 2, 3))(x, wih, whh, bias)
    for name, a, b in zip(("dx", "dwih", "dwhh", "dbias"), g16, g32):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 0.03, name


# ---------------------------------------------------------------- dual kernel
# The dual-direction kernel is a recorded DESIGN STUDY (see the section note
# in ops/lstm_pallas.py): production uses the single-direction pair; these
# tests pin that the study kernel remains EXACTLY equivalent to it.


def _dual_case(seed, B=4, T=37, D=12, H=16):
    x, wf, uf, bf, lengths = _case(seed, B=B, T=T, D=D, H=H)
    _, wb, ub, bb, _ = _case(seed + 100, B=B, T=T, D=D, H=H)
    return x, (wf, uf, bf), (wb, ub, bb), lengths


def test_bilstm_dual_forward_bit_exact():
    from pytorch_asr_tpu.ops.lstm_pallas import bilstm_seq

    x, (wf, uf, bf), (wb, ub, bb), lengths = _dual_case(0)
    with pltpu.force_tpu_interpret_mode():
        f = lstm_seq(x, wf, uf, bf, lengths, False, jnp.float32, jnp.float32)
        b = lstm_seq(x, wb, ub, bb, lengths, True, jnp.float32, jnp.float32)
        pair = jnp.concatenate([f, b], axis=-1)
        dual = bilstm_seq(x, jnp.stack([wf, wb]), jnp.stack([uf, ub]),
                          jnp.stack([bf, bb]), lengths,
                          jnp.float32, jnp.float32)
    assert np.array_equal(np.asarray(pair), np.asarray(dual))


def test_bilstm_dual_grads_bit_exact():
    from pytorch_asr_tpu.ops.lstm_pallas import bilstm_seq

    x, (wf, uf, bf), (wb, ub, bb), lengths = _dual_case(1, B=2, T=24, D=8, H=8)
    g = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 24, 16)).astype(np.float32))

    def pair_loss(x_, wf_, uf_, bf_, wb_, ub_, bb_):
        f = lstm_seq(x_, wf_, uf_, bf_, lengths, False, jnp.float32,
                     jnp.float32)
        b = lstm_seq(x_, wb_, ub_, bb_, lengths, True, jnp.float32,
                     jnp.float32)
        return jnp.sum(jnp.concatenate([f, b], -1) * g)

    def dual_loss(x_, wf_, uf_, bf_, wb_, ub_, bb_):
        o = bilstm_seq(x_, jnp.stack([wf_, wb_]), jnp.stack([uf_, ub_]),
                       jnp.stack([bf_, bb_]), lengths, jnp.float32,
                       jnp.float32)
        return jnp.sum(o * g)

    args = (x, wf, uf, bf, wb, ub, bb)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(pair_loss, argnums=tuple(range(7)))(*args)
        gd = jax.grad(dual_loss, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(("dx", "dwf", "duf", "dbf", "dwb", "dub", "dbb"),
                          gp, gd):
        # ulp-level only: the production kernel runs UNPADDED (partial last
        # block) while the study kernel pads to the chunk multiple, so the
        # dwih/dwhh row-sum accumulation orders differ.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)
