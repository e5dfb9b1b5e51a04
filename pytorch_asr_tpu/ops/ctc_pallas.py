"""Pallas CTC alpha-beta kernel (SURVEY.md §2.1 'CTC loss', §7.3 hard part #1).

The reference uses ATen/cuDNN C++/CUDA CTC.  The jnp scan version (ops/ctc.py)
is the correctness oracle but pays XLA's per-step scan overhead ~ O(T) kernel
launches (~30-45 ms at B=16, T=250 on v5e).  Here the whole recurrence runs
inside two Pallas kernels.

Design (v2 -- the round-1 kernel measured 32% of speed-of-light, bounded by
three (T, B, S~512) f32 lattices streamed through HBM; this version removes
ALL of them, ~13x less lattice traffic):

  * the emission lattice logp[b, t, ext[b, s]] is NEVER materialized in HBM:
    each kernel invocation rebuilds its (tc, B, S) chunk on the MXU from the
    (tc, B, V=32) log-prob chunk and the per-utterance one-hot label matrix
    (B, S, V) resident in VMEM -- 16x less HBM read than the lattice
    (V=32 vs S_pad=512);
  * the forward stores only CHUNK-BOUNDARY alpha snapshots (T/tc, B, S); the
    backward re-runs the tc-step alpha recursion per chunk in VMEM
    (checkpoint-recompute, the jax.checkpoint trade applied inside the
    kernel) -- 32x less alpha traffic for one extra VPU recursion pass;
  * the backward never emits the (T, B, S) posterior lattice w: it projects
    w onto the vocabulary in-kernel (one (tc*B, S) @ (S, V) one-hot matmul
    per chunk) and writes gamma_v (T, B, V); the occupancy total
    sum_s w[t, b, s] equals sum_v gamma_v[t, b, v] (one-hot rows sum to 1),
    so the XLA epilogue computes the gradient from gamma_v alone.

Lane layout: batch on sublanes, lattice states on lanes (S padded to 128);
the s-1/s-2 shifts are static lane rolls.  One-hot matmuls run at HIGHEST
precision: one-hot rows are exact 1.0, so the matmul reproduces gathered
values bit-for-bit and gradients stay parity-exact vs torch.nn.CTCLoss.

Parity: tests/test_ctc_pallas.py vs ops/ctc.py (itself vs torch.nn.CTCLoss).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_asr_tpu.ops.ctc import (
    NEG_INF,
    _extended_labels,
    _skip_allowed,
    _terminal_logz,
)
from pytorch_asr_tpu.ops.runtime import pallas_active, pallas_interpret

LANE = 128
TIME_CHUNK = 32
BATCH_BLOCK = 16   # caps VMEM: chunk buffers are (TIME_CHUNK, BATCH_BLOCK, S)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shift_r(x, k, lane_iota):
    """Shift lanes right by k (lattice s-k); vacated lanes -> NEG_INF."""
    rolled = pltpu.roll(x, k, 1)
    return jnp.where(lane_iota < k, NEG_INF, rolled)


def _shift_l(x, k, lane_iota, s_pad):
    rolled = pltpu.roll(x, s_pad - k, 1)
    return jnp.where(lane_iota >= s_pad - k, NEG_INF, rolled)


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m = jnp.maximum(m, NEG_INF)
    tot = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))
    return jnp.maximum(tot, NEG_INF)


def _chunk_lattice(logp_chunk, onehot, valid_s, tc):
    """(tc, B, V) log-probs + (B, S, V) one-hot -> (B, tc, S) lattice chunk.

    HIGHEST precision: one-hot rows are exact, so this equals the gather
    logp[b, t, ext[b, s]] bit-for-bit.  Invalid lattice states -> NEG_INF.
    """
    lp = jnp.swapaxes(logp_chunk, 0, 1)                # (B, tc, V)
    # Mosaic batched matmul needs batch dims at the SAME position (0, 0).
    lat = jax.lax.dot_general(
        lp, onehot,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)            # (B, tc, S)
    return jnp.where(valid_s[:, None, :], lat, NEG_INF)


def _fwd_kernel(logp_ref, onehot_ref, skip_ref, len_ref, lablen_ref,
                bound_ref, final_ref, alpha_sc, *, tc: int, s_pad: int):
    i = pl.program_id(1)                       # time-chunk index (inner dim)
    B = skip_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, s_pad), 1)

    @pl.when(i == 0)
    def _():
        alpha_sc[:] = jnp.full((B, s_pad), NEG_INF)

    bound_ref[0] = alpha_sc[:]                 # alpha ENTERING this chunk
    valid_s = lane < 2 * lablen_ref[:] + 1
    lat = _chunk_lattice(logp_ref[:], onehot_ref[:], valid_s, tc)
    alpha = alpha_sc[:]
    skip_add = skip_ref[:]                     # 0 where skip allowed else NEG_INF
    lens = len_ref[:]                          # (B, 1)
    for j in range(tc):
        t = i * tc + j
        logp_t = lat[:, j]
        stay = alpha
        s1 = _shift_r(alpha, 1, lane)
        s2 = _shift_r(alpha, 2, lane) + skip_add
        anew = _logsumexp3(stay, s1, s2) + logp_t
        anew = jnp.maximum(anew, NEG_INF)
        alpha0 = jnp.where(lane < 2, logp_t, NEG_INF)
        alpha = jnp.where(t == 0, alpha0,
                          jnp.where(t < lens, anew, alpha))
    alpha_sc[:] = alpha
    final_ref[:] = alpha


def _bwd_kernel(logp_ref, onehot_ref, skip_ref, skip_from_ref, bound_ref,
                beta_T_ref, len_ref, lablen_ref, logz_ref,
                gamma_ref, beta_sc, logp_next_sc, w_sc,
                *, tc: int, s_pad: int, n_chunks: int):
    i = pl.program_id(1)                       # reversed time-chunk index
    B = skip_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, s_pad), 1)

    @pl.when(i == 0)
    def _():
        beta_sc[:] = jnp.full((B, s_pad), NEG_INF)
        logp_next_sc[:] = jnp.full((B, s_pad), NEG_INF)

    valid_s = lane < 2 * lablen_ref[:] + 1
    lat = _chunk_lattice(logp_ref[:], onehot_ref[:], valid_s, tc)
    lens = len_ref[:]
    chunk = n_chunks - 1 - i

    # --- alpha recompute from the chunk-boundary checkpoint ----------------
    alpha = bound_ref[0]
    skip_add = skip_ref[:]
    for j in range(tc):
        t = chunk * tc + j
        logp_t = lat[:, j]
        stay = alpha
        s1 = _shift_r(alpha, 1, lane)
        s2 = _shift_r(alpha, 2, lane) + skip_add
        anew = _logsumexp3(stay, s1, s2) + logp_t
        anew = jnp.maximum(anew, NEG_INF)
        alpha0 = jnp.where(lane < 2, logp_t, NEG_INF)
        alpha = jnp.where(t == 0, alpha0,
                          jnp.where(t < lens, anew, alpha))
        w_sc[j] = alpha                        # alphas parked in the w buffer

    # --- beta walk; w = exp(alpha + beta - logZ) overwrites in place -------
    beta = beta_sc[:]
    logp_next = logp_next_sc[:]
    skip_from = skip_from_ref[:]
    beta_T = beta_T_ref[:]
    logz = logz_ref[:]
    for j in reversed(range(tc)):
        t = chunk * tc + j
        logp_t = lat[:, j]
        term = beta + logp_next
        stay = term
        s1 = _shift_l(term, 1, lane, s_pad)
        s2 = _shift_l(term, 2, lane, s_pad) + skip_from
        recursed = _logsumexp3(stay, s1, s2)
        beta = jnp.where(t == lens - 1, beta_T,
                         jnp.where(t < lens - 1, recursed, beta))
        gamma = w_sc[j] + beta - logz
        w_sc[j] = jnp.exp(jnp.maximum(jnp.where(t < lens, gamma, NEG_INF),
                                      NEG_INF))
        logp_next = logp_t
    beta_sc[:] = beta
    logp_next_sc[:] = logp_next

    # --- project posteriors onto the vocab: (B, tc, S) @ (B, S, V) ---------
    w_bt = jnp.swapaxes(w_sc[:], 0, 1)         # (B, tc, S)
    gv = jax.lax.dot_general(
        w_bt, onehot_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)    # (B, tc, V)
    gamma_ref[:] = jnp.swapaxes(gv, 0, 1)      # (tc, B, V)


def _prep_pallas(logits, logit_len, labels, label_len, blank):
    """XLA-side prep shared by fwd/bwd: log-softmax, one-hot labels, masks."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)            # (B, T, V)
    B, T, V = logp.shape
    ext = _extended_labels(labels, blank)                 # (B, S)
    skip = _skip_allowed(labels, label_len)               # (B, S) bool
    S = ext.shape[1]
    s_pad = _round_up(max(S, LANE), LANE)
    t_pad = _round_up(T, TIME_CHUNK)
    ext_p = jnp.pad(ext, ((0, 0), (0, s_pad - S)))        # pad rows -> label 0
    onehot = jax.nn.one_hot(ext_p, V, dtype=jnp.float32)  # (B, Sp, V)
    # time-major (t_pad, B, V) log-prob stream; padded rows gated by lens
    logp_tbv = jnp.swapaxes(
        jnp.pad(logp, ((0, 0), (0, t_pad - T), (0, 0))), 0, 1)
    skip_add = jnp.where(skip, 0.0, NEG_INF).astype(jnp.float32)
    skip_add = jnp.pad(skip_add, ((0, 0), (0, s_pad - S)),
                       constant_values=NEG_INF)
    return logp, logp_tbv, onehot, skip_add, s_pad, t_pad


def _pad_batch(x, b_pad, axis, fill):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, b_pad - x.shape[axis])
    return jnp.pad(x, pads, constant_values=fill) if b_pad != x.shape[axis] else x


def _batch_blocks(B: int) -> tuple[int, int]:
    bb = min(BATCH_BLOCK, _round_up(B, 8))
    return bb, _round_up(B, bb)


def _run_forward(logp_tbv, onehot, skip_add, logit_len, label_len,
                 s_pad, t_pad):
    B = logp_tbv.shape[1]
    V = logp_tbv.shape[2]
    bb, b_pad = _batch_blocks(B)
    logp_tbv = _pad_batch(logp_tbv, b_pad, 1, 0.0)
    onehot = _pad_batch(onehot, b_pad, 0, 0.0)
    skip_add = _pad_batch(skip_add, b_pad, 0, NEG_INF)
    lens = _pad_batch(logit_len.astype(jnp.int32)[:, None], b_pad, 0, 0)
    lablen = _pad_batch(label_len.astype(jnp.int32)[:, None], b_pad, 0, 0)
    n_chunks = t_pad // TIME_CHUNK
    kern = functools.partial(_fwd_kernel, tc=TIME_CHUNK, s_pad=s_pad)
    row = lambda b, i: (b, 0)  # noqa: E731
    bounds, final = pl.pallas_call(
        kern,
        grid=(b_pad // bb, n_chunks),
        in_specs=[
            pl.BlockSpec((TIME_CHUNK, bb, V), lambda b, i: (i, b, 0)),
            pl.BlockSpec((bb, s_pad, V), lambda b, i: (b, 0, 0)),  # one-hot
            pl.BlockSpec((bb, s_pad), row),                # skip_add
            pl.BlockSpec((bb, 1), row),                    # lens
            pl.BlockSpec((bb, 1), row),                    # label lens
        ],
        out_specs=[
            pl.BlockSpec((1, bb, s_pad), lambda b, i: (i, b, 0)),
            pl.BlockSpec((bb, s_pad), row),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, b_pad, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, s_pad), jnp.float32)],
        interpret=pallas_interpret(),
    )(logp_tbv, onehot, skip_add, lens, lablen)
    return bounds[:, :B], final[:B]


def _run_backward(logp_tbv, onehot, bounds, skip_add, beta_T, logit_len,
                  label_len, logz, s_pad, t_pad):
    B = logp_tbv.shape[1]
    V = logp_tbv.shape[2]
    bb, b_pad = _batch_blocks(B)
    n_chunks = t_pad // TIME_CHUNK
    # skip transitions s -> s+2 allowed iff arrival-skip allowed at s+2
    skip_from = jnp.concatenate(
        [skip_add[:, 2:], jnp.full((B, 2), NEG_INF, jnp.float32)], axis=1)
    logp_tbv = _pad_batch(logp_tbv, b_pad, 1, 0.0)
    onehot = _pad_batch(onehot, b_pad, 0, 0.0)
    bounds = _pad_batch(bounds, b_pad, 1, NEG_INF)
    skip_add = _pad_batch(skip_add, b_pad, 0, NEG_INF)
    skip_from = _pad_batch(skip_from, b_pad, 0, NEG_INF)
    beta_T = _pad_batch(beta_T, b_pad, 0, NEG_INF)
    lens = _pad_batch(logit_len.astype(jnp.int32)[:, None], b_pad, 0, 0)
    lablen = _pad_batch(label_len.astype(jnp.int32)[:, None], b_pad, 0, 0)
    logz_p = _pad_batch(logz[:, None], b_pad, 0, 0.0)
    kern = functools.partial(_bwd_kernel, tc=TIME_CHUNK, s_pad=s_pad,
                             n_chunks=n_chunks)
    rev3 = lambda b, i: (n_chunks - 1 - i, b, 0)  # noqa: E731
    row = lambda b, i: (b, 0)  # noqa: E731
    gamma = pl.pallas_call(
        kern,
        grid=(b_pad // bb, n_chunks),
        in_specs=[
            pl.BlockSpec((TIME_CHUNK, bb, V), rev3),       # logp chunks, rev
            pl.BlockSpec((bb, s_pad, V), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((bb, s_pad), row),                # skip_add
            pl.BlockSpec((bb, s_pad), row),                # skip_from
            pl.BlockSpec((1, bb, s_pad), rev3),            # alpha checkpoints
            pl.BlockSpec((bb, s_pad), row),                # beta_T
            pl.BlockSpec((bb, 1), row),                    # lens
            pl.BlockSpec((bb, 1), row),                    # label lens
            pl.BlockSpec((bb, 1), row),                    # logz
        ],
        out_specs=pl.BlockSpec((TIME_CHUNK, bb, V), rev3),
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, V), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb, s_pad), jnp.float32),          # beta carry
            pltpu.VMEM((bb, s_pad), jnp.float32),          # logp_{t+1} carry
            pltpu.VMEM((TIME_CHUNK, bb, s_pad), jnp.float32),  # alpha/w buffer
        ],
        interpret=pallas_interpret(),
    )(logp_tbv, onehot, skip_add, skip_from, bounds, beta_T, lens, lablen,
      logz_p)
    return gamma[:, :B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss_pallas(logits, logit_len, labels, label_len, blank=0):
    """Drop-in replacement for ops.ctc.ctc_loss running on Pallas TPU kernels."""
    loss, _ = _forward_impl(logits, logit_len, labels, label_len, blank)
    return loss


def _forward_impl(logits, logit_len, labels, label_len, blank):
    logp, logp_tbv, onehot, skip_add, s_pad, t_pad = _prep_pallas(
        logits, logit_len, labels, label_len, blank)
    bounds, final = _run_forward(logp_tbv, onehot, skip_add, logit_len,
                                 label_len, s_pad, t_pad)
    logz = _terminal_logz(final, label_len)
    feasible = (logz > NEG_INF / 2) & (logit_len > 0)
    loss = jnp.where(feasible, -logz, 0.0)
    residuals = (logp, logp_tbv, onehot, bounds, skip_add, logz, feasible,
                 logit_len, label_len, s_pad, t_pad)
    return loss, residuals


def _fwd_rule(logits, logit_len, labels, label_len, blank):
    return _forward_impl(logits, logit_len, labels, label_len, blank)


def _bwd_rule(blank, residuals, g):
    (logp, logp_tbv, onehot, bounds, skip_add, logz, feasible,
     logit_len, label_len, s_pad, t_pad) = residuals
    B, T, V = logp.shape
    bidx = jnp.arange(B)
    beta_T = jnp.full((B, s_pad), NEG_INF)
    beta_T = beta_T.at[bidx, 2 * label_len].set(0.0)
    beta_T = jnp.where(
        (label_len > 0)[:, None]
        & (jnp.arange(s_pad)[None, :] == jnp.maximum(2 * label_len - 1, 0)[:, None]),
        0.0, beta_T)
    logz_safe = jnp.where(feasible, logz, 0.0)
    gamma_v = _run_backward(logp_tbv, onehot, bounds, skip_add, beta_T,
                            logit_len, label_len, logz_safe, s_pad, t_pad)
    gamma_v = jnp.swapaxes(gamma_v[:T], 0, 1)               # (B, T, V)
    gamma_v = gamma_v * feasible[:, None, None]
    p = jnp.exp(logp)                                       # (B, T, V)
    t_valid = (jnp.arange(T)[None, :] < logit_len[:, None])[..., None]
    # sum_v gamma_v == sum_s w (one-hot rows sum to 1), so the occupancy
    # total never needs the (T, B, S) posterior lattice.
    grad = jnp.where(
        t_valid,
        p * jnp.sum(gamma_v, axis=-1, keepdims=True) - gamma_v,
        0.0)
    return grad * g[:, None, None], None, None, None


ctc_loss_pallas.defvjp(_fwd_rule, _bwd_rule)


def ctc_loss_auto(logits, logit_len, labels, label_len, blank=0):
    """Pallas kernels on TPU (per-data-shard under a mesh), jnp scan elsewhere."""
    from pytorch_asr_tpu.ops.ctc import ctc_loss

    if pallas_active():
        from jax.sharding import PartitionSpec as P

        from pytorch_asr_tpu.parallel.mesh import maybe_data_shard_map

        fn = lambda lo, ln, la, tl: ctc_loss_pallas(lo, ln, la, tl, blank)  # noqa: E731
        fn = maybe_data_shard_map(fn, in_specs=(P("data"),) * 4,
                                  out_specs=P("data"))
        return fn(logits, logit_len, labels, label_len)
    return ctc_loss(logits, logit_len, labels, label_len, blank)
