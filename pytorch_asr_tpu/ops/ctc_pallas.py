"""Pallas CTC alpha-beta kernel (SURVEY.md §2.1 'CTC loss', §7.3 hard part #1).

The reference uses ATen/cuDNN C++/CUDA CTC.  The jnp scan version (ops/ctc.py)
is the correctness oracle but pays XLA's per-step scan overhead ~ O(T) kernel
launches (~30-45 ms at B=16, T=250 on v5e).  Here the whole recurrence runs
inside two Pallas kernels:

  * forward: alpha recursion, time-chunked.  The grid iterates over T-chunks
    (sequential on-core), BlockSpecs auto-pipeline the (Tc, B, S) log-prob
    chunks HBM->VMEM, and the (B, S) alpha carry lives in persistent scratch.
    All alphas stream back to HBM for the backward pass.
  * backward: beta recursion with the grid walking chunks in reverse time
    order, emitting w = exp(alpha + beta - logZ) (the state posteriors).

Label-dependent gathers/scatters (ext-label log-prob gather, S->V posterior
scatter, log-softmax) stay in XLA where they fuse; the kernels do only the
sequential work XLA is bad at.  Lane layout: batch on sublanes, lattice states
on lanes (S padded to 128); the s-1/s-2 shifts are static lane rolls.

Parity: tests/test_ctc_pallas.py vs ops/ctc.py (itself vs torch.nn.CTCLoss).

DESIGN INVESTIGATION (round 2, VERDICT item "push CTC 32% SOL -> >=50%"):
three redesigns targeting the presumed HBM bound were built, parity-tested,
and MEASURED on v5e at B=128 T=250 S=512 (fwd+bwd, jax.grad):

  this design (lattice/alphas/w streamed via HBM) ... 1.022 ms
  v2: in-kernel emission lattice + chunk-checkpointed alphas with in-kernel
      recompute + in-kernel posterior->vocab projection ............ 1.330 ms
  v2b: as v2 but alphas stored (no recompute) ..................... 1.114 ms
  v3: XLA-built lattice (as here) + in-kernel projection only ..... 1.154 ms

Conclusion: the kernel is bound by the sequential VPU logsumexp recursion
(~0.7 ms of irreducible per-step vector work), not HBM -- the 32% figure
came from a bytes-only speed-of-light model.  Every variant that moved
matmul/transpose work INTO the kernel lost: Mosaic serializes small batched
dot_generals and relayouts that XLA fuses.  The HBM lattice streams overlap
the recursion via the BlockSpec pipeline, so removing them buys nothing.
This file keeps the fastest measured design; the roofline entry documents
the VPU bound (scripts/roofline.py).

ROUND-4 STUDY (VERDICT r3 item 7): attack the serial-iteration COUNT.
``_fwd_kernel_paired`` composes two frames into one sequential iteration:
the 2-step transition is a 5-term logsumexp over shifts 0..4 whose weights
W_m depend only on the emissions (computable off the alpha chain), so the
alpha-dependent dependency depth halves -- at the cost of ~2.3x the vector
work (the W build, the lse5, plus the single-step a1 the backward pass and
mid-pair-freeze rows still need).  Parity: exact for loss AND grads incl.
odd lens (mid-pair freeze) and the t==0 pair.  MEASURED on v5e at the
bench shape (B=128 T=250 S=513, 3 alternated repetitions, median):

    forward kernel      plain 0.689 ms   paired 0.797 ms   (-16%)
    fwd+bwd (jax.grad)  plain 1.193 ms   paired 1.299 ms   (-9%)

REFUTED: the recursion is THROUGHPUT-bound on the VPU, not latency-bound --
shortening the dependency chain buys nothing because the per-iteration
vector ops already issue back-to-back; the extra parallel work is pure
cost.  Together with the round-2 memory-system refutations this closes
both attack axes the roofline model suggests; the plain kernel stands ON
EVIDENCE.  The paired kernel is kept behind ``PAIRED_FWD`` as the record.
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
PAIRED_FWD = False  # opt-in study kernel (_fwd_kernel_paired); see its doc


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


def _fwd_kernel(logp_ref, skip_ref, len_ref, alphas_ref, final_ref,
                alpha_sc, *, tc: int, s_pad: int):
    i = pl.program_id(1)                       # time-chunk index (inner grid dim)
    B = logp_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, s_pad), 1)
    alpha = alpha_sc[:]
    skip_add = skip_ref[:]                      # 0 where skip allowed else NEG_INF
    lens = len_ref[:]                           # (B, 1)
    for j in range(tc):
        t = i * tc + j
        logp_t = logp_ref[j]
        stay = alpha
        s1 = _shift_r(alpha, 1, lane)
        s2 = _shift_r(alpha, 2, lane) + skip_add
        anew = _logsumexp3(stay, s1, s2) + logp_t
        anew = jnp.maximum(anew, NEG_INF)
        alpha0 = jnp.where(lane < 2, logp_t, NEG_INF)
        alpha = jnp.where(t == 0, alpha0,
                          jnp.where(t < lens, anew, alpha))
        alphas_ref[j] = alpha
    alpha_sc[:] = alpha
    final_ref[:] = alpha


def _lse5(a, b, c, d, e):
    m = jnp.maximum(jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d)), e)
    m = jnp.maximum(m, NEG_INF)
    tot = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
                      + jnp.exp(d - m) + jnp.exp(e - m))
    return jnp.maximum(tot, NEG_INF)


def _fwd_kernel_paired(logp_ref, skip_ref, len_ref, alphas_ref, final_ref,
                       alpha_sc, *, tc: int, s_pad: int):
    """Round-4 study (VERDICT r3 item 7): two frames per sequential
    iteration via the COMPOSED transition.

    One step is  A_t(x)[s] = lse(x[s], x[s-1], x[s-2]+K[s]) + P_t[s].
    Composing two,  A_{t+1}(A_t(x))[s] = P_{t+1}[s]
                    + lse_{m=0..4}( x[s-m] + W_m[s] )  with
        W_0 = P_t[s]
        W_1 = lse(P_t[s], P_t[s-1])
        W_2 = lse(P_t[s]+K[s], P_t[s-1], P_t[s-2]+K[s])
        W_3 = lse(P_t[s-1]+K[s-1], P_t[s-2]+K[s])
        W_4 = P_t[s-2] + K[s] + K[s-2]
    The W_m depend only on the emissions, so the alpha-dependent critical
    path per PAIR of frames is one 5-term logsumexp instead of two chained
    3-term ones.  The single-step result a1 is still computed (the backward
    pass consumes every alpha, and rows freezing mid-pair need it), so the
    variant trades ~2.3x the vector work for ~0.6x the dependency depth --
    a pure experiment on whether the recursion is latency- or
    throughput-bound.  Measured result: see the module docstring study.
    """
    i = pl.program_id(1)
    B = logp_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, s_pad), 1)
    alpha = alpha_sc[:]
    K0 = skip_ref[:]
    K1 = _shift_r(K0, 1, lane)
    K2 = _shift_r(K0, 2, lane)
    lens = len_ref[:]
    for j in range(0, tc, 2):
        t = i * tc + j
        p0 = logp_ref[j]                        # P_t
        p1 = logp_ref[j + 1]                    # P_{t+1}
        p0s1 = _shift_r(p0, 1, lane)
        p0s2 = _shift_r(p0, 2, lane)
        # ---- emission-only pair weights (off the alpha chain) --------------
        w0 = p0
        w1 = jnp.logaddexp(p0, p0s1)
        w2 = _logsumexp3(p0 + K0, p0s1, p0s2 + K0)
        w3 = jnp.logaddexp(p0s1 + K1, p0s2 + K0)
        w4 = p0s2 + K0 + K2
        # ---- single step a1 (stored; also the mid-pair freeze value) -------
        a1n = _logsumexp3(alpha, _shift_r(alpha, 1, lane),
                          _shift_r(alpha, 2, lane) + K0) + p0
        a1n = jnp.maximum(a1n, NEG_INF)
        alpha0 = jnp.where(lane < 2, p0, NEG_INF)
        a1 = jnp.where(t == 0, alpha0, jnp.where(t < lens, a1n, alpha))
        # ---- composed double step ------------------------------------------
        a2 = _lse5(alpha + w0,
                   _shift_r(alpha, 1, lane) + w1,
                   _shift_r(alpha, 2, lane) + w2,
                   _shift_r(alpha, 3, lane) + w3,
                   _shift_r(alpha, 4, lane) + w4) + p1
        a2 = jnp.maximum(a2, NEG_INF)
        # t == 0 pair: second step applies to alpha0, not to A_t(x)
        t0_out = _logsumexp3(alpha0, _shift_r(alpha0, 1, lane),
                             _shift_r(alpha0, 2, lane) + K0) + p1
        t0_out = jnp.maximum(t0_out, NEG_INF)
        out = jnp.where(t + 1 < lens,
                        jnp.where(t == 0, t0_out, a2), a1)
        alphas_ref[j] = a1
        alphas_ref[j + 1] = out
        alpha = out
    alpha_sc[:] = alpha
    final_ref[:] = alpha


def _bwd_kernel(logp_ref, alphas_ref, skip_from_ref, beta_T_ref, len_ref,
                logz_ref, w_ref, beta_sc, logp_next_sc,
                *, tc: int, s_pad: int, n_chunks: int):
    i = pl.program_id(1)                       # reversed time-chunk index
    B = logp_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, s_pad), 1)

    @pl.when(i == 0)
    def _():
        beta_sc[:] = jnp.full((B, s_pad), NEG_INF)
        logp_next_sc[:] = jnp.full((B, s_pad), NEG_INF)

    beta = beta_sc[:]
    logp_next = logp_next_sc[:]
    skip_from = skip_from_ref[:]
    beta_T = beta_T_ref[:]
    lens = len_ref[:]
    logz = logz_ref[:]
    chunk = n_chunks - 1 - i
    for j in reversed(range(tc)):
        t = chunk * tc + j
        logp_t = logp_ref[j]
        term = beta + logp_next
        stay = term
        s1 = _shift_l(term, 1, lane, s_pad)
        s2 = _shift_l(term, 2, lane, s_pad) + skip_from
        recursed = _logsumexp3(stay, s1, s2)
        beta = jnp.where(t == lens - 1, beta_T,
                         jnp.where(t < lens - 1, recursed, beta))
        gamma = alphas_ref[j] + beta - logz
        w = jnp.exp(jnp.maximum(jnp.where(t < lens, gamma, NEG_INF), NEG_INF))
        w_ref[j] = w
        logp_next = logp_t
    beta_sc[:] = beta
    logp_next_sc[:] = logp_next


def _prep_pallas(logits, logit_len, labels, label_len, blank):
    """XLA-side prep shared by fwd/bwd: log-softmax, ext lattice, masks."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)            # (B, T, V)
    B, T, V = logp.shape
    ext = _extended_labels(labels, blank)                 # (B, S)
    skip = _skip_allowed(labels, label_len)               # (B, S) bool
    S = ext.shape[1]
    s_pad = _round_up(max(S, LANE), LANE)
    t_pad = _round_up(T, TIME_CHUNK)
    # Emission lattice logp_tbs[t,b,s] = logp[b,t,ext[b,s]] as ONE one-hot
    # batched matmul on the MXU, emitted directly at padded shape — a per-row
    # lane gather plus a 67 MB pad copy measured 0.68+0.17 ms at B=128 on
    # v5e, the matmul ~0.1 ms.  One-hot rows are exact 1.0, so HIGHEST
    # precision reproduces the gathered values (same trick as the backward
    # scatter below).
    ext_p = jnp.pad(ext, ((0, 0), (0, s_pad - S)))        # pad rows -> label 0
    onehot = jax.nn.one_hot(ext_p, V, dtype=jnp.float32)  # (B, Sp, V)
    logp_tp = jnp.pad(logp, ((0, 0), (0, t_pad - T), (0, 0)))
    logp_tbs = jnp.einsum("btv,bsv->tbs", logp_tp, onehot,
                          precision=jax.lax.Precision.HIGHEST)
    valid_s = jnp.arange(s_pad)[None, :] < 2 * label_len[:, None] + 1
    valid_t = (jnp.arange(t_pad) < T)[:, None, None]
    logp_tbs = jnp.where(valid_s[None] & valid_t, logp_tbs, NEG_INF)
    skip_add = jnp.where(skip, 0.0, NEG_INF).astype(jnp.float32)
    skip_add = jnp.pad(skip_add, ((0, 0), (0, s_pad - S)),
                       constant_values=NEG_INF)
    return logp, logp_tbs, ext, skip_add, s_pad, t_pad


def _pad_batch(x, b_pad, axis, fill):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, b_pad - x.shape[axis])
    return jnp.pad(x, pads, constant_values=fill) if b_pad != x.shape[axis] else x


def _run_forward(logp_tbs, skip_add, logit_len, s_pad, t_pad):
    B = logp_tbs.shape[1]
    bb = min(BATCH_BLOCK, _round_up(B, 8))
    b_pad = _round_up(B, bb)
    logp_tbs = _pad_batch(logp_tbs, b_pad, 1, NEG_INF)
    skip_add = _pad_batch(skip_add, b_pad, 0, NEG_INF)
    lens = _pad_batch(logit_len.astype(jnp.int32)[:, None], b_pad, 0, 0)
    n_chunks = t_pad // TIME_CHUNK
    kern = functools.partial(
        _fwd_kernel_paired if PAIRED_FWD else _fwd_kernel,
        tc=TIME_CHUNK, s_pad=s_pad)
    alphas, final = pl.pallas_call(
        kern,
        grid=(b_pad // bb, n_chunks),
        in_specs=[
            pl.BlockSpec((TIME_CHUNK, bb, s_pad), lambda b, i: (i, b, 0)),
            pl.BlockSpec((bb, s_pad), lambda b, i: (b, 0)),    # skip_add
            pl.BlockSpec((bb, 1), lambda b, i: (b, 0)),        # lens
        ],
        out_specs=[
            pl.BlockSpec((TIME_CHUNK, bb, s_pad), lambda b, i: (i, b, 0)),
            pl.BlockSpec((bb, s_pad), lambda b, i: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, s_pad), jnp.float32)],
        interpret=pallas_interpret(),
    )(logp_tbs, skip_add, lens)
    return alphas[:, :B], final[:B]


def _run_backward(logp_tbs, alphas, skip_add, beta_T, logit_len, logz,
                  s_pad, t_pad):
    B = logp_tbs.shape[1]
    bb = min(BATCH_BLOCK, _round_up(B, 8))
    b_pad = _round_up(B, bb)
    n_chunks = t_pad // TIME_CHUNK
    # skip transitions s -> s+2 allowed iff arrival-skip allowed at s+2
    skip_from = jnp.concatenate(
        [skip_add[:, 2:], jnp.full((B, 2), NEG_INF, jnp.float32)], axis=1)
    logp_tbs = _pad_batch(logp_tbs, b_pad, 1, NEG_INF)
    alphas = _pad_batch(alphas, b_pad, 1, NEG_INF)
    skip_from = _pad_batch(skip_from, b_pad, 0, NEG_INF)
    beta_T = _pad_batch(beta_T, b_pad, 0, NEG_INF)
    lens = _pad_batch(logit_len.astype(jnp.int32)[:, None], b_pad, 0, 0)
    logz_p = _pad_batch(logz[:, None], b_pad, 0, 0.0)
    kern = functools.partial(_bwd_kernel, tc=TIME_CHUNK, s_pad=s_pad,
                             n_chunks=n_chunks)
    rev3 = lambda b, i: (n_chunks - 1 - i, b, 0)  # noqa: E731
    row = lambda b, i: (b, 0)  # noqa: E731
    w = pl.pallas_call(
        kern,
        grid=(b_pad // bb, n_chunks),
        in_specs=[
            pl.BlockSpec((TIME_CHUNK, bb, s_pad), rev3),  # logp chunks, reversed
            pl.BlockSpec((TIME_CHUNK, bb, s_pad), rev3),  # alpha chunks, reversed
            pl.BlockSpec((bb, s_pad), row),               # skip_from
            pl.BlockSpec((bb, s_pad), row),               # beta_T
            pl.BlockSpec((bb, 1), row),                   # lens
            pl.BlockSpec((bb, 1), row),                   # logz
        ],
        out_specs=pl.BlockSpec((TIME_CHUNK, bb, s_pad), rev3),
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, s_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb, s_pad), jnp.float32),         # beta carry
            pltpu.VMEM((bb, s_pad), jnp.float32),         # logp_{t+1} carry
        ],
        interpret=pallas_interpret(),
    )(logp_tbs, alphas, skip_from, beta_T, lens, logz_p)
    return w[:, :B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss_pallas(logits, logit_len, labels, label_len, blank=0):
    """Drop-in replacement for ops.ctc.ctc_loss running on Pallas TPU kernels."""
    loss, _ = _forward_impl(logits, logit_len, labels, label_len, blank)
    return loss


def _forward_impl(logits, logit_len, labels, label_len, blank):
    logp, logp_tbs, ext, skip_add, s_pad, t_pad = _prep_pallas(
        logits, logit_len, labels, label_len, blank)
    alphas, final = _run_forward(logp_tbs, skip_add, logit_len, s_pad, t_pad)
    logz = _terminal_logz(final, label_len)
    feasible = (logz > NEG_INF / 2) & (logit_len > 0)
    loss = jnp.where(feasible, -logz, 0.0)
    residuals = (logp, logp_tbs, alphas, skip_add, ext, logz, feasible,
                 logit_len, label_len, s_pad, t_pad)
    return loss, residuals


def _fwd_rule(logits, logit_len, labels, label_len, blank):
    return _forward_impl(logits, logit_len, labels, label_len, blank)


def _bwd_rule(blank, residuals, g):
    (logp, logp_tbs, alphas, skip_add, ext, logz, feasible,
     logit_len, label_len, s_pad, t_pad) = residuals
    B, T, V = logp.shape
    S = ext.shape[1]
    bidx = jnp.arange(B)
    beta_T = jnp.full((B, s_pad), NEG_INF)
    beta_T = beta_T.at[bidx, 2 * label_len].set(0.0)
    beta_T = jnp.where(
        (label_len > 0)[:, None]
        & (jnp.arange(s_pad)[None, :] == jnp.maximum(2 * label_len - 1, 0)[:, None]),
        0.0, beta_T)
    logz_safe = jnp.where(feasible, logz, 0.0)
    w = _run_backward(logp_tbs, alphas, skip_add, beta_T, logit_len,
                      logz_safe, s_pad, t_pad)              # (Tp, B, Sp)
    w = w[:T, :, :S] * feasible[None, :, None]
    onehot = jax.nn.one_hot(ext, V, dtype=w.dtype)          # (B, S, V)
    gamma_v = jnp.einsum("tbs,bsv->tbv", w, onehot,
                         precision=jax.lax.Precision.HIGHEST)
    p = jnp.exp(logp)                                       # (B, T, V)
    t_valid = (jnp.arange(T)[None, :] < logit_len[:, None])[..., None]
    grad = jnp.where(
        t_valid,
        p * jnp.sum(gamma_v, axis=-1).transpose(1, 0)[..., None]
        - jnp.swapaxes(gamma_v, 0, 1),
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
