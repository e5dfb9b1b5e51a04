"""Fully-fused Pallas LSTM sequence kernels (SURVEY.md §7.3 'BiLSTM throughput').

The reference leans on cuDNN's fused LSTM.  This kernel goes further than the
usual 'precompute the input projection, scan the recurrence' split: the input
projection, bias, recurrence, and masking ALL run inside one Pallas program,
so the (B, T, 4H) gate pre-activations never touch HBM.

Measured motivation (v5e, B=64 T=250 H=384): with the projection outside, each
direction spent ~3.7 ms of a 6.8 ms fwd+bwd OUTSIDE the recurrence kernel --
xproj materialization (100 MB fp32 per direction), (B,T)<->(T,B) transposes,
flips for the reverse direction, and shifted-copy concats for the backward
residuals.  This design removes all of it:

  * x stays batch-major (B, T, D) in HBM: the grid streams (B, tc, D) blocks;
    the per-chunk projection is one (tc*B, D)@(D, 4H) MXU matmul in VMEM.
  * the REVERSE direction is processed by walking the grid and the in-chunk
    loop backwards -- no jnp.flip copies; outputs land in natural time order
    and both directions share the same [0, len) mask window.
  * the TRAINING forward stores the gate activations (i, f, g, o) and cell
    states to HBM; the backward is then a single reverse walk with NO
    recomputation -- no x@wih replay, no chunk re-forward.  Profiling showed
    the recompute-from-snapshot design spent ~33% of backward MXU flops
    replaying the forward (both kernels run at 75-81% of the MXU roofline,
    so flop removal is the only lever left).  The h-prev/c-prev sequences the
    weight grads need are reconstructed VECTORIZED from the stored tensors
    (h_t = o_t * tanh(c_t) at valid steps; invalid steps have zero dgates so
    their garbage rows contribute nothing).
  * the INFERENCE forward (primal call outside jax.grad) uses a variant that
    skips the residual writes, so decode pays no extra HBM traffic.
  * in-chunk recurrences are lax.fori_loop over VMEM scratch (time-major for
    leading-dim dynamic indexing) -- unrolled Python loops spilled >100 MB of
    registers at tc=32.

Gate order (i, f, g, o) matches models/encoder_bilstm.py and torch (so the
torch checkpoint importer round-trips).  Custom VJP parity-tested against
jax.grad of the lax.scan reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_asr_tpu.ops.runtime import pallas_interpret

TIME_CHUNK = 32


def _pick_tc(B: int) -> int:
    """Time-chunk size: scratch buffers scale with tc*B, so shrink chunks as
    the batch grows to stay inside VMEM (tc*B ~ 2048 rows)."""
    return max(8, min(TIME_CHUNK, _round_up(2048 // max(B, 1), 8)))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _d(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _gates(pre, H):
    i = jax.nn.sigmoid(pre[:, :H])
    f = jax.nn.sigmoid(pre[:, H:2 * H])
    g = jnp.tanh(pre[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(pre[:, 3 * H:])
    return i, f, g, o


def _fwd_kernel(x_ref, wih_ref, whh_ref, b_ref,
                end_ref, hs_ref, h0_ref, c0_ref, h_sc, c_sc, xp_sc, ht_sc,
                *, tc: int, H: int, n_chunks: int, reverse: bool,
                acts_ref=None, ct_ref=None):
    ic = pl.program_id(0)
    B = h_sc.shape[0]

    @pl.when(ic == 0)
    def _():
        h_sc[:] = jnp.zeros((B, H), jnp.float32)
        c_sc[:] = jnp.zeros((B, H), jnp.float32)

    # chunk id in natural time (the grid walks reversed for reverse=True)
    chunk = (n_chunks - 1 - ic) if reverse else ic
    h0_ref[0] = h_sc[:]              # boundary snapshot (state entering chunk)
    c0_ref[0] = c_sc[:]

    xb = x_ref[:]                                        # (B, tc, D)
    D = xb.shape[-1]
    x_tb = jnp.swapaxes(xb, 0, 1).reshape(tc * B, D)     # time-major
    xp = jnp.dot(x_tb, wih_ref[:],
                 preferred_element_type=jnp.float32).reshape(tc, B, 4 * H)
    xp_sc[:] = xp + b_ref[:].reshape(1, 1, 4 * H)
    whh = whh_ref[:]
    end = end_ref[:]

    def step(k, carry):
        h, c = carry
        j = (tc - 1 - k) if reverse else k
        t = chunk * tc + j
        # The recurrence is latency-bound (small serial matmul): one fp32 dot
        # beats bf16x3 splits here (measured 1.55 vs 2.06 ms/direction).
        pre = xp_sc[j] + _d(h, whh)
        i, f, g, o = _gates(pre, H)
        if acts_ref is not None:
            # Candidate gate values; invalid steps are masked in the backward.
            acts_ref[j] = jnp.concatenate([i, f, g, o],
                                          axis=1).astype(acts_ref.dtype)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = t < end                                      # (B, 1)
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        # Output is ZERO outside [0, len): the window mask the model applied
        # after the kernel is folded in here (saves a full (B, T, H) f32
        # read+write pass per direction).
        ht_sc[j] = jnp.where(m, h_new, 0.0)
        if ct_ref is not None:
            # MASKED carry: the c entering step j+1
            ct_ref[j] = c.astype(ct_ref.dtype)
        return h, c

    h, c = jax.lax.fori_loop(0, tc, step, (h_sc[:], c_sc[:]))
    hs_ref[:] = jnp.swapaxes(ht_sc[:], 0, 1).astype(hs_ref.dtype)
    h_sc[:] = h
    c_sc[:] = c


def _bwd_kernel(x_ref, ghs_ref, acts_ref, ct_ref, h0_ref, c0_ref,
                wih_t_ref, whh_t_ref, end_ref,
                dx_ref, dwih_ref, dwhh_ref, db_ref,
                dh_sc, dc_sc, dwih_sc, dwhh_sc, db_sc,
                hp_sc, cp_sc, tanh_sc, gt_sc, dg_sc,
                *, tc: int, H: int, n_chunks: int, reverse: bool):
    """Single reverse walk over stored residuals -- no forward recompute.

    Processing-order 'previous' state sequences are built vectorized:
      cp[j] = c entering processing step at natural index j  (stored ct,
              shifted by one processing step; chunk boundary from c0)
      hp[j] = h entering that step = o_prev * tanh(c_prev) at valid steps
              (garbage at invalid steps is harmless: dgates rows are zero).
    """
    ic = pl.program_id(0)
    B = dh_sc.shape[0]

    @pl.when(ic == 0)
    def _():
        dh_sc[:] = jnp.zeros((B, H), jnp.float32)
        dc_sc[:] = jnp.zeros((B, H), jnp.float32)
        dwih_sc[:] = jnp.zeros(dwih_sc.shape, jnp.float32)
        dwhh_sc[:] = jnp.zeros(dwhh_sc.shape, jnp.float32)
        db_sc[:] = jnp.zeros(db_sc.shape, jnp.float32)

    # Backward walks chunks opposite to the forward processing order.
    chunk = ic if reverse else (n_chunks - 1 - ic)
    gt_sc[:] = jnp.swapaxes(ghs_ref[:], 0, 1)            # (tc, B, H)
    ct = ct_ref[:].astype(jnp.float32)                   # (tc, B, H)
    tanh_sc[:] = jnp.tanh(ct)
    # h outputs reconstructed from residuals (valid steps only -- see above).
    o_all = acts_ref[:, :, 3 * H:].astype(jnp.float32)
    h_all = o_all * tanh_sc[:]
    if reverse:
        # processing order walks natural time DESCENDING: the state entering
        # natural step j came out of natural step j+1.
        hp_sc[0:tc - 1] = h_all[1:tc]
        hp_sc[tc - 1] = h0_ref[0]
        cp_sc[0:tc - 1] = ct[1:tc]
        cp_sc[tc - 1] = c0_ref[0]
    else:
        hp_sc[0] = h0_ref[0]
        hp_sc[1:tc] = h_all[0:tc - 1]
        cp_sc[0] = c0_ref[0]
        cp_sc[1:tc] = ct[0:tc - 1]
    whh_t = whh_t_ref[:]
    end = end_ref[:]

    def bstep(k, carry):
        dh, dc = carry
        j = k if reverse else (tc - 1 - k)
        t = chunk * tc + j
        a = acts_ref[j].astype(jnp.float32)
        i, f, g, o = a[:, :H], a[:, H:2 * H], a[:, 2 * H:3 * H], a[:, 3 * H:]
        c_prev = cp_sc[j]
        tanh_ct = tanh_sc[j]    # == tanh(f*c_prev + i*g) at valid steps
        dh_tot = dh + gt_sc[j]
        do = dh_tot * tanh_ct
        dc_tot = dc + dh_tot * o * (1.0 - tanh_ct * tanh_ct)
        dgates = jnp.concatenate(
            [dc_tot * g * i * (1.0 - i),
             dc_tot * c_prev * f * (1.0 - f),
             dc_tot * i * (1.0 - g * g),
             do * o * (1.0 - o)], axis=1)                # (B, 4H)
        m = t < end
        dgates = jnp.where(m, dgates, 0.0)
        dg_sc[j] = dgates
        # Invalid steps: the OUTPUT there is a constant 0, so upstream
        # grads (gt) must not leak into the carry chain.
        dh = jnp.where(m, _d(dgates, whh_t), dh)
        dc = jnp.where(m, dc_tot * f, dc)
        return dh, dc

    dh, dc = jax.lax.fori_loop(0, tc, bstep, (dh_sc[:], dc_sc[:]))
    dh_sc[:] = dh
    dc_sc[:] = dc

    xb = x_ref[:]                                        # (B, tc, D)
    D = xb.shape[-1]
    x_tb = jnp.swapaxes(xb, 0, 1).reshape(tc * B, D)
    dgs = dg_sc[:].reshape(tc * B, 4 * H)
    # NOTE: hand-rolled bf16x3 splits were tried for these products and were
    # SLOWER than plain fp32 dots (19.2 vs 16.3 ms full-grad step at B=64):
    # the VPU split passes + extra MXU issues outweigh fp32's pass count.
    dx_tb = jnp.dot(dgs, wih_t_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32).reshape(tc, B, D)
    dx_ref[:] = jnp.swapaxes(dx_tb, 0, 1).astype(dx_ref.dtype)
    dwih_sc[:] += jnp.dot(x_tb.astype(jnp.float32).T, dgs,
                          preferred_element_type=jnp.float32)
    # dwhh as ONE big post-loop matmul: both operands are already buffered
    # t-major, and a per-step (H,B)@(B,4H) inside the serial loop would sit
    # on the recurrence critical path.
    dwhh_sc[:] += jnp.dot(hp_sc[:].reshape(tc * B, H).T, dgs,
                          preferred_element_type=jnp.float32)
    db_sc[:] += dgs.sum(axis=0)[None, :]

    @pl.when(ic == n_chunks - 1)
    def _():
        dwih_ref[:] = dwih_sc[:]
        dwhh_ref[:] = dwhh_sc[:]
        db_ref[:] = db_sc[:]


def _pad_time(x, t_pad):
    T = x.shape[1]
    if t_pad == T:
        return x
    return jnp.pad(x, ((0, 0), (0, t_pad - T)) + ((0, 0),) * (x.ndim - 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def lstm_seq(x, wih, whh, bias, lengths, reverse=False, out_dtype=None,
             residual_dtype=jnp.bfloat16):
    """Fused masked LSTM over a batch-major padded sequence.

    Args:
      x: (B, T, D) inputs in natural time order (any float dtype).
      wih: (D, 4H) input weights; whh: (H, 4H); bias: (4H,).
      lengths: (B,) valid lengths; the mask window is [0, len) for BOTH
        directions -- reverse=True processes t = T-1..0 internally.
      out_dtype: output dtype (None -> float32).  bf16 halves the HBM
        write + downstream read traffic; the recurrence stays fp32.
      residual_dtype: dtype of the saved gate activations / cell carries the
        backward consumes.  The backward is DMA-limited (72% MXU utilization
        with f32 residuals), so bf16 residuals buy real time; gates live in
        [-1, 1] where bf16's ~0.4% relative rounding is negligible against
        SGD gradient noise.  Tests pin f32 for exact-parity checks.
    Returns: (B, T, H) hidden states, ZERO outside the window (the window
      mask is folded into the kernel).
    """
    hs, _, _, _, _ = _fwd_impl(x, wih, whh, bias, lengths, reverse,
                               out_dtype, None, save_residuals=False)
    return hs


def _fwd_impl(x, wih, whh, bias, lengths, reverse, out_dtype, residual_dtype, save_residuals):
    B, T, D = x.shape
    H = whh.shape[0]
    tc = _pick_tc(B)
    t_pad = _round_up(T, tc)
    n_chunks = t_pad // tc
    xp = _pad_time(x, t_pad)
    end = lengths.astype(jnp.int32)[:, None]
    idx = (lambda i: (0, n_chunks - 1 - i, 0)) if reverse else \
          (lambda i: (0, i, 0))
    # time-major outputs (snapshots and residuals): block row = natural chunk
    snap_idx = (lambda i: (n_chunks - 1 - i, 0, 0)) if reverse else \
               (lambda i: (i, 0, 0))
    kern = functools.partial(_fwd_kernel, tc=tc, H=H, n_chunks=n_chunks,
                             reverse=reverse)
    out_specs = [
        pl.BlockSpec((B, tc, H), idx),                 # hs
        pl.BlockSpec((1, B, H), snap_idx),             # h snapshots
        pl.BlockSpec((1, B, H), snap_idx),             # c snapshots
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, t_pad, H), out_dtype or jnp.float32),
        jax.ShapeDtypeStruct((n_chunks, B, H), jnp.float32),
        jax.ShapeDtypeStruct((n_chunks, B, H), jnp.float32),
    ]
    if save_residuals:
        # pallas passes refs positionally; declare the extra outputs and map
        # them onto the keyword refs in a wrapper.
        out_specs += [
            pl.BlockSpec((tc, B, 4 * H), snap_idx),    # gate activations
            pl.BlockSpec((tc, B, H), snap_idx),        # cell-state carries
        ]
        out_shape += [
            jax.ShapeDtypeStruct((t_pad, B, 4 * H), residual_dtype),
            jax.ShapeDtypeStruct((t_pad, B, H), residual_dtype),
        ]

        def kern(*refs, _inner=functools.partial(
                _fwd_kernel, tc=tc, H=H, n_chunks=n_chunks, reverse=reverse)):
            (x_ref, wih_ref, whh_ref, b_ref, end_ref,
             hs_ref, h0_ref, c0_ref, acts_ref, ct_ref,
             h_sc, c_sc, xp_sc, ht_sc) = refs
            _inner(x_ref, wih_ref, whh_ref, b_ref, end_ref,
                   hs_ref, h0_ref, c0_ref, h_sc, c_sc, xp_sc, ht_sc,
                   acts_ref=acts_ref, ct_ref=ct_ref)

    outs = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, tc, D), idx),                 # x
            pl.BlockSpec(memory_space=pltpu.VMEM),         # wih
            pl.BlockSpec(memory_space=pltpu.VMEM),         # whh
            pl.BlockSpec(memory_space=pltpu.VMEM),         # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),         # end
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),               # h carry
            pltpu.VMEM((B, H), jnp.float32),               # c carry
            pltpu.VMEM((tc, B, 4 * H), jnp.float32),       # xproj chunk
            pltpu.VMEM((tc, B, H), jnp.float32),           # h outputs (t-major)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(xp, wih, whh, bias.reshape(1, -1), end)
    if save_residuals:
        hs, h0, c0, acts, ct = outs
    else:
        (hs, h0, c0), acts, ct = outs, None, None
    return hs[:, :T], h0, c0, acts, ct


def _vjp_fwd(x, wih, whh, bias, lengths, reverse, out_dtype, residual_dtype):
    hs, h0, c0, acts, ct = _fwd_impl(x, wih, whh, bias, lengths, reverse,
                                     out_dtype, residual_dtype or jnp.float32,
                                     save_residuals=True)
    res = (x, wih, whh, bias, lengths, h0, c0, acts, ct)
    return hs, res


def _vjp_bwd(reverse, out_dtype, residual_dtype, res, g_hs):
    x, wih, whh, bias, lengths, h0, c0, acts, ct = res
    B, T, D = x.shape
    H = whh.shape[0]
    tc = _pick_tc(B)
    t_pad = acts.shape[0]
    n_chunks = t_pad // tc
    xp = _pad_time(x, t_pad)
    ghs = _pad_time(g_hs.astype(jnp.float32), t_pad)
    end = lengths.astype(jnp.int32)[:, None]
    # whh^T / wih^T precomputed outside the kernel: in-kernel transposes of
    # VMEM-resident weights sat on the serial backward walk (~3% of the step).
    whh_t = whh.T
    wih_t = wih.astype(jnp.float32).T
    # backward grid walks chunks opposite to the forward processing order
    idx = (lambda i: (0, i, 0)) if reverse else \
          (lambda i: (0, n_chunks - 1 - i, 0))
    snap_idx = (lambda i: (i, 0, 0)) if reverse else \
               (lambda i: (n_chunks - 1 - i, 0, 0))
    kern = functools.partial(_bwd_kernel, tc=tc, H=H, n_chunks=n_chunks,
                             reverse=reverse)
    dx, dwih, dwhh, db = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, tc, D), idx),                 # x
            pl.BlockSpec((B, tc, H), idx),                 # ghs
            pl.BlockSpec((tc, B, 4 * H), snap_idx),        # gate activations
            pl.BlockSpec((tc, B, H), snap_idx),            # cell-state carries
            pl.BlockSpec((1, B, H), snap_idx),             # h snapshots
            pl.BlockSpec((1, B, H), snap_idx),             # c snapshots
            pl.BlockSpec(memory_space=pltpu.VMEM),         # wih^T
            pl.BlockSpec(memory_space=pltpu.VMEM),         # whh^T
            pl.BlockSpec(memory_space=pltpu.VMEM),         # end
        ],
        out_specs=[
            pl.BlockSpec((B, tc, D), idx),                 # dx
            pl.BlockSpec((D, 4 * H), lambda i: (0, 0)),    # dwih
            pl.BlockSpec((H, 4 * H), lambda i: (0, 0)),    # dwhh
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0)),    # dbias
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, t_pad, D), x.dtype),
            jax.ShapeDtypeStruct((D, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),               # dh carry
            pltpu.VMEM((B, H), jnp.float32),               # dc carry
            pltpu.VMEM((D, 4 * H), jnp.float32),           # dwih accum
            pltpu.VMEM((H, 4 * H), jnp.float32),           # dwhh accum
            pltpu.VMEM((1, 4 * H), jnp.float32),           # dbias accum
            pltpu.VMEM((tc, B, H), jnp.float32),           # h_prev (rebuilt)
            pltpu.VMEM((tc, B, H), jnp.float32),           # c_prev (rebuilt)
            pltpu.VMEM((tc, B, H), jnp.float32),           # tanh(c_t)
            pltpu.VMEM((tc, B, H), jnp.float32),           # ghs (t-major)
            pltpu.VMEM((tc, B, 4 * H), jnp.float32),       # dgates buffer
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(xp, ghs, acts, ct, h0, c0, wih_t, whh_t, end)
    dx = dx[:, :T]
    return (dx, dwih.astype(wih.dtype), dwhh.astype(whh.dtype),
            db.reshape(bias.shape).astype(bias.dtype), None)


lstm_seq.defvjp(_vjp_fwd, _vjp_bwd)
