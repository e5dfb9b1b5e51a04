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


def _pick_tc_dual(B: int) -> int:
    """Dual-direction kernels hold BOTH directions' chunk scratch (xproj,
    residuals) at once, so halve the row budget (tc*B ~ 1024 rows)."""
    return max(8, min(TIME_CHUNK, _round_up(1024 // max(B, 1), 8)))


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
                *, tc: int, H: int, n_chunks: int, reverse: bool,
                t_total: int | None = None):
    """Single reverse walk over stored residuals -- no forward recompute.

    Processing-order 'previous' state sequences are built vectorized:
      cp[j] = c entering processing step at natural index j  (stored ct,
              shifted by one processing step; chunk boundary from c0)
      hp[j] = h entering that step = o_prev * tanh(c_prev) at valid steps
              (garbage at invalid steps is harmless: dgates rows are zero).

    ``t_total``: set when the grid's last block is PARTIAL (unpadded T not a
    tc multiple).  Rows at t >= t_total come from out-of-bounds loads whose
    bits are undefined.  Three hazards, all zero-sanitized here:
      1. x rows at t >= t_total enter the dwih matmul against zero dgates
         rows (NaN * 0 = NaN), so xb is zeroed before the matmul.
      2. ct / o_all rows at t >= t_total are SHIFTED by one step when
         building the processing-order prev-state sequences; for the
         reverse direction the shift moves row t_total UP onto the VALID
         step t_total-1 (whose dgates mask is true), so garbage would enter
         the live gradient chain.  Sanitizing ct and o_all BEFORE the shift
         makes the shifted-in value 0 — which is exactly the reverse chain's
         entering state there, because the partial chunk is the reverse
         direction's FIRST processed chunk (h0/c0 are the initial zeros).
      3. the sanitized h_prev rows also keep garbage out of the dwhh matmul
         (same NaN * 0 hazard as dwih).
    Everything else flows through value SELECTS, which do not propagate the
    unselected operand.
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
    # h outputs reconstructed from residuals (valid steps only -- see above).
    o_all = acts_ref[:, :, 3 * H:].astype(jnp.float32)
    if t_total is not None:
        # Sanitize BEFORE the shift below: see hazard 2 in the docstring.
        rows = chunk * tc + jax.lax.broadcasted_iota(
            jnp.int32, (tc, 1, 1), 0)
        valid = rows < t_total
        ct = jnp.where(valid, ct, 0.0)
        o_all = jnp.where(valid, o_all, 0.0)
    tanh_sc[:] = jnp.tanh(ct)
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
    if t_total is not None:
        rows_x = chunk * tc + jax.lax.broadcasted_iota(
            jnp.int32, (1, tc, 1), 1)
        xb = jnp.where(rows_x < t_total, xb, 0.0)
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


def _chunking(B: int, T: int) -> tuple[int, int, int]:
    """(tc, t_pad, n_chunks) for a T-step sequence.

    T >= tc runs UNPADDED: the grid's last block is partial (Mosaic masks
    partial stores; OOB loads are sanitized in the backward — see
    ``t_total``).  Padding x/ghs to a tc multiple cost ~0.8 ms/step of pure
    HBM copies at the bench shape (measured via the per-op profile).  Only
    tiny sequences (T < tc) still pad, to the sublane multiple.
    """
    tc = _pick_tc(B)
    if T < tc:
        t_pad = _round_up(T, 8)
        tc = t_pad
    else:
        t_pad = T
    return tc, t_pad, -(-t_pad // tc)


def _fwd_impl(x, wih, whh, bias, lengths, reverse, out_dtype, residual_dtype, save_residuals):
    B, T, D = x.shape
    H = whh.shape[0]
    tc, t_pad, n_chunks = _chunking(B, T)
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
    tc, t_pad, n_chunks = _chunking(B, T)
    assert t_pad == acts.shape[0]
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
                             reverse=reverse,
                             t_total=t_pad if t_pad % tc else None)
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


# --------------------------------------------------------------------------
# Dual-direction kernel (DESIGN STUDY — parity-proven, NOT the production
# path).  Hypothesis: the single-direction recurrence looked latency-bound
# (batch scaling B=32..256 costs only 1.9x for 8x the work), so interleaving
# the two independent direction chains in ONE fori_loop should overlap chain
# A's per-step (B, H) @ (H, 4H) MXU latency with chain B's VPU gate math.
# Measured on v5e at the bench shape (B=128 T=250 D=768 H=384, bf16,
# calibrated two-point harness): fwd pair 1.65—1.68 ms vs dual 1.62—1.64 ms
# (~2%); train pair 4.88 ms vs dual 4.91 ms (parity).  REFUTED: the serial
# loop is throughput-bound in the VPU/VMEM path (the sub-linear batch
# scaling comes from fixed per-grid/DMA overheads), so cross-chain
# interleaving has nothing to hide.  The single-direction kernels stay the
# production path; this kernel is kept with its exact-parity test as the
# recorded measurement (same precedent as the CTC redesign study in
# ops/ctc_pallas.py).  Design notes: the grid walks forward chunks ascending
# and reverse chunks descending simultaneously (chunk ic and n_chunks-1-ic),
# so both directions' in/out DMA streams stay sequential in HBM; both dots
# are issued before either chain's gate math.
# --------------------------------------------------------------------------


def _fwd_kernel_dual(xf_ref, xb_ref, wih_ref, whh_ref, b_ref, end_ref,
                     hsf_ref, hsb_ref, h0f_ref, c0f_ref, h0b_ref, c0b_ref,
                     h_sc, c_sc, xpf_sc, xpb_sc, htf_sc, htb_sc,
                     *, tc: int, H: int, n_chunks: int,
                     actsf_ref=None, ctf_ref=None,
                     actsb_ref=None, ctb_ref=None):
    ic = pl.program_id(0)
    B = h_sc.shape[1]

    @pl.when(ic == 0)
    def _():
        h_sc[:] = jnp.zeros((2, B, H), jnp.float32)
        c_sc[:] = jnp.zeros((2, B, H), jnp.float32)

    chunk_f = ic                      # forward walks chunks ascending
    chunk_b = n_chunks - 1 - ic       # reverse walks descending
    h0f_ref[0] = h_sc[0]              # boundary snapshots (state entering chunk)
    c0f_ref[0] = c_sc[0]
    h0b_ref[0] = h_sc[1]
    c0b_ref[0] = c_sc[1]

    D = xf_ref.shape[-1]
    xf_tb = jnp.swapaxes(xf_ref[:], 0, 1).reshape(tc * B, D)
    xb_tb = jnp.swapaxes(xb_ref[:], 0, 1).reshape(tc * B, D)
    xpf_sc[:] = jnp.dot(xf_tb, wih_ref[0], preferred_element_type=jnp.float32
                        ).reshape(tc, B, 4 * H) + b_ref[0].reshape(1, 1, 4 * H)
    xpb_sc[:] = jnp.dot(xb_tb, wih_ref[1], preferred_element_type=jnp.float32
                        ).reshape(tc, B, 4 * H) + b_ref[1].reshape(1, 1, 4 * H)
    whh_f = whh_ref[0]
    whh_b = whh_ref[1]
    end = end_ref[:]

    def step(k, carry):
        hf, cf, hb, cb = carry
        jf = k
        jb = tc - 1 - k
        tf = chunk_f * tc + jf
        tb = chunk_b * tc + jb
        # Issue both chains' dots before either chain's gate math: the
        # scheduler overlaps one chain's MXU latency with the other's VPU.
        pre_f = xpf_sc[jf] + _d(hf, whh_f)
        pre_b = xpb_sc[jb] + _d(hb, whh_b)
        i_f, f_f, g_f, o_f = _gates(pre_f, H)
        i_b, f_b, g_b, o_b = _gates(pre_b, H)
        if actsf_ref is not None:
            actsf_ref[jf] = jnp.concatenate(
                [i_f, f_f, g_f, o_f], axis=1).astype(actsf_ref.dtype)
            actsb_ref[jb] = jnp.concatenate(
                [i_b, f_b, g_b, o_b], axis=1).astype(actsb_ref.dtype)
        cf_new = f_f * cf + i_f * g_f
        hf_new = o_f * jnp.tanh(cf_new)
        cb_new = f_b * cb + i_b * g_b
        hb_new = o_b * jnp.tanh(cb_new)
        mf = tf < end
        mb = tb < end
        hf = jnp.where(mf, hf_new, hf)
        cf = jnp.where(mf, cf_new, cf)
        hb = jnp.where(mb, hb_new, hb)
        cb = jnp.where(mb, cb_new, cb)
        htf_sc[jf] = jnp.where(mf, hf_new, 0.0)
        htb_sc[jb] = jnp.where(mb, hb_new, 0.0)
        if ctf_ref is not None:
            ctf_ref[jf] = cf.astype(ctf_ref.dtype)
            ctb_ref[jb] = cb.astype(ctb_ref.dtype)
        return hf, cf, hb, cb

    hf, cf, hb, cb = jax.lax.fori_loop(
        0, tc, step, (h_sc[0], c_sc[0], h_sc[1], c_sc[1]))
    hsf_ref[:] = jnp.swapaxes(htf_sc[:], 0, 1).astype(hsf_ref.dtype)
    hsb_ref[:] = jnp.swapaxes(htb_sc[:], 0, 1).astype(hsb_ref.dtype)
    h_sc[0] = hf
    c_sc[0] = cf
    h_sc[1] = hb
    c_sc[1] = cb


def _bwd_kernel_dual(xf_ref, xb_ref, ghsf_ref, ghsb_ref,
                     actsf_ref, ctf_ref, h0f_ref, c0f_ref,
                     actsb_ref, ctb_ref, h0b_ref, c0b_ref,
                     wih_t_ref, whh_t_ref, end_ref,
                     dxf_ref, dxb_ref, dwih_ref, dwhh_ref, db_ref,
                     dh_sc, dc_sc, dwih_sc, dwhh_sc, db_sc,
                     hpf_sc, cpf_sc, tanhf_sc, gtf_sc, dgf_sc,
                     hpb_sc, cpb_sc, tanhb_sc, gtb_sc, dgb_sc,
                     *, tc: int, H: int, n_chunks: int):
    """Both directions' single reverse walks, interleaved (see _bwd_kernel
    for the per-direction residual algebra).  The forward direction's
    backward walks chunks DESCENDING (n_chunks-1-ic), the reverse
    direction's ASCENDING (ic) — each opposite to its forward processing
    order, and again both DMA streams are sequential."""
    ic = pl.program_id(0)
    B = dh_sc.shape[1]

    @pl.when(ic == 0)
    def _():
        dh_sc[:] = jnp.zeros((2, B, H), jnp.float32)
        dc_sc[:] = jnp.zeros((2, B, H), jnp.float32)
        dwih_sc[:] = jnp.zeros(dwih_sc.shape, jnp.float32)
        dwhh_sc[:] = jnp.zeros(dwhh_sc.shape, jnp.float32)
        db_sc[:] = jnp.zeros(db_sc.shape, jnp.float32)

    chunk_f = n_chunks - 1 - ic
    chunk_b = ic
    gtf_sc[:] = jnp.swapaxes(ghsf_ref[:], 0, 1)          # (tc, B, H)
    gtb_sc[:] = jnp.swapaxes(ghsb_ref[:], 0, 1)
    ctf = ctf_ref[:].astype(jnp.float32)
    ctb = ctb_ref[:].astype(jnp.float32)
    tanhf_sc[:] = jnp.tanh(ctf)
    tanhb_sc[:] = jnp.tanh(ctb)
    of_all = actsf_ref[:, :, 3 * H:].astype(jnp.float32)
    ob_all = actsb_ref[:, :, 3 * H:].astype(jnp.float32)
    hf_all = of_all * tanhf_sc[:]
    hb_all = ob_all * tanhb_sc[:]
    # forward direction: natural-ascending processing; prev state at j is the
    # state leaving j-1 (chunk boundary from the snapshot).
    hpf_sc[0] = h0f_ref[0]
    hpf_sc[1:tc] = hf_all[0:tc - 1]
    cpf_sc[0] = c0f_ref[0]
    cpf_sc[1:tc] = ctf[0:tc - 1]
    # reverse direction: processing walks natural time DESCENDING; the state
    # entering natural step j came out of natural step j+1.
    hpb_sc[0:tc - 1] = hb_all[1:tc]
    hpb_sc[tc - 1] = h0b_ref[0]
    cpb_sc[0:tc - 1] = ctb[1:tc]
    cpb_sc[tc - 1] = c0b_ref[0]
    whh_t_f = whh_t_ref[0]
    whh_t_b = whh_t_ref[1]
    end = end_ref[:]

    def bstep(k, carry):
        dhf, dcf, dhb, dcb = carry
        jf = tc - 1 - k
        jb = k
        tf = chunk_f * tc + jf
        tb = chunk_b * tc + jb
        af = actsf_ref[jf].astype(jnp.float32)
        ab = actsb_ref[jb].astype(jnp.float32)
        i_f, f_f, g_f, o_f = (af[:, :H], af[:, H:2 * H],
                              af[:, 2 * H:3 * H], af[:, 3 * H:])
        i_b, f_b, g_b, o_b = (ab[:, :H], ab[:, H:2 * H],
                              ab[:, 2 * H:3 * H], ab[:, 3 * H:])
        tanh_f = tanhf_sc[jf]
        tanh_b = tanhb_sc[jb]
        dh_tot_f = dhf + gtf_sc[jf]
        dh_tot_b = dhb + gtb_sc[jb]
        do_f = dh_tot_f * tanh_f
        do_b = dh_tot_b * tanh_b
        dc_tot_f = dcf + dh_tot_f * o_f * (1.0 - tanh_f * tanh_f)
        dc_tot_b = dcb + dh_tot_b * o_b * (1.0 - tanh_b * tanh_b)
        dg_f = jnp.concatenate(
            [dc_tot_f * g_f * i_f * (1.0 - i_f),
             dc_tot_f * cpf_sc[jf] * f_f * (1.0 - f_f),
             dc_tot_f * i_f * (1.0 - g_f * g_f),
             do_f * o_f * (1.0 - o_f)], axis=1)
        dg_b = jnp.concatenate(
            [dc_tot_b * g_b * i_b * (1.0 - i_b),
             dc_tot_b * cpb_sc[jb] * f_b * (1.0 - f_b),
             dc_tot_b * i_b * (1.0 - g_b * g_b),
             do_b * o_b * (1.0 - o_b)], axis=1)
        mf = tf < end
        mb = tb < end
        dg_f = jnp.where(mf, dg_f, 0.0)
        dg_b = jnp.where(mb, dg_b, 0.0)
        dgf_sc[jf] = dg_f
        dgb_sc[jb] = dg_b
        dhf = jnp.where(mf, _d(dg_f, whh_t_f), dhf)
        dcf = jnp.where(mf, dc_tot_f * f_f, dcf)
        dhb = jnp.where(mb, _d(dg_b, whh_t_b), dhb)
        dcb = jnp.where(mb, dc_tot_b * f_b, dcb)
        return dhf, dcf, dhb, dcb

    dhf, dcf, dhb, dcb = jax.lax.fori_loop(
        0, tc, bstep, (dh_sc[0], dc_sc[0], dh_sc[1], dc_sc[1]))
    dh_sc[0] = dhf
    dc_sc[0] = dcf
    dh_sc[1] = dhb
    dc_sc[1] = dcb

    D = xf_ref.shape[-1]
    xf_tb = jnp.swapaxes(xf_ref[:], 0, 1).reshape(tc * B, D)
    xb_tb = jnp.swapaxes(xb_ref[:], 0, 1).reshape(tc * B, D)
    dgf = dgf_sc[:].reshape(tc * B, 4 * H)
    dgb = dgb_sc[:].reshape(tc * B, 4 * H)
    dxf_tb = jnp.dot(dgf, wih_t_ref[0].astype(jnp.float32),
                     preferred_element_type=jnp.float32).reshape(tc, B, D)
    dxb_tb = jnp.dot(dgb, wih_t_ref[1].astype(jnp.float32),
                     preferred_element_type=jnp.float32).reshape(tc, B, D)
    dxf_ref[:] = jnp.swapaxes(dxf_tb, 0, 1).astype(dxf_ref.dtype)
    dxb_ref[:] = jnp.swapaxes(dxb_tb, 0, 1).astype(dxb_ref.dtype)
    dwih_sc[0] += jnp.dot(xf_tb.astype(jnp.float32).T, dgf,
                          preferred_element_type=jnp.float32)
    dwih_sc[1] += jnp.dot(xb_tb.astype(jnp.float32).T, dgb,
                          preferred_element_type=jnp.float32)
    dwhh_sc[0] += jnp.dot(hpf_sc[:].reshape(tc * B, H).T, dgf,
                          preferred_element_type=jnp.float32)
    dwhh_sc[1] += jnp.dot(hpb_sc[:].reshape(tc * B, H).T, dgb,
                          preferred_element_type=jnp.float32)
    db_sc[0] += dgf.sum(axis=0)[None, :]
    db_sc[1] += dgb.sum(axis=0)[None, :]

    @pl.when(ic == n_chunks - 1)
    def _():
        dwih_ref[:] = dwih_sc[:]
        dwhh_ref[:] = dwhh_sc[:]
        db_ref[:] = db_sc[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bilstm_seq(x, wih, whh, bias, lengths, out_dtype=None,
               residual_dtype=jnp.bfloat16):
    """Fused masked BiLSTM layer: BOTH directions in one Pallas program.

    Args:
      x: (B, T, D) inputs in natural time order.
      wih: (2, D, 4H) stacked [forward, reverse] input weights;
      whh: (2, H, 4H); bias: (2, 4H).
      lengths: (B,) valid lengths; mask window [0, len) for both directions.
    Returns: (B, T, 2H) = concat(forward, reverse hidden states), ZERO
      outside the window.  Bit-identical per direction to ``lstm_seq``
      (same operations in the same order); the fusion only changes the
      instruction schedule.
    """
    hsf, hsb, *_ = _dual_fwd_impl(x, wih, whh, bias, lengths,
                                  out_dtype, None, save_residuals=False)
    return jnp.concatenate([hsf, hsb], axis=-1)


def _dual_fwd_impl(x, wih, whh, bias, lengths, out_dtype, residual_dtype,
                   save_residuals):
    B, T, D = x.shape
    H = whh.shape[1]
    tc = _pick_tc_dual(B)
    t_pad = _round_up(T, tc)
    n_chunks = t_pad // tc
    xp = _pad_time(x, t_pad)
    end = lengths.astype(jnp.int32)[:, None]
    idx_f = lambda i: (0, i, 0)                          # noqa: E731
    idx_b = lambda i: (0, n_chunks - 1 - i, 0)           # noqa: E731
    snap_f = lambda i: (i, 0, 0)                         # noqa: E731
    snap_b = lambda i: (n_chunks - 1 - i, 0, 0)          # noqa: E731
    kern = functools.partial(_fwd_kernel_dual, tc=tc, H=H, n_chunks=n_chunks)
    out_specs = [
        pl.BlockSpec((B, tc, H), idx_f),                 # hs fwd
        pl.BlockSpec((B, tc, H), idx_b),                 # hs bwd
        pl.BlockSpec((1, B, H), snap_f),                 # h0 fwd snapshots
        pl.BlockSpec((1, B, H), snap_f),                 # c0 fwd
        pl.BlockSpec((1, B, H), snap_b),                 # h0 bwd
        pl.BlockSpec((1, B, H), snap_b),                 # c0 bwd
    ]
    odt = out_dtype or jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((B, t_pad, H), odt),
        jax.ShapeDtypeStruct((B, t_pad, H), odt),
        jax.ShapeDtypeStruct((n_chunks, B, H), jnp.float32),
        jax.ShapeDtypeStruct((n_chunks, B, H), jnp.float32),
        jax.ShapeDtypeStruct((n_chunks, B, H), jnp.float32),
        jax.ShapeDtypeStruct((n_chunks, B, H), jnp.float32),
    ]
    if save_residuals:
        out_specs += [
            pl.BlockSpec((tc, B, 4 * H), snap_f),        # fwd gate acts
            pl.BlockSpec((tc, B, H), snap_f),            # fwd cell carries
            pl.BlockSpec((tc, B, 4 * H), snap_b),        # bwd gate acts
            pl.BlockSpec((tc, B, H), snap_b),            # bwd cell carries
        ]
        out_shape += [
            jax.ShapeDtypeStruct((t_pad, B, 4 * H), residual_dtype),
            jax.ShapeDtypeStruct((t_pad, B, H), residual_dtype),
            jax.ShapeDtypeStruct((t_pad, B, 4 * H), residual_dtype),
            jax.ShapeDtypeStruct((t_pad, B, H), residual_dtype),
        ]

        def kern(*refs, _inner=functools.partial(
                _fwd_kernel_dual, tc=tc, H=H, n_chunks=n_chunks)):
            (xf_ref, xb_ref, wih_ref, whh_ref, b_ref, end_ref,
             hsf_ref, hsb_ref, h0f_ref, c0f_ref, h0b_ref, c0b_ref,
             actsf_ref, ctf_ref, actsb_ref, ctb_ref,
             h_sc, c_sc, xpf_sc, xpb_sc, htf_sc, htb_sc) = refs
            _inner(xf_ref, xb_ref, wih_ref, whh_ref, b_ref, end_ref,
                   hsf_ref, hsb_ref, h0f_ref, c0f_ref, h0b_ref, c0b_ref,
                   h_sc, c_sc, xpf_sc, xpb_sc, htf_sc, htb_sc,
                   actsf_ref=actsf_ref, ctf_ref=ctf_ref,
                   actsb_ref=actsb_ref, ctb_ref=ctb_ref)

    outs = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, tc, D), idx_f),             # x (forward stream)
            pl.BlockSpec((B, tc, D), idx_b),             # x (reverse stream)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # wih (2, D, 4H)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # whh (2, H, 4H)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias (2, 1, 4H)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # end
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),          # h carries
            pltpu.VMEM((2, B, H), jnp.float32),          # c carries
            pltpu.VMEM((tc, B, 4 * H), jnp.float32),     # fwd xproj chunk
            pltpu.VMEM((tc, B, 4 * H), jnp.float32),     # bwd xproj chunk
            pltpu.VMEM((tc, B, H), jnp.float32),         # fwd h outputs
            pltpu.VMEM((tc, B, H), jnp.float32),         # bwd h outputs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(xp, xp, wih, whh, bias.reshape(2, 1, -1), end)
    if save_residuals:
        hsf, hsb, h0f, c0f, h0b, c0b, actsf, ctf, actsb, ctb = outs
    else:
        (hsf, hsb, h0f, c0f, h0b, c0b) = outs
        actsf = ctf = actsb = ctb = None
    return (hsf[:, :T], hsb[:, :T], h0f, c0f, h0b, c0b,
            actsf, ctf, actsb, ctb)


def _dual_vjp_fwd(x, wih, whh, bias, lengths, out_dtype, residual_dtype):
    (hsf, hsb, h0f, c0f, h0b, c0b, actsf, ctf, actsb, ctb) = _dual_fwd_impl(
        x, wih, whh, bias, lengths, out_dtype,
        residual_dtype or jnp.float32, save_residuals=True)
    res = (x, wih, whh, bias, lengths, h0f, c0f, h0b, c0b,
           actsf, ctf, actsb, ctb)
    return jnp.concatenate([hsf, hsb], axis=-1), res


def _dual_vjp_bwd(out_dtype, residual_dtype, res, g_hs):
    (x, wih, whh, bias, lengths, h0f, c0f, h0b, c0b,
     actsf, ctf, actsb, ctb) = res
    B, T, D = x.shape
    H = whh.shape[1]
    tc = _pick_tc_dual(B)
    t_pad = actsf.shape[0]
    n_chunks = t_pad // tc
    xp = _pad_time(x, t_pad)
    g = g_hs.astype(jnp.float32)
    ghsf = _pad_time(g[..., :H], t_pad)
    ghsb = _pad_time(g[..., H:], t_pad)
    end = lengths.astype(jnp.int32)[:, None]
    wih_t = jnp.swapaxes(wih.astype(jnp.float32), 1, 2)  # (2, 4H, D)
    whh_t = jnp.swapaxes(whh, 1, 2)                      # (2, 4H, H)
    idx_f = lambda i: (0, n_chunks - 1 - i, 0)           # noqa: E731
    idx_b = lambda i: (0, i, 0)                          # noqa: E731
    snap_f = lambda i: (n_chunks - 1 - i, 0, 0)          # noqa: E731
    snap_b = lambda i: (i, 0, 0)                         # noqa: E731
    kern = functools.partial(_bwd_kernel_dual, tc=tc, H=H, n_chunks=n_chunks)
    dxf, dxb, dwih, dwhh, db = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, tc, D), idx_f),             # x (fwd-dir stream)
            pl.BlockSpec((B, tc, D), idx_b),             # x (bwd-dir stream)
            pl.BlockSpec((B, tc, H), idx_f),             # ghs fwd
            pl.BlockSpec((B, tc, H), idx_b),             # ghs bwd
            pl.BlockSpec((tc, B, 4 * H), snap_f),        # fwd gate acts
            pl.BlockSpec((tc, B, H), snap_f),            # fwd cell carries
            pl.BlockSpec((1, B, H), snap_f),             # fwd h snapshots
            pl.BlockSpec((1, B, H), snap_f),             # fwd c snapshots
            pl.BlockSpec((tc, B, 4 * H), snap_b),        # bwd gate acts
            pl.BlockSpec((tc, B, H), snap_b),            # bwd cell carries
            pl.BlockSpec((1, B, H), snap_b),             # bwd h snapshots
            pl.BlockSpec((1, B, H), snap_b),             # bwd c snapshots
            pl.BlockSpec(memory_space=pltpu.VMEM),       # wih^T (2, 4H, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # whh^T (2, 4H, H)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # end
        ],
        out_specs=[
            pl.BlockSpec((B, tc, D), idx_f),             # dx fwd contribution
            pl.BlockSpec((B, tc, D), idx_b),             # dx bwd contribution
            pl.BlockSpec((2, D, 4 * H), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, H, 4 * H), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, 1, 4 * H), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, t_pad, D), x.dtype),
            jax.ShapeDtypeStruct((B, t_pad, D), x.dtype),
            jax.ShapeDtypeStruct((2, D, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((2, H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((2, 1, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),          # dh carries
            pltpu.VMEM((2, B, H), jnp.float32),          # dc carries
            pltpu.VMEM((2, D, 4 * H), jnp.float32),      # dwih accums
            pltpu.VMEM((2, H, 4 * H), jnp.float32),      # dwhh accums
            pltpu.VMEM((2, 1, 4 * H), jnp.float32),      # dbias accums
            pltpu.VMEM((tc, B, H), jnp.float32),         # fwd h_prev
            pltpu.VMEM((tc, B, H), jnp.float32),         # fwd c_prev
            pltpu.VMEM((tc, B, H), jnp.float32),         # fwd tanh(c_t)
            pltpu.VMEM((tc, B, H), jnp.float32),         # fwd ghs (t-major)
            pltpu.VMEM((tc, B, 4 * H), jnp.float32),     # fwd dgates
            pltpu.VMEM((tc, B, H), jnp.float32),         # bwd h_prev
            pltpu.VMEM((tc, B, H), jnp.float32),         # bwd c_prev
            pltpu.VMEM((tc, B, H), jnp.float32),         # bwd tanh(c_t)
            pltpu.VMEM((tc, B, H), jnp.float32),         # bwd ghs (t-major)
            pltpu.VMEM((tc, B, 4 * H), jnp.float32),     # bwd dgates
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(xp, xp, ghsf, ghsb, actsf, ctf, h0f, c0f, actsb, ctb, h0b, c0b,
      wih_t, whh_t, end)
    dx = (dxf + dxb)[:, :T]
    return (dx, dwih.astype(wih.dtype), dwhh.astype(whh.dtype),
            db.reshape(bias.shape).astype(bias.dtype), None)


bilstm_seq.defvjp(_dual_vjp_fwd, _dual_vjp_bwd)
